"""Platform services (reference L10, zero-egress single-node shape).

The reference runs a constellation of cloud services around Batch —
`auth/` (identity + sessions), `gear/` (shared service library: database,
auth decorators, metrics), `monitoring/` (resource/billing dashboards),
`web_common/` (shared HTML templating) — on Kubernetes behind a gateway.
This package is the same capability shape on one host:

- metrics.py   — Prometheus-style counters/gauges/summaries + /metrics
                 exposition + aiohttp middleware (gear/gear/metrics.py)
- database.py  — async sqlite Database with the reference's call surface
                 (gear/gear/database.py, MySQL there)
- gear.py      — bearer-token parsing + authenticated-handler decorators
                 (gear/gear/auth.py)
- auth_service.py — the identity service: users + session tokens over REST
                 (auth/auth/auth.py)
- tokens.py    — client-side token store, ~/.hail_tpu/tokens.json
                 (hailtop/auth/tokens.py)
- web_common.py — minimal shared HTML layout for service UI pages
                 (web_common/web_common/web_common.py)
"""

from .auth_service import AuthService
from .database import Database
from .metrics import Counter, Gauge, Summary, render_metrics

__all__ = ['AuthService', 'Database', 'Counter', 'Gauge', 'Summary',
           'render_metrics']
