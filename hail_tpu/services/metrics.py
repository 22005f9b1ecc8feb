"""Prometheus-style metrics + exposition (reference gear/gear/metrics.py,
which uses prometheus_client; this is a fresh dependency-free equivalent:
labeled Counter/Gauge/Summary registered globally, rendered in the
Prometheus text exposition format at /metrics, and an aiohttp middleware
recording per-endpoint request count/latency/in-flight like the reference's
monitor_endpoints_middleware)."""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

_REGISTRY: 'List[_Metric]' = []
_REGISTRY_LOCK = threading.Lock()


class _Metric:
    kind = 'untyped'

    def __init__(self, name: str, documentation: str,
                 labelnames: Sequence[str] = ()):
        self.name = name
        self.documentation = documentation
        self.labelnames = tuple(labelnames)
        self._children: Dict[Tuple[str, ...], '_Metric'] = {}
        self._lock = threading.Lock()
        self._value = 0.0
        with _REGISTRY_LOCK:
            _REGISTRY.append(self)

    def labels(self, **labels) -> '_Metric':
        key = tuple(str(labels[n]) for n in self.labelnames)
        with self._lock:
            child = self._children.get(key)
            if child is None:
                child = self._make_child()
                self._children[key] = child
            return child

    def _make_child(self) -> '_Metric':
        child = object.__new__(type(self))
        child.labelnames = ()
        child._children = {}
        child._lock = threading.Lock()
        child._value = 0.0
        if isinstance(child, Summary):
            child._sum = 0.0
            child._count = 0
        return child

    def _samples(self) -> List[Tuple[str, Dict[str, str], float]]:
        raise NotImplementedError


class Counter(_Metric):
    kind = 'counter'

    def inc(self, amount: float = 1.0) -> None:
        with self._lock:
            self._value += amount

    @property
    def value(self) -> float:
        return self._value

    def _samples(self):
        if self.labelnames:
            return [(self.name, dict(zip(self.labelnames, k)), c._value)
                    for k, c in self._children.items()]
        return [(self.name, {}, self._value)]


class Gauge(_Metric):
    kind = 'gauge'

    def inc(self, amount: float = 1.0) -> None:
        with self._lock:
            self._value += amount

    def dec(self, amount: float = 1.0) -> None:
        self.inc(-amount)

    def set(self, v: float) -> None:
        with self._lock:
            self._value = float(v)

    @property
    def value(self) -> float:
        return self._value

    _samples = Counter._samples


class Summary(_Metric):
    kind = 'summary'

    def __init__(self, name, documentation, labelnames=()):
        super().__init__(name, documentation, labelnames)
        self._sum = 0.0
        self._count = 0

    def observe(self, v: float) -> None:
        with self._lock:
            self._sum += v
            self._count += 1

    def time(self) -> '_SummaryTimer':
        return _SummaryTimer(self)

    def _samples(self):
        out = []
        if self.labelnames:
            for k, c in self._children.items():
                lab = dict(zip(self.labelnames, k))
                out.append((self.name + '_sum', lab, c._sum))
                out.append((self.name + '_count', lab, float(c._count)))
        else:
            out.append((self.name + '_sum', {}, self._sum))
            out.append((self.name + '_count', {}, float(self._count)))
        return out


class _SummaryTimer:
    def __init__(self, summary: Summary):
        self._s = summary

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._s.observe(time.perf_counter() - self._t0)


def _escape(v: str) -> str:
    return v.replace('\\', r'\\').replace('"', r'\"').replace('\n', r'\n')


def render_metrics(extra: Optional[Dict[str, float]] = None) -> str:
    """Prometheus text exposition format (v0.0.4)."""
    lines = []
    with _REGISTRY_LOCK:
        metrics = list(_REGISTRY)
    for m in metrics:
        lines.append(f'# HELP {m.name} {m.documentation}')
        lines.append(f'# TYPE {m.name} {m.kind}')
        for name, labels, value in m._samples():
            if labels:
                lab = ','.join(f'{k}="{_escape(v)}"' for k, v in labels.items())
                lines.append(f'{name}{{{lab}}} {value}')
            else:
                lines.append(f'{name} {value}')
    for k, v in (extra or {}).items():
        lines.append(f'# TYPE {k} gauge')
        lines.append(f'{k} {v}')
    return '\n'.join(lines) + '\n'


# -- shared HTTP metrics + middleware (gear monitor_endpoints_middleware) ---

REQUEST_TIME = Summary('http_request_latency_seconds',
                       'Endpoint latency in seconds', ['endpoint', 'verb'])
REQUEST_COUNT = Counter('http_request_count', 'Number of HTTP requests',
                        ['endpoint', 'verb', 'status'])
CONCURRENT_REQUESTS = Gauge('http_concurrent_requests',
                            'Number of in progress HTTP requests',
                            ['endpoint', 'verb'])


def monitor_endpoints_middleware():
    from aiohttp import web

    @web.middleware
    async def middleware(request, handler):
        resource = request.match_info.route.resource
        endpoint = resource.canonical if resource else ''
        verb = request.method
        CONCURRENT_REQUESTS.labels(endpoint=endpoint, verb=verb).inc()
        t0 = time.perf_counter()
        status = 500
        try:
            response = await handler(request)
            status = response.status
            return response
        except web.HTTPException as e:
            status = e.status
            raise
        finally:
            REQUEST_TIME.labels(endpoint=endpoint, verb=verb).observe(
                time.perf_counter() - t0)
            REQUEST_COUNT.labels(endpoint=endpoint, verb=verb,
                                 status=status).inc()
            CONCURRENT_REQUESTS.labels(endpoint=endpoint, verb=verb).dec()
    return middleware


async def metrics_handler(request):
    from aiohttp import web
    return web.Response(text=render_metrics(),
                        content_type='text/plain', charset='utf-8')
