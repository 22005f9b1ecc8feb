"""Minimal shared HTML layout for service UI pages (reference
web_common/web_common/web_common.py + templates: sass styling and Jinja
layout there; a dependency-free string layout here)."""

from __future__ import annotations

from html import escape
from typing import List, Sequence

_STYLE = '''
body { font-family: system-ui, sans-serif; margin: 2rem; color: #222; }
h1 { font-size: 1.4rem; }
table { border-collapse: collapse; margin-top: 1rem; }
th, td { border: 1px solid #ccc; padding: 0.3rem 0.7rem; text-align: left; }
th { background: #f0f0f0; }
a { color: #1a5dab; text-decoration: none; }
.state-Success { color: #0a7a0a; } .state-Failed, .state-Error { color: #b00020; }
.state-Running { color: #b06a00; } .state-Cancelled { color: #666; }
'''


def render_page(title: str, body_html: str) -> str:
    return (f'<!DOCTYPE html><html><head><meta charset="utf-8">'
            f'<title>{escape(title)}</title><style>{_STYLE}</style></head>'
            f'<body><h1>{escape(title)}</h1>{body_html}</body></html>')


def render_table(headers: Sequence[str], rows: List[Sequence[str]],
                 raw_cols: Sequence[int] = ()) -> str:
    """HTML table; cells are escaped except column indices in raw_cols
    (pre-rendered links)."""
    head = ''.join(f'<th>{escape(h)}</th>' for h in headers)
    body = []
    for row in rows:
        cells = []
        for i, c in enumerate(row):
            v = str(c) if c is not None else ''
            cells.append(f'<td>{v if i in raw_cols else escape(v)}</td>')
        body.append('<tr>' + ''.join(cells) + '</tr>')
    return (f'<table><thead><tr>{head}</tr></thead>'
            f'<tbody>{"".join(body)}</tbody></table>')
