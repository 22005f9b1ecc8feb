"""Documentation site: render docs/ (user guide + generated API reference)
as HTML — the scoped analogue of the reference's `website/` service
(`/root/reference/website/website/website.py` serves the Sphinx-built docs
behind aiohttp; here the markdown renders on demand through the shared
web_common page chrome)."""

from __future__ import annotations

import os
from typing import Optional

DOCS_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'docs')

_NAV = """
<nav style="margin-bottom:1em">
  <a href="/">home</a> ·
  <a href="/guide/01-getting-started.md">user guide</a> ·
  <a href="/api/index.md">api reference</a>
</nav>
"""


def render_markdown(text: str) -> str:
    import markdown
    return markdown.markdown(
        text, extensions=['tables', 'fenced_code'])


def _page(title: str, body: str) -> str:
    from .web_common import render_page
    return render_page(title, _NAV + body)


def _index_html(root: str) -> str:
    parts = ['<h1>hail_tpu documentation</h1>', '<h2>User guide</h2><ul>']
    gdir = os.path.join(root, 'guide')
    if os.path.isdir(gdir):
        for f in sorted(os.listdir(gdir)):
            if f.endswith('.md'):
                title = f[:-3].split('-', 1)[-1].replace('-', ' ')
                parts.append(f'<li><a href="/guide/{f}">{title}</a></li>')
    parts.append('</ul><h2>API reference</h2>'
                 '<ul><li><a href="/api/index.md">index</a></li></ul>')
    return '\n'.join(parts)


def build_app(root: Optional[str] = None):
    """aiohttp app serving the docs tree."""
    from aiohttp import web
    root = root or DOCS_ROOT

    async def index(request):
        return web.Response(text=_page('hail_tpu docs', _index_html(root)),
                            content_type='text/html')

    async def page(request):
        rel = request.match_info['path']
        path = os.path.normpath(os.path.join(root, rel))
        if not path.startswith(root) or not os.path.isfile(path):
            raise web.HTTPNotFound()
        with open(path) as f:
            text = f.read()
        if path.endswith('.md'):
            return web.Response(text=_page(rel, render_markdown(text)),
                                content_type='text/html')
        return web.Response(text=text)

    app = web.Application()
    app.router.add_get('/', index)
    app.router.add_get('/{path:.+}', page)
    return app


def serve(port: int = 8080, root: Optional[str] = None) -> None:
    from aiohttp import web
    print(f'serving docs at http://127.0.0.1:{port}/')
    web.run_app(build_app(root), host='127.0.0.1', port=port,
                print=lambda *_: None)
