"""Documentation site (services/docs_site.py — the reference website/
analogue): guide + generated API pages render and serve."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_guide_pages_exist():
    guide = os.path.join(REPO, 'docs', 'guide')
    pages = [f for f in os.listdir(guide) if f.endswith('.md')]
    assert len(pages) >= 10
    for f in pages:
        text = open(os.path.join(guide, f)).read()
        assert text.startswith('#'), f


def test_api_reference_generated():
    api = os.path.join(REPO, 'docs', 'api')
    assert os.path.isfile(os.path.join(api, 'index.md'))
    methods = open(os.path.join(api, 'methods.md')).read()
    assert 'linear_regression_rows' in methods
    assert 'hwe_normalized_pca' in methods
    table = open(os.path.join(api, 'Table.md')).read()
    assert 'Table.annotate' in table


def test_markdown_renders():
    from hail_tpu.services.docs_site import render_markdown
    html = render_markdown('# T\n\n```python\nx = 1\n```\n\n| a | b |\n'
                           '|---|---|\n| 1 | 2 |\n')
    assert '<h1>' in html and '<code' in html and '<table>' in html


def test_docs_site_serves():
    import asyncio

    from hail_tpu.services.docs_site import build_app

    async def run():
        from aiohttp import web
        from aiohttp.test_utils import TestClient, TestServer
        app = build_app()
        async with TestClient(TestServer(app)) as client:
            r = await client.get('/')
            assert r.status == 200
            body = await r.text()
            assert 'User guide' in body
            r = await client.get('/guide/01-getting-started.md')
            assert r.status == 200
            assert 'hail_tpu' in await r.text()
            r = await client.get('/api/index.md')
            assert r.status == 200
            r = await client.get('/../secrets')
            assert r.status in (403, 404)

    try:
        asyncio.run(run())
    except OSError:
        pytest.skip('sockets unavailable')
