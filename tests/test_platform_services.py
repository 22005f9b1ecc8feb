"""Platform services tier (reference auth/, gear/, monitoring/, web_common/):
identity service, token auth on the batch front end, Prometheus metrics,
HTML UI pages."""

import json
import urllib.error
import urllib.request

import pytest

from hail_tpu.batch_service import BatchService, BatchServiceClient
from hail_tpu.services import AuthService
from hail_tpu.services import auth_client, metrics


def _get(url, token=None, expect_json=True):
    headers = {}
    if token:
        headers['Authorization'] = f'Bearer {token}'
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=10) as resp:
        body = resp.read()
    return json.loads(body) if expect_json else body.decode()


@pytest.fixture(scope='module')
def auth_svc():
    svc = AuthService.start_in_thread(initial_developer='dev')
    yield svc
    svc.shutdown()


@pytest.fixture()
def dev_token(auth_svc, tmp_path, monkeypatch):
    monkeypatch.setenv('HAIL_TOKENS_FILE', str(tmp_path / 'tokens.json'))
    return auth_client.login(f'http://127.0.0.1:{auth_svc.port}', 'dev')


def test_login_and_userinfo(auth_svc, dev_token):
    url = f'http://127.0.0.1:{auth_svc.port}'
    info = auth_client.get_userinfo(url, dev_token)
    assert info['username'] == 'dev'
    assert info['is_developer'] is True


def test_userinfo_requires_token(auth_svc):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f'http://127.0.0.1:{auth_svc.port}/api/v1alpha/userinfo')
    assert e.value.code == 401


def test_user_management(auth_svc, dev_token):
    url = f'http://127.0.0.1:{auth_svc.port}'
    req = urllib.request.Request(
        f'{url}/api/v1alpha/users/alice/create', method='POST',
        data=json.dumps({'is_developer': False}).encode(),
        headers={'Authorization': f'Bearer {dev_token}',
                 'Content-Type': 'application/json'})
    urllib.request.urlopen(req, timeout=10)
    users = _get(f'{url}/api/v1alpha/users', dev_token)['users']
    assert {u['username'] for u in users} >= {'dev', 'alice'}
    # non-developer may not list users
    alice_token = auth_client._req(f'{url}/api/v1alpha/login', 'POST',
                                   {'username': 'alice'})['token']
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f'{url}/api/v1alpha/users', alice_token)
    assert e.value.code == 403


def test_copy_paste_token_exchange(auth_svc, dev_token, tmp_path, monkeypatch):
    monkeypatch.setenv('HAIL_TOKENS_FILE', str(tmp_path / 't2.json'))
    url = f'http://127.0.0.1:{auth_svc.port}'
    cp = auth_client._req(f'{url}/api/v1alpha/copy-paste-token', 'POST', {},
                          token=dev_token)['token']
    session = auth_client.copy_paste_login(url, cp)
    assert auth_client.get_userinfo(url, session)['username'] == 'dev'
    # single-use: the copy-paste token is consumed
    with pytest.raises(urllib.error.HTTPError):
        auth_client._req(f'{url}/api/v1alpha/copy-paste-login', 'POST',
                         {'token': cp})


def test_metrics_endpoint(auth_svc):
    text = _get(f'http://127.0.0.1:{auth_svc.port}/metrics', expect_json=False)
    assert '# TYPE http_request_count counter' in text
    assert 'http_request_latency_seconds_sum' in text


def test_batch_service_with_auth(auth_svc, dev_token, tmp_path):
    svc = BatchService.start_in_thread(
        n_workers=2, data_dir=str(tmp_path / 'svc'),
        auth_url=f'http://127.0.0.1:{auth_svc.port}')
    try:
        url = f'http://127.0.0.1:{svc.port}'
        # unauthenticated API calls are rejected
        unauth = BatchServiceClient(url, token='')
        with pytest.raises(urllib.error.HTTPError) as e:
            unauth.create_batch()
        assert e.value.code == 401
        # authenticated client runs a job end-to-end
        client = BatchServiceClient(url, token=dev_token)
        bid = client.create_batch()
        client.create_jobs(bid, [{'job_id': 1, 'command': 'echo hello-auth'}])
        client.close_batch(bid)
        st = client.wait(bid, timeout=60)
        assert st['n_succeeded'] == 1
        assert 'hello-auth' in client.get_job_log(bid, 1)
        # batch /metrics exposes job-state gauges
        text = _get(f'{url}/metrics', expect_json=False)
        assert 'batch_jobs_success' in text
        # HTML UI pages render (authenticated; unauthenticated UI GETs
        # now redirect to /login like the reference)
        page = _get(f'{url}/batches', token=dev_token, expect_json=False)
        assert f'/batches/{bid}' in page
        page = _get(f'{url}/batches/{bid}', token=dev_token,
                    expect_json=False)
        assert 'state-Success' in page
    finally:
        svc.shutdown()


def test_metrics_primitives():
    c = metrics.Counter('test_widget_total', 'widgets', ['kind'])
    c.labels(kind='a').inc()
    c.labels(kind='a').inc(2)
    c.labels(kind='b').inc()
    g = metrics.Gauge('test_depth', 'depth')
    g.set(5)
    g.dec()
    s = metrics.Summary('test_latency', 'lat')
    with s.time():
        pass
    text = metrics.render_metrics()
    assert 'test_widget_total{kind="a"} 3.0' in text
    assert 'test_widget_total{kind="b"} 1.0' in text
    assert 'test_depth 4.0' in text
    assert 'test_latency_count 1.0' in text


# ---------------------------------------------------------------------------
# gear middleware primitives (reference gear/gear/{csrf,session,
# time_limited_max_size_cache,database}.py)
# ---------------------------------------------------------------------------

def test_csrf_token_and_cookie_sessions():
    import asyncio
    from hail_tpu.services import gear

    t = gear.new_csrf_token()
    assert len(t) > 60 and t != gear.new_csrf_token()

    cs = gear.CookieSessions(b'secret-key')
    cookie = cs.encode({'user': 'dev', 'is_developer': True})
    assert cs.decode(cookie) == {'user': 'dev', 'is_developer': True}
    # tampering invalidates
    assert cs.decode(cookie[:-4] + 'AAAA') is None
    assert cs.decode('garbage') is None
    assert gear.CookieSessions(b'other-key').decode(cookie) is None


def test_csrf_middleware_rejects_mismatched_tokens():
    import asyncio
    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer
    from hail_tpu.services import gear

    async def run():
        app = web.Application(middlewares=[gear.csrf_middleware])

        async def post(request):
            return web.json_response({'ok': True})
        app.router.add_post('/mutate', post)
        async with TestClient(TestServer(app)) as client:
            # no cookies at all: csrf check does not apply (token auth path)
            r = await client.post('/mutate')
            assert r.status == 200
            tok = gear.new_csrf_token()
            client.session.cookie_jar.update_cookies({'_csrf': tok})
            r = await client.post('/mutate')          # cookie but no header
            assert r.status == 401
            r = await client.post('/mutate', headers={'X-CSRF-Token': 'wrong'})
            assert r.status == 401
            r = await client.post('/mutate', headers={'X-CSRF-Token': tok})
            assert r.status == 200
    asyncio.run(run())


def test_time_limited_max_size_cache():
    import asyncio
    from hail_tpu.services.gear import TimeLimitedMaxSizeCache

    async def run():
        loads = []

        async def load(k):
            loads.append(k)
            await asyncio.sleep(0.01)
            return k * 2

        c = TimeLimitedMaxSizeCache(load, lifetime_ns=50_000_000_000,
                                    num_slots=2, cache_name='t')
        # coalescing: two concurrent lookups -> one load
        a, b = await asyncio.gather(c.lookup(1), c.lookup(1))
        assert a == b == 2 and loads == [1]
        assert await c.lookup(1) == 2 and c.hits == 1
        # eviction at capacity
        await c.lookup(2)
        await c.lookup(3)
        assert c.evictions == 1 and len(c._cache) == 2
        await c.shutdown()
        with pytest.raises(ValueError):
            await c.lookup(9)
    asyncio.run(run())


def test_database_transaction_and_retry():
    import asyncio
    import sqlite3
    from hail_tpu.services.database import Database, retry_transient_db_errors

    async def run():
        db = await Database().async_init()
        await db.just_execute('CREATE TABLE t (k TEXT PRIMARY KEY, v INT)')
        async with db.transaction() as tx:
            await tx.execute_insertone('INSERT INTO t VALUES (?, ?)', ('a', 1))
            await tx.just_execute('UPDATE t SET v = v + 1 WHERE k = ?', ('a',))
        row = await db.execute_and_fetchone('SELECT v FROM t WHERE k = ?', ('a',))
        assert row['v'] == 2
        # rollback on error
        try:
            async with db.transaction() as tx:
                await tx.just_execute('UPDATE t SET v = 99 WHERE k = ?', ('a',))
                raise RuntimeError('boom')
        except RuntimeError:
            pass
        row = await db.execute_and_fetchone('SELECT v FROM t WHERE k = ?', ('a',))
        assert row['v'] == 2

        calls = []

        async def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise sqlite3.OperationalError('database is locked')
            return 'ok'
        assert await retry_transient_db_errors(flaky)() == 'ok'
        assert len(calls) == 3

        async def fatal():
            raise sqlite3.OperationalError('syntax error')
        with pytest.raises(sqlite3.OperationalError):
            await retry_transient_db_errors(fatal)()
        await db.async_close()
    asyncio.run(run())
