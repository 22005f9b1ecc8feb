"""CI service: build.yaml-style step DAG on the single-node Batch service
(round-2 verdict missing item 7 — the CI component of L10)."""

import textwrap

import pytest

from hail_tpu.batch_service import BatchService
from hail_tpu.services.ci_service import (BuildConfigurationError, CIRunner,
                                          CIService, parse_build_yaml)

BUILD_YAML = textwrap.dedent('''
    steps:
      - kind: buildImage2
        name: base_image
        dockerFile: Dockerfile.base
        publishAs: base
      - kind: runImage
        name: check_lint
        image: base
        script: |
          echo lint-ok
        dependsOn:
          - base_image
      - kind: runImage
        name: run_tests
        image: base
        script: |
          echo tests-ok
        dependsOn:
          - base_image
      - kind: deploy
        name: deploy_batch
        dependsOn:
          - check_lint
          - run_tests
''')


@pytest.fixture(scope='module')
def svc():
    try:
        service = BatchService.start_in_thread(n_workers=4)
    except OSError:
        pytest.skip('sockets unavailable in this sandbox')
    yield service
    service.shutdown()


def test_parse_build_yaml():
    steps = parse_build_yaml(BUILD_YAML)
    assert [s['name'] for s in steps] == [
        'base_image', 'check_lint', 'run_tests', 'deploy_batch']
    assert steps[3]['dependsOn'] == ['check_lint', 'run_tests']


def test_parse_rejects_bad_configs():
    with pytest.raises(BuildConfigurationError):
        parse_build_yaml('steps:\n  - kind: runImage\n')   # no name
    with pytest.raises(BuildConfigurationError):
        parse_build_yaml(
            'steps:\n  - {kind: runImage, name: a, dependsOn: [missing]}\n')
    with pytest.raises(BuildConfigurationError):
        parse_build_yaml('steps:\n  - {kind: nope, name: a}\n')


def test_ci_runner_executes_dag(svc):
    runner = CIRunner(f'http://127.0.0.1:{svc.port}')
    status = runner.run(BUILD_YAML, timeout=60)
    assert status['complete']
    states = {s['name']: s['state'] for s in status['steps']}
    assert states == {'base_image': 'Success', 'check_lint': 'Success',
                      'run_tests': 'Success', 'deploy_batch': 'Success'}


def test_ci_failure_blocks_dependents(svc):
    bad = BUILD_YAML.replace('echo tests-ok', 'exit 1')
    runner = CIRunner(f'http://127.0.0.1:{svc.port}')
    steps = parse_build_yaml(bad)
    bid = runner.submit(steps)
    runner.client.wait(bid, timeout=60)
    states = {s['name']: s['state'] for s in runner.status(bid)['steps']}
    assert states['run_tests'] == 'Failed'
    assert states['deploy_batch'] in ('Cancelled', 'Failed')
    assert states['check_lint'] == 'Success'


def test_ci_rest_surface(svc):
    import json
    import urllib.request
    ci = CIService(f'http://127.0.0.1:{svc.port}')
    try:
        url = ci.start()
        req = urllib.request.Request(f'{url}/api/v1alpha/ci/build',
                                     data=BUILD_YAML.encode(), method='POST')
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert out['n_steps'] == 4
        bid = out['batch_id']
        runner = CIRunner(f'http://127.0.0.1:{svc.port}')
        runner.client.wait(bid, timeout=60)
        with urllib.request.urlopen(
                f'{url}/api/v1alpha/ci/builds/{bid}', timeout=30) as resp:
            st = json.loads(resp.read())
        assert st['complete'] and len(st['steps']) == 4
    finally:
        ci.stop()


def test_pr_watcher_merge_queue(svc, tmp_path):
    """PR watcher over a local git repo: merge-commit builds, approval
    gating, merge queue (reference ci/ci/github.py at single-node scale)."""
    import subprocess

    from hail_tpu.services.ci_service import PRWatcher

    repo = tmp_path / 'repo'
    repo.mkdir()

    def git(*args, env_extra=None):
        env = {'GIT_AUTHOR_NAME': 'ci', 'GIT_AUTHOR_EMAIL': 'ci@x',
               'GIT_COMMITTER_NAME': 'ci', 'GIT_COMMITTER_EMAIL': 'ci@x',
               'HOME': str(tmp_path), 'PATH': '/usr/bin:/bin:/usr/local/bin'}
        subprocess.run(['git', '-C', str(repo), *args], check=True,
                       capture_output=True, env=env)

    git('init', '-b', 'main')
    (repo / 'build.yaml').write_text(textwrap.dedent('''
        steps:
          - kind: runImage
            name: test
            script: test -f ok.txt
    '''))
    (repo / 'ok.txt').write_text('base\n')
    git('add', '-A')
    git('commit', '-m', 'base')

    # approved PR that passes the build
    git('checkout', '-b', 'pr/1-good')
    (repo / 'feature.txt').write_text('x\n')
    git('add', '-A')
    git('commit', '-m', 'feature\n\nApproved-by: dev')
    git('checkout', 'main')

    # PR that breaks the build (deletes ok.txt), also "approved"
    git('checkout', '-b', 'pr/2-bad')
    git('rm', '-q', 'ok.txt')
    git('commit', '-m', 'break it\n\nApproved-by: dev')
    git('checkout', 'main')

    # green but unapproved PR
    git('checkout', '-b', 'pr/3-unapproved')
    (repo / 'other.txt').write_text('y\n')
    git('add', '-A')
    git('commit', '-m', 'no review yet')
    git('checkout', 'main')

    runner = CIRunner(f'http://127.0.0.1:{svc.port}')
    w = PRWatcher(str(repo), runner)
    import atexit; atexit.register(w.close)
    w.poll()
    w.wait_builds(timeout=120)
    assert w.prs['pr/1-good']['state'] == 'success'
    assert w.prs['pr/1-good']['approved']
    assert w.prs['pr/2-bad']['state'] == 'failure'
    assert w.prs['pr/3-unapproved']['state'] == 'success'
    assert not w.prs['pr/3-unapproved']['approved']

    merged = w.merge_ready()
    assert merged == ['pr/1-good']
    # the merge landed on main
    out = subprocess.run(['git', '-C', str(repo), 'log', '--oneline', 'main'],
                         capture_output=True, text=True, check=True).stdout
    assert 'feature' in out
    # idempotent: nothing left to merge
    assert w.merge_ready() == []
    # unchanged heads are not rebuilt
    before = {b: r['batch_id'] for b, r in w.prs.items()}
    w.poll()
    assert {b: r['batch_id'] for b, r in w.prs.items()} == before
