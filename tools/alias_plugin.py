"""pytest plugin for alias runs (tools/alias_tests.sh): the reference marks
known-local-backend-failures as STRICT xfail (helpers.py fails_local_backend);
when this framework passes such a test, that's a capability win, not an
error — downgrade every xfail marker to non-strict so XPASS reports as xpassed."""


def pytest_collection_modifyitems(items):
    for item in items:
        for mark in item.iter_markers('xfail'):
            mark.kwargs['strict'] = False
