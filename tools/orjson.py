"""stdlib-json stand-in for orjson (not in this image; used only on the
alias-test PYTHONPATH so the reference test modules import)."""
import json as _json


def dumps(obj, *, default=None, option=None) -> bytes:
    return _json.dumps(obj, default=default).encode()


def loads(data):
    if isinstance(data, (bytes, bytearray, memoryview)):
        data = bytes(data).decode()
    return _json.loads(data)


OPT_NON_STR_KEYS = 1
OPT_SORT_KEYS = 2
