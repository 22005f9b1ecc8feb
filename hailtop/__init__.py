"""Drop-in alias: `hailtop.*` resolves to the hail_tpu service layers
(`hailtop.batch` -> hail_tpu.batch, `hailtop.fs` -> hail_tpu.fs, ...)."""

import sys as _sys

import hail_tpu as _ht
from hail_tpu.utils.hadoop import TemporaryDirectory, TemporaryFilename  # noqa: F401
from hail_tpu.context import ANY_REGION  # noqa: F401

batch = _ht.batch if hasattr(_ht, 'batch') else __import__('hail_tpu.batch', fromlist=['x'])
import hail_tpu.batch as batch  # noqa: F811,E402
import hail_tpu.fs as fs  # noqa: E402
import hail_tpu.utils as utils  # noqa: E402

_sys.modules['hailtop.batch'] = batch
_sys.modules['hailtop.fs'] = fs
_sys.modules['hailtop.utils'] = utils
