"""Drop-in alias: `import hail as hl` resolves to hail_tpu.

Reference pipelines import `hail`; this package forwards the entire
hail_tpu namespace (and registers submodule aliases so
`import hail.expr.functions`-style imports work too).
"""

import sys as _sys

import hail_tpu as _ht
from hail_tpu import *  # noqa: F401,F403
from hail_tpu import (agg, scan, nd, vds, utils, linalg, experimental,  # noqa: F401
                      genetics, plot, ggplot, stats, fs, methods, expr,
                      __version__, __pip_version__, __revision__,
                      _linear_skat, _logistic_skat,
                      _linear_regression_rows_nd, _logistic_regression_rows_nd,
                      _blanczos_pca, _hwe_normalized_blanczos,
                      _pca_and_moments, _spectral_moments,
                      _set_flags, _get_flags, _with_flags)

# submodule aliases: import hail.<mod> -> hail_tpu.<mod>
_PREFIX_LEN = 9  # len('hail_tpu.') — builtins.len is shadowed by hl.len here
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith('hail_tpu.'):
        _sys.modules['hail.' + _name[_PREFIX_LEN:]] = _mod
_sys.modules['hail.methods'] = _ht.methods
_sys.modules['hail.expr'] = _ht.expr
_sys.modules['hail.utils'] = _ht.utils
_sys.modules['hail.genetics'] = _ht.genetics
_sys.modules['hail.linalg'] = _ht.linalg
_sys.modules['hail.nd'] = _ht.nd
_sys.modules['hail.vds'] = _ht.vds
_sys.modules['hail.experimental'] = _ht.experimental
_sys.modules['hail.plot'] = _ht.plot
_sys.modules['hail.ggplot'] = _ht.ggplot
_sys.modules['hail.typecheck'] = __import__('hail_tpu.typecheck', fromlist=['x'])
# reference test-harness imports (helpers.py:10, conftest.py:11-12)
import hail_tpu.utils.java as _java
import hail_tpu.backend as _backend_pkg
import hail_tpu.backend.service_backend as _service_backend
import hail_tpu.backend.backend as _backend_mod
_sys.modules['hail.utils.java'] = _java
_sys.modules['hail.backend'] = _backend_pkg
_sys.modules['hail.backend.backend'] = _backend_mod
_sys.modules['hail.backend.service_backend'] = _service_backend
