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
                      _set_flags, _get_flags, _with_flags,
                      _compare, _sort_by, _values_similar,
                      _locus_windows_per_contig, _stream_range, _zip_streams,
                      _zip_join_producers)

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

# module-path remaps where our layout differs from the reference's
# (reference hail/expr/types.py → hail_tpu/types.py, etc.)
import importlib as _importlib

# importlib (not `import a.b as x`): several of these submodule names are
# shadowed by same-named functions on their parent package (methods.pca is
# both the pca() function and the module)
_types = _importlib.import_module('hail_tpu.types')
_context = _importlib.import_module('hail_tpu.context')
_ir = _importlib.import_module('hail_tpu.ir')
_tc_check = _importlib.import_module('hail_tpu.typecheck.check')
_utils_misc = _importlib.import_module('hail_tpu.utils.misc')
_placement_tree = _importlib.import_module('hail_tpu.utils.placement_tree')
_linkedlist = _importlib.import_module('hail_tpu.utils.linkedlist')
_dedup = _importlib.import_module('hail_tpu.utils.deduplicate')
_exp_time = _importlib.import_module('hail_tpu.experimental.time')
_vds_combiner = _importlib.import_module('hail_tpu.vds.combiner')
_vds_combine = _importlib.import_module('hail_tpu.vds.combiner.combine')
_methods_pca = _importlib.import_module('hail_tpu.methods.pca')
_methods_qc = _importlib.import_module('hail_tpu.methods.qc')
from hail_tpu.expr.typefuncs import ExpressionException  # noqa: F401

_sys.modules['hail.expr.types'] = _types
_sys.modules['hail.expr.expressions'] = _importlib.import_module('hail_tpu.expr.expression')
# hail.expr.expressions.typed_expressions: the reference keeps the typed
# Expression subclasses in a dedicated module; ours live in expr.expression
_sys.modules['hail.expr.expressions.typed_expressions'] = \
    _importlib.import_module('hail_tpu.expr.expression')
_expr_expressions = _sys.modules['hail.expr.expressions']
_expr_expressions.typed_expressions = _expr_expressions
_ht.expr.expressions = _expr_expressions
_sys.modules['hail.context'] = _context
_sys.modules['hail.ir'] = _ir
_sys.modules['hail.typecheck.check'] = _tc_check
_sys.modules['hail.utils.misc'] = _utils_misc
_sys.modules['hail.utils.placement_tree'] = _placement_tree
_sys.modules['hail.utils.linkedlist'] = _linkedlist
_sys.modules['hail.utils.deduplicate'] = _dedup
_sys.modules['hail.experimental.time'] = _exp_time
_sys.modules['hail.vds.combiner'] = _vds_combiner
_sys.modules['hail.vds.combiner.combine'] = _vds_combine
_sys.modules['hail.methods.pca'] = _methods_pca
_sys.modules['hail.methods.qc'] = _methods_qc
ir = _ir
current_backend = _ht.current_backend if hasattr(_ht, 'current_backend') else None


# reference tests monkeypatch/import hail.backend.spark_backend; there is no
# Spark here — expose an explanatory stub module
import types as _types_mod
_spark_stub = _types_mod.ModuleType('hail.backend.spark_backend')


class SparkBackend:  # noqa: N801 - reference name
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            'SparkBackend does not exist in hail_tpu: execution is local '
            'XLA / mesh backends (see hail_tpu/backend/)')


def _configure_spark_classpath(*a, **kw):
    raise NotImplementedError('no Spark in hail_tpu')


def _get_or_create_pyspark_session(*a, **kw):
    raise NotImplementedError('no Spark in hail_tpu')


_spark_stub.SparkBackend = SparkBackend
_spark_stub._configure_spark_classpath = _configure_spark_classpath
_spark_stub._get_or_create_pyspark_session = _get_or_create_pyspark_session
_sys.modules['hail.backend.spark_backend'] = _spark_stub
