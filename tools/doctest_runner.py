"""Run the REFERENCE's documentation examples against this engine.

The reference runs `pytest --doctest-modules hail` over its own sources
(`hail/Makefile:250 doctest-query`), with a conftest that (a) seeds a large
doctest namespace from checkpointed datasets under `hail/docs/data`
(`python/hail/conftest.py:55 generate_datasets`) and (b) patches the doctest
output checker with a SKIP_OUTPUT_CHECK directive + whitespace
normalization (`conftest.py:9-26`).

We can't import the reference's modules (they need py4j/the JVM), so this
harness extracts every docstring via `ast` without importing, binds the same
namespace built with OUR engine (reading the same data files through the
hail-format compatibility reader), and executes each example with the
reference's checker semantics. Pass rates per module land in DOCTESTS.log.

Usage: python tools/doctest_runner.py [module-substring ...]
"""

from __future__ import annotations

import ast
import doctest
import io
import os
import shutil
import sys
import tempfile
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PY = '/root/reference/hail/python/hail'
DOCS = os.path.join(REF_PY, 'docs')

SKIP_OUTPUT_CHECK = doctest.register_optionflag('SKIP_OUTPUT_CHECK')


class RefChecker(doctest.OutputChecker):
    """The reference conftest's patched check_output (conftest.py:14-26),
    verbatim semantics: examples with no expected output (or a bare `None`)
    pass unconditionally — the reference's own FIXME acknowledges its docs
    don't always match outputs."""

    def check_output(self, want, got, optionflags):
        return (
            (not want)
            or (want.strip() == 'None')
            or (SKIP_OUTPUT_CHECK & optionflags)
            or super().check_output(want, got,
                                    optionflags | doctest.NORMALIZE_WHITESPACE)
        )


def iter_docstrings(path):
    """Yield (qualname, docstring, lineno) for a module without importing."""
    with open(path) as f:
        src = f.read()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return
    stack = [(tree, '')]
    while stack:
        node, prefix = stack.pop()
        name = getattr(node, 'name', None)
        qual = f'{prefix}.{name}' if name and prefix else (name or prefix)
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            ds = ast.get_docstring(node, clean=False)
            if ds:
                yield qual or '<module>', ds, node.body[0].lineno if node.body else 1
            for child in ast.iter_child_nodes(node):
                stack.append((child, qual))


def build_namespace(hl):
    """Port of the reference's generate_datasets (conftest.py:55-220):
    the same objects, read from the same checkpointed files through this
    engine's compatibility reader."""
    import numpy as np
    ns = {}
    ns['hl'] = hl
    ns['np'] = np

    ds = hl.read_matrix_table('data/example.mt')
    ns['ds'] = ds
    ns['dataset'] = ds
    ns['dataset2'] = ds.annotate_globals(global_field=5)
    ns['dataset_to_union_1'] = ds
    ns['dataset_to_union_2'] = ds

    v_metadata = ds.rows().annotate_globals(global_field=5).annotate(consequence='SYN')
    ns['v_metadata'] = v_metadata
    s_metadata = ds.cols().annotate(pop='AMR', is_case=False, sex='F')
    ns['s_metadata'] = s_metadata
    ns['cols_to_keep'] = s_metadata
    ns['cols_to_remove'] = s_metadata
    ns['rows_to_keep'] = v_metadata
    ns['rows_to_remove'] = v_metadata

    ns['small_mt'] = hl.read_matrix_table('data/small.mt')

    table1 = hl.read_table('data/kt_example1.ht')
    ns['table1'] = table1
    ns['other_table'] = table1
    ns['table2'] = hl.read_table('data/kt_example2.ht')
    ns['table4'] = hl.read_table('data/kt_example4.ht')
    ns['people_table'] = hl.read_table('data/explode_example.ht')
    ns['tdt_dataset'] = hl.read_matrix_table('data/tdt_tiny.mt')

    ds2 = hl.variant_qc(ds)
    ns['ds2'] = ds2.select_rows(AF=ds2.variant_qc.AF)

    ns['names'] = hl.literal(['Alice', 'Bob', 'Charlie'])
    ns['a1'] = hl.literal([0, 1, 2, 3, 4, 5])
    ns['a2'] = hl.literal([1, -1, 1, -1, 1, -1])
    ns['t'] = hl.literal(True)
    ns['f'] = hl.literal(False)
    ns['na'] = hl.missing(hl.tbool)
    ns['call'] = hl.call(0, 1, phased=False)
    ns['a'] = hl.literal([1, 2, 3, 4, 5])
    ns['d'] = hl.literal({'Alice': 43, 'Bob': 33, 'Charles': 44})
    ns['interval'] = hl.interval(3, 11)
    ns['locus_interval'] = hl.parse_locus_interval("1:53242-90543")
    ns['locus'] = hl.locus('1', 1034245)
    ns['x'] = hl.literal(3)
    ns['y'] = hl.literal(4.5)
    ns['s1'] = hl.literal({1, 2, 3})
    ns['s2'] = hl.literal({1, 3, 5})
    ns['s3'] = hl.literal({'Alice', 'Bob', 'Charlie'})
    ns['struct'] = hl.struct(a=5, b='Foo')
    ns['tup'] = hl.literal(("a", 1, [1, 2, 3]))
    ns['s'] = hl.literal('The quick brown fox')
    ns['interval2'] = hl.Interval(3, 6)
    ns['nd'] = hl.nd.array([[1, 2], [3, 4]])

    ns['ht'] = table1
    ns['mt'] = ds

    gnomad_data = ds.rows()
    ns['gnomad_data'] = gnomad_data.select(gnomad_data.info.AF)

    bgen = hl.import_bgen('data/example.8bits.bgen',
                          entry_fields=['GT', 'GP', 'dosage'])
    ns['variants_table'] = bgen.rows()

    ns['burden_ds'] = hl.read_matrix_table('data/example_burden.mt')
    ns['ld_score_one_pheno_sumstats'] = hl.read_table(
        'data/ld_score_regression.one_pheno.sumstats.ht')
    ns['ld_score_all_phenos_sumstats'] = hl.read_matrix_table(
        'data/ld_score_regression.all_phenos.sumstats.mt')
    return ns


def main():
    filters = [a for a in sys.argv[1:] if not a.startswith('-')]

    os.environ['COLUMNS'] = '80'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    # doctests write to output/ and read data/ relatively: run from a
    # sandbox copy of the docs dir (the reference checkout is read-only)
    sandbox = tempfile.mkdtemp(prefix='hail_tpu_doctest_')
    os.symlink(os.path.join(DOCS, 'data'), os.path.join(sandbox, 'data'))
    os.makedirs(os.path.join(sandbox, 'output'), exist_ok=True)
    os.chdir(sandbox)

    import hail_tpu as hl
    hl.init(global_seed=0)
    hl.reset_global_randomness()
    try:
        base_ns = build_namespace(hl)
    except Exception:
        traceback.print_exc()
        return 1

    parser = doctest.DocTestParser()
    # upstream sets no doctest_optionflags: default semantics,
    # whitespace-normalization comes from the checker
    runner_flags = 0

    class Recorder(doctest.DocTestRunner):
        """Counts failures that are broken UPSTREAM too: an example with no
        expected output whose statement echoes a value fails the reference's
        own doctest run identically (e.g. `>>> hl.identity_by_descent(ds)`
        with nothing after it). Those measure the docs, not this engine."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.upstream_broken = 0

        def report_failure(self, out, test, example, got):
            if example.want == '' and not got.lstrip().startswith('Traceback'):
                # statement echoes a value where the docs expect none
                self.upstream_broken += 1
            elif example.want.strip() == 'None' and got == '':
                # docs show 'None' but the display hook never echoes None
                self.upstream_broken += 1
            return super().report_failure(out, test, example, got)

    files = []
    for root, dirs, names in os.walk(REF_PY):
        dirs[:] = [d for d in dirs if d not in ('docs', '__pycache__')]
        for n in sorted(names):
            if n.endswith('.py'):
                files.append(os.path.join(root, n))

    per_module = defaultdict(lambda: [0, 0, 0])  # mod -> [attempted, failed, upstream_broken]
    failures = []
    import importlib

    def module_globals(mod_rel: str) -> dict:
        # pytest --doctest-modules exposes the module's own globals; ours
        # come from the aliased package (hail.x.y -> hail_tpu impl)
        name = 'hail.' + mod_rel[:-3].replace('/', '.')
        name = name.removesuffix('.__init__')
        candidates = [name]
        # single-function reference modules often fold into our package
        # __init__: fall back to the parent package's globals
        if '.' in name:
            candidates.append(name.rsplit('.', 1)[0])
        for cand in candidates:
            try:
                m = importlib.import_module(cand)
                return {k: v for k, v in vars(m).items()
                        if not k.startswith('__')}
            except Exception:
                continue
        return {}

    for path in sorted(files):
        mod = os.path.relpath(path, REF_PY)
        if filters and not any(f in mod for f in filters):
            continue
        mod_ns = module_globals(mod)
        for qual, ds_text, lineno in iter_docstrings(path):
            examples = parser.get_examples(ds_text)
            if not examples:
                continue
            # module globals under the conftest namespace: the fixture's
            # names win (pytest injects doctest_namespace over the module's
            # globals; our aliased modules also carry `ht`-style imports
            # that must not shadow the fixture's tables)
            globs = dict(mod_ns)
            globs.update(base_ns)
            test = parser.get_doctest(ds_text, globs,
                                      f'{mod}::{qual}', path, lineno)
            hl.reset_global_randomness()
            out = io.StringIO()
            runner = Recorder(checker=RefChecker(), optionflags=runner_flags)
            try:
                runner.run(test, out=out.write)
                res = runner.summarize(verbose=False)
                per_module[mod][0] += res.attempted
                per_module[mod][1] += res.failed
                per_module[mod][2] += runner.upstream_broken
                if res.failed:
                    failures.append((f'{mod}::{qual}', out.getvalue()))
            except KeyboardInterrupt:
                raise
            except Exception as e:
                n = len(examples)
                per_module[mod][0] += n
                per_module[mod][1] += n
                failures.append((f'{mod}::{qual}', f'harness error: {e!r}'))

    total_a = sum(v[0] for v in per_module.values())
    total_f = sum(v[1] for v in per_module.values())
    total_u = sum(v[2] for v in per_module.values())
    lines = ['# DOCTESTS — the reference\'s documentation examples run '
             'against this engine',
             '# (docstrings extracted from /root/reference sources without '
             'importing them;',
             '#  namespace = the reference conftest\'s generate_datasets, '
             'built by this engine',
             '#  from the same checkpointed data files)',
             '# upstream_broken = examples that fail the reference\'s own '
             'doctest run the same',
             '# way (no expected output but the statement echoes a value)',
             '# module | examples | failed | of which upstream_broken']
    for mod in sorted(per_module):
        a, f, u = per_module[mod]
        lines.append(f'{mod:55s} attempted={a:<5d} failed={f:<4d} '
                     f'upstream_broken={u}')
    pct = 100.0 * (total_a - total_f) / total_a if total_a else 0.0
    adj = (100.0 * (total_a - total_f + total_u) / total_a) if total_a else 0.0
    lines.append(f'TOTAL attempted={total_a} failed={total_f} '
                 f'(upstream_broken={total_u}) pass={pct:.1f}% '
                 f'pass_excl_upstream_broken={adj:.1f}%')
    report = '\n'.join(lines)
    print(report)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'DOCTESTS.log'), 'w') as f:
        f.write(report + '\n')
    if '-v' in sys.argv:
        for name, log in failures[:200]:
            print('=' * 70)
            print(name)
            print(log[:3000])
    shutil.rmtree(sandbox, ignore_errors=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
