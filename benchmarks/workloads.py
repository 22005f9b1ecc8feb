"""Benchmark workloads mirroring the reference's pytest benchmark suite
(`hail/python/benchmark/hail/benchmark_{table,matrix_table,shuffle,linalg,
methods,combiner}.py`), scaled to this rig (single host + one chip; the
reference sizes target Spark clusters). Workload NAMES track the reference's
so per-op regressions are comparable round over round."""

from __future__ import annotations

import os
import tempfile

import numpy as np

from .harness import benchmark

_rng = np.random.default_rng(0)


def _hl():
    import hail_tpu as hl
    return hl


# ---------------------------------------------------------------------------
# table (reference benchmark_table.py)
# ---------------------------------------------------------------------------

@benchmark('table')
def table_key_by_shuffle():
    hl = _hl()
    n = 100_000
    ht = hl.utils.range_table(n, 8)
    ht = ht.key_by(x=n - ht.idx)
    ht._force_count()


@benchmark('table')
def table_group_by_aggregate_sorted():
    hl = _hl()
    n = 500_000
    ht = hl.utils.range_table(n, 8)
    ht = ht.group_by(x=ht.idx // 1000).aggregate(y=hl.agg.count())
    ht._force_count()


@benchmark('table')
def table_group_by_aggregate_unsorted():
    hl = _hl()
    n = 500_000
    ht = hl.utils.range_table(n, 8)
    ht = ht.group_by(x=(n - ht.idx) // 1000).aggregate(y=hl.agg.count())
    ht._force_count()


@benchmark('table')
def table_range_force_count():
    _hl().utils.range_table(5_000_000, 8)._force_count()


@benchmark('table')
def table_range_join():
    hl = _hl()
    ht1 = hl.utils.range_table(500_000, 8)
    ht2 = hl.utils.range_table(500_000, 8)
    ht1.join(ht2, 'inner').count()


@benchmark('table')
def table_foreign_key_join():
    hl = _hl()
    m, n = 200_000, 1_000
    ht = hl.utils.range_table(m, 8)
    ht2 = hl.utils.range_table(n)
    ht.annotate(x=ht2[(m - 1 - ht.idx) % n])._force_count()


@benchmark('table')
def table_python_construction():
    hl = _hl()
    ht = hl.utils.range_table(100)
    for i in range(100):
        ht = ht.annotate(**{f'x_{i}': 0})


@benchmark('table')
def table_big_aggregate_compile_and_execute():
    hl = _hl()
    ht = hl.utils.range_table(200_000, 8)
    expr = tuple(hl.agg.fraction(ht.idx % i == 0) for i in range(1, 100))
    ht.aggregate(expr)


@benchmark('table')
def table_aggregate_array_sum():
    hl = _hl()
    ht = hl.utils.range_table(500_000, 8)
    ht.aggregate(hl.agg.array_sum(hl.range(0, 100)))


@benchmark('table')
def table_annotate_scan_prefix():
    hl = _hl()
    ht = hl.utils.range_table(500_000, 8)
    ht.annotate(c=hl.scan.count())._force_count()


@benchmark('table')
def table_explode():
    hl = _hl()
    ht = hl.utils.range_table(100_000, 8)
    ht = ht.annotate(a=hl.range(0, 5)).explode('a')
    ht._force_count()


@benchmark('table')
def table_filter_collect():
    hl = _hl()
    ht = hl.utils.range_table(500_000, 8)
    ht.filter(ht.idx % 100 == 0).collect()


@benchmark('table')
def table_write_read_roundtrip():
    hl = _hl()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 't.ht')
        hl.utils.range_table(200_000, 8).annotate(sq=1).write(p)
        hl.read_table(p)._force_count()


@benchmark('table')
def table_order_by():
    hl = _hl()
    n = 100_000
    ht = hl.utils.range_table(n, 8)
    ht.order_by(hl.desc(ht.idx))._force_count()


@benchmark('table')
def table_take_head():
    hl = _hl()
    ht = hl.utils.range_table(1_000_000, 8)
    ht.annotate(x=ht.idx * 2).take(100)


# ---------------------------------------------------------------------------
# shuffle (reference benchmark_shuffle.py)
# ---------------------------------------------------------------------------

@benchmark('shuffle')
def shuffle_key_by_random():
    hl = _hl()
    n = 100_000
    ht = hl.utils.range_table(n, 8)
    ht = ht.key_by(x=hl.rand_unif(0, 1))
    ht._force_count()


@benchmark('shuffle')
def shuffle_key_by_aggregate_bad_locality():
    hl = _hl()
    n = 200_000
    ht = hl.utils.range_table(n, 8)
    ht = ht.key_by(x=(n - ht.idx) % 997)
    ht = ht.group_by(ht.x).aggregate(n=hl.agg.count())
    ht._force_count()


# ---------------------------------------------------------------------------
# matrix table (reference benchmark_matrix_table.py)
# ---------------------------------------------------------------------------

def _mt(rows=2_000, cols=200):
    hl = _hl()
    mt = hl.utils.range_matrix_table(rows, cols, n_partitions=4)
    return mt.annotate_entries(x=(mt.row_idx * 31 + mt.col_idx * 7) % 5)


@benchmark('matrix_table')
def matrix_table_force_count():
    _hl().utils.range_matrix_table(100_000, 100, 8)._force_count_rows()


@benchmark('matrix_table')
def matrix_table_entries_sum():
    hl = _hl()
    mt = _mt()
    mt.aggregate_entries(hl.agg.sum(mt.x))


@benchmark('matrix_table')
def matrix_table_annotate_entries_arith():
    mt = _mt()
    mt = mt.annotate_entries(y=mt.x * 2 + 1)
    mt.entries()._force_count()


@benchmark('matrix_table')
def matrix_table_rows_agg_stats():
    hl = _hl()
    mt = _mt()
    mt.annotate_rows(st=hl.agg.stats(mt.x)).rows()._force_count()


@benchmark('matrix_table')
def matrix_table_cols_agg_stats():
    hl = _hl()
    mt = _mt()
    mt.annotate_cols(st=hl.agg.stats(mt.x)).cols()._force_count()


@benchmark('matrix_table')
def matrix_table_group_rows_by_agg():
    hl = _hl()
    mt = _mt()
    mt.group_rows_by(k=mt.row_idx % 50).aggregate(
        s=hl.agg.sum(mt.x)).entries()._force_count()


@benchmark('matrix_table')
def matrix_table_filter_entries():
    mt = _mt()
    mt.filter_entries(mt.x > 1).entries()._force_count()


@benchmark('matrix_table')
def matrix_table_write_read():
    hl = _hl()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'm.mt')
        _mt().write(p)
        hl.read_matrix_table(p)._force_count_rows()


@benchmark('matrix_table')
def matrix_table_localize_entries():
    mt = _mt()
    mt.localize_entries('ent', 'cols')._force_count()


@benchmark('matrix_table')
def matrix_table_many_aggs_per_row():
    hl = _hl()
    mt = _mt()
    mt.annotate_rows(
        s=hl.agg.sum(mt.x), m=hl.agg.mean(mt.x), mx=hl.agg.max(mt.x),
        mn=hl.agg.min(mt.x), c=hl.agg.count_where(mt.x > 2),
        f=hl.agg.fraction(mt.x == 0)).rows()._force_count()


# ---------------------------------------------------------------------------
# linalg (reference benchmark_linalg.py)
# ---------------------------------------------------------------------------

@benchmark('linalg')
def linalg_blockmatrix_multiply():
    hl = _hl()
    a = _rng.normal(size=(1024, 1024))
    bm = hl.linalg.BlockMatrix.from_numpy(a, block_size=256)
    (bm @ bm.T).to_numpy()


@benchmark('linalg')
def linalg_blockmatrix_from_entry_expr():
    hl = _hl()
    mt = _mt(1_000, 200)
    hl.linalg.BlockMatrix.from_entry_expr(hl.float64(mt.x)).to_numpy()


@benchmark('linalg')
def linalg_blockmatrix_elementwise():
    hl = _hl()
    a = _rng.normal(size=(1024, 1024))
    bm = hl.linalg.BlockMatrix.from_numpy(a, block_size=256)
    ((bm + bm) * 2 - bm).to_numpy()


@benchmark('linalg')
def linalg_ndarray_qr():
    hl = _hl()
    a = _rng.normal(size=(512, 256))
    hl.eval(hl.nd.qr(hl.nd.array(a))[0].shape)


@benchmark('linalg')
def linalg_blanczos_pca():
    hl = _hl()
    mt = _mt(1_000, 100)
    hl._blanczos_pca(hl.float64(mt.x), k=5, q_iterations=3)


# ---------------------------------------------------------------------------
# methods (reference benchmark_methods.py)
# ---------------------------------------------------------------------------

def _gt_mt(rows=1_000, cols=200):
    hl = _hl()
    mt = hl.utils.range_matrix_table(rows, cols, n_partitions=4)
    mt = mt.key_rows_by(locus=hl.locus('1', mt.row_idx + 1),
                        alleles=hl.literal(['A', 'T']))
    mt = mt.annotate_entries(
        GT=hl.unphased_diploid_gt_index_call((mt.row_idx * 17 + mt.col_idx * 3) % 3))
    return mt


@benchmark('methods')
def methods_linear_regression_rows():
    hl = _hl()
    mt = _gt_mt()
    mt = mt.annotate_cols(ph=hl.rand_norm(seed=1))
    hl.linear_regression_rows(y=mt.ph, x=mt.GT.n_alt_alleles(),
                              covariates=[1.0])._force_count()


@benchmark('methods')
def methods_logistic_regression_rows():
    hl = _hl()
    mt = _gt_mt(200, 100)
    mt = mt.annotate_cols(ph=hl.rand_bool(0.5, seed=2))
    hl.logistic_regression_rows(
        test='wald', y=hl.float64(mt.ph), x=mt.GT.n_alt_alleles(),
        covariates=[1.0])._force_count()


@benchmark('methods')
def methods_variant_qc():
    hl = _hl()
    mt = _gt_mt()
    hl.variant_qc(mt).rows()._force_count()


@benchmark('methods')
def methods_sample_qc():
    hl = _hl()
    mt = _gt_mt()
    hl.sample_qc(mt).cols()._force_count()


@benchmark('methods')
def methods_split_multi_hts():
    hl = _hl()
    mt = _hl().utils.range_matrix_table(500, 50, n_partitions=2)
    mt = mt.key_rows_by(locus=hl.locus('1', mt.row_idx + 1),
                        alleles=hl.literal(['A', 'T', 'C']))
    mt = mt.annotate_entries(
        GT=hl.unphased_diploid_gt_index_call((mt.row_idx + mt.col_idx) % 3))
    hl.split_multi_hts(mt)._force_count_rows()


@benchmark('methods')
def methods_hwe_normalized_pca():
    hl = _hl()
    mt = _gt_mt(500, 100)
    hl.hwe_normalized_pca(mt.GT, k=5)


@benchmark('methods')
def methods_genetic_relatedness_matrix():
    hl = _hl()
    mt = _gt_mt(500, 100)
    hl.genetic_relatedness_matrix(mt.GT).to_numpy()


@benchmark('methods')
def methods_ld_prune():
    hl = _hl()
    mt = _gt_mt(300, 100)
    hl.ld_prune(mt.GT, r2=0.2, bp_window_size=10000)._force_count()


# ---------------------------------------------------------------------------
# combiner / import-export (reference benchmark_combiner.py + impex)
# ---------------------------------------------------------------------------

@benchmark('impex')
def impex_export_import_vcf_roundtrip():
    hl = _hl()
    mt = _gt_mt(1_000, 50)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'x.vcf.bgz')
        hl.export_vcf(mt, p)
        hl.import_vcf(p)._force_count_rows()


@benchmark('impex')
def impex_import_export_plink():
    hl = _hl()
    mt = _gt_mt(500, 50)
    mt = mt.annotate_cols(s=hl.str(mt.col_idx)).key_cols_by('s')
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'pl')
        hl.export_plink(mt, p)
        hl.import_plink(p + '.bed', p + '.bim', p + '.fam')._force_count_rows()


@benchmark('combiner')
def combiner_vds_sparse_union():
    hl = _hl()
    mt = _gt_mt(500, 20)
    mt = mt.annotate_entries(END=hl.missing('int32'),
                             GQ=(mt.row_idx + mt.col_idx) % 99,
                             DP=10)
    mt2 = mt.key_cols_by(col_idx=mt.col_idx + 20)
    mt.union_cols(mt2)._force_count_rows()
