"""Projection pushdown into native reads: selecting a field subset must load
only those arrays (round-1 verdict item 5; reference PruneDeadFields)."""

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.io import native


@pytest.fixture
def loaded_columns(monkeypatch):
    """Record which top-level columns get materialized from npz parts."""
    seen = []
    orig = native.column_from_arrays

    def spy(name, desc, arrs):
        seen.append(name)
        return orig(name, desc, arrs)
    monkeypatch.setattr(native, 'column_from_arrays', spy)
    return seen


def _write_wide_table(tmp_path):
    t = hl.utils.range_table(100, n_partitions=4)
    t = t.annotate(**{f'f{i}': t.idx * i for i in range(20)})
    p = str(tmp_path / 'wide.ht')
    t.write(p)
    return p


def test_select_prunes_read(tmp_path, loaded_columns):
    p = _write_wide_table(tmp_path)
    t = hl.read_table(p)
    loaded_columns.clear()
    rows = t.select('f3', 'f7').collect()
    assert len(rows) == 100
    assert rows[5].f3 == 15 and rows[5].f7 == 35
    touched = {c for c in loaded_columns if not c.startswith('idx')} | \
              {c for c in loaded_columns if c == 'idx'}
    # only key (idx) + f3 + f7 columns were materialized across partitions
    assert set(loaded_columns) <= {'idx', 'f3', 'f7'}, set(loaded_columns)
    assert {'f3', 'f7'} <= set(loaded_columns)


def test_select_with_expr_prunes_to_referenced(tmp_path, loaded_columns):
    p = _write_wide_table(tmp_path)
    t = hl.read_table(p)
    loaded_columns.clear()
    rows = t.select(total=t.f1 + t.f2).collect()
    assert rows[10].total == 30
    assert set(loaded_columns) <= {'idx', 'f1', 'f2'}, set(loaded_columns)


def test_unpruned_read_loads_everything(tmp_path, loaded_columns):
    p = _write_wide_table(tmp_path)
    t = hl.read_table(p)
    loaded_columns.clear()
    t.collect()
    assert len(set(loaded_columns)) == 21  # idx + 20 fields


def test_matrix_entry_pruning_via_entry_blocks(tmp_path, loaded_columns, sample_mt):
    p = str(tmp_path / 'm2.mt')
    mt = sample_mt.annotate_entries(X=hl.float64(3.5), Y=hl.int32(7))
    mt.write(p)
    mt2 = hl.read_matrix_table(p)
    loaded_columns.clear()
    from hail_tpu.methods.statgen import _entry_expr_to_blocks
    G, M = _entry_expr_to_blocks(mt2.GT.n_alt_alleles())
    assert G.shape == (346, 100)
    ent_cols = {c for c in loaded_columns if c.startswith('e.')}
    assert ent_cols == {'e.GT'}, ent_cols


def test_pruned_result_matches_unpruned(tmp_path, sample_mt):
    p = str(tmp_path / 'm3.mt')
    hl.variant_qc(sample_mt).write(p)
    mt2 = hl.read_matrix_table(p)
    from hail_tpu.methods.statgen import _entry_expr_to_blocks
    G1, M1 = _entry_expr_to_blocks(mt2.GT.n_alt_alleles())
    G2, M2 = _entry_expr_to_blocks(sample_mt.GT.n_alt_alleles())
    np.testing.assert_array_equal(G1, G2)
    np.testing.assert_array_equal(M1, M2)


def test_interval_filter_prunes_partitions(tmp_path):
    """filter_intervals on a read table skips non-overlapping partitions
    (round-1 verdict item 5 second half; reference ExtractIntervalFilters ->
    partitioner rangeBounds pruning)."""
    rg = hl.get_reference('GRCh37')
    t = hl.utils.range_table(400, n_partitions=8)
    t = t.annotate(locus=hl.locus('20', t.idx + 1, 'GRCh37'), v=t.idx * 2)
    t = t.key_by('locus').drop('idx')
    p = str(tmp_path / 'loci.ht')
    t.write(p)

    t2 = hl.read_table(p)
    assert t2._stage.n_partitions == 8
    iv = hl.utils.Interval(hl.genetics.Locus('20', 10, 'GRCh37'),
                           hl.genetics.Locus('20', 60, 'GRCh37'))
    f = hl.filter_intervals(t2, [iv])
    # partitions hold ~50 consecutive loci; [10, 60) overlaps exactly 2
    assert f._stage.n_partitions <= 2, f._stage.n_partitions
    got = f.collect()
    assert len(got) == 50
    assert all(10 <= r.locus.position < 60 for r in got)


def test_interval_filter_prunes_matrix_partitions(tmp_path):
    mt = hl.balding_nichols_model(2, 10, 200, n_partitions=8)
    p = str(tmp_path / 'bn.mt')
    mt.write(p)
    mt2 = hl.read_matrix_table(p)
    assert mt2._stage.contexts and len(mt2._stage.contexts) == 8
    iv = hl.utils.Interval(hl.genetics.Locus('1', 1, 'GRCh37'),
                           hl.genetics.Locus('1', 26, 'GRCh37'))
    f = hl.filter_intervals(mt2, [iv])
    assert len(f._stage.contexts) <= 2, len(f._stage.contexts)
    assert f.count_rows() == 25
