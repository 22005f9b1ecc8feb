"""index_bgen: .idx2 directory format, seek-reads, read-only input handling
(round-1 verdict item 10: the old flat-JSON index crashed on reference-format
.idx2 dirs and wrote beside read-only inputs)."""

import os
import shutil

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.io.bgen import _load_bgen_index

REF_BGEN = '/root/reference/hail/hail/test/resources/example.8bits.bgen'


@pytest.fixture
def bgen_copy(tmp_path):
    if not os.path.exists(REF_BGEN):
        pytest.skip('reference bgen fixture not available')
    dst = str(tmp_path / 'ex.bgen')
    shutil.copy(REF_BGEN, dst)
    return dst


def test_index_write_and_load(bgen_copy):
    hl.index_bgen(bgen_copy, reference_genome='GRCh37',
                  contig_recoding={'01': '1'})
    idx2 = bgen_copy + '.idx2'
    assert os.path.isdir(idx2)
    meta = _load_bgen_index(bgen_copy)
    assert meta is not None
    assert meta['n_variants'] == len(meta['variants'])
    # offsets strictly increasing
    offs = [v[5] for v in meta['variants']]
    assert all(b > a for a, b in zip(offs, offs[1:]))


def test_index_overwrites_foreign_idx2_dir(bgen_copy):
    # simulate a reference-format (binary) .idx2 directory
    idx2 = bgen_copy + '.idx2'
    os.makedirs(idx2)
    with open(os.path.join(idx2, 'index'), 'wb') as f:
        f.write(b'\x00' * 64)
    assert _load_bgen_index(bgen_copy) is None  # unparseable, not a crash
    hl.index_bgen(bgen_copy, contig_recoding={'01': '1'})
    assert _load_bgen_index(bgen_copy) is not None


def test_index_file_map_for_readonly_input(tmp_path):
    if not os.path.exists(REF_BGEN):
        pytest.skip('reference bgen fixture not available')
    # index a file whose directory we must not write to
    idx = str(tmp_path / 'alt.idx2')
    hl.index_bgen(REF_BGEN, index_file_map={REF_BGEN: idx},
                  contig_recoding={'01': '1'})
    assert os.path.isdir(idx)
    meta = _load_bgen_index(REF_BGEN, {REF_BGEN: idx})
    assert meta is not None and meta['n_variants'] > 0


def test_indexed_import_matches_scan(bgen_copy):
    hl.index_bgen(bgen_copy, contig_recoding={'01': '1'})
    mt_scan = hl.import_bgen(bgen_copy, entry_fields=['GT', 'GP', 'dosage'])
    mt_idx = hl.import_bgen(bgen_copy, entry_fields=['GT', 'GP', 'dosage'])
    assert mt_scan.count() == mt_idx.count()
    d1 = mt_scan.aggregate_entries(hl.agg.sum(mt_scan.dosage))
    d2 = mt_idx.aggregate_entries(hl.agg.sum(mt_idx.dosage))
    np.testing.assert_allclose(d1, d2, rtol=1e-12)


def test_indexed_variant_filter_seeks(bgen_copy):
    hl.index_bgen(bgen_copy, contig_recoding={'01': '1'})
    mt_all = hl.import_bgen(bgen_copy, entry_fields=['GT'])
    rows = mt_all.rows().take(5)
    want = [r.locus for r in rows[2:4]]
    mt_f = hl.import_bgen(bgen_copy, entry_fields=['GT'], variants=want)
    assert mt_f.count_rows() == len({str(w) for w in want})
    got = {str(r.locus) for r in mt_f.rows().collect()}
    assert got == {str(w) for w in want}
