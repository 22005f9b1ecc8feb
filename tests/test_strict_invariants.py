"""strict_invariants flag: columnar-plane structural validation at every
Batch construction (the analogue of the reference's region-integrity
assertions behind HailFeatureFlags)."""

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht
from hail_tpu.ir import columns as C


def test_strict_mode_passes_on_real_pipeline():
    with hl._with_flags(strict_invariants='1'):
        t = hl.utils.range_table(50, n_partitions=3)
        t = t.annotate(x=t.idx * 2)
        t = t.filter(t.x % 4 == 0)
        assert t.count() == 25
        mt = hl.balding_nichols_model(2, 20, 30)
        assert hl.variant_qc(mt).rows().count() == 30


def test_strict_mode_catches_length_mismatch():
    with hl._with_flags(strict_invariants='1'):
        good = C.PrimitiveColumn(ht.tint32, np.arange(5, dtype=np.int32))
        bad = C.PrimitiveColumn(ht.tint32, np.arange(4, dtype=np.int32))
        with pytest.raises(C.InvariantViolation, match='batch length'):
            C.Batch({'a': good, 'b': bad})


def test_strict_mode_catches_bad_mask_shape():
    with hl._with_flags(strict_invariants='1'):
        col = C.PrimitiveColumn(ht.tint32, np.arange(5, dtype=np.int32))
        # bypass constructor normalization to simulate a corrupted mask
        col.missing = np.ones(3, dtype=bool)
        with pytest.raises(C.InvariantViolation, match='missing shape'):
            C.Batch({'a': col})


def test_strict_mode_off_by_default():
    good = C.PrimitiveColumn(ht.tint32, np.arange(5, dtype=np.int32))
    bad = C.PrimitiveColumn(ht.tint32, np.arange(4, dtype=np.int32))
    C.Batch({'a': good, 'b': bad})  # no validation, no raise
