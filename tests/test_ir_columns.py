"""Property-style round-trip tests for the columnar value plane — the
analogue of the reference's physical/encoded type round-trip suites
(`test/src/is/hail/types/{physical,encoded}`) and test_ir.py IR round trips."""

import random

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht
from hail_tpu.ir import columns as C
from hail_tpu.utils.structs import Struct


TYPES = [
    ht.tint32, ht.tint64, ht.tfloat64, ht.tbool, ht.tstr, ht.tcall,
    ht.tarray(ht.tint32), ht.tarray(ht.tfloat64), ht.tset(ht.tstr),
    ht.tdict(ht.tstr, ht.tint32),
    ht.tstruct(a=ht.tint32, b=ht.tstr),
    ht.tstruct(x=ht.tarray(ht.tint32), y=ht.tstruct(z=ht.tfloat64)),
    ht.tlocus('GRCh37'),
    ht.ttuple(ht.tint32, ht.tstr),
]


def rand_value(t, rng, depth=0):
    if rng.random() < 0.15:
        return None
    if t == ht.tint32:
        return int(rng.integers(-1000, 1000))
    if t == ht.tint64:
        return int(rng.integers(-10**12, 10**12))
    if t == ht.tfloat64:
        return float(rng.normal())
    if t == ht.tbool:
        return bool(rng.random() < 0.5)
    if t == ht.tstr:
        return ''.join(rng.choice(list('abcXYZ'), size=rng.integers(0, 6)))
    if t == ht.tcall:
        return hl.Call([int(rng.integers(0, 3)), int(rng.integers(0, 3))],
                       bool(rng.random() < 0.3))
    if isinstance(t, ht.tarray):
        return [rand_value(t.element_type, rng, depth + 1)
                for _ in range(rng.integers(0, 4))]
    if isinstance(t, ht.tset):
        vals = [rand_value(t.element_type, rng, depth + 1) for _ in range(rng.integers(0, 4))]
        return frozenset(v for v in vals if v is not None)
    if isinstance(t, ht.tdict):
        return hl.frozendict({
            (rand_value(t.key_type, rng, depth + 1) or 'k'):
                rand_value(t.value_type, rng, depth + 1)
            for _ in range(rng.integers(0, 3))})
    if isinstance(t, ht.tstruct):
        return Struct(**{k: rand_value(ft, rng, depth + 1) for k, ft in t.fields.items()})
    if isinstance(t, ht.tlocus):
        return hl.Locus('20', int(rng.integers(1, 10**6)), 'GRCh37')
    if isinstance(t, ht.ttuple):
        return tuple(rand_value(ft, rng, depth + 1) for ft in t.types)
    raise ValueError(t)


@pytest.mark.parametrize('t', TYPES, ids=[str(t) for t in TYPES])
def test_column_roundtrip(t):
    rng = np.random.default_rng(hash(str(t)) % 2**31)
    vals = [rand_value(t, rng) for _ in range(40)]
    col = C.from_pylist(t, vals)
    back = col.to_pylist()
    assert back == vals, f'{t}: roundtrip mismatch'


@pytest.mark.parametrize('t', TYPES, ids=[str(t) for t in TYPES])
def test_column_gather_compress(t):
    rng = np.random.default_rng(1234)
    vals = [rand_value(t, rng) for _ in range(30)]
    col = C.from_pylist(t, vals)
    idx = np.asarray([3, 1, 1, 29, 0])
    g = col.gather(idx)
    assert g.to_pylist() == [vals[i] for i in idx]
    keep = np.asarray([i % 3 == 0 for i in range(30)])
    cmp_ = col.compress(keep)
    assert cmp_.to_pylist() == [v for v, k in zip(vals, keep) if k]
    cc = C.concat_columns([g, cmp_])
    assert cc.to_pylist() == g.to_pylist() + cmp_.to_pylist()


@pytest.mark.parametrize('t', TYPES, ids=[str(t) for t in TYPES])
def test_native_format_roundtrip(t, tmp_path):
    rng = np.random.default_rng(777)
    vals = [rand_value(t, rng) for _ in range(25)]
    b = C.Batch({'x': C.from_pylist(t, vals)}, 25)
    from hail_tpu.io.native import read_batch, write_batch
    p = str(tmp_path / 'b.npz')
    desc = write_batch(b, p)
    b2 = read_batch(p, desc)
    assert b2.columns['x'].to_pylist() == vals
    assert str(b2.columns['x'].typ) == str(t)


def test_ir_render():
    t = hl.range_table(3)
    e = (t.idx + 1) * 2 > 4
    r = e._ir.render()
    assert 'ApplyBinaryOp' in r and 'GetField' in r
    e2 = hl.if_else(t.idx > 0, hl.struct(a=t.idx), hl.missing(ht.tstruct(a=ht.tint32)))
    assert 'If' in e2._ir.render()


def test_mt_row_scan():
    mt = hl.range_matrix_table(12, 2, 3)
    mt = mt.annotate_rows(csum=hl.scan.sum(mt.row_idx))
    assert [r.csum for r in mt.rows().collect()] == [sum(range(i)) for i in range(12)]
