import pytest

import hail_tpu as hl
from hail_tpu import types as ht


def test_primitive_str_roundtrip():
    for t in [ht.tint32, ht.tint64, ht.tfloat32, ht.tfloat64, ht.tbool, ht.tstr,
              ht.tcall]:
        assert ht.dtype(str(t)) == t


def test_container_roundtrip():
    for s in ['array<int32>', 'set<str>', 'dict<str, float64>',
              'array<array<float64>>', 'interval<int32>',
              'struct{a: int32, b: array<str>}', 'tuple(int32, str)',
              'ndarray<float64, 2>', 'locus<GRCh37>',
              'struct{x: struct{y: int64}}']:
        t = ht.dtype(s)
        assert ht.dtype(str(t)) == t


def test_unify():
    assert ht.unify_types(ht.tint32, ht.tint64) == ht.tint64
    assert ht.unify_types(ht.tint32, ht.tfloat64) == ht.tfloat64
    assert ht.unify_types(ht.tarray(ht.tint32), ht.tarray(ht.tfloat64)) == ht.tarray(ht.tfloat64)
    assert ht.unify_types(ht.tstr, ht.tint32) is None


def test_typecheck():
    ht.tint32.typecheck(5)
    with pytest.raises(TypeError):
        ht.tint32.typecheck('x')
    ht.tstruct(a=ht.tint32).typecheck(hl.Struct(a=1))


def test_struct_type_ops():
    t = ht.tstruct(a=ht.tint32, b=ht.tstr)
    assert list(t) == ['a', 'b']
    assert t['a'] == ht.tint32
    t2 = t._insert_field('c', ht.tbool)
    assert list(t2) == ['a', 'b', 'c']
    assert list(t2._drop_fields({'b'})) == ['a', 'c']
