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


def test_genetics_class_method_parity():
    import re

    def methods_of(path, cls):
        src = open(path).read()
        m = re.search(rf'^class {cls}\b.*?(?=^class |\Z)', src, re.S | re.M)
        return set(re.findall(r'^    def ([a-z][a-z0-9_]*)\(', m.group(0), re.M)) if m else set()

    R = '/root/reference/hail/python/hail/'
    rg = hl.get_reference('GRCh37')
    for cls, path, mine in [
            ('Call', R + 'genetics/call.py', hl.Call([0, 1])),
            ('Locus', R + 'genetics/locus.py', hl.Locus('1', 1)),
            ('ReferenceGenome', R + 'genetics/reference_genome.py', rg),
            ('Trio', R + 'genetics/pedigree.py', hl.Trio('a')),
            ('Interval', R + 'utils/interval.py', hl.Interval(1, 2))]:
        missing = sorted(m for m in methods_of(path, cls) if not hasattr(mine, m))
        assert missing == [], (cls, missing)
    assert rg.global_positions_dict['2'] == rg.lengths['1']
    i1, i2, i3 = hl.Interval(1, 5), hl.Interval(4, 9), hl.Interval(5, 9)
    assert i1.overlaps(i2) and not i1.overlaps(i3)
