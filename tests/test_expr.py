import math

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import types as ht


def ev(e):
    return hl.eval(e)


def test_arith():
    assert ev(hl.literal(2) + 3) == 5
    assert ev(hl.literal(7) // 2) == 3
    assert ev(hl.literal(7) % 3) == 1
    assert ev(hl.literal(7) / 2) == 3.5
    assert abs(ev(hl.literal(2.0) ** 10) - 1024.0) < 1e-12
    assert ev(-hl.literal(5)) == -5


def test_comparison():
    assert ev(hl.literal(3) < 4) is True
    assert ev(hl.literal(3) >= 4) is False
    assert ev(hl.literal('a') == 'a') is True
    assert ev(hl.literal('a') < 'b') is True


def test_missingness():
    assert ev(hl.missing(ht.tint32)) is None
    assert ev(hl.missing(ht.tint32) + 1) is None
    assert ev(hl.is_missing(hl.missing(ht.tint32))) is True
    assert ev(hl.is_defined(hl.missing(ht.tint32))) is False
    assert ev(hl.coalesce(hl.missing(ht.tint32), 5)) == 5
    assert ev(hl.or_else(hl.missing(ht.tfloat64), 1.5)) == 1.5
    assert ev(hl.or_missing(False, 5)) is None
    assert ev(hl.or_missing(True, 5)) == 5


def test_kleene_logic():
    na = hl.missing(ht.tbool)
    assert ev(hl.literal(False) & na) is False
    assert ev(hl.literal(True) & na) is None
    assert ev(hl.literal(True) | na) is True
    assert ev(hl.literal(False) | na) is None
    assert ev(na & na) is None
    assert ev(~hl.literal(True)) is False


def test_if_else_case_switch():
    assert ev(hl.if_else(True, 1, 2)) == 1
    assert ev(hl.if_else(hl.missing(ht.tbool), 1, 2)) is None
    assert ev(hl.if_else(hl.missing(ht.tbool), 1, 2, missing_false=True)) == 2
    c = hl.case().when(hl.literal(1) > 2, 'a').when(hl.literal(2) > 1, 'b').default('c')
    assert ev(c) == 'b'
    s = hl.switch(hl.literal('x')).when('x', 1).when('y', 2).default(0)
    assert ev(s) == 1


def test_strings():
    s = hl.literal('Hello, World')
    assert ev(s.length()) == 12
    assert ev(s.lower()) == 'hello, world'
    assert ev(s.upper()) == 'HELLO, WORLD'
    assert ev(s.contains('World')) is True
    assert ev(s.startswith('Hello')) is True
    assert ev(s.endswith('ld')) is True
    assert ev(s.split(', ')) == ['Hello', 'World']
    assert ev(s.replace('World', 'there')) == 'Hello, there'
    assert ev(s[0:5]) == 'Hello'
    assert ev(s.matches('W.rld')) is True
    assert ev(hl.literal('a,b,c').split(',')) == ['a', 'b', 'c']
    assert ev(hl.literal('abc') + 'def') == 'abcdef'


def test_arrays():
    a = hl.literal([1, 2, 3, 4])
    assert ev(a[0]) == 1
    assert ev(a[-1]) == 4
    assert ev(a[10]) is None
    assert ev(a.length()) == 4
    assert ev(a.map(lambda x: x * 2)) == [2, 4, 6, 8]
    assert ev(a.filter(lambda x: x % 2 == 0)) == [2, 4]
    assert ev(hl.sum(a)) == 10
    assert ev(hl.max(a)) == 4
    assert ev(hl.min(a)) == 1
    assert ev(hl.mean(a)) == 2.5
    assert ev(hl.sorted(hl.literal([3, 1, 2]))) == [1, 2, 3]
    assert ev(hl.reversed(a)) == [4, 3, 2, 1]
    assert ev(a[1:3]) == [2, 3]
    assert ev(hl.flatten(hl.literal([[1], [2, 3]]))) == [1, 2, 3]
    assert ev(hl.zip(hl.literal([1, 2]), hl.literal(['a', 'b']))) == [(1, 'a'), (2, 'b')]
    assert ev(a.fold(lambda acc, x: acc + x, 0)) == 10
    assert ev(a.contains(3)) is True
    assert ev(hl.range(5)) == [0, 1, 2, 3, 4]
    assert ev(hl.argmax(hl.literal([1.0, 5.0, 2.0]))) == 1


def test_sets_dicts():
    s = hl.literal({1, 2, 3})
    assert ev(s.contains(2)) is True
    assert ev(s.contains(9)) is False
    assert sorted(ev(hl.array(s))) == [1, 2, 3]
    assert ev(s.union(hl.literal({4}))) == frozenset({1, 2, 3, 4})
    d = hl.literal({'a': 1, 'b': 2})
    assert ev(d.get('a')) == 1
    assert ev(d.get('z')) is None
    assert ev(d.contains('b')) is True
    assert sorted(ev(d.keys())) == ['a', 'b']
    assert ev(d.size()) == 2


def test_structs_tuples():
    s = hl.struct(a=1, b='x')
    assert ev(s.a) == 1
    assert ev(s.annotate(c=True)) == hl.Struct(a=1, b='x', c=True)
    assert ev(s.select('a')) == hl.Struct(a=1)
    assert ev(s.drop('a')) == hl.Struct(b='x')
    t = hl.tuple([1, 'two'])
    assert ev(t[1]) == 'two'


def test_math_functions():
    assert abs(ev(hl.exp(1.0)) - math.e) < 1e-12
    assert abs(ev(hl.log(math.e)) - 1) < 1e-12
    assert abs(ev(hl.log10(100.0)) - 2) < 1e-12
    assert ev(hl.sqrt(9.0)) == 3.0
    assert ev(hl.abs(-4)) == 4
    assert ev(hl.sign(-3.0)) == -1.0
    assert ev(hl.floor(2.7)) == 2.0
    assert ev(hl.ceil(2.1)) == 3.0
    assert ev(hl.is_nan(float('nan'))) is True
    assert ev(hl.min(4, 2, 7)) == 2
    assert ev(hl.max(4, 2, 7)) == 7
    assert abs(ev(hl.expit(0.0)) - 0.5) < 1e-12


def test_stats_functions():
    assert abs(ev(hl.pnorm(0.0)) - 0.5) < 1e-12
    assert abs(ev(hl.qnorm(0.975)) - 1.959964) < 1e-5
    assert abs(ev(hl.pchisqtail(3.84, 1)) - 0.05) < 1e-3
    assert abs(ev(hl.dpois(2, 3.0)) - (9 / 2) * math.exp(-3)) < 1e-12
    fr = ev(hl.fisher_exact_test(10, 10, 10, 10))
    assert abs(fr.p_value - 1.0) < 1e-9
    hw = ev(hl.hardy_weinberg_test(25, 50, 25))
    assert 0 <= hw.p_value <= 1
    bt = ev(hl.binom_test(5, 10, 0.5))
    assert abs(bt - 1.0) < 1e-9


def test_conversions():
    assert ev(hl.int32('42')) == 42
    assert ev(hl.float64('1.5')) == 1.5
    assert ev(hl.str(17)) == '17'
    assert ev(hl.bool('true')) is True
    assert ev(hl.parse_int32('not a number')) is None
    assert ev(hl.parse_float64('2.5')) == 2.5


def test_genetics_functions():
    c = ev(hl.call(0, 1))
    assert c.alleles == [0, 1]
    assert ev(hl.call(0, 1).is_het()) is True
    assert ev(hl.call(1, 1).n_alt_alleles()) == 2
    assert ev(hl.call(0, 0).is_hom_ref()) is True
    assert ev(hl.parse_call('0|1')).phased is True
    assert ev(hl.unphased_diploid_gt_index_call(2)) == hl.Call([1, 1])
    l = ev(hl.locus('20', 1234))
    assert l.contig == '20' and l.position == 1234
    assert ev(hl.parse_locus('20:1234')) == hl.Locus('20', 1234)
    v = ev(hl.parse_variant('20:1234:A:T'))
    assert v.alleles == ['A', 'T']
    assert ev(hl.is_snp('A', 'T')) is True
    assert ev(hl.is_indel('A', 'AT')) is True
    assert ev(hl.is_transition('A', 'G')) is True
    assert ev(hl.is_transversion('A', 'C')) is True
    mr = ev(hl.min_rep(hl.locus('1', 10000), hl.literal(['TAA', 'TA'])))
    assert mr.alleles == ['TA', 'T']
    assert abs(ev(hl.pl_dosage(hl.literal([0, 20, 100]))) - 0.009901) < 1e-4
    assert ev(hl.gp_dosage(hl.literal([0.0, 0.0, 1.0]))) == 2.0


def test_locus_methods():
    l = hl.locus('X', 2699510)
    assert ev(l.in_x_par()) is True
    l2 = hl.locus('X', 3000000)
    assert ev(l2.in_x_nonpar()) is True
    assert ev(hl.locus('1', 5).in_autosome()) is True
    gp = ev(hl.locus('1', 1).global_position())
    assert gp == 0
    assert ev(hl.locus_from_global_position(0)) == hl.Locus('1', 1)


def test_intervals():
    iv = hl.interval(1, 10)
    assert ev(iv.contains(5)) is True
    assert ev(iv.contains(10)) is False
    assert ev(iv.start) == 1
    liv = ev(hl.parse_locus_interval('1:100-200'))
    assert liv.start.position == 100
    assert liv.end.position == 200


def test_json_format():
    assert ev(hl.json(hl.struct(a=1))) == '{"a":1}'  # reference compact form
    assert ev(hl.delimit(hl.literal([1, 2, 3]), ',')) == '1,2,3'


def test_rand_deterministic():
    t = hl.range_table(100, 4)
    x1 = t.annotate(r=hl.rand_unif(0, 1, seed=42)).collect()
    # same seed and rows, different partitioning → same values
    t2 = hl.range_table(100, 4)
    x2 = t2.annotate(r=hl.rand_unif(0, 1, seed=42)).collect()
    for a, b in zip(x1, x2):
        assert 0 <= a.r < 1
    vals = [r.r for r in x1]
    assert len(set(vals)) > 90  # near-unique


def test_rand_seed_deterministic():
    t1 = hl.range_table(50, 4).annotate(r=hl.rand_unif(0, 1, seed=42)).collect()
    t2 = hl.range_table(50, 4).annotate(r=hl.rand_unif(0, 1, seed=42)).collect()
    assert all(a.r == b.r for a, b in zip(t1, t2))
    t3 = hl.range_table(50, 4).annotate(r=hl.rand_unif(0, 1, seed=43)).collect()
    assert any(a.r != b.r for a, b in zip(t1, t3))


def test_folds_scans_and_new_builtins():
    ev = hl.eval
    assert ev(hl.fold(lambda a, x: a + x, 0, [1, 2, 3])) == 6
    assert ev(hl.array_scan(lambda a, x: a + x, 0, [1, 2, 3])) == [0, 1, 3, 6]
    assert ev(hl.cumulative_sum([1, 2, 3, 4])) == [1, 3, 6, 10]
    assert ev(hl.gq_from_pl([0, 69, 1035])) == 69
    assert ev(hl.numeric_allele_type('A', 'T')) == 1
    assert ev(hl.numeric_allele_type('A', 'AT')) == 3
    assert ev(hl.parse_float32('bad')) is None
    pj = ev(hl.parse_json('{"a": 1, "b": [1.5]}', 'struct{a: int32, b: array<float64>}'))
    assert pj.a == 1 and pj.b == [1.5]
    assert ev(hl.repeat('x', 3)) == ['x', 'x', 'x']
    assert ev(hl.zeros(2)) == [0, 0]


def test_stat_distribution_builtins():
    import scipy.stats as st
    ev = hl.eval
    assert abs(ev(hl.dchisq(1.0, 2.0)) - st.chi2.pdf(1, 2)) < 1e-12
    assert abs(ev(hl.pgamma(2.0, 3.0, 1.5)) - st.gamma.cdf(2, 3, scale=1.5)) < 1e-12
    assert abs(ev(hl.qgamma(0.7, 3.0, 1.5)) - st.gamma.ppf(0.7, 3, scale=1.5)) < 1e-10
    # reference phyper is the probability MASS at x (stats/package.scala:469)
    assert abs(ev(hl.phyper(2, 10, 4, 6)) - 0.42857142857142855) < 1e-10
    # reference functions.py doctest values
    cmh = ev(hl.cochran_mantel_haenszel_test(
        [56, 61, 73, 71], [69, 257, 65, 48], [40, 57, 71, 55], [77, 301, 79, 48]))
    assert abs(cmh.test_statistic - 5.0496881823306765) < 1e-10
    assert abs(cmh.p_value - 0.024630370456863417) < 1e-10
    assert len(ev(hl.rand_norm2d(seed=1))) == 2
    mh = ev(hl.rand_multi_hyper([10, 20, 30], 12, seed=3))
    assert sum(mh) == 12


def test_reference_doctest_semantics():
    # behaviors pinned by the reference's own docstring examples
    ev = hl.eval
    assert ev(hl.json([1, 2, 3, 4, 5])) == '[1,2,3,4,5]'
    assert abs(ev(hl.pchisqtail(5, 1, ncp=2)) - 0.20571085634347097) < 1e-10
    assert abs(ev(hl.qchisqtail(0.05, 2, ncp=2)) - 10.838131614372958) < 1e-8
    assert abs(ev(hl.qchisqtail(hl.log(0.05), 2, log_p=True)) - 5.991464547107979) < 1e-8
    assert abs(ev(hl.pT(1, 10)) - 0.82955343384897) < 1e-10
    assert abs(ev(hl.pT(1, 10, lower_tail=False)) - 0.17044656615103004) < 1e-10
    assert abs(ev(hl.pF(1, 3, 10)) - 0.5676627969783028) < 1e-10
    assert ev(hl.argmin([0.4, 0.2, 0.2], unique=True)) is None
    assert ev(hl.argmax([0.4, 0.4, 0.2], unique=True)) is None
    assert ev(hl.bit_rshift(-1, 1, logical=True)) == 2147483647
    assert ev(hl.format('%.4f', hl.missing(hl.tfloat64))) == 'null'
    assert ev(hl.format('%s %s %s', 'hello',
                        hl.tuple([3, hl.locus('1', 2453)]), True)) == \
        'hello (3, 1:2453) true'


def test_collection_expression_surface():
    # reference typed_expressions doctest behaviors
    ev = hl.eval
    assert ev(hl.literal([1, 2, 3]).any(lambda x: x % 2 == 0)) is True
    assert ev(hl.literal([1, 5, 6]).find(lambda x: x ** 2 > 20)) == 5
    assert ev(hl.literal([1, 2]).flatmap(lambda x: hl.range(0, x))) == [0, 0, 1]
    assert ev(hl.literal(['a', 'b']).head()) == 'a'
    assert ev(hl.empty_array(hl.tint32).head()) is None
    assert ev(hl.literal(['Alice', 'Beth']).index(lambda x: x.endswith('e'))) == 0
    assert ev(hl.literal(['Alice']).index(lambda x: x.startswith('Z'))) is None
    assert ev(hl.literal([1, 2, 3, 4, 5]).grouped(2)) == [[1, 2], [3, 4], [5]]
    g = ev(hl.literal([1, 2, 3]).group_by(lambda x: x % 2))
    assert dict(g) == {0: [2], 1: [1, 3]}
    assert ev(hl.array([(1, 2), (2, 3)]).starmap(lambda x, y: x + y)) == [3, 5]
    # ArrayNumericExpression arithmetic
    assert ev(-hl.literal([0, 1, 2])) == [0, -1, -2]
    assert ev(hl.literal([0, 1, 2]) + 5) == [5, 6, 7]
    assert ev(1 - hl.literal([0, 1, 2])) == [1, 0, -1]
    assert ev(hl.literal([0, 1, 2]) + hl.literal([1, -1, 1])) == [1, 0, 3]
    assert ev(hl.literal([0, 1, 2]) ** 2) == [0.0, 1.0, 4.0]
    assert ev(hl.literal([1, 2, 3]) // 2) == [0, 1, 1]
    # SetExpression operators
    s1, s2 = hl.literal({1, 2, 3}), hl.literal({1, 3, 5})
    assert set(ev(s1 - s2)) == {2}
    assert set(ev(s1 & s2)) == {1, 3}
    assert set(ev(s1 | s2)) == {1, 2, 3, 5}
    assert set(ev(s1 ^ s2)) == {2, 5}
    # array<struct> field broadcast
    arr = hl.literal([{'a': 'foo', 'b': 1}, {'a': 'bar', 'b': 2}],
                     hl.tarray(hl.tstruct(a=hl.tstr, b=hl.tint32)))
    assert ev(arr.a) == ['foo', 'bar']


def test_string_split_limit_and_index_missing():
    # Java-style split limit (n = max parts) and missing index-of
    assert hl.eval(hl.literal('The quick brown fox').split(r'\s+', 2)) == \
        ['The', 'quick brown fox']
    assert hl.eval(hl.literal(['Alice', 'Beth']).index('Zed')) is None
    assert hl.eval(hl.literal(['Alice', 'Beth']).index('Beth')) == 1


def test_expression_class_method_parity():
    ev = hl.eval
    # CallExpression
    assert str(ev(hl.call(1, 0, phased=True).unphase())) == '0/1'
    assert ev(hl.call(0, 1).contains_allele(1)) is True
    # LocusExpression
    w = ev(hl.locus('1', 100).window(10, 10))
    assert w.start.position == 90 and w.end.position == 110
    assert ev(hl.locus('1', 5).window(10, 10)).start.position == 1
    assert ev(hl.locus('2', 5).contig_idx) == 1
    assert ev(hl.locus('1', 100).in_autosome_or_par()) is True
    # StringExpression
    assert ev(hl.literal('abc').reverse()) == 'cba'
    assert ev(hl.literal('abc').translate({'a': 'z'})) == 'zbc'
    assert ev(hl.literal('hailo').find('l')) == 3
    # Struct/Tuple/Dict
    assert ev(hl.struct(a=5).get('a')) == 5
    assert ev(hl.struct(a=5).get('zz', 0)) == 0
    t = hl.tuple([1, 2, 1])
    assert ev(t.count(1)) == 2 and ev(t.index(2)) == 1 and ev(t.index(9)) is None
    assert set(ev(hl.literal({'a': 1}).key_set())) == {'a'}
    # local array aggregation
    arr = hl.literal([1, 2, 3, 4])
    assert ev(arr.aggregate(lambda x: hl.agg.sum(x))) == 10
    tb = hl.utils.range_table(3)
    tb = tb.annotate(a=hl.range(0, tb.idx + 1))
    assert [r.s for r in tb.annotate(
        s=tb.a.aggregate(lambda x: hl.agg.sum(x))).collect()] == [0, 1, 3]


def test_expression_class_method_namespace_parity():
    import re
    from hail_tpu.expr import expression as E
    src = open('/root/reference/hail/python/hail/expr/expressions/typed_expressions.py').read()

    def methods_of(cls):
        m = re.search(rf'^class {cls}\b.*?(?=^class |\Z)', src, re.S | re.M)
        return set(re.findall(r'^    def ([a-z][a-z0-9_]*)\(', m.group(0), re.M)) if m else set()

    pairs = [('CollectionExpression', E.CollectionExpression),
             ('ArrayExpression', E.ArrayExpression),
             ('ArrayNumericExpression', E.ArrayExpression),
             ('SetExpression', E.SetExpression),
             ('DictExpression', E.DictExpression),
             ('StructExpression', E.StructExpression),
             ('TupleExpression', E.TupleExpression),
             ('StringExpression', E.StringExpression),
             ('CallExpression', E.CallExpression),
             ('LocusExpression', E.LocusExpression),
             ('IntervalExpression', E.IntervalExpression)]
    for name, mine in pairs:
        missing = sorted(m for m in methods_of(name) if not hasattr(mine, m))
        assert missing == [], (name, missing)


def test_expression_containers_lift():
    # python containers holding expressions build expression containers
    # (reference to_expr: [t.C1, t.C2] -> array expression)
    t = hl.utils.range_table(3)
    r = t.aggregate(hl.agg.array_sum([t.idx, t.idx * 2]))
    assert list(r) == [3, 6]
    s = hl.eval(hl.literal(5) + 0)
    pair = hl.eval(hl.tuple([hl.literal(1) + 1, 'x']))
    assert pair == (2, 'x') or list(pair) == [2, 'x']
    st = hl.eval(hl.set({hl.literal(3)}))
    assert set(st) == {3}
    d = hl.eval({'k': hl.literal(7)}) if True else None


def test_expr_module_namespace_parity():
    import re
    esrc = open('/root/reference/hail/python/hail/expr/__init__.py').read()
    names = re.findall(r"'([^']+)'",
                       re.search(r'__all__ = \[(.*?)\]', esrc, re.S).group(1))
    missing = [n for n in names if not hasattr(hl, n) and not hasattr(hl.expr, n)]
    assert missing == [], missing
