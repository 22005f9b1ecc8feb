"""Reference native-format reader (hail_format.py): decode .mt/.ht dirs
written by the reference Hail (EType rows, LZ4/Zstd blocks, LEB128)."""

import os

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.io.hail_format import (is_hail_native, lz4_decompress_block,
                                     parse_etype, parse_vtype)

RES = '/root/reference/hail/hail/test/resources'
MT = os.path.join(RES, 'split-multi-sample.vcf.mt')
HT = os.path.join(RES, 'three_key.ht')


def _need(p):
    if not os.path.isdir(p):
        pytest.skip(f'fixture {p} not available')


def test_lz4_roundtrip_vs_known():
    # literals-only block
    data = b'hello world, hail!'
    token = bytes([min(len(data), 15) << 4]) + (
        bytes([len(data) - 15]) if len(data) >= 15 else b'')
    assert lz4_decompress_block(token + data, len(data)) == data


def test_type_parsers():
    et = parse_etype('+EBaseStruct{a:+EInt32,b:EArray[+EBinary]}')
    assert et.kind == 'struct' and et.required
    assert et.fields[0][0] == 'a' and et.fields[0][1].required
    assert et.fields[1][1].kind == 'array'
    vt = parse_vtype('Struct{locus:Locus(GRCh37),alleles:Array[String],x:Float64}')
    assert str(vt.fields['alleles']) == 'array<str>'
    assert str(vt.fields['locus']).startswith('locus')


def test_read_reference_matrix_table():
    _need(MT)
    mt = hl.read_matrix_table(MT)
    assert is_hail_native(MT)
    assert mt.count() == (346, 100)
    r = mt.rows().take(1)[0]
    assert str(r.locus) == '20:10019093'
    assert r.alleles == ['A', 'G']
    assert r.rsid == 'rs575534'
    e = mt.entries().take(1)[0]
    assert str(e.GT) in ('0/0', '0|0')
    assert e.AD == [30, 0] and e.DP == 30 and e.GQ == 72
    # aggregations run over decoded entries
    cr = mt.aggregate_entries(hl.agg.fraction(hl.is_defined(mt.GT)))
    assert 0.5 < cr <= 1.0


def test_read_reference_table():
    _need(HT)
    t = hl.read_table(HT)
    rows = t.collect()
    assert len(rows) == t.count()
    assert len(rows) > 0


def test_reference_mt_parity_with_vcf_import():
    _need(MT)
    # split-multi-sample.vcf.mt was written from sample.vcf post-split;
    # GT call rate must match an agg over the same data
    mt = hl.read_matrix_table(MT)
    n_called = mt.aggregate_entries(hl.agg.count_where(hl.is_defined(mt.GT)))
    assert n_called == 33720  # stable decoded fact for this fixture


def test_ndarray_decode_column_major():
    # ENDArrayColumnMajor.scala:20-47: nDims int64 shapes then elements in
    # column-major order
    import struct
    import numpy as np
    from hail_tpu.io.hail_format import _Reader, decode_value, parse_etype, parse_vtype
    et = parse_etype('+ENDArrayColumnMajor[+EFloat64,2]')
    assert et.kind == 'ndarray' and et.ndims == 2
    vt = parse_vtype('NDArray[Float64,2]')
    assert vt.ndim == 2
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    buf = struct.pack('<qq', 2, 3) + arr.tobytes(order='F')
    out = decode_value(_Reader(buf, leb128=False), et, vt)
    assert out.shape == (2, 3)
    assert np.array_equal(out, arr)
