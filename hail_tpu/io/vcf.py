"""VCF import/export.

Capability parity with reference `is/hail/io/vcf/LoadVCF.scala` (header/type
parsing, HTS genotype schema, partitioned parse) — a fresh host-side parser
producing dense columnar MatrixBatches (int32 packed calls, (R,C,w) dense
arrays for AD/PL) ready for device transfer. Two tiers: a pure-python parser
for the full HTS schema, and a native fast path (hail_tpu/native: parallel
BGZF + C++ GT tokenizer, SURVEY §7 "host I/O throughput") selected with
entry_fields=['GT'].
"""

from __future__ import annotations

import gzip
import io as _io
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import types as ht
from ..genetics.call import pack_call
from ..genetics.reference_genome import ReferenceGenome, default_reference
from ..ir import columns as C
from ..ir.columns import (Batch, Column, DenseArrayColumn, LocusColumn,
                          ObjectColumn, PrimitiveColumn)
from ..utils.structs import Struct

_VCF_TYPE = {'Integer': ht.tint32, 'Float': ht.tfloat64, 'String': ht.tstr,
             'Character': ht.tstr, 'Flag': ht.tbool}

_HEADER_RE = re.compile(r'##(INFO|FORMAT|FILTER|contig)=<(.*)>\s*$')


def _parse_header_attrs(s: str) -> Dict[str, str]:
    out = {}
    key = ''
    val = ''
    in_key = True
    in_quote = False
    for ch in s:
        if in_quote:
            if ch == '"':
                in_quote = False
            else:
                val += ch
        elif ch == '"':
            in_quote = True
        elif in_key and ch == '=':
            in_key = False
        elif ch == ',' and not in_key:
            out[key] = val
            key, val, in_key = '', '', True
        elif in_key:
            key += ch
        else:
            val += ch
    if key:
        out[key] = val
    return out


class VCFHeader:
    def __init__(self):
        self.infos: Dict[str, Tuple[str, str]] = {}    # name -> (Number, Type)
        self.formats: Dict[str, Tuple[str, str]] = {}
        self.filters: List[str] = []
        self.samples: List[str] = []
        self.contigs: List[Tuple[str, Optional[int]]] = []
        self.lines: List[str] = []

    def field_type(self, kind: str, name: str) -> ht.HailType:
        num, typ = (self.infos if kind == 'info' else self.formats)[name]
        base = _VCF_TYPE.get(typ, ht.tstr)
        if typ == 'Flag':
            return ht.tbool
        if num in ('1', '0'):
            return base if num == '1' else ht.tbool
        return ht.tarray(base)


def _open_text(path: str, force_bgz: bool = False, force: bool = False):
    if path.endswith('.gz') or path.endswith('.bgz') or force_bgz:
        return gzip.open(path, 'rt')
    return open(path, 'rt')


def parse_vcf_header(path: str, force_bgz: bool = False) -> VCFHeader:
    h = VCFHeader()
    with _open_text(path, force_bgz) as f:
        for line in f:
            line = line.rstrip('\n')
            if line.startswith('##'):
                h.lines.append(line)
                m = _HEADER_RE.match(line)
                if m:
                    kind, attrs_s = m.groups()
                    attrs = _parse_header_attrs(attrs_s)
                    if kind == 'INFO':
                        h.infos[attrs['ID']] = (attrs.get('Number', '.'), attrs.get('Type', 'String'))
                    elif kind == 'FORMAT':
                        h.formats[attrs['ID']] = (attrs.get('Number', '.'), attrs.get('Type', 'String'))
                    elif kind == 'FILTER':
                        h.filters.append(attrs['ID'])
                    elif kind == 'contig':
                        ln = attrs.get('length')
                        h.contigs.append((attrs['ID'], int(ln) if ln else None))
            elif line.startswith('#CHROM'):
                parts = line.split('\t')
                h.samples = parts[9:] if len(parts) > 9 else []
                break
            else:
                break
    return h


def _parse_gt(s: str) -> Optional[int]:
    """GT string → packed call or None for missing."""
    if not s or s == '.' or s == './.' or s == '.|.':
        return None
    phased = '|' in s
    sep = '|' if phased else '/'
    parts = s.split(sep)
    alleles = []
    for p in parts:
        if p == '.' or p == '':
            return None
        alleles.append(int(p))
    if len(alleles) > 2:
        return None
    return pack_call(alleles, phased)


def _info_value(raw: str, num: str, typ: str):
    base = _VCF_TYPE.get(typ, ht.tstr)
    def conv(x):
        if x == '.' or x == '':
            return None
        if base == ht.tint32:
            return int(x)
        if base == ht.tfloat64:
            return float(x)
        return x
    if num == '1':
        return conv(raw)
    return [conv(x) for x in raw.split(',')]


def import_vcf(path, force_bgz: bool = False, force: bool = False,
               header_file: Optional[str] = None, min_partitions: Optional[int] = None,
               call_fields: Sequence[str] = ('PGT',), entry_float_type=ht.tfloat64,
               reference_genome='default', contig_recoding: Optional[Dict[str, str]] = None,
               array_elements_required: bool = True, skip_invalid_loci: bool = False,
               filter=None, find_replace=None, n_partitions: Optional[int] = None,
               block_size: Optional[int] = None, _partitions=None,
               entry_fields: Optional[Sequence[str]] = None):
    """Import VCF file(s) as a MatrixTable (reference `methods/impex.py`
    import_vcf → `LoadVCF.scala:1751`).

    `entry_fields=['GT']` selects the native fast path: parallel BGZF
    decompression + the C++ line parser (hail_tpu/native), producing dense
    packed-call blocks directly — the host-IO fast path of SURVEY §7."""
    from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable
    if (entry_fields is not None and list(entry_fields) == ['GT']
            and filter is None and find_replace is None):
        try:
            return _import_vcf_fast_gt(path, force_bgz, header_file,
                                       reference_genome, contig_recoding,
                                       skip_invalid_loci, n_partitions)
        except _FastPathUnavailable:
            pass

    paths = [path] if isinstance(path, str) else list(path)
    paths = [os.path.expanduser(p) for p in paths]
    rg = default_reference() if reference_genome == 'default' else (
        ReferenceGenome.get(reference_genome) if isinstance(reference_genome, str) else reference_genome)

    header = parse_vcf_header(header_file or paths[0], force_bgz)
    samples = header.samples
    n_samples = len(samples)

    filter_re = re.compile(filter) if filter else None

    # row type
    info_fields = list(header.infos.keys())
    info_t = ht.tstruct(**{k: header.field_type('info', k) for k in info_fields})
    # rg=None keys rows by a plain contig/position struct (reference
    # TLocus.schemaFromRG(None))
    locus_t = ht.tlocus(rg) if rg is not None else \
        ht.tstruct(contig=ht.tstr, position=ht.tint32)
    row_t = ht.tstruct(locus=locus_t, alleles=ht.tarray(ht.tstr),
                       rsid=ht.tstr, qual=ht.tfloat64, filters=ht.tset(ht.tstr),
                       info=info_t)
    # entry type: preserve header order, GT first if present
    fmt_fields = list(header.formats.keys())
    if 'GT' in fmt_fields:
        fmt_fields.remove('GT')
        fmt_fields = ['GT'] + fmt_fields
    entry_fields = {}
    for k in fmt_fields:
        if k == 'GT' or k in call_fields:
            entry_fields[k] = ht.tcall
        else:
            t = header.field_type('format', k)
            if t == ht.tfloat64:
                t = entry_float_type
            elif isinstance(t, ht.tarray) and t.element_type == ht.tfloat64:
                t = ht.tarray(entry_float_type)
            entry_fields[k] = t
    entry_t = ht.tstruct(**entry_fields)
    col_t = ht.tstruct(s=ht.tstr)

    # read data lines
    rows: List[dict] = []
    for p in paths:
        with _open_text(p, force_bgz) as f:
            for line in f:
                if line.startswith('#'):
                    continue
                line = line.rstrip('\n')
                if not line:
                    continue
                if filter_re and filter_re.search(line):
                    continue
                if find_replace:
                    line = re.sub(find_replace[0], find_replace[1], line)
                rows.append(line)

    n_rows_total = len(rows)
    if n_partitions is None:
        n_partitions = min_partitions or max(1, min(8, n_rows_total // 4096 + 1))
    n_partitions = max(1, min(n_partitions, max(n_rows_total, 1)))
    bounds = np.linspace(0, n_rows_total, n_partitions + 1).astype(int)

    def parse_partition(ctx) -> MatrixBatch:
        s, e = ctx
        lines = rows[s:e]
        R = len(lines)
        contig_idx = np.zeros(R, dtype=np.int32)
        contig_strs = np.empty(R, dtype=object)
        position = np.zeros(R, dtype=np.int32)
        loc_missing = np.zeros(R, dtype=bool)
        alleles = np.empty(R, dtype=object)
        rsid = np.empty(R, dtype=object)
        qual = np.zeros(R, dtype=np.float64)
        qual_missing = np.zeros(R, dtype=bool)
        filters = np.empty(R, dtype=object)
        info_vals: Dict[str, np.ndarray] = {k: np.empty(R, dtype=object) for k in info_fields}

        ent: Dict[str, dict] = {}
        for k, t in entry_fields.items():
            if t == ht.tcall:
                ent[k] = {'v': np.zeros((R, n_samples), np.int32),
                          'm': np.ones((R, n_samples), bool), 'kind': 'call'}
            elif t in (ht.tint32, ht.tfloat32, ht.tfloat64):
                ent[k] = {'v': np.zeros((R, n_samples), t.numpy_dtype),
                          'm': np.ones((R, n_samples), bool), 'kind': 'prim', 't': t}
            elif isinstance(t, ht.tarray) and t.element_type.numpy_dtype is not None:
                ent[k] = {'rows': [[None] * n_samples for _ in range(R)], 'kind': 'arr', 't': t}
            else:
                ent[k] = {'v': np.full((R, n_samples), None, dtype=object), 'kind': 'obj', 't': t}

        keep = np.ones(R, dtype=bool)
        for i, line in enumerate(lines):
            parts = line.split('\t')
            contig = parts[0]
            if contig_recoding:
                contig = contig_recoding.get(contig, contig)
            if rg is None:
                contig_strs[i] = contig
            else:
                if not rg.has_contig(contig):
                    if skip_invalid_loci:
                        keep[i] = False
                        continue
                    raise ValueError(f'invalid contig {contig!r} for reference genome {rg.name} '
                                     f'(use contig_recoding or skip_invalid_loci)')
                contig_idx[i] = rg.contig_index(contig)
            position[i] = int(parts[1])
            rsid[i] = None if parts[2] == '.' else parts[2]
            ref = parts[3]
            alts = parts[4].split(',') if parts[4] != '.' else []
            alleles[i] = [ref] + [a for a in alts if a != '.']
            if parts[5] == '.':
                qual_missing[i] = True
            else:
                qual[i] = float(parts[5])
            if parts[6] == '.':
                filters[i] = None
            elif parts[6] == 'PASS':
                filters[i] = frozenset()
            else:
                filters[i] = frozenset(parts[6].split(';'))
            info = {}
            if len(parts) > 7 and parts[7] != '.':
                for item in parts[7].split(';'):
                    if '=' in item:
                        k, v = item.split('=', 1)
                    else:
                        k, v = item, None
                    if k in header.infos:
                        num, typ = header.infos[k]
                        if typ == 'Flag':
                            info[k] = True
                        elif v is not None:
                            info[k] = _info_value(v, num, typ)
            for k in info_fields:
                num, typ = header.infos[k]
                if typ == 'Flag':
                    info_vals[k][i] = bool(info.get(k, False))
                else:
                    info_vals[k][i] = info.get(k)
            if len(parts) > 8 and n_samples:
                fmt = parts[8].split(':')
                for j in range(n_samples):
                    sv = parts[9 + j]
                    if sv == '.' or sv == '':
                        continue
                    svs = sv.split(':')
                    for fi, fk in enumerate(fmt):
                        if fi >= len(svs) or fk not in ent:
                            continue
                        raw = svs[fi]
                        if raw == '.' or raw == '':
                            continue
                        slot = ent[fk]
                        if slot['kind'] == 'call':
                            g = _parse_gt(raw)
                            if g is not None:
                                slot['v'][i, j] = g
                                slot['m'][i, j] = False
                        elif slot['kind'] == 'prim':
                            try:
                                slot['v'][i, j] = (int(raw) if slot['t'] == ht.tint32 else float(raw))
                                slot['m'][i, j] = False
                            except ValueError:
                                pass
                        elif slot['kind'] == 'arr':
                            et = slot['t'].element_type
                            try:
                                vals = [None if x == '.' else (int(x) if et == ht.tint32 else float(x))
                                        for x in raw.split(',')]
                                slot['rows'][i][j] = vals
                            except ValueError:
                                pass
                        else:
                            slot['v'][i, j] = raw

        if not keep.all():
            sel = np.where(keep)[0]
        else:
            sel = None

        def subsel(a):
            return a if sel is None else a[sel]

        info_cols = {k: C.from_pylist(info_t[k], list(subsel(info_vals[k])))
                     for k in info_fields}
        Rk = R if sel is None else len(sel)
        if rg is None:
            locus_col = C.StructColumn(
                locus_t,
                {'contig': ObjectColumn(ht.tstr, subsel(contig_strs)),
                 'position': PrimitiveColumn(ht.tint32, subsel(position))},
                None, (R if sel is None else len(sel),))
        else:
            locus_col = LocusColumn(locus_t, subsel(contig_idx), subsel(position))
        row_cols = {
            'locus': locus_col,
            'alleles': ObjectColumn(ht.tarray(ht.tstr), subsel(alleles)),
            'rsid': ObjectColumn(ht.tstr, subsel(rsid)),
            'qual': PrimitiveColumn(ht.tfloat64, subsel(qual),
                                    subsel(qual_missing) if qual_missing.any() else None),
            'filters': ObjectColumn(ht.tset(ht.tstr), subsel(filters)),
            'info': C.StructColumn(info_t, info_cols, None, (Rk,)),
        }
        entries: Dict[str, Column] = {}
        for k, slot in ent.items():
            if slot['kind'] == 'call':
                entries[k] = PrimitiveColumn(ht.tcall, subsel(slot['v']),
                                             subsel(slot['m']) if slot['m'].any() else None)
            elif slot['kind'] == 'prim':
                entries[k] = PrimitiveColumn(slot['t'], subsel(slot['v']),
                                             subsel(slot['m']) if slot['m'].any() else None)
            elif slot['kind'] == 'arr':
                t = slot['t']
                et = t.element_type
                rows2 = slot['rows'] if sel is None else [slot['rows'][x] for x in sel]
                w = 0
                for rr in rows2:
                    for vv in rr:
                        if vv is not None and len(vv) > w:
                            w = len(vv)
                Rk2 = len(rows2)
                vals = np.zeros((Rk2, n_samples, max(w, 1)), dtype=et.numpy_dtype)
                lengths = np.zeros((Rk2, n_samples), dtype=np.int32)
                miss = np.ones((Rk2, n_samples), dtype=bool)
                em = np.zeros((Rk2, n_samples, max(w, 1)), dtype=bool)
                for i2, rr in enumerate(rows2):
                    for j, vv in enumerate(rr):
                        if vv is None:
                            continue
                        miss[i2, j] = False
                        lengths[i2, j] = len(vv)
                        for x_i, x in enumerate(vv):
                            if x is None:
                                em[i2, j, x_i] = True
                            else:
                                vals[i2, j, x_i] = x
                entries[k] = DenseArrayColumn(t, vals, lengths, em if em.any() else None,
                                              miss if miss.any() else None)
            else:
                entries[k] = ObjectColumn(slot['t'], subsel(slot['v']))
        return MatrixBatch(Batch(row_cols, Rk), entries)

    contexts = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_partitions)]
    cols = Batch({'s': C.from_pylist(ht.tstr, samples)}, n_samples)
    g = Batch({}, 1)
    stage = MatrixStage(g, cols, ['locus', 'alleles'], ['s'], row_t, col_t,
                        entry_t, contexts, parse_partition)
    return MatrixTable(stage)


def get_vcf_metadata(path: str) -> dict:
    h = parse_vcf_header(path)
    out = {'info': {}, 'format': {}, 'filter': {}}
    for k, (num, typ) in h.infos.items():
        out['info'][k] = {'Number': num, 'Type': typ}
    for k, (num, typ) in h.formats.items():
        out['format'][k] = {'Number': num, 'Type': typ}
    for k in h.filters:
        out['filter'][k] = {}
    return out


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _fmt_value(v, t: ht.HailType) -> str:
    if v is None:
        return '.'
    if isinstance(t, ht.tarray):
        return ','.join(_fmt_value(x, t.element_type) for x in v)
    if t == ht.tfloat64 or t == ht.tfloat32:
        return f'{v:.6g}'
    if t == ht.tbool:
        return '1' if v else '0'
    return str(v)


def export_vcf(dataset, output: str, append_to_header: Optional[str] = None,
               metadata: Optional[dict] = None, tabix: bool = False) -> None:
    """Export a MatrixTable to VCF (reference `ExportVCF`)."""
    st = dataset._stage
    rg = None
    if isinstance(st.row_type['locus'], ht.tlocus):
        rg = st.row_type['locus'].reference_genome
    samples = [r.s for r in st.cols.to_pylist()]
    entry_t = st.entry_type
    info_t = st.row_type.fields.get('info', ht.tstruct())

    opener = gzip.open if output.endswith('.gz') or output.endswith('.bgz') else open
    with opener(output, 'wt') as f:
        f.write('##fileformat=VCFv4.2\n')
        f.write('##source=hail_tpu\n')
        for k, t in entry_t.items():
            typ = 'String'
            num = '1'
            base = t.element_type if isinstance(t, ht.tarray) else t
            if base == ht.tint32 or base == ht.tint64:
                typ = 'Integer'
            elif base in (ht.tfloat32, ht.tfloat64):
                typ = 'Float'
            if t == ht.tcall:
                typ, num = 'String', '1'
            elif isinstance(t, ht.tarray):
                num = '.'
            f.write(f'##FORMAT=<ID={k},Number={num},Type={typ},Description="">\n')
        for k, t in info_t.items():
            base = t.element_type if isinstance(t, ht.tarray) else t
            typ = 'String'
            if t == ht.tbool:
                typ, num = 'Flag', '0'
            elif base in (ht.tint32, ht.tint64):
                typ = 'Integer'
                num = '1' if not isinstance(t, ht.tarray) else '.'
            elif base in (ht.tfloat32, ht.tfloat64):
                typ = 'Float'
                num = '1' if not isinstance(t, ht.tarray) else '.'
            else:
                num = '1' if not isinstance(t, ht.tarray) else '.'
            f.write(f'##INFO=<ID={k},Number={num},Type={typ},Description="">\n')
        if rg is not None:
            for c in rg.contigs:
                f.write(f'##contig=<ID={c},length={rg.contig_length(c)}>\n')
        if append_to_header:
            with open(append_to_header) as ah:
                f.write(ah.read())
        cols9 = '#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO'
        if samples:
            f.write(cols9 + '\tFORMAT\t' + '\t'.join(samples) + '\n')
        else:
            f.write(cols9 + '\n')

        fmt_keys = list(entry_t.fields)
        for ctx in st.contexts:
            mb = st.partition_fn(ctx)
            row_lists = {k: c.to_pylist() for k, c in mb.rows.columns.items()}
            ent_lists = {k: C.to_object(c).values for k, c in mb.entries.items()}
            for i in range(mb.n_rows):
                loc = row_lists['locus'][i]
                als = row_lists['alleles'][i]
                rsid = row_lists.get('rsid', [None] * mb.n_rows)[i]
                qual = row_lists.get('qual', [None] * mb.n_rows)[i]
                filt = row_lists.get('filters', [None] * mb.n_rows)[i]
                info = row_lists.get('info', [None] * mb.n_rows)[i]
                if filt is None:
                    fs = '.'
                elif len(filt) == 0:
                    fs = 'PASS'
                else:
                    fs = ';'.join(sorted(filt))
                info_items = []
                if info is not None:
                    for k, t in info_t.items():
                        v = info[k]
                        if t == ht.tbool:
                            if v:
                                info_items.append(k)
                        elif v is not None:
                            info_items.append(f'{k}={_fmt_value(v, t)}')
                out = [loc.contig, str(loc.position), rsid or '.', als[0],
                       ','.join(als[1:]) if len(als) > 1 else '.',
                       '.' if qual is None else f'{qual:.6g}',
                       fs, ';'.join(info_items) if info_items else '.']
                if samples:
                    out.append(':'.join(fmt_keys))
                    for j in range(len(samples)):
                        parts = []
                        for k in fmt_keys:
                            v = ent_lists[k][i, j]
                            if entry_t[k] == ht.tcall:
                                parts.append('./.' if v is None else str(v))
                            else:
                                parts.append(_fmt_value(v, entry_t[k]))
                        out.append(':'.join(parts))
                f.write('\t'.join(out) + '\n')


# ---------------------------------------------------------------------------
# native fast path: GT-only import via hail_tpu.native
# ---------------------------------------------------------------------------

class _FastPathUnavailable(Exception):
    pass


def _read_vcf_bytes(path: str, force_bgz: bool) -> bytes:
    from .. import native as native_mod
    raw = open(path, 'rb').read()
    if path.endswith('.bgz') or path.endswith('.gz') or force_bgz:
        out = native_mod.bgzf_decompress(raw)
        if out is None:
            import gzip as _gz
            out = _gz.decompress(raw)
        return out
    return raw


def _import_vcf_fast_gt(path, force_bgz, header_file, reference_genome,
                        contig_recoding, skip_invalid_loci, n_partitions):
    from .. import native as native_mod
    from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable
    if reference_genome is None:
        # genome-less import keys by a contig/position struct — only the
        # general path builds that
        raise _FastPathUnavailable()
    if native_mod.get_lib() is None:
        raise _FastPathUnavailable(native_mod.build_error())
    paths = [path] if isinstance(path, str) else list(path)
    rg = default_reference() if reference_genome == 'default' else (
        ReferenceGenome.get(reference_genome) if isinstance(reference_genome, str) else reference_genome)
    contig_recoding = contig_recoding or {}
    header = parse_vcf_header(header_file or paths[0], force_bgz)
    samples = header.samples
    n_samples = len(samples)

    all_contigs: List[str] = []
    all_pos: List[np.ndarray] = []
    all_gt: List[np.ndarray] = []
    all_miss: List[np.ndarray] = []
    all_meta: List[tuple] = []
    for p in paths:
        text = _read_vcf_bytes(p, force_bgz)
        res = native_mod.vcf_parse_gt(text, n_samples, text.count(b'\n') + 1)
        if res is None:
            raise _FastPathUnavailable('parse failed')
        contigs, pos, gt, miss = res
        all_contigs.extend(contigs)
        all_pos.append(pos)
        all_gt.append(gt)
        all_miss.append(miss)
        # row metadata (ID/REF/ALT/QUAL/FILTER) from the first 8 columns only
        body_at = 0
        for line in text.split(b'\n'):
            if line.startswith(b'#') or not line:
                continue
            parts = line.split(b'\t', 8)
            rsid = None if parts[2] == b'.' else parts[2].decode()
            ref_a = parts[3].decode()
            alts = parts[4].decode().split(',') if parts[4] != b'.' else []
            qual = None if parts[5] == b'.' else float(parts[5])
            if parts[6] == b'.':
                filt = None
            elif parts[6] == b'PASS':
                filt = frozenset()
            else:
                filt = frozenset(parts[6].decode().split(';'))
            all_meta.append((rsid, [ref_a] + [a for a in alts if a != '.'], qual, filt))

    pos = np.concatenate(all_pos) if all_pos else np.zeros(0, np.int32)
    gt = np.concatenate(all_gt) if all_gt else np.zeros((0, n_samples), np.int32)
    miss = np.concatenate(all_miss) if all_miss else np.zeros((0, n_samples), bool)
    m = len(all_contigs)
    cidx = np.zeros(m, dtype=np.int32)
    keep = np.ones(m, dtype=bool)
    for i, c in enumerate(all_contigs):
        c2 = contig_recoding.get(c, c)
        if not rg.has_contig(c2):
            if skip_invalid_loci:
                keep[i] = False
                continue
            raise ValueError(f'invalid contig {c2!r} for {rg.name}')
        cidx[i] = rg.contig_index(c2)
    sel = np.where(keep)[0]
    m2 = len(sel)
    alleles_arr = np.empty(m2, dtype=object)
    rsid_arr = np.empty(m2, dtype=object)
    qual = np.zeros(m2, dtype=np.float64)
    qual_miss = np.zeros(m2, dtype=bool)
    filt_arr = np.empty(m2, dtype=object)
    for j, i in enumerate(sel):
        rsid_arr[j], alleles_arr[j], q, filt_arr[j] = all_meta[i]
        if q is None:
            qual_miss[j] = True
        else:
            qual[j] = q
    row_t = ht.tstruct(locus=ht.tlocus(rg), alleles=ht.tarray(ht.tstr),
                       rsid=ht.tstr, qual=ht.tfloat64, filters=ht.tset(ht.tstr))
    n_partitions = n_partitions or max(1, min(8, m2 // 65536 + 1))
    n_partitions = max(1, min(n_partitions, max(m2, 1)))
    bounds = np.linspace(0, m2, n_partitions + 1).astype(int)
    cidx2 = cidx[sel]
    pos2 = pos[sel]
    gt2 = gt[sel]
    miss2 = miss[sel]

    def pf(ctx):
        s_, e_ = ctx
        R = e_ - s_
        rows = Batch({
            'locus': LocusColumn(ht.tlocus(rg), cidx2[s_:e_], pos2[s_:e_]),
            'alleles': ObjectColumn(ht.tarray(ht.tstr), alleles_arr[s_:e_]),
            'rsid': ObjectColumn(ht.tstr, rsid_arr[s_:e_]),
            'qual': PrimitiveColumn(ht.tfloat64, qual[s_:e_],
                                    qual_miss[s_:e_] if qual_miss[s_:e_].any() else None),
            'filters': ObjectColumn(ht.tset(ht.tstr), filt_arr[s_:e_]),
        }, R)
        mm = miss2[s_:e_]
        return MatrixBatch(rows, {'GT': PrimitiveColumn(
            ht.tcall, gt2[s_:e_], mm if mm.any() else None)})

    contexts = [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_partitions)]
    cols = Batch({'s': C.from_pylist(ht.tstr, samples)}, n_samples)
    g = Batch({}, 1)
    return MatrixTable(MatrixStage(g, cols, ['locus', 'alleles'], ['s'], row_t,
                                   ht.tstruct(s=ht.tstr), ht.tstruct(GT=ht.tcall),
                                   contexts, pf))
