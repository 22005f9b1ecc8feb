"""BGEN v1.2 import/export.

Capability parity with reference `is/hail/io/bgen/` (`LoadBgen`,
`StagedBGENReader`'s codegen'd 8-bit probability unpacking, `IndexBgen`):
here the bit-unpack is a vectorized numpy reinterpretation producing dense
(R, N, 3) GP blocks — the same dense-tensor layout the device tier consumes.
Supports layout 2 (v1.2), zlib or uncompressed, unphased diploid, 8/16-bit
probabilities (the standard UK-Biobank shape).
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import types as ht
from ..genetics.call import pack_diploid
from ..genetics.reference_genome import ReferenceGenome, default_reference
from ..ir import columns as C
from ..ir.columns import (Batch, DenseArrayColumn, LocusColumn, ObjectColumn,
                          PrimitiveColumn)
from ..utils.structs import Struct


def _read_header(f):
    offset = struct.unpack('<I', f.read(4))[0]
    lh = struct.unpack('<I', f.read(4))[0]
    m, n = struct.unpack('<II', f.read(8))
    magic = f.read(4)
    if magic not in (b'bgen', b'\x00\x00\x00\x00'):
        raise ValueError('bad BGEN magic')
    free = f.read(lh - 20)
    flags = struct.unpack('<I', f.read(4))[0]
    compression = flags & 0x3
    layout = (flags >> 2) & 0xF
    has_sample_ids = (flags >> 31) & 1
    return offset, m, n, compression, layout, has_sample_ids


def _read_samples(f, n):
    lsi, n2 = struct.unpack('<II', f.read(8))
    samples = []
    for _ in range(n2):
        ln = struct.unpack('<H', f.read(2))[0]
        samples.append(f.read(ln).decode())
    return samples


def import_bgen(path, entry_fields: Sequence[str] = ('GT', 'GP'),
                sample_file: Optional[str] = None, n_partitions: Optional[int] = None,
                block_size: Optional[int] = None, index_file_map: Optional[Dict] = None,
                variants=None, _row_fields: Sequence[str] = ('varid', 'rsid'),
                reference_genome='default', contig_recoding: Optional[Dict[str, str]] = None,
                skip_invalid_loci: bool = False):
    """Import BGEN v1.2 (reference impex.import_bgen → LoadBgen.scala)."""
    from ..matrixtable import MatrixBatch, MatrixStage, MatrixTable
    paths = [path] if isinstance(path, str) else list(path)
    rg = default_reference() if reference_genome == 'default' else (
        ReferenceGenome.get(reference_genome) if isinstance(reference_genome, str) else reference_genome)
    contig_recoding = contig_recoding or {}
    for ef in entry_fields:
        if ef not in ('GT', 'GP', 'dosage'):
            raise ValueError(f'unknown entry field {ef!r}')

    # pre-filter keyset for indexed seek-reads ("contig:pos" strings).
    # `variants` may be a locus-keyed Table, a list of Locus/Structs, or
    # expressions (reference import_bgen variants arg forms)
    want_keys = None
    if variants is not None:
        from ..table import Table as _Table
        from ..expr.expression import Expression as _Expr, eval_scalar
        if isinstance(variants, _Table):
            variants = [r['locus'] if 'locus' in r else r
                        for r in variants.collect()]
        elif isinstance(variants, _Expr):
            variants = eval_scalar(variants)
        want_keys = set()
        for v in variants:
            if isinstance(v, _Expr):
                v = eval_scalar(v)
            if isinstance(v, Struct):
                want_keys.add(str(v.locus))
            else:
                want_keys.add(str(v))

    all_meta = []
    all_gp = []
    all_miss = []
    samples = None
    for p in paths:
        idx = _load_bgen_index(p, index_file_map)
        if idx is not None:
            # index-time settings carry into the import (reference semantics:
            # import_bgen takes recoding/rg/skip_invalid from the .idx2)
            contig_recoding = {**idx.get('contig_recoding', {}),
                               **(contig_recoding or {})}
            if reference_genome == 'default' and idx.get('reference_genome') \
                    not in (None, 'default'):
                rg = ReferenceGenome.get(idx['reference_genome'])
            skip_invalid_loci = skip_invalid_loci or bool(
                idx.get('skip_invalid_loci'))
        with open(p, 'rb') as f:
            offset, m, n, compression, layout, has_ids = _read_header(f)
            if layout != 2:
                raise NotImplementedError(f'BGEN layout {layout}; only v1.2 (layout 2) supported')
            if compression == 2:
                raise NotImplementedError('zstd-compressed BGEN not supported (no zstd in image)')
            if has_ids:
                fsamples = _read_samples(f, n)
            elif sample_file is not None:
                with open(sample_file) as sf:
                    lines = [l.strip() for l in sf if l.strip()]
                fsamples = [l.split()[0] for l in lines[2:]]
            else:
                fsamples = [str(i) for i in range(n)]
            if samples is None:
                samples = fsamples

            def decode_one(raw_bytes, contig, pos, varid, rsid, alleles, k):
                gp, miss = _decode_probability_block(raw_bytes, n, k)
                all_meta.append((contig, pos, varid, rsid, alleles))
                all_gp.append(gp)
                all_miss.append(miss)

            if idx is not None and idx.get('n_variants') == m:
                # seek path: touch only the genotype blocks we need
                for (chrom, pos, varid, rsid, alleles, voff, goff, clen) \
                        in idx['variants']:
                    contig = contig_recoding.get(chrom, chrom)
                    if not rg.has_contig(contig):
                        if skip_invalid_loci:
                            continue
                        raise ValueError(f'invalid contig {contig!r} '
                                         '(use contig_recoding or skip_invalid_loci)')
                    if want_keys is not None and \
                            f'{contig}:{pos}' not in want_keys:
                        continue
                    f.seek(goff)
                    if compression:
                        _dlen = struct.unpack('<I', f.read(4))[0]
                        raw = zlib.decompress(f.read(clen - 4))
                    else:
                        raw = f.read(clen)
                    decode_one(raw, contig, pos, varid, rsid, list(alleles),
                               len(alleles))
                continue

            f.seek(offset + 4)
            for _vi in range(m):
                ln = struct.unpack('<H', f.read(2))[0]
                varid = f.read(ln).decode()
                ln = struct.unpack('<H', f.read(2))[0]
                rsid = f.read(ln).decode()
                ln = struct.unpack('<H', f.read(2))[0]
                chrom = f.read(ln).decode()
                pos = struct.unpack('<I', f.read(4))[0]
                k = struct.unpack('<H', f.read(2))[0]
                alleles = []
                for _ in range(k):
                    ln = struct.unpack('<I', f.read(4))[0]
                    alleles.append(f.read(ln).decode())
                clen = struct.unpack('<I', f.read(4))[0]
                if compression:
                    dlen = struct.unpack('<I', f.read(4))[0]
                    raw = zlib.decompress(f.read(clen - 4))
                else:
                    raw = f.read(clen)
                contig = contig_recoding.get(chrom, chrom)
                if not rg.has_contig(contig):
                    if skip_invalid_loci:
                        continue
                    raise ValueError(f'invalid contig {contig!r} '
                                     '(use contig_recoding or skip_invalid_loci)')
                decode_one(raw, contig, pos, varid, rsid, alleles, k)

    m_tot = len(all_meta)
    n = len(samples)
    GP = np.stack(all_gp, axis=0) if m_tot else np.zeros((0, n, 3))
    MISS = np.stack(all_miss, axis=0) if m_tot else np.zeros((0, n), bool)

    cidx = np.asarray([rg.contig_index(c) for c, *_ in all_meta], dtype=np.int32)
    positions = np.asarray([p for _, p, *_ in all_meta], dtype=np.int32)
    varids = np.empty(m_tot, dtype=object)
    rsids = np.empty(m_tot, dtype=object)
    alleles_arr = np.empty(m_tot, dtype=object)
    for i, (_, _, vid, rs, al) in enumerate(all_meta):
        varids[i] = vid
        rsids[i] = rs
        alleles_arr[i] = al

    row_fields = {'locus': LocusColumn(ht.tlocus(rg), cidx, positions),
                  'alleles': ObjectColumn(ht.tarray(ht.tstr), alleles_arr)}
    row_t_fields = [('locus', ht.tlocus(rg)), ('alleles', ht.tarray(ht.tstr))]
    if 'varid' in _row_fields:
        row_fields['varid'] = ObjectColumn(ht.tstr, varids)
        row_t_fields.append(('varid', ht.tstr))
    if 'rsid' in _row_fields:
        row_fields['rsid'] = ObjectColumn(ht.tstr, rsids)
        row_t_fields.append(('rsid', ht.tstr))
    rows = Batch(row_fields, m_tot)

    ents: Dict[str, C.Column] = {}
    ent_t = {}
    mm = MISS if MISS.any() else None
    if 'GT' in entry_fields:
        best = np.argmax(GP, axis=2) if m_tot else np.zeros((0, n), np.int64)
        j = (best >= 1).astype(np.int32)
        k2 = (best == 2).astype(np.int32)
        ents['GT'] = PrimitiveColumn(ht.tcall, pack_diploid(j, k2), mm)
        ent_t['GT'] = ht.tcall
    if 'GP' in entry_fields:
        ents['GP'] = DenseArrayColumn(ht.tarray(ht.tfloat64), GP,
                                      np.full((m_tot, n), 3, np.int32), None, mm)
        ent_t['GP'] = ht.tarray(ht.tfloat64)
    if 'dosage' in entry_fields:
        ents['dosage'] = PrimitiveColumn(ht.tfloat64, GP[..., 1] + 2 * GP[..., 2], mm)
        ent_t['dosage'] = ht.tfloat64
    cols = Batch({'s': C.from_pylist(ht.tstr, samples)}, n)
    row_t = ht.tstruct.from_fields(row_t_fields)
    mb = MatrixBatch(rows, ents)
    order = np.argsort(rows.columns['locus'].global_position(), kind='stable')
    mb = mb.gather_rows(order)
    mt = MatrixTable(MatrixStage.from_batches(
        Batch({}, 1), cols, ['locus', 'alleles'], ['s'], row_t,
        ht.tstruct(s=ht.tstr), ht.tstruct(**ent_t), [mb]))
    if variants is not None:
        keyset = set()
        for v in variants:
            if isinstance(v, Struct):
                keyset.add((str(v.locus), tuple(v.alleles)))
            else:
                keyset.add((str(v), None))
        rows_b = mt._stage.partition_fn(0)
        lk = [str(l) for l in rows_b.rows.columns['locus'].to_pylist()]
        ak = [tuple(a) for a in rows_b.rows.columns['alleles'].to_pylist()]
        keep = np.asarray([(l, a) in keyset or (l, None) in keyset
                           for l, a in zip(lk, ak)])
        mb2 = rows_b.filter_rows(keep)
        mt = MatrixTable(MatrixStage.from_batches(
            Batch({}, 1), cols, ['locus', 'alleles'], ['s'], row_t,
            ht.tstruct(s=ht.tstr), ht.tstruct(**ent_t), [mb2]))
    return mt


def _decode_probability_block(raw: bytes, n: int, k: int):
    """Decode a layout-2 genotype block → ((n, 3) GP float64, (n,) missing)."""
    n2 = struct.unpack('<I', raw[0:4])[0]
    k2 = struct.unpack('<H', raw[4:6])[0]
    pmin, pmax = raw[6], raw[7]
    ploidy_bytes = np.frombuffer(raw[8:8 + n], dtype=np.uint8)
    missing = (ploidy_bytes & 0x80) != 0
    phased = raw[8 + n]
    bits = raw[9 + n]
    body = np.frombuffer(raw[10 + n:], dtype=np.uint8)
    if k2 != 2 or pmin != 2 or pmax != 2:
        raise NotImplementedError('only diploid biallelic BGEN v1.2 supported')
    n_probs = 2  # stored probs per sample for unphased diploid biallelic
    if phased:
        n_probs = 2  # per haplotype 1 stored prob → 2 total
    if bits == 8:
        vals = body[:n * n_probs].reshape(n, n_probs).astype(np.float64) / 255.0
    elif bits == 16:
        vals = np.frombuffer(body.tobytes()[:n * n_probs * 2], dtype='<u2').reshape(
            n, n_probs).astype(np.float64) / 65535.0
    elif bits == 32:
        vals = np.frombuffer(body.tobytes()[:n * n_probs * 4], dtype='<u4').reshape(
            n, n_probs).astype(np.float64) / 4294967295.0
    else:
        # generic bit widths: unpack via bit arithmetic
        total_bits = n * n_probs * bits
        bitarr = np.unpackbits(body, bitorder='little')[:total_bits].reshape(n * n_probs, bits)
        weights = (1 << np.arange(bits, dtype=np.uint64))
        ints = (bitarr.astype(np.uint64) * weights).sum(axis=1)
        vals = (ints / float((1 << bits) - 1)).reshape(n, n_probs)
    if phased:
        # P(hap1=alt), P(hap2=alt) → unphased GP
        a1 = vals[:, 0]
        a2 = vals[:, 1]
        gp = np.stack([(1 - a1) * (1 - a2), a1 * (1 - a2) + (1 - a1) * a2, a1 * a2], axis=1)
    else:
        p0 = vals[:, 0]
        p1 = vals[:, 1]
        gp = np.stack([p0, p1, np.clip(1.0 - p0 - p1, 0, 1)], axis=1)
    gp[missing] = 0.0
    return gp, missing


def _scan_variant_index(p: str):
    """One pass over a BGEN file collecting per-variant metadata + byte
    offsets of each variant block (the seek index; reference
    `io/bgen/IndexBgen.scala` builds the same mapping into a B-tree)."""
    metas = []
    with open(p, 'rb') as f:
        offset, m, n, compression, layout, has_ids = _read_header(f)
        if has_ids:
            _read_samples(f, n)
        f.seek(offset + 4)
        for _ in range(m):
            voff = f.tell()
            ln = struct.unpack('<H', f.read(2))[0]
            varid = f.read(ln).decode()
            ln = struct.unpack('<H', f.read(2))[0]
            rsid = f.read(ln).decode()
            ln = struct.unpack('<H', f.read(2))[0]
            chrom = f.read(ln).decode()
            pos = struct.unpack('<I', f.read(4))[0]
            k = struct.unpack('<H', f.read(2))[0]
            alleles = []
            for _ in range(k):
                ln = struct.unpack('<I', f.read(4))[0]
                alleles.append(f.read(ln).decode())
            clen = struct.unpack('<I', f.read(4))[0]
            goff = f.tell()
            f.seek(clen, 1)
            metas.append((chrom, pos, varid, rsid, alleles, voff, goff, clen))
    return dict(n_variants=m, n_samples=n, layout=layout,
                compression=compression, variants=metas)


_IDX2_META = 'metadata.json'


def index_bgen(path, index_file_map=None, reference_genome='default',
               contig_recoding=None, skip_invalid_loci: bool = False) -> None:
    """Write a `.idx2` index DIRECTORY with per-variant byte offsets,
    enabling seek-reads in import_bgen (reference `IndexBgen.scala` writes
    the same dir layout with a B-tree; ours is a JSON metadata file —
    variant counts here are small enough that a sorted array is the B-tree).

    An existing index (including a reference-format `.idx2` dir, which we
    can't parse) is replaced. If the default location beside the input is
    not writable, pass `index_file_map={bgen_path: writable_idx2_path}`."""
    import shutil
    paths = [path] if isinstance(path, str) else list(path)
    for p in paths:
        idx_path = (index_file_map or {}).get(p, p + '.idx2')
        scan = _scan_variant_index(p)
        try:
            if os.path.exists(idx_path):
                if os.path.isdir(idx_path):
                    shutil.rmtree(idx_path)
                else:
                    os.unlink(idx_path)
            os.makedirs(idx_path)
            rg_name = (reference_genome if isinstance(reference_genome, str)
                       else getattr(reference_genome, 'name', 'default'))
            with open(os.path.join(idx_path, _IDX2_META), 'w') as f:
                json.dump({'path': p, 'n_variants': scan['n_variants'],
                           'n_samples': scan['n_samples'],
                           'layout': scan['layout'],
                           'compression': scan['compression'],
                           # index-time settings are applied by import_bgen
                           # (reference IndexBgen stores them in the idx2
                           # metadata; LoadBgen.scala reads them back)
                           'contig_recoding': contig_recoding or {},
                           'reference_genome': rg_name,
                           'skip_invalid_loci': bool(skip_invalid_loci),
                           'variants': [list(v) for v in scan['variants']]}, f)
        except (PermissionError, OSError) as e:
            raise OSError(
                f'cannot write BGEN index at {idx_path!r} ({e}); pass '
                f'index_file_map={{{p!r}: <writable .idx2 path>}}') from e


def _load_bgen_index(p: str, index_file_map=None):
    """Load our .idx2 dir if present and parseable; None otherwise
    (including for reference-format binary indexes, which trigger a fresh
    in-memory scan instead of a crash)."""
    idx_path = (index_file_map or {}).get(p, p + '.idx2')
    meta_file = os.path.join(idx_path, _IDX2_META)
    if not os.path.isfile(meta_file):
        return None
    try:
        with open(meta_file) as f:
            meta = json.load(f)
        if 'variants' not in meta:
            return None
        meta['variants'] = [tuple(v) for v in meta['variants']]
        return meta
    except (json.JSONDecodeError, OSError, KeyError):
        return None


def export_bgen(mt, output: str, gp=None, varid=None, rsid=None,
                parallel=None, compression_codec: str = 'zlib') -> None:
    """Export BGEN v1.2, 8-bit probabilities (reference export_bgen)."""
    st = mt._stage
    skey = st.col_key[0]
    samples = [str(r[skey]) for r in st.cols.to_pylist()]
    n = len(samples)
    m = mt.count_rows()
    with open(output + '.bgen', 'wb') as f:
        sample_block = b''.join(struct.pack('<H', len(s)) + s.encode() for s in samples)
        si_len = 8 + len(sample_block)
        header = struct.pack('<II', m, n) + b'bgen' + struct.pack('<I', (1) | (2 << 2) | (1 << 31))
        lh = 20
        offset = lh + si_len
        f.write(struct.pack('<I', offset))
        f.write(struct.pack('<I', lh))
        f.write(header)
        f.write(struct.pack('<II', si_len, n))
        f.write(sample_block)
        for ictx, ctx in enumerate(st.contexts):
            mb = st.partition_fn(ctx)
            gp_col = mb.entries.get('GP')
            gt_col = mb.entries.get('GT')
            loci = mb.rows.columns['locus'].to_pylist()
            alleles = mb.rows.columns['alleles'].to_pylist()
            for r in range(mb.n_rows):
                l = loci[r]
                a = alleles[r]
                vid = f'{l.contig}:{l.position}:{a[0]}:{a[1]}'.encode()
                f.write(struct.pack('<H', len(vid)) + vid)
                f.write(struct.pack('<H', len(vid)) + vid)
                cb = l.contig.encode()
                f.write(struct.pack('<H', len(cb)) + cb)
                f.write(struct.pack('<I', l.position))
                f.write(struct.pack('<H', len(a)))
                for al in a:
                    ab = al.encode()
                    f.write(struct.pack('<I', len(ab)) + ab)
                if gp_col is not None:
                    gpv = np.clip(gp_col.values[r], 0, 1)
                    miss = gp_col.missing_mask()[r]
                else:
                    from ..genetics.call import calls_n_alt_alleles
                    na = calls_n_alt_alleles(np.asarray(gt_col.values[r]))
                    gpv = np.zeros((n, 3))
                    gpv[np.arange(n), np.clip(na, 0, 2)] = 1.0
                    miss = gt_col.missing_mask()[r]
                probs8 = np.round(gpv[:, :2] * 255).astype(np.uint8)
                ploidy = np.full(n, 2, np.uint8) | (miss.astype(np.uint8) << 7)
                block = (struct.pack('<IHBB', n, 2, 2, 2) + ploidy.tobytes()
                         + bytes([0, 8]) + probs8.tobytes())
                comp = zlib.compress(block)
                f.write(struct.pack('<I', len(comp) + 4))
                f.write(struct.pack('<I', len(block)))
                f.write(comp)
