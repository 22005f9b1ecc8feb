"""hl.experimental (reference hail/python/hail/experimental/).

Round-1 subset: full_outer_join_mt, pc_project, strided helpers, and
write_multiple; ld_score_regression and the annotation DB land later.
"""

from __future__ import annotations

import numpy as np

from .. import types as ht
from ..expr import functions as F
from ..expr import aggregators as agg
from ..expr.expression import to_expr
from ..matrixtable import MatrixTable
from ..table import Table


def full_outer_join_mt(left: MatrixTable, right: MatrixTable) -> MatrixTable:
    raise NotImplementedError('full_outer_join_mt: planned (round 2)')


def pc_project(call_expr, loadings_expr, af_expr):
    """Project genotypes onto PCA loadings (reference
    experimental/pc_project.py)."""
    from ..methods.statgen import _entry_expr_to_blocks
    e = to_expr(call_expr)
    mt = e._indices.source
    ne = e.n_alt_alleles() if e.dtype == ht.tcall else e
    G, M = _entry_expr_to_blocks(ne)
    le = to_expr(loadings_expr)
    ae = to_expr(af_expr)
    src = le._indices.source
    loadings = []
    afs = []
    for i, ctx in enumerate(mt._stage.contexts):
        mb = mt._stage.partition_fn(ctx)
        env = mt._row_env(mb, i)
        lcol = le._ir.evaluate(env)
        acol = ae._ir.evaluate(env)
        loadings.extend(lcol.to_pylist())
        afs.extend(acol.to_pylist())
    keep = np.asarray([l is not None and a is not None for l, a in zip(loadings, afs)])
    L = np.asarray([l for l, k in zip(loadings, keep) if k], dtype=np.float64)
    af = np.asarray([a for a, k in zip(afs, keep) if k], dtype=np.float64)
    Gk = G[keep]
    Mk = M[keep]
    norm = np.sqrt(2 * af * (1 - af) * L.shape[0])
    Z = np.where(Mk, 0.0, (Gk - 2 * af[:, None]) / np.maximum(norm, 1e-300)[:, None])
    scores = Z.T @ L            # (n_samples, k)
    from ..ir.columns import Batch, DenseArrayColumn
    from ..table import TableStage
    st = mt._stage
    skey = st.col_key
    b = Batch({
        **{kf: st.cols.columns[kf] for kf in skey},
        'scores': DenseArrayColumn(ht.tarray(ht.tfloat64), scores,
                                   np.full(scores.shape[0], L.shape[1], np.int32)),
    }, st.n_cols)
    return Table(TableStage.from_batches(Batch({}, 1), skey, b.row_type, [b]))


def write_multiple(mts, prefix: str, overwrite: bool = False, stage_locally: bool = False):
    for i, mt in enumerate(mts):
        mt.write(f'{prefix}{i}.mt', overwrite=overwrite)


def import_gtf(path: str, reference_genome=None, skip_invalid_contigs: bool = False,
               min_partitions=None, force_bgz: bool = False, force: bool = False) -> Table:
    """Import a GTF as an interval-keyed table (reference
    experimental/import_gtf.py)."""
    from ..methods.impex import _open
    from ..genetics.locus import Locus
    from ..genetics.reference_genome import ReferenceGenome, default_reference
    from ..utils.structs import Interval, Struct
    from ..ir.columns import Batch
    from ..table import TableStage
    rg = None
    if reference_genome is not None:
        rg = ReferenceGenome.get(reference_genome) if isinstance(reference_genome, str) else reference_genome
    rows = []
    attr_keys = set()
    with _open(path) as f:
        for line in f:
            if line.startswith('#'):
                continue
            parts = line.rstrip('\n').split('\t')
            if len(parts) < 9:
                continue
            seqname, source, feature, start, end, score, strand, frame, attrs_s = parts[:9]
            if rg is not None and not rg.has_contig(seqname):
                if skip_invalid_contigs:
                    continue
                raise ValueError(f'invalid contig {seqname!r}')
            attrs = {}
            for item in attrs_s.rstrip(';').split(';'):
                item = item.strip()
                if ' ' in item:
                    k, v = item.split(' ', 1)
                    attrs[k] = v.strip('"')
            attr_keys |= set(attrs)
            rows.append((seqname, int(start), int(end), source, feature, score,
                         strand, frame, attrs))
    out = []
    for (seqname, start, end, source, feature, score, strand, frame, attrs) in rows:
        if rg is not None:
            iv = Interval(Locus(seqname, start, rg), Locus(seqname, end, rg), True, True)
        else:
            iv = Interval(Struct(contig=seqname, position=start),
                          Struct(contig=seqname, position=end), True, True)
        out.append(Struct(interval=iv, source=source, feature=feature,
                          score=None if score == '.' else float(score),
                          strand=strand, frame=None if frame == '.' else int(frame),
                          **{k: attrs.get(k) for k in sorted(attr_keys)}))
    pt = ht.tlocus(rg) if rg is not None else ht.tstruct(contig=ht.tstr, position=ht.tint32)
    row_t = ht.tstruct(interval=ht.tinterval(pt), source=ht.tstr, feature=ht.tstr,
                       score=ht.tfloat64, strand=ht.tstr, frame=ht.tint32,
                       **{k: ht.tstr for k in sorted(attr_keys)})
    return Table(TableStage.from_batches(Batch({}, 1), ['interval'], row_t,
                                         [Batch.from_pylist(row_t, out)]))


def ld_score_regression(*args, **kwargs):
    raise NotImplementedError('ld_score_regression: planned (round 2)')


def ld_score(*args, **kwargs):
    raise NotImplementedError('ld_score: planned (round 2)')


def phase_by_transmission(*args, **kwargs):
    raise NotImplementedError('phase_by_transmission: planned (round 2)')


def load_dataset(name, version, reference_genome, region='us-central1', cloud='gcp'):
    raise NotImplementedError('annotation datasets require cloud access (gated)')
