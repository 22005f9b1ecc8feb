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
from ..utils.structs import Struct


def full_outer_join_mt(left: MatrixTable, right: MatrixTable) -> MatrixTable:
    """Full outer join on both axes: rows = union of row keys, cols = union
    of col keys, entries {left_entry, right_entry} (reference
    experimental/full_outer_join_mt.py)."""
    from ..ir import columns as C
    from ..ir.columns import Batch, StructColumn
    from ..matrixtable import MatrixBatch, MatrixStage, _concat_matrix_batches
    from ..table import _hashable_key, _key_tuples
    lst, rst = left._stage, right._stage
    lmb = _concat_matrix_batches(lst.collect_batches(), lst)
    rmb = _concat_matrix_batches(rst.collect_batches(), rst)
    # row union
    lkeys = [_hashable_key(k) for k in _key_tuples(lmb.rows, lst.row_key)]
    rkeys = [_hashable_key(k) for k in _key_tuples(rmb.rows, rst.row_key)]
    rmap = {k: i for i, k in enumerate(rkeys)}
    lmap = {k: i for i, k in enumerate(lkeys)}
    def skey(kt):
        out = []
        for v in kt:
            if hasattr(v, 'global_position'):
                out.append((0, v.global_position()))
            elif isinstance(v, tuple):
                out.append((1, tuple(str(x) for x in v)))
            else:
                out.append((2, str(v)))
        return tuple(out)
    union_rows = sorted(set(lkeys) | set(rkeys), key=skey)
    # col union
    lckeys = [_hashable_key(k) for k in _key_tuples(lst.cols, lst.col_key)]
    rckeys = [_hashable_key(k) for k in _key_tuples(rst.cols, rst.col_key)]
    lcmap = {k: i for i, k in enumerate(lckeys)}
    rcmap = {k: i for i, k in enumerate(rckeys)}
    union_cols = list(dict.fromkeys(lckeys + rckeys))
    R, Cn = len(union_rows), len(union_cols)

    def gather_entries(mb, st, rowmap, colmap):
        ridx = np.asarray([rowmap.get(k2, 0) for k2 in union_rows], dtype=np.int64)
        rmiss = np.asarray([k2 not in rowmap for k2 in union_rows])
        cidx = np.asarray([colmap.get(k2, 0) for k2 in union_cols], dtype=np.int64)
        cmiss = np.asarray([k2 not in colmap for k2 in union_cols])
        ents = {}
        for k2, c2 in mb.entries.items():
            g = c2.gather(ridx, axis=0).gather(cidx, axis=1)
            miss = rmiss[:, None] | cmiss[None, :]
            ents[k2] = g.with_missing(miss.copy()) if miss.any() else g
        return StructColumn(st.entry_type, ents, None, (R, Cn)) if ents else \
            StructColumn(st.entry_type, {}, None, (R, Cn))
    left_entry = gather_entries(lmb, lst, lmap, lcmap)
    right_entry = gather_entries(rmb, rst, rmap, rcmap)
    # row fields from whichever side has the key
    row_vals = []
    for kt in union_rows:
        if kt in lmap:
            i = lmap[kt]
            row_vals.append(Struct(**{f: lmb.rows.columns[f].to_pylist()[i]
                                      for f in lst.row_type.fields}))
        else:
            i = rmap[kt]
            base = {f: None for f in lst.row_type.fields}
            for f in lst.row_key:
                if f in rst.row_type.fields:
                    base[f] = rmb.rows.columns[f].to_pylist()[i]
            row_vals.append(Struct(**base))
    rows = Batch.from_pylist(lst.row_type, row_vals)
    col_vals = []
    for kt in union_cols:
        if kt in lcmap:
            i = lcmap[kt]
            col_vals.append(Struct(**{f: lst.cols.columns[f].to_pylist()[i]
                                      for f in lst.col_type.fields}))
        else:
            i = rcmap[kt]
            base = {f: None for f in lst.col_type.fields}
            for f in lst.col_key:
                base[f] = rst.cols.columns[f].to_pylist()[i]
            col_vals.append(Struct(**base))
    cols = Batch.from_pylist(lst.col_type, col_vals)
    entry_t = ht.tstruct(left_entry=lst.entry_type, right_entry=rst.entry_type)
    mb = MatrixBatch(rows, {'left_entry': left_entry, 'right_entry': right_entry})
    return MatrixTable(MatrixStage.from_batches(
        lst.globals, cols, lst.row_key, lst.col_key, lst.row_type,
        lst.col_type, entry_t, [mb]))


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


def ld_score(entry_expr, locus_expr, radius, coord_expr=None,
             annotation_exprs=None, block_size=None) -> Table:
    """Univariate LD scores: per variant, sum of r² with variants within
    `radius` bp (reference experimental/ld_score.py)."""
    from ..methods.statgen import _entry_expr_to_blocks
    from ..expr.expression import to_expr
    from ..ir.columns import Batch, PrimitiveColumn
    from ..table import TableStage
    e = to_expr(entry_expr)
    mt = e._indices.source
    G, M = _entry_expr_to_blocks(e)
    cnt = (~M).sum(axis=1)
    s_ = np.where(M, 0, G).sum(axis=1)
    mean = np.where(cnt > 0, s_ / np.maximum(cnt, 1), 0.0)
    G = np.where(M, mean[:, None], G)
    centered = G - G.mean(axis=1, keepdims=True)
    ss = np.sqrt((centered * centered).sum(axis=1, keepdims=True))
    Z = np.where(ss > 0, centered / np.where(ss > 0, ss, 1), 0.0)
    le = to_expr(locus_expr)
    gpos = []
    for i, ctx in enumerate(mt._stage.contexts):
        mb = mt._stage.partition_fn(ctx)
        env = mt._row_env(mb, i)
        col = le._ir.evaluate(env)
        gpos.append(np.asarray(col.global_position()))
    gp = np.concatenate(gpos)
    n = G.shape[1]
    import jax.numpy as jnp
    r = np.asarray(jnp.asarray(Z) @ jnp.asarray(Z).T)
    r2 = r * r
    # adjusted r2 (unbiased): r2_adj = r2 - (1 - r2)/(n - 2)
    r2 = r2 - (1 - r2) / max(n - 2, 1)
    mask = np.abs(gp[:, None] - gp[None, :]) <= radius
    scores = (r2 * mask).sum(axis=1)
    rows_b = mt.rows()._stage.collect_single()
    key_fields = mt._stage.row_key
    cols = {k: rows_b.columns[k] for k in key_fields}
    cols['ld_score'] = PrimitiveColumn(ht.tfloat64, scores)
    row_t = ht.tstruct(**{k: c.typ for k, c in cols.items()})
    return Table(TableStage.from_batches(Batch({}, 1), key_fields, row_t,
                                         [Batch(cols, rows_b.length)]))


def ld_score_regression(weight_expr, ld_score_expr, chi_sq_exprs,
                        n_samples_exprs, n_blocks: int = 200,
                        two_step_threshold: int = 30,
                        n_reference_panel_variants=None) -> Table:
    """LD score regression: h² and intercept from chi² ~ N·l/M (reference
    experimental/ldscore_regression.py), with block-jackknife SEs."""
    from ..expr.expression import to_expr
    from ..ir.columns import Batch
    from ..table import TableStage
    we = to_expr(weight_expr)
    src = we._indices.source
    def collect_f(expr):
        e2 = to_expr(expr)
        vals = (src.rows()._collect_expr(src.rows()._rebind(e2))
                if hasattr(src, 'rows') and not hasattr(src, '_collect_expr')
                else src._collect_expr(e2))
        return np.asarray([np.nan if v is None else float(v) for v in vals])
    chis = chi_sq_exprs if isinstance(chi_sq_exprs, (list, tuple)) else [chi_sq_exprs]
    ns = n_samples_exprs if isinstance(n_samples_exprs, (list, tuple)) else [n_samples_exprs]
    w = collect_f(weight_expr)
    l = collect_f(ld_score_expr)
    out_rows = []
    for pi, (ce, ne) in enumerate(zip(chis, ns)):
        chi2 = collect_f(ce)
        n_s = collect_f(ne)
        ok = np.isfinite(chi2) & np.isfinite(l) & np.isfinite(w) & np.isfinite(n_s) & (w > 0)
        chi2, lk, wk, nk = chi2[ok], l[ok], w[ok], n_s[ok]
        M = len(lk)
        if M < 3:
            out_rows.append(Struct(phenotype=pi, mean_chi_sq=None,
                                   intercept=Struct(estimate=None, standard_error=None),
                                   snp_heritability=Struct(estimate=None, standard_error=None)))
            continue
        x = nk * lk / M
        X = np.stack([np.ones(M), x], axis=1)
        weights = 1.0 / np.maximum(wk, 1e-12)
        XtWX = (X * weights[:, None]).T @ X
        XtWy = (X * weights[:, None]).T @ chi2
        beta = np.linalg.solve(XtWX, XtWy)
        # block jackknife
        nb = min(n_blocks, M)
        idx_blocks = np.array_split(np.arange(M), nb)
        est = []
        for b in idx_blocks:
            m2 = np.ones(M, dtype=bool)
            m2[b] = False
            Xb, yb, wb = X[m2], chi2[m2], weights[m2]
            bb = np.linalg.solve((Xb * wb[:, None]).T @ Xb, (Xb * wb[:, None]).T @ yb)
            est.append(bb)
        est = np.asarray(est)
        se = np.sqrt((nb - 1) / nb * ((est - est.mean(0)) ** 2).sum(0))
        out_rows.append(Struct(
            phenotype=pi, mean_chi_sq=float(chi2.mean()),
            intercept=Struct(estimate=float(beta[0]), standard_error=float(se[0])),
            snp_heritability=Struct(estimate=float(beta[1]), standard_error=float(se[1]))))
    row_t = ht.tstruct(
        phenotype=ht.tint32, mean_chi_sq=ht.tfloat64,
        intercept=ht.tstruct(estimate=ht.tfloat64, standard_error=ht.tfloat64),
        snp_heritability=ht.tstruct(estimate=ht.tfloat64, standard_error=ht.tfloat64))
    from ..ir.columns import Batch as B2
    return Table(__import__('hail_tpu.table', fromlist=['TableStage']).TableStage.from_batches(
        B2({}, 1), ['phenotype'], row_t, [B2.from_pylist(row_t, out_rows)]))


def phase_by_transmission(locus, alleles, c, tm=None):
    """Phase trio genotypes by transmission (reference
    experimental/phase_by_transmission.py): returns an array
    [phased_mother, phased_father, phased_proband] where unambiguous."""
    from ..genetics.call import Call
    le = to_expr(locus)
    ae = to_expr(alleles)
    ce = to_expr(c)
    t = ht.tarray(ht.tcall)

    def phase(l, al, calls):
        if calls is None:
            return None
        mother, father, child = calls
        if mother is None or father is None or child is None:
            return None
        if not (mother.is_diploid() and father.is_diploid() and child.is_diploid()):
            return None
        ma, fa, ca = set(mother.alleles), set(father.alleles), child.alleles
        # determine which child allele came from which parent
        options = []
        for a1, a2 in [(ca[0], ca[1]), (ca[1], ca[0])]:
            if a1 in ma and a2 in fa:
                options.append((a1, a2))
        options = list(dict.fromkeys(options))
        if len(options) != 1:
            return None
        from_m, from_f = options[0]
        def phase_parent(p, transmitted):
            als = p.alleles
            if transmitted in als:
                other = als[1] if als[0] == transmitted else als[0]
                return Call([transmitted, other], phased=True)
            return None
        pm = phase_parent(mother, from_m)
        pf = phase_parent(father, from_f)
        pc = Call([from_m, from_f], phased=True)
        if pm is None or pf is None:
            return None
        return [pm, pf, pc]

    return F._apply('phase_by_transmission', t, F._obj_impl_lenient(
        t, lambda l, a, calls: phase(l, a, calls)), le, ae, ce)


from .datasets import load_dataset  # noqa: E402


def simulate_phenotypes(mt, genotype, h2, pi=1.0, rg=None, annot=None,
                        popstrat=None, popstrat_var=None, exact_h2=False):
    """Simulate phenotypes with target heritability (reference
    experimental/ldscsim.py simulate_phenotypes): beta ~ N(0, h2/M) on a
    `pi` fraction of causal variants, environmental noise to 1-h2."""
    from ..methods.statgen import _entry_expr_to_blocks
    from ..context import Env
    ge = to_expr(genotype)
    src = ge._indices.source
    G, M = _entry_expr_to_blocks(ge)
    Mv, n = G.shape
    rng = np.random.default_rng(Env.next_seed())
    cnt = (~M).sum(axis=1)
    s_ = np.where(M, 0, G).sum(axis=1)
    mean = np.where(cnt > 0, s_ / np.maximum(cnt, 1), 0.0)
    G = np.where(M, mean[:, None], G)
    sd = G.std(axis=1)
    ok = sd > 0
    Z = np.where(ok[:, None], (G - mean[:, None]) / np.where(ok, sd, 1)[:, None], 0.0)
    causal = rng.random(Mv) < pi
    m_causal = max(int(causal.sum()), 1)
    beta = np.where(causal, rng.normal(0, np.sqrt(h2 / m_causal), Mv), 0.0)
    g_comp = Z.T @ beta
    if exact_h2 and g_comp.std() > 0:
        g_comp = g_comp * np.sqrt(h2) / g_comp.std()
    e_comp = rng.normal(0, np.sqrt(max(1 - h2, 0)), n)
    y = g_comp + e_comp
    from ..ir.columns import PrimitiveColumn
    from ..matrixtable import MatrixStage
    st = src._stage
    cb = st.cols.annotate(y=PrimitiveColumn(ht.tfloat64, y))
    out = MatrixTable(MatrixStage(st.globals, cb, st.row_key, st.col_key,
                                  st.row_type, cb.row_type, st.entry_type,
                                  st.contexts, st.partition_fn))
    # per-row betas as a row annotation
    batches = []
    off = 0
    from ..matrixtable import MatrixBatch
    for ctx in st.contexts:
        mb = st.partition_fn(ctx)
        col = PrimitiveColumn(ht.tfloat64, beta[off:off + mb.n_rows])
        off += mb.n_rows
        batches.append(MatrixBatch(mb.rows.annotate(beta=col), mb.entries))
    return MatrixTable(MatrixStage.from_batches(
        st.globals, cb, st.row_key, st.col_key,
        st.row_type._insert_field('beta', ht.tfloat64), cb.row_type,
        st.entry_type, batches))


def cached(path: str, make, overwrite: bool = False):
    """Compute-or-load: the explicit form of the reference's fast-restart
    execution cache (`backend/ExecutionCache.scala`) — if `path` exists,
    read it; otherwise call `make()`, write, and read back."""
    import os
    from .. import read_matrix_table, read_table
    from ..matrixtable import MatrixTable as MT
    from ..table import Table as T
    if os.path.exists(path) and not overwrite:
        with __import__('builtins').open(os.path.join(path, 'metadata.json')) as f:
            import json as _json
            kind = _json.load(f).get('kind')
        return read_matrix_table(path) if kind == 'matrix_table' else read_table(path)
    obj = make()
    obj.write(path, overwrite=True)
    return read_matrix_table(path) if isinstance(obj, MT) else read_table(path)


from .extras import (gather, spread, separate, strftime, strptime,
                     write_expression, read_expression, define_function, loop,
                     filtering_allele_frequency, haplotype_freq_em,
                     explode_trio_matrix, phase_trio_matrix_by_transmission,
                     densify, sparse_split_multi, export_entries_by_col,
                     mt_to_table_of_ndarray, block_matrices_tofiles,
                     export_block_matrices, write_block_matrices,
                     write_matrix_tables, plot_roc_curve, hail_metadata,
                     get_gene_intervals, Function)
from .datasets import DB, get_datasets_metadata
from ..context import init  # reference experimental re-exports init
