"""Native on-disk format: JSON spec + one .npz per partition.

Replaces the reference's native Table/MatrixTable format (encoded partition
files + B-tree index + JSON metadata, `rvd/AbstractRVDSpec.scala:224`,
`io/index/IndexWriter`): columnar npz parts with hierarchical array names,
partition key bounds in the metadata for interval pruning, object columns
pickled inside the npz.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Dict, List, Optional

import numpy as np

from .. import types as ht
from ..ir import columns as C
from ..ir.columns import (Batch, Column, DenseArrayColumn, LocusColumn,
                          ObjectColumn, PrimitiveColumn, StructColumn)

FORMAT_VERSION = 1


def column_to_arrays(name: str, col: Column, out: Dict[str, np.ndarray]) -> dict:
    """Flatten a column into named arrays; returns a descriptor dict."""
    if isinstance(col, PrimitiveColumn):
        out[f'{name}.v'] = col.values
        d = {'kind': 'prim', 'type': str(col.typ)}
        if col.missing is not None:
            out[f'{name}.m'] = col.missing
            d['missing'] = True
        return d
    if isinstance(col, LocusColumn):
        out[f'{name}.ci'] = col.contig_idx
        out[f'{name}.pos'] = col.position
        d = {'kind': 'locus', 'type': str(col.typ), 'rg': col.rg.name}
        if col.missing is not None:
            out[f'{name}.m'] = col.missing
            d['missing'] = True
        return d
    if isinstance(col, StructColumn):
        d = {'kind': 'struct', 'type': str(col.typ), 'shape': list(col.shape), 'fields': {}}
        for k, c in col.fields.items():
            d['fields'][k] = column_to_arrays(f'{name}.f.{k}', c, out)
        if col.missing is not None:
            out[f'{name}.m'] = col.missing
            d['missing'] = True
        return d
    if isinstance(col, DenseArrayColumn):
        out[f'{name}.v'] = col.values
        out[f'{name}.len'] = col.lengths
        d = {'kind': 'dense_array', 'type': str(col.typ)}
        if col.elem_missing is not None:
            out[f'{name}.em'] = col.elem_missing
            d['elem_missing'] = True
        if col.missing is not None:
            out[f'{name}.m'] = col.missing
            d['missing'] = True
        return d
    if isinstance(col, ObjectColumn):
        out[f'{name}.obj'] = np.frombuffer(pickle.dumps(list(col.values.ravel())), dtype=np.uint8)
        return {'kind': 'object', 'type': str(col.typ), 'shape': list(col.shape)}
    raise TypeError(type(col))


def column_from_arrays(name: str, desc: dict, arrs) -> Column:
    kind = desc['kind']
    typ = ht.dtype(desc['type'])
    if kind == 'prim':
        return PrimitiveColumn(typ, arrs[f'{name}.v'],
                               arrs[f'{name}.m'] if desc.get('missing') else None)
    if kind == 'locus':
        return LocusColumn(typ, arrs[f'{name}.ci'], arrs[f'{name}.pos'],
                           arrs[f'{name}.m'] if desc.get('missing') else None)
    if kind == 'struct':
        fields = {k: column_from_arrays(f'{name}.f.{k}', d, arrs)
                  for k, d in desc['fields'].items()}
        return StructColumn(typ, fields,
                            arrs[f'{name}.m'] if desc.get('missing') else None,
                            tuple(desc['shape']))
    if kind == 'dense_array':
        return DenseArrayColumn(typ, arrs[f'{name}.v'], arrs[f'{name}.len'],
                                arrs[f'{name}.em'] if desc.get('elem_missing') else None,
                                arrs[f'{name}.m'] if desc.get('missing') else None)
    if kind == 'object':
        vals = pickle.loads(arrs[f'{name}.obj'].tobytes())
        arr = np.empty(len(vals), dtype=object)
        arr[:] = vals
        return ObjectColumn(typ, arr.reshape(tuple(desc['shape'])))
    raise ValueError(kind)


def write_batch(batch: Batch, path: str) -> dict:
    arrs: Dict[str, np.ndarray] = {}
    descs = {}
    for k, col in batch.columns.items():
        descs[k] = column_to_arrays(k, col, arrs)
    np.savez_compressed(path, **arrs)
    return {'columns': descs, 'length': batch.length}


def read_batch(path: str, desc: dict, fields: Optional[list] = None) -> Batch:
    """Load a partition; `fields` restricts to a column subset (projection
    pushdown — npz members are decompressed per-array, so unselected columns
    are never read; reference equivalent: PruneDeadFields-driven reads)."""
    with np.load(path, allow_pickle=False) as arrs:
        cols = {k: column_from_arrays(k, d, arrs)
                for k, d in desc['columns'].items()
                if fields is None or k in fields}
    return Batch(cols, desc['length'])


def _partition_bounds(batch: Batch, key) -> Optional[list]:
    """[min_gpos, max_gpos] for locus-first-keyed batches (interval pruning;
    reference partitioner rangeBounds, rvd/RVDPartitioner.scala:18)."""
    if not key:
        return None
    col = batch.columns.get(key[0])
    if isinstance(col, LocusColumn) and batch.length:
        gp = col.global_position()
        return [int(gp.min()), int(gp.max())]
    if isinstance(col, PrimitiveColumn) and batch.length and col.missing is None \
        and col.values.dtype.kind in 'if':
        return [float(col.values.min()), float(col.values.max())]
    return None


def _prepare_dir(path: str, overwrite: bool):
    if os.path.exists(path):
        if not overwrite:
            raise ValueError(f'path exists: {path} (use overwrite=True)')
        shutil.rmtree(path)
    os.makedirs(os.path.join(path, 'parts'), exist_ok=True)


def write_table(table, path: str, overwrite: bool = False) -> None:
    _prepare_dir(path, overwrite)
    st = table._stage
    batches = st.collect_batches()
    part_descs = []
    for i, b in enumerate(batches):
        d = write_batch(b, os.path.join(path, 'parts', f'part-{i:05d}.npz'))
        d['bounds'] = _partition_bounds(b, st.key)
        part_descs.append(d)
    g_arrs: Dict[str, np.ndarray] = {}
    g_descs = {k: column_to_arrays(k, c, g_arrs) for k, c in st.globals.columns.items()}
    np.savez_compressed(os.path.join(path, 'globals.npz'), **g_arrs)
    meta = {
        'format_version': FORMAT_VERSION,
        'kind': 'table',
        'row_type': str(st.row_type),
        'globals_type': str(st.globals_type),
        'globals': {'columns': g_descs, 'length': 1},
        'key': st.key,
        'n_partitions': len(batches),
        'partitions': part_descs,
    }
    with open(os.path.join(path, 'metadata.json'), 'w') as f:
        json.dump(meta, f)


def read_table(path: str):
    from ..table import Table, TableStage
    from .hail_format import is_hail_native, read_hail_table
    if is_hail_native(path):
        # a directory written by the reference Hail (metadata.json.gz +
        # EType-encoded parts) — decode via the compatibility reader
        return read_hail_table(path)
    with open(os.path.join(path, 'metadata.json')) as f:
        meta = json.load(f)
    row_t = ht.dtype(meta['row_type'])
    with np.load(os.path.join(path, 'globals.npz'), allow_pickle=False) as arrs:
        g_cols = {k: column_from_arrays(k, d, arrs)
                  for k, d in meta['globals']['columns'].items()}
    g = Batch(g_cols, 1)
    parts = meta['partitions']
    bounds = [p.get('bounds') for p in parts]
    bounds = bounds if any(b is not None for b in bounds) else None

    def make_stage(fields: Optional[list]):
        sel_t = row_t if fields is None else ht.tstruct.from_fields(
            [(k, t) for k, t in row_t.fields.items() if k in fields])

        def pf(i):
            return read_batch(os.path.join(path, 'parts', f'part-{i:05d}.npz'),
                              parts[i], fields)
        import hashlib
        stat = os.stat(os.path.join(path, 'metadata.json'))
        lineage = hashlib.blake2b(
            f'read_table|{os.path.abspath(path)}|{stat.st_mtime_ns}|'
            f'{stat.st_size}|{sorted(fields) if fields else "*"}'.encode(),
            digest_size=16).hexdigest()
        lens = [p.get('length', 0) for p in parts]
        st = TableStage(g, meta['key'], sel_t, list(range(len(parts))), pf,
                        bounds, lineage=lineage,
                        uid_bases=list(np.cumsum([0] + lens[:-1]).astype(int)))

        def prune(required):
            req = set(required) | set(meta['key'])
            if fields is not None:
                req &= set(fields)
            return make_stage([k for k in row_t.fields if k in req])
        st.prune_columns = prune
        return st

    return Table(make_stage(None))


# -- matrix table ----------------------------------------------------------

def write_matrix_table(mt, path: str, overwrite: bool = False) -> None:
    _prepare_dir(path, overwrite)
    st = mt._stage
    mbatches = st.collect_batches()
    part_descs = []
    for i, mb in enumerate(mbatches):
        arrs: Dict[str, np.ndarray] = {}
        row_descs = {k: column_to_arrays(f'r.{k}', c, arrs) for k, c in mb.rows.columns.items()}
        ent_descs = {k: column_to_arrays(f'e.{k}', c, arrs) for k, c in mb.entries.items()}
        desc = {'rows': {'columns': row_descs, 'length': mb.n_rows},
                'entries': ent_descs, 'n_rows': mb.n_rows,
                'bounds': _partition_bounds(mb.rows, st.row_key)}
        if mb.entry_missing is not None:
            # FILTERED-entry mask (distinct from per-field missing)
            arrs['entry_filtered'] = mb.entry_missing
            desc['entry_filtered'] = True
        np.savez_compressed(os.path.join(path, 'parts', f'part-{i:05d}.npz'), **arrs)
        part_descs.append(desc)
    c_arrs: Dict[str, np.ndarray] = {}
    c_descs = {k: column_to_arrays(k, c, c_arrs) for k, c in st.cols.columns.items()}
    np.savez_compressed(os.path.join(path, 'cols.npz'), **c_arrs)
    g_arrs: Dict[str, np.ndarray] = {}
    g_descs = {k: column_to_arrays(k, c, g_arrs) for k, c in st.globals.columns.items()}
    np.savez_compressed(os.path.join(path, 'globals.npz'), **g_arrs)
    meta = {
        'format_version': FORMAT_VERSION,
        'kind': 'matrix_table',
        'row_type': str(st.row_type),
        'col_type': str(st.col_type),
        'entry_type': str(st.entry_type),
        'globals_type': str(st.globals_type),
        'row_key': st.row_key,
        'col_key': st.col_key,
        'n_cols': st.n_cols,
        'cols': {'columns': c_descs, 'length': st.n_cols},
        'globals': {'columns': g_descs, 'length': 1},
        'n_partitions': len(mbatches),
        'partitions': part_descs,
    }
    with open(os.path.join(path, 'metadata.json'), 'w') as f:
        json.dump(meta, f)


def read_matrix_table(path: str):
    from ..matrixtable import MatrixTable, MatrixStage, MatrixBatch
    from .hail_format import is_hail_native, read_hail_matrix_table
    if is_hail_native(path):
        return read_hail_matrix_table(path)
    with open(os.path.join(path, 'metadata.json')) as f:
        meta = json.load(f)
    row_t = ht.dtype(meta['row_type'])
    entry_t = ht.dtype(meta['entry_type'])
    with np.load(os.path.join(path, 'cols.npz'), allow_pickle=False) as arrs:
        c_cols = {k: column_from_arrays(k, d, arrs) for k, d in meta['cols']['columns'].items()}
    cols = Batch(c_cols, meta['n_cols'])
    with np.load(os.path.join(path, 'globals.npz'), allow_pickle=False) as arrs:
        g_cols = {k: column_from_arrays(k, d, arrs)
                  for k, d in meta['globals']['columns'].items()}
    g = Batch(g_cols, 1)
    parts = meta['partitions']
    bounds = [p.get('bounds') for p in parts]
    bounds = bounds if any(b is not None for b in bounds) else None

    def make_stage(row_fields: Optional[list], entry_fields: Optional[list]):
        sel_row_t = row_t if row_fields is None else ht.tstruct.from_fields(
            [(k, t) for k, t in row_t.fields.items() if k in row_fields])
        sel_ent_t = entry_t if entry_fields is None else ht.tstruct.from_fields(
            [(k, t) for k, t in entry_t.fields.items() if k in entry_fields])

        def pf(i):
            d = parts[i]
            with np.load(os.path.join(path, 'parts', f'part-{i:05d}.npz'),
                         allow_pickle=False) as arrs:
                rows = Batch({k: column_from_arrays(f'r.{k}', rd, arrs)
                              for k, rd in d['rows']['columns'].items()
                              if row_fields is None or k in row_fields},
                             d['n_rows'])
                entries = {k: column_from_arrays(f'e.{k}', ed, arrs)
                           for k, ed in d['entries'].items()
                           if entry_fields is None or k in entry_fields}
                filt = np.asarray(arrs['entry_filtered']) \
                    if d.get('entry_filtered') else None
            return MatrixBatch(rows, entries, filt)

        stage = MatrixStage(g, cols, meta['row_key'], meta['col_key'],
                            sel_row_t, ht.dtype(meta['col_type']), sel_ent_t,
                            list(range(len(parts))), pf, bounds)

        def prune(row_req=None, entry_req=None):
            rr = None if row_req is None else \
                (set(row_req) | set(meta['row_key'])) & \
                (set(row_fields) if row_fields is not None else set(row_t.fields))
            er = None if entry_req is None else \
                set(entry_req) & (set(entry_fields) if entry_fields is not None
                                  else set(entry_t.fields))
            return make_stage(
                row_fields if rr is None else [k for k in row_t.fields if k in rr],
                entry_fields if er is None else [k for k in entry_t.fields if k in er])
        stage.prune_matrix = prune
        return stage

    return MatrixTable(make_stage(None, None))


# ---------------------------------------------------------------------------
# point/interval queries against on-disk formats without a full read
# (reference hl.query_table / hl.query_matrix_table_rows, backed there by the
# B-tree index — here by the partition key bounds)
# ---------------------------------------------------------------------------

def _interval_gpos(q):
    from ..utils.structs import Interval
    if isinstance(q, Interval):
        s_, e_ = q.start, q.end
        lo = s_.global_position() if hasattr(s_, 'global_position') else s_
        hi = e_.global_position() if hasattr(e_, 'global_position') else e_
        return lo, hi, q.includes_start, q.includes_end
    p = q.global_position() if hasattr(q, 'global_position') else q
    return p, p, True, True


def query_table(path: str, query):
    """Rows of a written Table whose key matches the point/interval `query`,
    reading only the partitions whose bounds intersect it."""
    from .. import table as table_mod
    t = table_mod.read_table(path)
    lo, hi, inc_s, inc_e = _interval_gpos(query)
    st = t._stage
    keep = list(range(st.n_partitions))
    if st.partition_bounds is not None:
        keep = [i for i, b in enumerate(st.partition_bounds)
                if b is None or not (b[1] < lo or b[0] > hi)]
    out = []
    key0 = st.key[0]
    for i in keep:
        batch = st.partition_fn(st.contexts[i])
        col = batch.columns[key0]
        gp = col.global_position() if isinstance(col, LocusColumn) else \
            np.asarray(col.values, dtype=np.float64)
        mask = ((gp > lo) | ((gp == lo) & inc_s)) & ((gp < hi) | ((gp == hi) & inc_e))
        out.extend(batch.compress(mask).to_pylist())
    return out


def query_matrix_table_rows(path: str, query, entries_name: str = 'entries'):
    """Row structs (+ localized entries array) of a written MatrixTable
    matching the point/interval query (reference hl.query_matrix_table_rows)."""
    from ..matrixtable import read_matrix_table
    from ..utils.structs import Struct
    mt = read_matrix_table(path)
    lo, hi, inc_s, inc_e = _interval_gpos(query)
    st = mt._stage
    keep = list(range(len(st.contexts)))
    if st.partition_bounds is not None:
        keep = [i for i, b in enumerate(st.partition_bounds)
                if b is None or not (b[1] < lo or b[0] > hi)]
    key0 = st.row_key[0]
    out = []
    for i in keep:
        mb = st.partition_fn(st.contexts[i])
        col = mb.rows.columns[key0]
        gp = col.global_position() if isinstance(col, LocusColumn) else \
            np.asarray(col.values, dtype=np.float64)
        mask = ((gp > lo) | ((gp == lo) & inc_s)) & ((gp < hi) | ((gp == hi) & inc_e))
        sel = np.where(mask)[0]
        if not len(sel):
            continue
        sub = mb.gather_rows(sel)
        rows_py = sub.rows.to_pylist()
        ent_py = {k: C.to_object(c).values for k, c in sub.entries.items()}
        for r_i, r in enumerate(rows_py):
            ents = [Struct(**{k: ent_py[k][r_i, j] for k in ent_py})
                    for j in range(st.n_cols)]
            out.append(Struct(**dict(r), **{entries_name: ents}))
    return out
