"""Plotly-shaped figure objects and the ggplot → figure lowering.

The reference's ggplot renders through plotly's graph_objects
(`hail/python/hail/ggplot/ggplot.py to_plotly`). plotly isn't in this
zero-egress image, so `to_plotly()` builds structurally-compatible
lightweight objects: a Figure with `.data` traces and a `.layout`, both
supporting attribute and item access — everything the reference test-suite
(and typical downstream code) reads, without the plotly renderer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np


class AttrMap(dict):
    """dict with attribute access, plotly-graph-object style."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k) from None
        return v

    def __setattr__(self, k, v):
        self[k] = v


class Figure:
    """Minimal plotly.graph_objects.Figure stand-in."""

    def __init__(self):
        self.data: List[AttrMap] = []
        self.layout = AttrMap(xaxis=AttrMap(), yaxis=AttrMap(),
                              annotations=[])

    def __getitem__(self, k):
        if k == 'data':
            return self.data
        if k == 'layout':
            return self.layout
        raise KeyError(k)

    def add_trace(self, **kw):
        self.data.append(AttrMap(**kw))
        return self

    def update_layout(self, **kw):
        self.layout.update(kw)
        return self

    def show(self):
        # headless build: plotly's browser renderer is unavailable
        return self

    def to_dict(self):
        return {'data': [dict(t) for t in self.data],
                'layout': dict(self.layout)}


def _default_colors(n: int) -> List[str]:
    """n visually-spread, guaranteed-distinct categorical colors."""
    base = ['#1f77b4', '#ff7f0e', '#2ca02c', '#d62728', '#9467bd',
            '#8c564b', '#e377c2', '#7f7f7f', '#bcbd22', '#17becf']
    if n <= len(base):
        return base[:n]
    return [f'hsl({(i * 360.0 / n):.2f},70%,45%)' for i in range(n)]


def _group_indices(vals):
    """Ordered distinct group keys → member indices."""
    groups: Dict[Any, List[int]] = {}
    for i, v in enumerate(vals):
        groups.setdefault(v, []).append(i)
    return groups


def to_plotly(plot) -> Figure:
    """Lower a GGPlot to a Figure (reference ggplot/ggplot.py to_plotly)."""
    from .. import types as ht
    from ..genetics.locus import Locus

    fig = Figure()
    base_map = dict(plot.mapping)
    labels = plot.labels
    facets = plot.facet.facets if plot.facet is not None else ()

    # facet panels appear as one annotation per panel (plotly subplot titles)
    if facets:
        fd = plot._collect_aes({}, extra=facets)
        nf = len(facets)
        fkeys = sorted({tuple(fd[f'__facet{i}'][j] for i in range(nf))
                        for j in range(len(fd['__facet0']))},
                       key=lambda t: tuple(str(x) for x in t))
        for fk in fkeys:
            fig.layout.annotations.append(
                AttrMap(text=', '.join(str(k) for k in fk)))

    manual_colors: Optional[List[str]] = None
    for sc in plot.scales:
        if sc.aesthetic in ('color', 'fill') and sc.kind == 'manual':
            manual_colors = list(sc.kwargs.get('values') or [])

    genomic_axis = False
    rg = None

    for geom in plot.geoms:
        kind = geom.kind
        m = dict(base_map)
        m.update(geom.aes or {})

        if kind in ('hline', 'vline'):
            # rendered as layout shapes in plotly; keep as a shape record
            fig.layout.setdefault('shapes', []).append(
                AttrMap(type='line', **geom.kwargs))
            continue

        data = plot._collect_aes(m)
        xs = data.get('x', [])

        # genomic x: loci plot at global position with contig ticks
        if xs and isinstance(next((x for x in xs if x is not None), None), Locus):
            genomic_axis = True
            rg = next(x for x in xs if x is not None).reference_genome
            xs = [None if x is None else
                  x.reference_genome.global_position(x.contig, x.position)
                  for x in xs]
            data = dict(data)
            data['x'] = xs

        group_aes = None
        for k in ('fill', 'color'):
            if k in m and hasattr(m[k], '_ir'):
                group_aes = k
                break

        gvals = data.get(group_aes) if group_aes else None
        groups = _group_indices(gvals) if gvals is not None else {None: list(range(len(xs)))}
        colors = manual_colors if manual_colors is not None else \
            _default_colors(len(groups))

        if kind == 'histogram':
            _add_histogram(fig, data, groups, colors, geom)
            continue

        for gi, (gk, idxs) in enumerate(groups.items()):
            color = colors[gi % len(colors)]
            sub = {k: [v[i] for i in idxs] for k, v in data.items()
                   if isinstance(v, list) and len(v) == len(xs)}
            gx = sub.get('x', [])
            gy = sub.get('y', [])
            tr = AttrMap(name=str(gk) if gk is not None else '',
                         marker=AttrMap(color=color))
            if kind in ('bar',):
                # stat count/weighted-sum by x
                wt = sub.get('weight')
                agg: Dict[Any, float] = {}
                for i, xv in enumerate(gx):
                    agg[xv] = agg.get(xv, 0) + (wt[i] if wt else 1)
                keys = sorted(agg)
                tr.update(type='bar', x=np.asarray(keys, dtype=object),
                          y=np.asarray([agg[k] for k in keys]))
            elif kind in ('col',):
                tr.update(type='bar', x=np.asarray(gx, dtype=object),
                          y=np.asarray(gy, dtype=object))
            elif kind == 'ribbon':
                tr.update(type='scatter', x=np.asarray(gx, dtype=object),
                          y=np.asarray(sub.get('ymax', gy), dtype=object),
                          ymin=np.asarray(sub.get('ymin', []), dtype=object),
                          fill='tonexty')
            elif kind == 'area':
                tr.update(type='scatter', x=np.asarray(gx, dtype=object),
                          y=np.asarray(gy, dtype=object), fill='tozeroy')
            elif kind == 'text':
                tr.update(type='scatter', mode='text',
                          x=np.asarray(gx, dtype=object),
                          y=np.asarray(gy, dtype=object),
                          text=[str(t) for t in sub.get('label', [])])
            elif kind == 'line':
                tr.update(type='scatter', mode='lines',
                          x=np.asarray(gx, dtype=object),
                          y=np.asarray(gy, dtype=object))
            else:  # point and friends
                tr.update(type='scatter', mode='markers',
                          x=np.asarray(gx, dtype=object),
                          y=np.asarray(gy, dtype=object))
            fig.data.append(tr)

    if genomic_axis and rg is not None:
        # ticks for the primary assembly: autosomes through Y, skipping MT
        # and alt/decoy contigs (reference scale_x_genomic tick set)
        last = max((rg.contigs.index(c) for c in (rg.x_contigs + rg.y_contigs)
                    if c in rg._contig_index), default=len(rg.contigs) - 1)
        ticks = [c for c in rg.contigs[:last + 1]
                 if not rg.is_mitochondrial(c)]
        pos = [rg._global_offsets[c] + rg.lengths[c] // 2 for c in ticks]
        fig.layout.xaxis.ticktext = tuple(ticks)
        fig.layout.xaxis.tickvals = tuple(pos)

    if 'title' in labels:
        fig.layout.title = AttrMap(text=labels['title'])
    if 'x' in labels:
        fig.layout.xaxis.title = AttrMap(text=labels['x'])
    if 'y' in labels:
        fig.layout.yaxis.title = AttrMap(text=labels['y'])
    return fig


def _add_histogram(fig, data, groups, colors, geom):
    xs = data['x']
    kw = geom.kwargs or {}
    bins = kw.get('bins') or 30
    lo = kw.get('min_val')
    hi = kw.get('max_val')
    defined = [x for x in xs if x is not None]
    if lo is None:
        lo = min(defined) if defined else 0.0
    if hi is None:
        hi = max(defined) if defined else 1.0
    width = (hi - lo) / bins
    position = kw.get('position', 'stack')
    n_groups = len(groups)
    for gi, (gk, idxs) in enumerate(groups.items()):
        gx = [xs[i] for i in idxs if xs[i] is not None]
        counts = np.zeros(bins)
        for v in gx:
            b = min(int((v - lo) / width), bins - 1) if width else 0
            counts[b] += 1
        if position == 'dodge':
            gw = width / n_groups
            centers = np.arange(lo + gw / 2 + gi * gw, hi, width)
        else:
            centers = np.arange(lo + width / 2, hi, width)
        fig.data.append(AttrMap(
            type='bar', name=str(gk), x=centers[:bins], y=counts,
            marker=AttrMap(color=colors[gi % len(colors)])))
