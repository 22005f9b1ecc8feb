"""hl.ggplot — grammar of graphics over Hail expressions.

Capability parity with reference `hail/python/hail/ggplot/` (plotly-backed
there; matplotlib here — both produce figure objects with `show`/
`write_image`). The full reference `__all__` surface is exported: 14 geoms,
the scale_{x,y,color,fill,shape}_* family, facet_wrap/vars,
coord_cartesian, and labels. Aesthetics are Hail expressions collected in
one pass through the source table/matrix; discrete color/fill aesthetics
group the data and produce a legend, mirroring the reference's
grouped-trace behavior (`ggplot/geoms.py` _add_aesthetics_to_trace).
"""

from __future__ import annotations

import copy
import itertools
from typing import Any, Dict, List, Optional

import numpy as np

from ..expr.expression import Expression, to_expr

__all__ = [
    'Aesthetic', 'FigureAttribute', 'GGPlot', 'aes', 'coord_cartesian',
    'facet_wrap', 'geom_area', 'geom_bar', 'geom_col', 'geom_density',
    'geom_func', 'geom_histogram', 'geom_hline', 'geom_line', 'geom_point',
    'geom_ribbon', 'geom_text', 'geom_tile', 'geom_vline', 'ggplot',
    'ggtitle', 'labs', 'scale_color_continuous', 'scale_color_discrete',
    'scale_color_hue', 'scale_color_identity', 'scale_color_manual',
    'scale_fill_continuous', 'scale_fill_discrete', 'scale_fill_hue',
    'scale_fill_identity', 'scale_fill_manual', 'scale_shape_auto',
    'scale_shape_manual', 'scale_x_continuous', 'scale_x_discrete',
    'scale_x_genomic', 'scale_x_log10', 'scale_x_reverse',
    'scale_y_continuous', 'scale_y_discrete', 'scale_y_log10',
    'scale_y_reverse', 'vars', 'xlab', 'ylab',
]


class Aesthetic(dict):
    """Mapping from aesthetic names (x, y, color, fill, shape, label,
    ymin, ymax, ...) to expressions or literals."""


def aes(**kwargs) -> Aesthetic:
    return Aesthetic(**kwargs)


class FigureAttribute:
    """Base for everything addable to a GGPlot (geoms, scales, labs,
    facets, coords) — reference `ggplot/utils.py` FigureAttribute."""


# ---------------------------------------------------------------------------
# geoms
# ---------------------------------------------------------------------------

class Geom(FigureAttribute):
    kind = ''

    def __init__(self, mapping=None, **kwargs):
        self.aes = mapping or Aesthetic()
        self.kwargs = kwargs


def _mk_geom(kind_name):
    cls = type(f'Geom{kind_name.title()}', (Geom,), {'kind': kind_name})
    return cls


GeomPoint = _mk_geom('point')
GeomLine = _mk_geom('line')
GeomHistogram = _mk_geom('histogram')
GeomBar = _mk_geom('bar')
GeomCol = _mk_geom('col')
GeomArea = _mk_geom('area')
GeomRibbon = _mk_geom('ribbon')
GeomDensity = _mk_geom('density')
GeomText = _mk_geom('text')
GeomTile = _mk_geom('tile')
GeomFunc = _mk_geom('func')
GeomHline = _mk_geom('hline')
GeomVline = _mk_geom('vline')


def geom_point(mapping=None, *, size=None, alpha=None, color=None, **kw):
    return GeomPoint(mapping, size=size, alpha=alpha, color=color, **kw)


def geom_line(mapping=None, *, size=None, color=None, **kw):
    return GeomLine(mapping, size=size, color=color, **kw)


def geom_histogram(mapping=None, *, min_val=None, max_val=None, bins=None,
                   fill=None, color=None, alpha=None, position='stack',
                   size=None):
    return GeomHistogram(mapping, min_val=min_val, max_val=max_val,
                         bins=bins or 30, fill=fill, color=color,
                         alpha=alpha, position=position, size=size)


def geom_bar(mapping=None, *, fill=None, color=None, alpha=None,
             position='stack', size=None):
    return GeomBar(mapping, fill=fill, color=color, alpha=alpha,
                   position=position, size=size)


def geom_col(mapping=None, *, fill=None, color=None, alpha=None,
             position='stack', size=None):
    return GeomCol(mapping, fill=fill, color=color, alpha=alpha,
                   position=position, size=size)


def geom_area(mapping=None, *, fill=None, color=None):
    return GeomArea(mapping, fill=fill, color=color)


def geom_ribbon(mapping=None, *, fill=None, color=None):
    return GeomRibbon(mapping, fill=fill, color=color)


def geom_density(mapping=None, *, k=1000, smoothing=0.5, fill=None,
                 color=None, alpha=None, smoothed=False):
    return GeomDensity(mapping, k=k, smoothing=smoothing, fill=fill,
                       color=color, alpha=alpha, smoothed=smoothed)


def geom_text(mapping=None, *, size=None, alpha=None, color=None):
    return GeomText(mapping, size=size, alpha=alpha, color=color)


def geom_tile(mapping=None, **kw):
    return GeomTile(mapping, **kw)


def geom_func(mapping=None, *, fun=None, color=None):
    return GeomFunc(mapping, fun=fun, color=color)


def geom_hline(yintercept, *, linetype='solid', color=None):
    return GeomHline(None, yintercept=yintercept, linetype=linetype,
                     color=color)


def geom_vline(xintercept, *, linetype='solid', color=None):
    return GeomVline(None, xintercept=xintercept, linetype=linetype,
                     color=color)


# ---------------------------------------------------------------------------
# labels / scales / facets / coords
# ---------------------------------------------------------------------------

class Labs(FigureAttribute):
    def __init__(self, **kwargs):
        self.kwargs = {k: v for k, v in kwargs.items() if v is not None}


def labs(*, title=None, x=None, y=None, color=None, fill=None):
    return Labs(title=title, x=x, y=y, color=color, fill=fill)


def ggtitle(label):
    return Labs(title=label)


def xlab(label):
    return Labs(x=label)


def ylab(label):
    return Labs(y=label)


class Scale(FigureAttribute):
    def __init__(self, aesthetic, kind, **kwargs):
        self.aesthetic = aesthetic      # 'x' | 'y' | 'color' | 'fill' | 'shape'
        self.kind = kind
        self.kwargs = kwargs


def scale_x_continuous(name=None, breaks=None, labels=None, trans=None):
    return Scale('x', trans or 'continuous', name=name, breaks=breaks,
                 labels=labels)


def scale_y_continuous(name=None, breaks=None, labels=None, trans=None):
    return Scale('y', trans or 'continuous', name=name, breaks=breaks,
                 labels=labels)


def scale_x_discrete(name=None, breaks=None, labels=None):
    return Scale('x', 'discrete', name=name, breaks=breaks, labels=labels)


def scale_y_discrete(name=None, breaks=None, labels=None):
    return Scale('y', 'discrete', name=name, breaks=breaks, labels=labels)


def scale_x_log10(name=None):
    return Scale('x', 'log10', name=name)


def scale_y_log10(name=None):
    return Scale('y', 'log10', name=name)


def scale_x_reverse(name=None):
    return Scale('x', 'reverse', name=name)


def scale_y_reverse(name=None):
    return Scale('y', 'reverse', name=name)


def scale_x_genomic(reference_genome, name=None):
    """Genomic x axis: loci render at global position with contig ticks
    (reference `ggplot/scale.py` ScaleXGenomic)."""
    return Scale('x', 'genomic', reference_genome=reference_genome, name=name)


def scale_color_continuous():
    return Scale('color', 'continuous')


def scale_color_discrete():
    return Scale('color', 'discrete')


def scale_color_hue():
    return Scale('color', 'hue')


def scale_color_identity():
    return Scale('color', 'identity')


def scale_color_manual(*, values):
    return Scale('color', 'manual', values=values)


def scale_fill_continuous():
    return Scale('fill', 'continuous')


def scale_fill_discrete():
    return Scale('fill', 'discrete')


def scale_fill_hue():
    return Scale('fill', 'hue')


def scale_fill_identity():
    return Scale('fill', 'identity')


def scale_fill_manual(*, values):
    return Scale('fill', 'manual', values=values)


def scale_shape_auto():
    return Scale('shape', 'auto')


def scale_shape_manual(*, values):
    return Scale('shape', 'manual', values=values)


def vars(*args):
    """Facet variables (reference `ggplot/facets.py` vars): returns the
    tuple of faceting expressions."""
    return tuple(to_expr(a) for a in args)


class FacetWrap(FigureAttribute):
    def __init__(self, facets, ncol=None, nrow=None, scales='fixed'):
        self.facets = facets if isinstance(facets, tuple) else (facets,)
        self.ncol = ncol
        self.nrow = nrow
        self.scales = scales


def facet_wrap(facets, *, ncol=None, nrow=None, scales='fixed'):
    return FacetWrap(facets, ncol=ncol, nrow=nrow, scales=scales)


class CoordCartesian(FigureAttribute):
    def __init__(self, xlim=None, ylim=None):
        self.xlim = xlim
        self.ylim = ylim


def coord_cartesian(xlim=None, ylim=None):
    return CoordCartesian(xlim, ylim)


# ---------------------------------------------------------------------------
# the plot object
# ---------------------------------------------------------------------------

_HUE_PALETTE = ['#F8766D', '#00BA38', '#619CFF', '#F564E3', '#00BFC4',
                '#B79F00', '#DE8C00', '#7CAE00', '#00B4F0', '#C77CFF']

_MPL_LINESTYLE = {'solid': '-', 'dashed': '--', 'dotted': ':',
                  'dotdash': '-.', 'longdash': '--', 'blank': 'None'}


class GGPlot:
    """A composable plot: `ggplot(t, aes(...)) + geom_*() + scale_*() + ...`
    (reference `ggplot/ggplot.py` GGPlot)."""

    def __init__(self, ht, mapping: Aesthetic):
        self.ht = ht
        self.mapping = mapping or Aesthetic()
        self.geoms: List[Geom] = []
        self.labels: Dict[str, str] = {}
        self.scales: List[Scale] = []
        self.facet: Optional[FacetWrap] = None
        self.coord: Optional[CoordCartesian] = None

    # reference name for the source table attr
    @property
    def source(self):
        return self.ht

    def __add__(self, other):
        new = copy.copy(self)
        new.geoms = list(self.geoms)
        new.labels = dict(self.labels)
        new.scales = list(self.scales)
        if isinstance(other, Geom):
            new.geoms.append(other)
        elif isinstance(other, Labs):
            new.labels.update(other.kwargs)
        elif isinstance(other, Scale):
            new.scales.append(other)
        elif isinstance(other, FacetWrap):
            new.facet = other
        elif isinstance(other, CoordCartesian):
            new.coord = other
        elif isinstance(other, Aesthetic):
            # adding an aes() merges into the plot-level mapping
            merged = Aesthetic(self.mapping)
            merged.update(other)
            new.mapping = merged
        else:
            raise TypeError(f'cannot add {type(other).__name__} to a GGPlot')
        return new

    # -- data collection ---------------------------------------------------

    def _collect_aes(self, m: Dict[str, Any], extra=()) -> Dict[str, list]:
        """Collect every expression-valued aesthetic in ONE pass."""
        from .. import expr as _  # noqa: F401
        import hail_tpu as hl
        exprs = {}
        consts = {}
        for k, v in m.items():
            if isinstance(v, Expression):
                exprs[k] = v
            else:
                consts[k] = v
        for i, f in enumerate(extra):
            exprs[f'__facet{i}'] = f
        if not exprs:
            return {k: [v] for k, v in consts.items()}
        src = None
        for e in exprs.values():
            if e._indices.source is not None:
                src = e._indices.source
                break
        if src is None:
            src = self.ht
        struct = hl.struct(**exprs)
        if hasattr(src, '_collect_expr'):
            rows = src._collect_expr(struct)
        else:
            rows = src.rows()._collect_expr(struct)
        out = {k: [r[k] if r is not None else None for r in rows]
               for k in exprs}
        n = len(rows)
        for k, v in consts.items():
            out[k] = [v] * n
        return out

    def _scale_for(self, aesthetic):
        for sc in self.scales:
            if sc.aesthetic == aesthetic:
                return sc
        return None

    # -- rendering ---------------------------------------------------------

    def to_plot(self):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        facets = self.facet.facets if self.facet is not None else ()
        base = dict(self.mapping)
        # facet panel discovery
        if facets:
            fd = self._collect_aes({}, extra=facets)
            fkeys = sorted({tuple(fd[f'__facet{i}'][j] for i in range(len(facets)))
                            for j in range(len(fd['__facet0']))})
            ncol = self.facet.ncol or int(np.ceil(np.sqrt(len(fkeys))))
            nrow = self.facet.nrow or int(np.ceil(len(fkeys) / ncol))
            fig, axes = plt.subplots(nrow, ncol, squeeze=False,
                                     figsize=(4 * ncol, 3 * nrow))
            panels = list(zip(fkeys, axes.flat))
            for ax in list(axes.flat)[len(fkeys):]:
                ax.set_visible(False)
        else:
            fig, ax0 = plt.subplots()
            panels = [(None, ax0)]

        for fkey, ax in panels:
            self._render_panel(ax, base, facets, fkey)
            if fkey is not None:
                ax.set_title(', '.join(str(k) for k in fkey), fontsize=9)

        for _, ax in panels:
            self._apply_scales_coords(ax)
        ax0 = panels[0][1]
        if 'title' in self.labels and not facets:
            ax0.set_title(self.labels['title'])
        elif 'title' in self.labels:
            fig.suptitle(self.labels['title'])
        for _, ax in panels:
            if 'x' in self.labels:
                ax.set_xlabel(self.labels['x'])
            if 'y' in self.labels:
                ax.set_ylabel(self.labels['y'])
        fig.tight_layout()
        return fig

    def _apply_scales_coords(self, ax):
        for sc in self.scales:
            if sc.aesthetic == 'x':
                if sc.kind == 'log10':
                    ax.set_xscale('log')
                elif sc.kind == 'reverse':
                    ax.invert_xaxis()
                if sc.kwargs.get('name'):
                    ax.set_xlabel(sc.kwargs['name'])
                if sc.kwargs.get('breaks') is not None:
                    ax.set_xticks(sc.kwargs['breaks'])
                    if sc.kwargs.get('labels') is not None:
                        ax.set_xticklabels(sc.kwargs['labels'])
            elif sc.aesthetic == 'y':
                if sc.kind == 'log10':
                    ax.set_yscale('log')
                elif sc.kind == 'reverse':
                    ax.invert_yaxis()
                if sc.kwargs.get('name'):
                    ax.set_ylabel(sc.kwargs['name'])
                if sc.kwargs.get('breaks') is not None:
                    ax.set_yticks(sc.kwargs['breaks'])
                    if sc.kwargs.get('labels') is not None:
                        ax.set_yticklabels(sc.kwargs['labels'])
        if self.coord is not None:
            # coord limits respect an inverted (reversed-scale) axis direction
            if self.coord.xlim is not None:
                lo, hi = sorted(self.coord.xlim)
                ax.set_xlim(hi, lo) if ax.xaxis_inverted() else ax.set_xlim(lo, hi)
            if self.coord.ylim is not None:
                lo, hi = sorted(self.coord.ylim)
                ax.set_ylim(hi, lo) if ax.yaxis_inverted() else ax.set_ylim(lo, hi)

    def _color_cycle(self, groups, aesthetic='color'):
        sc = self._scale_for(aesthetic) or self._scale_for('fill')
        if sc is not None and sc.kind == 'manual':
            vals = sc.kwargs['values']
            if isinstance(vals, dict):
                return {g: vals.get(g) for g in groups}
            return {g: vals[i % len(vals)] for i, g in enumerate(groups)}
        if sc is not None and sc.kind == 'identity':
            return {g: g for g in groups}
        return {g: _HUE_PALETTE[i % len(_HUE_PALETTE)]
                for i, g in enumerate(groups)}

    def _render_panel(self, ax, base, facets, fkey):
        for geom in self.geoms:
            m = dict(base)
            m.update(geom.aes or {})
            if geom.kind == 'hline':
                ax.axhline(geom.kwargs['yintercept'],
                           linestyle=_MPL_LINESTYLE.get(
                               geom.kwargs.get('linetype', 'solid'), '-'),
                           color=geom.kwargs.get('color') or 'black')
                continue
            if geom.kind == 'vline':
                ax.axvline(geom.kwargs['xintercept'],
                           linestyle=_MPL_LINESTYLE.get(
                               geom.kwargs.get('linetype', 'solid'), '-'),
                           color=geom.kwargs.get('color') or 'black')
                continue
            if geom.kind == 'func':
                fun = geom.kwargs['fun']
                lo, hi = ax.get_xlim()
                xs = np.linspace(lo, hi, 200)
                ax.plot(xs, [fun(x) for x in xs],
                        color=geom.kwargs.get('color'))
                continue

            data = self._collect_aes(m, extra=facets if fkey is not None else ())
            if fkey is not None:
                nrows = len(next(iter(data.values()), []))
                keep = [j for j in range(nrows)
                        if tuple(data[f'__facet{i}'][j]
                                 for i in range(len(facets))) == fkey]
                data = {k: [v[j] for j in keep] for k, v in data.items()
                        if not k.startswith('__facet')}
            self._render_geom(ax, geom, data)
        handles, labels_ = ax.get_legend_handles_labels()
        if labels_:
            ax.legend(fontsize=8)

    def _render_geom(self, ax, geom, data):
        from ..genetics import Locus
        kind = geom.kind
        x = data.get('x')
        y = data.get('y')
        sc_x = self._scale_for('x')
        if x and isinstance(x[0], Locus):
            if sc_x is not None and sc_x.kind == 'genomic':
                x = [loc.global_position() if loc is not None else None
                     for loc in x]
            else:
                x = [loc.position if loc is not None else None for loc in x]
        group_key = None
        for aes_name in ('color', 'fill'):
            v = data.get(aes_name)
            if v and isinstance(v[0], (str, bool)) and aes_name in \
                    (geom.aes or {}) | self.mapping:
                group_key = aes_name
                break
        if group_key is not None:
            groups = sorted(set(data[group_key]), key=str)
            colors = self._color_cycle(groups, group_key)
            for g in groups:
                idx = [j for j, v in enumerate(data[group_key]) if v == g]
                sub = {k: [v[j] for j in idx] for k, v in data.items()}
                self._draw(ax, geom, sub, color=colors[g], label=str(g))
        else:
            self._draw(ax, geom, data, color=geom.kwargs.get('color')
                       or geom.kwargs.get('fill'))

    def _draw(self, ax, geom, data, color=None, label=None):
        kind = geom.kind
        x = data.get('x')
        y = data.get('y')
        from ..genetics import Locus
        if x and isinstance(x[0], Locus):
            sc_x = self._scale_for('x')
            if sc_x is not None and sc_x.kind == 'genomic':
                x = [loc.global_position() if loc is not None else None
                     for loc in x]
            else:
                x = [loc.position if loc is not None else None for loc in x]
        if kind == 'point':
            ax.scatter(x, y, s=geom.kwargs.get('size') or 12,
                       alpha=geom.kwargs.get('alpha'), c=color, label=label)
        elif kind == 'line':
            order = np.argsort(np.asarray(x, dtype=float))
            ax.plot(np.asarray(x, dtype=float)[order],
                    np.asarray(y, dtype=float)[order],
                    color=color, label=label)
        elif kind == 'histogram':
            vals = [v for v in x if v is not None]
            rng = None
            if geom.kwargs.get('min_val') is not None or \
                    geom.kwargs.get('max_val') is not None:
                vv = np.asarray(vals, dtype=float)
                rng = (geom.kwargs.get('min_val') or vv.min(),
                       geom.kwargs.get('max_val') or vv.max())
            ax.hist(vals, bins=geom.kwargs.get('bins') or 30, range=rng,
                    alpha=geom.kwargs.get('alpha') or (0.6 if label else 1.0),
                    color=color, label=label)
        elif kind in ('bar', 'col'):
            if kind == 'bar' or y is None:
                cats, counts = np.unique([str(v) for v in x],
                                         return_counts=True)
                ax.bar(cats, counts, color=color, label=label)
            else:
                ax.bar([str(v) for v in x], np.asarray(y, dtype=float),
                       color=color, label=label)
        elif kind == 'area':
            order = np.argsort(np.asarray(x, dtype=float))
            xs = np.asarray(x, dtype=float)[order]
            ys = np.asarray(y, dtype=float)[order]
            ax.fill_between(xs, 0, ys, alpha=0.5, color=color, label=label)
        elif kind == 'ribbon':
            ymin = np.asarray(data['ymin'], dtype=float)
            ymax = np.asarray(data['ymax'], dtype=float)
            order = np.argsort(np.asarray(x, dtype=float))
            xs = np.asarray(x, dtype=float)[order]
            ax.fill_between(xs, ymin[order], ymax[order], alpha=0.4,
                            color=color, label=label)
        elif kind == 'density':
            from scipy.stats import gaussian_kde
            vals = np.asarray([v for v in x if v is not None], dtype=float)
            if len(vals) > 1:
                kde = gaussian_kde(vals, bw_method=geom.kwargs.get('smoothing')
                                   or 0.5)
                xs = np.linspace(vals.min(), vals.max(),
                                 min(geom.kwargs.get('k') or 1000, 1000))
                ax.plot(xs, kde(xs), color=color, label=label)
        elif kind == 'text':
            for xi, yi, li in zip(x, y, data.get('label', [''] * len(x))):
                ax.annotate(str(li), (xi, yi),
                            fontsize=geom.kwargs.get('size') or 9,
                            color=color)
        elif kind == 'tile':
            w = data.get('width', [1.0] * len(x))
            h = data.get('height', [1.0] * len(x))
            fills = data.get('fill')
            import matplotlib
            import matplotlib.patches as mpatches
            import matplotlib.colors as mcolors
            numeric_fill = fills and isinstance(fills[0], (int, float)) \
                and not isinstance(fills[0], bool)
            if numeric_fill:
                norm = mcolors.Normalize(min(fills), max(fills))
                cmap = matplotlib.colormaps['viridis']
            for j in range(len(x)):
                fc = (cmap(norm(fills[j])) if numeric_fill
                      else (color or 'steelblue'))
                ax.add_patch(mpatches.Rectangle(
                    (x[j] - w[j] / 2, y[j] - h[j] / 2), w[j], h[j],
                    facecolor=fc))
            ax.autoscale_view()

    def show(self):
        return self.to_plot()

    def write_image(self, path: str):
        self.to_plot().savefig(path)

    def to_plotly(self):
        """Lower to a plotly-shaped Figure (reference ggplot to_plotly);
        see hail_tpu/ggplot/plotlike.py."""
        from .plotlike import to_plotly as _to_plotly
        return _to_plotly(self)


def ggplot(table=None, mapping=None) -> GGPlot:
    return GGPlot(table, mapping or Aesthetic())
