"""hl.ggplot — grammar-of-graphics over matplotlib.

Reference `hail/python/hail/ggplot/` (plotly-backed there). Round-1: core
verbs (ggplot, aes, geom_point/line/histogram/bar, labs) sufficient for the
common docs examples; full scale/facet system in a later round.
"""

from __future__ import annotations

import numpy as np

from ..expr.expression import Expression, to_expr


class Aesthetic(dict):
    pass


def aes(**kwargs) -> Aesthetic:
    return Aesthetic(**kwargs)


class Geom:
    def __init__(self, aes=None, **kwargs):
        self.aes = aes or Aesthetic()
        self.kwargs = kwargs


class GeomPoint(Geom):
    kind = 'point'


class GeomLine(Geom):
    kind = 'line'


class GeomHistogram(Geom):
    kind = 'histogram'


class GeomBar(Geom):
    kind = 'bar'


class GeomCol(Geom):
    kind = 'col'


def geom_point(mapping=None, **kwargs):
    return GeomPoint(mapping, **kwargs)


def geom_line(mapping=None, **kwargs):
    return GeomLine(mapping, **kwargs)


def geom_histogram(mapping=None, bins=30, **kwargs):
    return GeomHistogram(mapping, bins=bins, **kwargs)


def geom_bar(mapping=None, **kwargs):
    return GeomBar(mapping, **kwargs)


def geom_col(mapping=None, **kwargs):
    return GeomCol(mapping, **kwargs)


class Labs:
    def __init__(self, **kwargs):
        self.kwargs = kwargs


def labs(**kwargs):
    return Labs(**kwargs)


def ggtitle(title):
    return Labs(title=title)


def xlab(label):
    return Labs(x=label)


def ylab(label):
    return Labs(y=label)


class GGPlot:
    def __init__(self, source, mapping: Aesthetic):
        self.source = source
        self.mapping = mapping
        self.geoms = []
        self.labels = {}

    def __add__(self, other):
        import copy
        new = copy.copy(self)
        new.geoms = list(self.geoms)
        new.labels = dict(self.labels)
        if isinstance(other, Geom):
            new.geoms.append(other)
        elif isinstance(other, Labs):
            new.labels.update(other.kwargs)
        elif isinstance(other, Scale):
            new.scales = getattr(self, 'scales', []) + [other]
        elif isinstance(other, FacetWrap):
            new.facet = other
        return new

    def _collect(self, expr):
        e = to_expr(expr)
        src = e._indices.source or self.source
        if hasattr(src, '_collect_expr'):
            return src._collect_expr(e)
        return src.rows()._collect_expr(e)

    def to_plot(self):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        for geom in self.geoms:
            m = dict(self.mapping)
            m.update(geom.aes or {})
            xv = self._collect(m['x']) if 'x' in m else None
            yv = self._collect(m['y']) if 'y' in m else None
            if geom.kind == 'hline':
                ax.axhline(geom.kwargs['yintercept'],
                           linestyle=geom.kwargs.get('linetype', '-').replace('dashed', '--'))
            elif geom.kind == 'vline':
                ax.axvline(geom.kwargs['xintercept'],
                           linestyle=geom.kwargs.get('linetype', '-').replace('dashed', '--'))
            elif geom.kind == 'density':
                import numpy as _np
                from scipy.stats import gaussian_kde
                vals = _np.asarray([v for v in xv if v is not None], dtype=float)
                if len(vals) > 1:
                    kde = gaussian_kde(vals)
                    xs = _np.linspace(vals.min(), vals.max(), 200)
                    ax.plot(xs, kde(xs))
            elif geom.kind == 'point':
                ax.scatter(xv, yv, s=geom.kwargs.get('size', 6))
            elif geom.kind == 'line':
                ax.plot(xv, yv)
            elif geom.kind == 'histogram':
                ax.hist([v for v in xv if v is not None],
                        bins=geom.kwargs.get('bins', 30))
            elif geom.kind in ('bar', 'col'):
                if yv is None:
                    vals, counts = np.unique([str(v) for v in xv], return_counts=True)
                    ax.bar(vals, counts)
                else:
                    ax.bar([str(v) for v in xv], yv)
        if 'title' in self.labels:
            ax.set_title(self.labels['title'])
        if 'x' in self.labels:
            ax.set_xlabel(self.labels['x'])
        if 'y' in self.labels:
            ax.set_ylabel(self.labels['y'])
        for sc in getattr(self, 'scales', []):
            if sc.kind == 'log10':
                (ax.set_xscale if sc.axis == 'x' else ax.set_yscale)('log')
            elif sc.kind == 'reverse':
                (ax.invert_xaxis if sc.axis == 'x' else ax.invert_yaxis)()
        return fig

    def show(self):
        return self.to_plot()

    def write_image(self, path):
        self.to_plot().savefig(path)


def ggplot(table=None, mapping=None) -> GGPlot:
    return GGPlot(table, mapping or Aesthetic())


class Scale:
    def __init__(self, axis, kind, **kwargs):
        self.axis = axis
        self.kind = kind
        self.kwargs = kwargs


def scale_x_log10():
    return Scale('x', 'log10')


def scale_y_log10():
    return Scale('y', 'log10')


def scale_x_continuous(name=None, breaks=None, labels=None, trans=None):
    return Scale('x', trans or 'continuous', name=name)


def scale_y_continuous(name=None, breaks=None, labels=None, trans=None):
    return Scale('y', trans or 'continuous', name=name)


def scale_x_reverse():
    return Scale('x', 'reverse')


def scale_y_reverse():
    return Scale('y', 'reverse')


class FacetWrap:
    def __init__(self, mapping, ncol=None):
        self.mapping = mapping
        self.ncol = ncol


def facet_wrap(mapping, ncol=None, nrow=None, scales='fixed'):
    return FacetWrap(mapping, ncol)


class GeomHline(Geom):
    kind = 'hline'


class GeomVline(Geom):
    kind = 'vline'


def geom_hline(yintercept, **kwargs):
    g = GeomHline(None, yintercept=yintercept, **kwargs)
    return g


def geom_vline(xintercept, **kwargs):
    g = GeomVline(None, xintercept=xintercept, **kwargs)
    return g


class GeomDensity(Geom):
    kind = 'density'


def geom_density(mapping=None, **kwargs):
    return GeomDensity(mapping, **kwargs)
