"""hl.plot — matplotlib-backed plotting (the reference uses bokeh,
`hail/python/hail/plot/`; bokeh is not in this image, so figures are
matplotlib objects with the same function surface)."""

from __future__ import annotations

import numpy as np

from ..expr.expression import Expression, to_expr


def _collect_numeric(expr):
    e = to_expr(expr)
    src = e._indices.source
    vals = src._collect_expr(e) if hasattr(src, '_collect_expr') else \
        src.rows()._collect_expr(e)
    return np.asarray([v for v in vals if v is not None], dtype=np.float64)


def histogram(data, legend=None, title=None, log=False, range=None, bins=50):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    if isinstance(data, Expression):
        data = _collect_numeric(data)
    elif hasattr(data, 'bin_edges'):
        fig, ax = plt.subplots()
        edges = np.asarray(data.bin_edges)
        freq = np.asarray(data.bin_freq)
        ax.bar(edges[:-1], freq, width=np.diff(edges), align='edge')
        ax.set_title(title or '')
        return fig
    fig, ax = plt.subplots()
    ax.hist(data, bins=bins, range=range, log=log)
    if title:
        ax.set_title(title)
    if legend:
        ax.set_xlabel(legend)
    return fig


def cumulative_histogram(data, legend=None, title=None, normalize=True, log=False,
                         range=None, bins=50):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    if isinstance(data, Expression):
        data = _collect_numeric(data)
    fig, ax = plt.subplots()
    ax.hist(data, bins=bins, range=range, cumulative=True, density=normalize, log=log)
    if title:
        ax.set_title(title)
    return fig


def scatter(x, y, label=None, title=None, xlabel=None, ylabel=None, size=4,
            legend=True, hover_fields=None, colors=None, width=800, height=800):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    xv = _collect_numeric(x) if isinstance(x, Expression) else np.asarray(x)
    yv = _collect_numeric(y) if isinstance(y, Expression) else np.asarray(y)
    fig, ax = plt.subplots()
    n = min(len(xv), len(yv))
    ax.scatter(xv[:n], yv[:n], s=size)
    ax.set_title(title or '')
    ax.set_xlabel(xlabel or '')
    ax.set_ylabel(ylabel or '')
    return fig


def histogram2d(x, y, bins=40, range=None, title=None, width=600, height=600,
                colors=None, log=False):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    xv = _collect_numeric(x) if isinstance(x, Expression) else np.asarray(x)
    yv = _collect_numeric(y) if isinstance(y, Expression) else np.asarray(y)
    fig, ax = plt.subplots()
    n = min(len(xv), len(yv))
    ax.hist2d(xv[:n], yv[:n], bins=bins)
    ax.set_title(title or '')
    return fig


def qq(pvals, label=None, title='Q-Q plot', xlabel='Expected -log10(p)',
       ylabel='Observed -log10(p)', size=6, legend=True, hover_fields=None,
       collect_all=None, n_divisions=500, missing_label='NA'):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    pv = _collect_numeric(pvals) if isinstance(pvals, Expression) else np.asarray(pvals)
    pv = np.sort(pv[(pv > 0) & (pv <= 1)])
    n = len(pv)
    exp = -np.log10((np.arange(1, n + 1) - 0.5) / n)
    obs = -np.log10(pv)
    fig, ax = plt.subplots()
    ax.scatter(exp, obs, s=size)
    lim = max(exp.max(initial=1), obs.max(initial=1))
    ax.plot([0, lim], [0, lim], 'r-')
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    return fig


def manhattan(pvals, locus=None, title=None, size=4, hover_fields=None,
              collect_all=None, n_divisions=500, significance_line=5e-8):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    e = to_expr(pvals)
    src = e._indices.source
    if locus is None:
        locus = src.locus if hasattr(src, 'locus') else src.rows().locus
    le = to_expr(locus)
    pv = src._collect_expr(e) if hasattr(src, '_collect_expr') else src.rows()._collect_expr(e)
    gp = [l.global_position() if l is not None else None
          for l in (src._collect_expr(le) if hasattr(src, '_collect_expr')
                    else src.rows()._collect_expr(le))]
    pts = [(g, -np.log10(p)) for g, p in zip(gp, pv) if g is not None and p is not None and p > 0]
    fig, ax = plt.subplots(figsize=(12, 4))
    if pts:
        xs, ys = zip(*pts)
        ax.scatter(xs, ys, s=size)
    if significance_line:
        ax.axhline(-np.log10(significance_line), color='r', linestyle='--')
    ax.set_title(title or '')
    ax.set_xlabel('genomic position')
    ax.set_ylabel('-log10(p)')
    return fig


def output_notebook():
    pass


def show(fig):
    fig.show()
