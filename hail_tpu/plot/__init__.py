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


def _check_downsample_args(name, collect_all, n_divisions):
    """Validate the deprecated collect_all / n_divisions pair (reference
    plot/plots.py downsampling argument handling)."""
    if n_divisions is not None and n_divisions <= 0:
        raise ValueError(
            f'{name}: n_divisions must be a positive integer or None')
    if collect_all is not None:
        if n_divisions is not None:
            raise ValueError(
                f'{name}: pass collect_all or n_divisions, not both')
        import warnings
        warnings.warn(f'{name}: collect_all is deprecated, '
                      f'use n_divisions=None instead')


def scatter(x, y, label=None, title=None, xlabel=None, ylabel=None, size=4,
            legend=True, hover_fields=None, colors=None, width=800, height=800,
            collect_all=None, n_divisions=500, missing_label='NA'):
    _check_downsample_args('scatter', collect_all, n_divisions)
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
    _check_downsample_args('qq', collect_all, n_divisions)
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
    _check_downsample_args('manhattan', collect_all, n_divisions)
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


def cdf(data, k=350, legend=None, title=None, normalize=True, log=False):
    """Plot an empirical CDF (reference plot/plots.py cdf). `data` may be a
    numeric expression or an approx_cdf struct."""
    import matplotlib.pyplot as plt
    vals = np.sort(np.asarray(_collect_numeric(data), dtype=np.float64))
    vals = vals[~np.isnan(vals)]
    n = len(vals)
    y = np.arange(1, n + 1) / n if normalize else np.arange(1, n + 1)
    fig, ax = plt.subplots()
    ax.step(vals, y, where='post')
    if log:
        ax.set_xscale('log')
    ax.set_xlabel(legend or 'value')
    ax.set_ylabel('cumulative probability' if normalize else 'rank')
    if title:
        ax.set_title(title)
    return fig


def pdf(data, k=1000, confidence=5, legend=None, title=None, log=False,
        interactive=False):
    """Histogram-based density estimate (reference plot/plots.py pdf)."""
    import matplotlib.pyplot as plt
    vals = np.asarray(_collect_numeric(data), dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    fig, ax = plt.subplots()
    ax.hist(vals, bins=min(k, max(10, int(np.sqrt(len(vals)) or 10))),
            density=True)
    if log:
        ax.set_xscale('log')
    ax.set_xlabel(legend or 'value')
    ax.set_ylabel('density')
    if title:
        ax.set_title(title)
    return fig


def smoothed_pdf(data, k=350, smoothing=0.5, legend=None, title=None,
                 log=False, interactive=False, figure=None):
    """Gaussian-kernel smoothed density (reference plot/plots.py
    smoothed_pdf)."""
    import matplotlib.pyplot as plt
    from scipy.stats import gaussian_kde
    vals = np.asarray(_collect_numeric(data), dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    kde = gaussian_kde(vals, bw_method=smoothing)
    xs = np.linspace(vals.min(), vals.max(), 1000)
    fig = figure
    if fig is None:
        fig, ax = plt.subplots()
    else:
        ax = fig.gca()
    ax.plot(xs, kde(xs))
    if log:
        ax.set_xscale('log')
    ax.set_xlabel(legend or 'value')
    ax.set_ylabel('density')
    if title:
        ax.set_title(title)
    return fig


def joint_plot(x, y, label=None, title=None, xlabel=None, ylabel=None,
               size=4, hover_fields=None, colors=None, width=600, height=600,
               collect_all=None, n_divisions=500, missing_label='NA'):
    """Scatter plot with marginal histograms (reference plot/plots.py
    joint_plot)."""
    _check_downsample_args('join_plot', collect_all, n_divisions)
    import matplotlib.pyplot as plt
    xv = np.asarray(_collect_numeric(x), dtype=np.float64)
    yv = np.asarray(_collect_numeric(y), dtype=np.float64)
    fig = plt.figure(figsize=(width / 100, height / 100))
    gs = fig.add_gridspec(2, 2, width_ratios=(4, 1), height_ratios=(1, 4),
                          wspace=0.05, hspace=0.05)
    ax = fig.add_subplot(gs[1, 0])
    ax_hx = fig.add_subplot(gs[0, 0], sharex=ax)
    ax_hy = fig.add_subplot(gs[1, 1], sharey=ax)
    ax.scatter(xv, yv, s=size)
    ax_hx.hist(xv[~np.isnan(xv)], bins=40)
    ax_hy.hist(yv[~np.isnan(yv)], bins=40, orientation='horizontal')
    ax_hx.tick_params(labelbottom=False)
    ax_hy.tick_params(labelleft=False)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    if title:
        ax_hx.set_title(title)
    return fig


def set_font_size(p, font_size: str = '12pt'):
    """Set all label/title font sizes on a figure (reference plot/plots.py
    set_font_size)."""
    size = float(str(font_size).replace('pt', ''))
    for ax in p.get_axes():
        ax.title.set_fontsize(size)
        ax.xaxis.label.set_fontsize(size)
        ax.yaxis.label.set_fontsize(size)
        for tick in ax.get_xticklabels() + ax.get_yticklabels():
            tick.set_fontsize(size)
    return p


def visualize_missingness(entry_field, row_field=None, column_field=None,
                          window=6000000, plot_width=1800, plot_height=900):
    """Heatmap of entry missingness across the dataset; takes an ENTRY
    expression (reference plot/plots.py visualize_missingness)."""
    import matplotlib.pyplot as plt
    if isinstance(entry_field, Expression):
        mt = entry_field._indices.source
        e = entry_field
    else:
        mt = entry_field
        e = None
    st = mt._stage
    entry_name = None if e is not None else next(iter(st.entry_type.fields))
    blocks = []
    for i, ctx in enumerate(st.contexts):
        mb = st.partition_fn(ctx)
        if e is not None:
            env = mt._entry_env(mb, i)
            c = e._ir.evaluate(env)
            if c.shape != env.shape:
                c = c.broadcast_to(env.shape)
        else:
            c = mb.entries[entry_name]
        blocks.append(c.missing_mask().astype(np.float64))
    M = np.concatenate(blocks, axis=0) if blocks else np.zeros((0, 0))
    # downsample rows into windows for display
    n_bins = max(1, min(200, M.shape[0]))
    idx = np.linspace(0, M.shape[0], n_bins + 1).astype(int)
    binned = np.stack([M[a:b].mean(axis=0) if b > a else np.zeros(M.shape[1])
                       for a, b in zip(idx[:-1], idx[1:])])
    fig, ax = plt.subplots(figsize=(plot_width / 100, plot_height / 100))
    im = ax.imshow(binned.T, aspect='auto', cmap='viridis', origin='lower')
    fig.colorbar(im, ax=ax, label='fraction missing')
    ax.set_xlabel('variant window')
    ax.set_ylabel('sample')
    return fig
