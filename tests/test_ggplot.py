"""hl.ggplot grammar: full reference __all__ surface + rendering smoke.

Reference `hail/python/hail/ggplot/__init__.py` __all__ (41 names)."""

import os

import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu import ggplot as gg

REFERENCE_ALL = [
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


def test_surface_parity():
    missing = [n for n in REFERENCE_ALL if not hasattr(gg, n)]
    assert not missing, missing


@pytest.fixture
def t():
    tt = hl.utils.range_table(60, 3)
    return tt.annotate(x=hl.float64(tt.idx),
                       y=hl.float64(tt.idx) * 2 + 1,
                       grp=hl.if_else(tt.idx % 2 == 0, 'even', 'odd'))


def _axes(fig):
    return [a for a in fig.axes if a.get_visible()]


class TestRender:
    def test_point_with_color_legend(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y, color=t.grp))
               + gg.geom_point()
               + gg.labs(title='pts', x='xx', y='yy')).to_plot()
        ax = _axes(fig)[0]
        assert ax.get_title() == 'pts'
        assert ax.get_xlabel() == 'xx'
        assert len(ax.collections) == 2          # one scatter per group
        _, labels = ax.get_legend_handles_labels()
        assert set(labels) == {'even', 'odd'}

    def test_line_histogram_bar_col(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y)) + gg.geom_line()).to_plot()
        assert len(_axes(fig)[0].lines) == 1
        fig = (gg.ggplot(t, gg.aes(x=t.x)) + gg.geom_histogram(bins=10)).to_plot()
        assert len(_axes(fig)[0].patches) == 10
        fig = (gg.ggplot(t, gg.aes(x=t.grp)) + gg.geom_bar()).to_plot()
        assert len(_axes(fig)[0].patches) == 2
        fig = (gg.ggplot(t, gg.aes(x=t.grp, y=t.y)) + gg.geom_col()).to_plot()
        assert len(_axes(fig)[0].patches) >= 2

    def test_facet_wrap(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y))
               + gg.geom_point()
               + gg.facet_wrap(gg.vars(t.grp))).to_plot()
        assert len(_axes(fig)) == 2
        npts = sum(len(c.get_offsets()) for a in _axes(fig)
                   for c in a.collections)
        assert npts == 60

    def test_scales_and_coord(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x + 1, y=t.y))
               + gg.geom_point()
               + gg.scale_x_log10()
               + gg.scale_y_reverse()
               + gg.coord_cartesian(ylim=(0, 200))).to_plot()
        ax = _axes(fig)[0]
        assert ax.get_xscale() == 'log'
        lo, hi = ax.get_ylim()
        assert (lo, hi) == (200.0, 0.0)   # reversed + coord limits

    def test_scale_color_manual(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y, color=t.grp))
               + gg.geom_point()
               + gg.scale_color_manual(values=['#ff0000', '#0000ff'])).to_plot()
        cols = _axes(fig)[0].collections
        rgba = {tuple(np.round(c.get_facecolor()[0], 3)) for c in cols}
        assert (1.0, 0.0, 0.0, 1.0) in rgba and (0.0, 0.0, 1.0, 1.0) in rgba

    def test_ribbon_area_density_text_tile_func(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, ymin=t.y - 1, ymax=t.y + 1))
               + gg.geom_ribbon()).to_plot()
        assert len(_axes(fig)[0].collections) == 1
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y)) + gg.geom_area()).to_plot()
        assert len(_axes(fig)[0].collections) == 1
        fig = (gg.ggplot(t, gg.aes(x=t.x)) + gg.geom_density()).to_plot()
        assert len(_axes(fig)[0].lines) == 1
        t5 = t.head(5)
        fig = (gg.ggplot(t5, gg.aes(x=t5.x, y=t5.y, label=t5.grp))
               + gg.geom_text()).to_plot()
        assert len(_axes(fig)[0].texts) == 5
        t4 = t.head(4)
        fig = (gg.ggplot(t4, gg.aes(x=t4.x, y=t4.y, fill=t4.y))
               + gg.geom_tile()).to_plot()
        assert len(_axes(fig)[0].patches) == 4
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y)) + gg.geom_point()
               + gg.geom_func(fun=lambda x: 2 * x + 1)).to_plot()
        assert len(_axes(fig)[0].lines) == 1

    def test_hline_vline_linetypes(self, t):
        fig = (gg.ggplot(t, gg.aes(x=t.x, y=t.y)) + gg.geom_point()
               + gg.geom_hline(30, linetype='dashed')
               + gg.geom_vline(10, linetype='dotted')).to_plot()
        assert len(_axes(fig)[0].lines) == 2

    def test_genomic_scale(self):
        mt = hl.balding_nichols_model(2, 5, 30)
        ht = mt.rows()
        ht = ht.annotate(pv=0.5)
        fig = (gg.ggplot(ht, gg.aes(x=ht.locus, y=ht.pv))
               + gg.geom_point()
               + gg.scale_x_genomic(reference_genome='GRCh37')).to_plot()
        offs = _axes(fig)[0].collections[0].get_offsets()
        assert len(offs) == 30

    def test_write_image(self, t, tmp_path):
        p = str(tmp_path / 'plot.png')
        (gg.ggplot(t, gg.aes(x=t.x, y=t.y)) + gg.geom_point()).write_image(p)
        assert os.path.getsize(p) > 1000

    def test_add_rejects_garbage(self, t):
        with pytest.raises(TypeError):
            gg.ggplot(t, gg.aes(x=t.x)) + 42
