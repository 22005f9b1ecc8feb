import numpy as np
import pytest

import hail_tpu as hl
from hail_tpu.linalg import BlockMatrix


def test_construct_and_ops():
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    bm = BlockMatrix.from_numpy(a)
    assert bm.shape == (3, 4)
    assert np.allclose((bm + 1).to_numpy(), a + 1)
    assert np.allclose((bm * 2).to_numpy(), a * 2)
    assert np.allclose((bm - bm).to_numpy(), 0)
    assert np.allclose((bm / 2).to_numpy(), a / 2)
    assert np.allclose(bm.T.to_numpy(), a.T)
    assert np.allclose((bm ** 2).to_numpy(), a ** 2)
    assert np.allclose(bm.abs().to_numpy(), np.abs(a))


def test_matmul():
    a = np.random.default_rng(0).normal(size=(5, 7))
    b = np.random.default_rng(1).normal(size=(7, 3))
    bma = BlockMatrix.from_numpy(a)
    bmb = BlockMatrix.from_numpy(b)
    assert np.allclose((bma @ bmb).to_numpy(), a @ b)
    assert np.allclose(bma.tree_matmul(bmb).to_numpy(), a @ b)


def test_reductions_slicing():
    a = np.arange(6, dtype=np.float64).reshape(2, 3)
    bm = BlockMatrix.from_numpy(a)
    assert bm.sum() == a.sum()
    assert np.allclose(bm.sum(axis=0).to_numpy(), a.sum(0, keepdims=True))
    assert np.allclose(bm.diagonal().to_numpy(), np.diagonal(a).reshape(1, -1))
    assert bm[1, 2] == 5.0
    sub = bm[0:2, 1:3]
    assert np.allclose(sub.to_numpy(), a[0:2, 1:3])
    assert np.allclose(bm.filter_rows([1]).to_numpy(), a[[1]])


def test_sparsify():
    a = np.ones((6, 6))
    bm = BlockMatrix.from_numpy(a)
    band = bm.sparsify_band(-1, 1).to_numpy()
    assert band[0, 0] == 1 and band[0, 1] == 1 and band[0, 2] == 0
    tri = bm.sparsify_triangle().to_numpy()
    assert tri[0, 5] == 1 and tri[5, 0] == 0
    ri = bm.sparsify_row_intervals([0, 1, 2, 3, 4, 5], [1, 2, 3, 4, 5, 6]).to_numpy()
    assert np.allclose(ri, np.eye(6))
    # sparsify_rectangles keeps whole BLOCKS intersecting the rectangles
    # (reference block-granular semantics)
    bm2 = BlockMatrix.from_numpy(a, block_size=2)
    rect = bm2.sparsify_rectangles([[0, 2, 0, 2]]).to_numpy()
    assert rect[:2, :2].sum() == 4 and rect.sum() == 4
    assert bm2.sparsify_rectangles([[0, 1, 0, 1]]).is_sparse


def test_write_read(tmp_path):
    a = np.random.default_rng(2).normal(size=(4, 5))
    bm = BlockMatrix.from_numpy(a)
    p = str(tmp_path / 'bm')
    bm.write(p)
    bm2 = BlockMatrix.read(p)
    assert np.allclose(bm2.to_numpy(), a)


def test_entries_table():
    a = np.arange(4, dtype=np.float64).reshape(2, 2)
    t = BlockMatrix.from_numpy(a).entries()
    rows = t.collect()
    assert len(rows) == 4
    assert rows[3].i == 1 and rows[3].j == 1 and rows[3].entry == 3.0


def test_svd_random_fill():
    bm = BlockMatrix.random(10, 6, seed=4)
    u, s, vt = bm.svd()
    assert np.allclose(u @ np.diag(s) @ vt, bm.to_numpy(), atol=1e-8)
    f = BlockMatrix.fill(3, 3, 2.5)
    assert np.allclose(f.to_numpy(), 2.5)


def test_from_entry_expr():
    mt = hl.balding_nichols_model(1, 10, 15)
    bm = BlockMatrix.from_entry_expr(mt.GT.n_alt_alleles())
    assert bm.shape == (15, 10)
    G = bm.to_numpy()
    assert set(np.unique(G)).issubset({0.0, 1.0, 2.0})


def test_export(tmp_path):
    a = np.arange(4, dtype=np.float64).reshape(2, 2)
    p = str(tmp_path / 'out.tsv')
    BlockMatrix.from_numpy(a).export(p)
    lines = open(p).read().strip().split('\n')
    assert len(lines) == 2


def test_rectangles_roundtrip(tmp_path):
    # reference blockmatrix.py rectangles_to_numpy docstring example
    nd = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    p = str(tmp_path / 'rects')
    BlockMatrix.from_numpy(nd).export_rectangles(p, [[0, 3, 0, 1], [1, 2, 0, 2]])
    out = BlockMatrix.rectangles_to_numpy(p)
    assert np.allclose(out, np.array([[1.0, 0.0], [4.0, 5.0], [7.0, 0.0]]))


def test_rectangles_binary_and_blocks(tmp_path):
    nd = np.arange(12, dtype=np.float64).reshape(3, 4)
    pb = str(tmp_path / 'rb')
    BlockMatrix.from_numpy(nd).export_rectangles(pb, [[0, 3, 0, 4]], binary=True)
    assert np.allclose(BlockMatrix.rectangles_to_numpy(pb, binary=True), nd)
    pblk = str(tmp_path / 'blocks')
    BlockMatrix.from_numpy(nd, block_size=2).export_blocks(pblk)
    assert np.allclose(BlockMatrix.rectangles_to_numpy(pblk), nd)
