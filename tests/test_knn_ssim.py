"""kNN exactness vs brute force; SSIM parity vs a direct NumPy implementation."""

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops.knn import knn, mean3_sq_dist
from dynamic3dgaussians_tpu.ops.ssim import calc_ssim


def _brute_knn(pts, k, mask=None):
    n = pts.shape[0]
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    if mask is not None:
        d2[:, ~mask] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist = np.take_along_axis(d2, idx, axis=1)
    if mask is not None:
        idx = np.where(np.isfinite(dist), idx, -1)
        dist[~mask] = np.inf
        idx[~mask] = -1
    return dist, idx


def test_knn_exact_small():
    rng = np.random.RandomState(0)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(pts), 5, row_chunk=64, col_chunk=128)
    bd, bi = _brute_knn(pts.astype(np.float64), 5)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)
    # indices can differ on exact ties; distances pin correctness
    same = (np.asarray(i) == bi).mean()
    assert same > 0.99


def test_knn_masked():
    rng = np.random.RandomState(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    mask = np.arange(200) < 150
    d, i = knn(jnp.asarray(pts), 4, mask=jnp.asarray(mask),
               row_chunk=64, col_chunk=64)
    bd, bi = _brute_knn(pts.astype(np.float64), 4, mask)
    np.testing.assert_allclose(np.asarray(d)[:150], bd[:150], atol=1e-4)
    assert (np.asarray(i)[150:] == -1).all()
    assert (np.asarray(i)[:150] < 150).all()  # masked points never neighbors


def test_mean3_sq_dist_positive():
    rng = np.random.RandomState(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    m = np.asarray(mean3_sq_dist(jnp.asarray(pts)))
    assert (m > 0).all()
    bd, _ = _brute_knn(pts.astype(np.float64), 3)
    np.testing.assert_allclose(m, bd.mean(-1).clip(1e-7), rtol=1e-4)


def _ssim_numpy(img1, img2, ws=11, sigma=1.5):
    """Direct NumPy SSIM with zero-padded separable gaussian window."""
    xs = np.arange(ws) - ws // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def blur(x):
        h, w, c = x.shape
        pad = ws // 2
        xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
        out = np.zeros_like(x)
        for yy in range(h):
            for xx in range(w):
                patch = xp[yy:yy + ws, xx:xx + ws]
                out[yy, xx] = np.einsum("ij,ijc->c", win, patch)
        return out

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 ** 2
    s2 = blur(img2 * img2) - mu2 ** 2
    s12 = blur(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_numpy():
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (24, 20, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(calc_ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_identical_images():
    rng = np.random.RandomState(4)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert float(calc_ssim(jnp.asarray(a), jnp.asarray(a))) > 0.99


def test_knn_approx_recall_and_distances():
    from dynamic3dgaussians_tpu.ops.knn import knn, knn_approx
    rng = np.random.RandomState(0)
    # clustered points (realistic scene statistics)
    centers = rng.uniform(-2, 2, (10, 3))
    pts = (centers[rng.randint(0, 10, 1500)]
           + rng.normal(0, 0.15, (1500, 3))).astype(np.float32)
    d_ex, i_ex = knn(jnp.asarray(pts), 3)
    d_ap, i_ap = knn_approx(jnp.asarray(pts), 3, window=24, grids=2)
    # distances nearly exact on average (mean 3-NN sq dist drives log_scales)
    m_ex = np.asarray(d_ex).mean(axis=1)
    m_ap = np.asarray(d_ap).mean(axis=1)
    rel = np.abs(m_ap - m_ex) / np.maximum(m_ex, 1e-12)
    assert np.median(rel) < 0.05
    assert np.mean(rel) < 0.25
    # neighbor recall
    recall = np.mean([len(set(np.asarray(i_ap)[i]) & set(np.asarray(i_ex)[i]))
                      / 3.0 for i in range(1500)])
    assert recall > 0.8


def test_knn_approx_respects_mask():
    from dynamic3dgaussians_tpu.ops.knn import knn_approx
    rng = np.random.RandomState(1)
    pts = rng.rand(200, 3).astype(np.float32)
    mask = jnp.arange(200) < 100
    d, i = knn_approx(jnp.asarray(pts), 4, mask=mask, window=16)
    i = np.asarray(i)
    d = np.asarray(d)
    assert (i[100:] == -1).all() and np.isinf(d[100:]).all()
    assert (i[:100] < 100).all()  # masked-out points never appear
