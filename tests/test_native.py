"""Native C++ components: simple-knn parity (reference spatial.cu:15-26)."""
import numpy as np
import pytest


def test_native_knn_matches_scipy(rng):
    from gssr_tpu.ops.knn_native import mean_knn_dist2_native
    pts = rng.uniform(-5, 5, (20_000, 3))
    out = mean_knn_dist2_native(pts)
    if out is None:
        pytest.skip("no C++ toolchain on this machine")
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(pts, k=4)
    ref = np.mean(d[:, 1:] ** 2, axis=1)
    assert np.max(np.abs(out - ref) / (ref + 1e-12)) < 1e-4


def test_host_knn_wrapper_uses_native_or_falls_back(rng):
    from gssr_tpu.ops.knn import mean_knn_dist2_host
    pts = rng.uniform(-1, 1, (512, 3))
    d2 = mean_knn_dist2_host(pts)
    assert d2.shape == (512,)
    assert np.all(d2 > 0)
