"""PGSR covisibility view selection + pair.txt IO.

Parity target: reference gssr/utils/mvsnet_utils.py:307-390 (calc_score
with the MVSNet triangulation-angle kernel, view_selection, pair IO)."""
import math

import numpy as np

from gssr_tpu.dataio.view_selection import (read_pairs, view_selection,
                                            write_pairs)


def ring_centers(n=8, radius=4.0):
    return [np.array([radius * math.sin(2 * math.pi * i / n), 0.0,
                      -radius * math.cos(2 * math.pi * i / n)])
            for i in range(n)]


def test_neighbours_score_highest():
    """On a camera ring observing a shared cloud, each camera's strongest
    partners must be its angular neighbours (small triangulation angles
    score near exp(0); opposite cameras fall off in the 10-degree tail)."""
    rng = np.random.default_rng(0)
    n = 8
    centers = ring_centers(n)
    pts = {i + 1: rng.uniform(-0.5, 0.5, 3) for i in range(60)}
    ids = np.arange(1, 61, dtype=np.int64)
    sel = view_selection(centers, [ids] * n, pts, num_views=4)

    for i in range(n):
        ranked = [k for k, s in sel[i] if s > 0]
        assert ranked[0] in ((i - 1) % n, (i + 1) % n)
        assert set(ranked[:2]) == {(i - 1) % n, (i + 1) % n}
        # scores are sorted descending
        scores = [s for _, s in sel[i]]
        assert scores == sorted(scores, reverse=True)


def test_no_covisibility_zero_score():
    centers = ring_centers(4)
    pts = {1: np.zeros(3), 2: np.ones(3)}
    # each camera sees a disjoint point set -> all scores zero
    id_lists = [np.array([1]), np.array([2]),
                np.array([], dtype=np.int64), np.array([1])]
    sel = view_selection(centers, id_lists, pts, num_views=2)
    assert all(s == 0.0 for pairs in sel[1:3] for _, s in pairs)
    # cameras 0 and 3 share point 1 at a wide angle: still scored
    assert any(k == 3 and s > 0 for k, s in sel[0])


def test_pair_txt_roundtrip(tmp_path):
    sel = [[(1, 27.0), (2, 3.0)], [(0, 27.0)], []]
    p = tmp_path / "pair.txt"
    write_pairs(str(p), sel)
    back = read_pairs(str(p))
    assert len(back) == 3
    assert [k for k, _ in back[0]] == [1, 2]
    assert back[1][0][0] == 0 and back[1][0][1] == 27.0
    assert back[2] == []
