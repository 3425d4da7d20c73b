"""Single-linkage + LAD scoring tests (driver-side sampled path).

≙ reference tests/unittests/cleaner/off_topic_samples/
test_lad_scoring.py:9-19 (far outlier ranks first) and the SciPy
linkage contract the reference relies on (lad_mixin.py:18).
"""

import numpy as np

from selfclean_spark.functions.linkage import (
    lad_ranking,
    lad_scores,
    single_linkage,
    to_tree,
)


def _rand_dist(n, rng):
    d = rng.uniform(0.1, 0.9, size=(n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0.0)
    return d


def test_single_linkage_chain():
    d = np.array([[0, 0.1, 0.3], [0.1, 0, 0.2], [0.3, 0.2, 0]])
    L = single_linkage(d)
    assert L[0][2] == 0.1 and L[1][2] == 0.2
    assert L[1][3] == 3  # final merge holds all leaves


def test_single_linkage_matches_naive_mst():
    """Single-linkage merge heights = MST edge weights sorted asc."""
    rng = np.random.default_rng(7)
    d = _rand_dist(12, rng)
    L = single_linkage(d)
    # naive Kruskal MST weights
    edges = sorted(
        (d[i, j], i, j) for i in range(12) for j in range(i + 1, 12)
    )
    parent = list(range(12))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for w, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            mst.append(w)
    np.testing.assert_allclose(np.sort(L[:, 2]), np.sort(mst))


def test_tree_counts():
    rng = np.random.default_rng(3)
    L = single_linkage(_rand_dist(9, rng))
    root = to_tree(L)
    assert root.count == 9
    assert not root.is_leaf()


def test_lad_far_outlier_first():
    """≙ test_lad_scoring.py: the planted far point emits at rank 1."""
    n = 30
    rng = np.random.default_rng(0)
    d = rng.uniform(0.05, 0.15, size=(n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0.0)
    d[n - 1, :] = d[:, n - 1] = 0.9
    d[n - 1, n - 1] = 0.0
    _scores, idx = lad_ranking(d)
    assert idx[0] == n - 1


def test_lad_covers_all_leaves():
    rng = np.random.default_rng(5)
    L = single_linkage(_rand_dist(17, rng))
    scoring = lad_scores(L)
    assert sorted(i for _, i in scoring) == list(range(17))
    # cumulative areas are non-decreasing in emission order
    vals = [s for s, _ in scoring]
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))


def test_lad_clone_corpus_closed_form():
    """The planted configuration behind queries.lad_offtopic_planted:
    n-1 points at mutual distance 0 plus one at distance 1 from all.
    The LAD areas are closed-form: outlier 1/n at rank 1, every clone
    (n-1)/n (the sweep's interval recursion leaves the rightmost 1/n
    strip unpainted — lad_scoring.py:291-331 semantics)."""
    n = 21
    d = np.zeros((n, n))
    d[0, 1:] = d[1:, 0] = 1.0
    scores, idx = lad_ranking(d)
    assert idx[0] == 0
    np.testing.assert_allclose(scores[0], 1.0 / n, rtol=1e-12)
    np.testing.assert_allclose(scores[1:], (n - 1.0) / n, rtol=1e-12)
