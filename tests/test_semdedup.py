"""SemDeDup semantic dedup (similarity.semdedup_prune).

Checks, per the repo's oracle discipline:
* planted near/exact duplicates are dropped, distinct vectors kept;
* exact parity with an independent NumPy reference implementing the
  documented semantics (quantized dots, argmax cell, prefix prune);
* comparator-cap semantics (rows beyond the cap compare only against
  the cell's first ``cap`` rows — conservative, never false-drops);
* determinism across input partitionings;
* zero-norm vectors are never dropped and never drop others.
"""

from __future__ import annotations

import numpy as np
import pytest

from selfclean_spark.operators import similarity as S


def _run(spark, rows, n_centroids=4, tau=0.9, cap=4_096):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.semdedup_prune(
        df, n_centroids=n_centroids, threshold=tau, comparator_cap=cap
    )
    return {r["id"]: (r["cell"], r["keep"]) for r in out.collect()}


def _centroid_ids(spark, rows, n_centroids):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (
        df.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n_centroids)
        .collect()
    )
    return [r["vec_id"] for r in got]


def _reference_prune(rows, cent_ids, n_centroids, tau, cap, scale=1_000_000.0):
    """Pure-NumPy reference of the full operator given the sampled
    centroid ids (sampling itself is Spark xxhash64 — taken as input)."""
    by_id = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    icents = np.stack(
        [np.floor(by_id[i] * scale + 0.5).astype(np.int64) for i in cent_ids]
    )
    out = {}
    cells: dict[int, list[int]] = {}
    for i, v in rows:
        iv = np.floor(by_id[i] * scale + 0.5).astype(np.int64)
        cell = int(np.argmax(icents @ iv))
        cells.setdefault(cell, []).append(i)
    for cell, members in cells.items():
        members = sorted(members)
        ivs = np.stack(
            [np.floor(by_id[i] * scale + 0.5).astype(np.int64) for i in members]
        )
        n2 = (ivs * ivs).sum(axis=1)
        for pos, i in enumerate(members):
            dropped = False
            for j in range(min(pos, cap)):
                if n2[pos] == 0 or n2[j] == 0:
                    continue
                cos = float(ivs[pos] @ ivs[j]) / (
                    np.sqrt(float(n2[pos])) * np.sqrt(float(n2[j]))
                )
                if cos >= tau:
                    dropped = True
                    break
            out[i] = (cell, not dropped)
    return out


def _corpus(seed=7, n=60, dim=16, n_dups=12):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(n)]
    # exact copies with higher ids -> must be dropped
    for k in range(n_dups):
        rows.append((1000 + k, base[k].tolist()))
    return rows


def test_planted_copies_dropped_distinct_kept(spark):
    rows = _corpus()
    got = _run(spark, rows, n_centroids=4, tau=0.95)
    # every planted copy shares a cell with its source and is dropped
    for k in range(12):
        assert got[1000 + k][0] == got[k][0]
        assert got[1000 + k][1] is False
    # random gaussians in 16-dim are nowhere near cosine 0.95
    assert all(got[i][1] for i in range(60))
    assert len(got) == len(rows)


def test_matches_numpy_reference(spark):
    rows = _corpus(seed=11, n=80, dim=8, n_dups=10)
    for tau in (0.5, 0.9):
        got = _run(spark, rows, n_centroids=5, tau=tau)
        ref = _reference_prune(
            rows, _centroid_ids(spark, rows, 5), 5, tau, 4_096
        )
        assert got == ref


def test_comparator_cap_conservative(spark):
    # one tight family of 8 near-identical vectors; cap=2 means rows
    # beyond the 2nd compare only against the first two -> still all
    # dropped (they match row 0), and parity with the reference holds
    v = np.ones(8, dtype=np.float32)
    rows = [(int(i), (v + np.float32(i) * np.float32(1e-4)).tolist()) for i in range(8)]
    got = _run(spark, rows, n_centroids=2, tau=0.99, cap=2)
    ref = _reference_prune(rows, _centroid_ids(spark, rows, 2), 2, 0.99, 2)
    assert got == ref
    keeps = [i for i, (_, k) in got.items() if k]
    assert keeps == [0]


def test_zero_norm_never_dropped(spark):
    rows = [(0, [0.0] * 4), (1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0])]
    got = _run(spark, rows, n_centroids=1, tau=0.5)
    assert got[0][1] and got[1][1]  # zero vectors: kept, drop nothing
    assert got[2][1] and not got[3][1]  # exact dup dropped


def test_determinism_across_partitionings(spark):
    rows = _corpus(seed=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    outs = []
    for parts in (1, 7):
        out = S.semdedup_prune(
            df.repartition(parts), n_centroids=4, threshold=0.95
        )
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]


def test_hot_cell_split_matches_whole_group_path(spark):
    """Cells over ``cell_rows_cap`` take the bounded split path
    (comparator block + salted slices) — output must be IDENTICAL to
    the whole-group path at the same comparator_cap (VERDICT r3 #3).
    The 200-copy planted family lands in one cell by construction, so
    the split path is guaranteed to trigger at cell_rows_cap=50."""
    rng = np.random.default_rng(5)
    v = rng.normal(size=12).astype(np.float32)
    # family occupies the LOW ids so it owns the comparator block —
    # cap semantics then prune it to one survivor (rows beyond the cap
    # compare against the first `cap` ids only)
    rows = [(int(k), v.tolist()) for k in range(200)]
    rows += [
        (500 + i, rng.normal(size=12).astype(np.float32).tolist())
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(n_centroids=4, threshold=0.95, comparator_cap=8)
    whole = sorted(
        map(tuple, S.semdedup_prune(df, cell_rows_cap=10**9, **kw).collect())
    )
    split = sorted(
        map(
            tuple,
            S.semdedup_prune(df, cell_rows_cap=50, slice_rows=16, **kw).collect(),
        )
    )
    assert split == whole
    ref = _reference_prune(rows, _centroid_ids(spark, rows, 4), 4, 0.95, 8)
    assert {r[0]: (r[1], r[2]) for r in split} == ref
    # the family is star-pruned: first member kept, all copies dropped
    fam = {r[0]: r[2] for r in split if r[0] < 200}
    assert fam[0] is True
    assert sum(fam.values()) == 1


def test_quantization_contract_enforced(spark):
    """Out-of-contract input (|dot| would exceed 2^53, where integer
    dots stop being exact and NumPy would silently wrap at 2^63 while
    DuckDB raises) must fail loudly, not diverge (ADVICE r3)."""
    rows = [(0, [1.0e6] * 16), (1, [1.0e6] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="quantization contract"):
        S.semdedup_prune(df, n_centroids=1, threshold=0.9)


def test_hot_cell_ten_thousand_copies_bounded(spark):
    """The VERDICT-r3 scenario verbatim: a 10^4-copy boilerplate
    embedding family (single degenerate cell).  With the split path the
    largest pandas group is ~slice_rows + comparator_cap rows instead
    of the full 10^4-row cell; output must still be the star prune —
    one survivor, everything else dropped against it."""
    v = [0.3, -0.2, 0.9, 0.1]
    rows = [(int(k), v) for k in range(10_000)]
    rows += [(20_000, [0.9, 0.3, -0.1, 0.2]), (20_001, [-0.5, 0.1, 0.2, 0.8])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.semdedup_prune(
        df,
        n_centroids=2,
        threshold=0.99,
        comparator_cap=64,
        cell_rows_cap=1_024,
        slice_rows=512,
    )
    got = {r["id"]: r["keep"] for r in out.collect()}
    assert len(got) == 10_002
    fam_keeps = [i for i in range(10_000) if got[i]]
    assert fam_keeps == [0]
    assert got[20_000] and got[20_001]


def test_hot_cell_split_equivalence_randomized(spark):
    """Randomized configs: the bounded split path must equal the
    whole-group path for ANY (n_centroids, comparator_cap,
    cell_rows_cap, slice_rows) — near-duplicate families of random
    sizes stress the comparator-block/slice interactions the planted
    fixtures don't."""
    for seed in (101, 202, 303):
        rng = np.random.default_rng(seed)
        rows, nid = [], 0
        for _ in range(int(rng.integers(1, 4))):
            v = rng.normal(size=8).astype(np.float32)
            for _ in range(int(rng.integers(30, 120))):
                jitter = rng.normal(size=8).astype(np.float32) * np.float32(1e-5)
                rows.append((nid, (v + jitter).tolist()))
                nid += 1
        for _ in range(40):
            rows.append((nid, rng.normal(size=8).astype(np.float32).tolist()))
            nid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        kw = dict(
            n_centroids=int(rng.integers(1, 5)),
            threshold=0.97,
            comparator_cap=int(rng.integers(4, 20)),
        )
        whole = sorted(
            map(tuple, S.semdedup_prune(df, cell_rows_cap=10**9, **kw).collect())
        )
        split = sorted(
            map(
                tuple,
                S.semdedup_prune(
                    df,
                    cell_rows_cap=int(rng.integers(20, 60)),
                    slice_rows=int(rng.integers(8, 33)),
                    **kw,
                ).collect(),
            )
        )
        assert split == whole, (seed, kw)
