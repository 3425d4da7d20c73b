"""Code-payload clone operators: winnowing + block clones.

Differential tests pin the Spark winnowing kernel to a pure-Python
re-implementation of the SIGMOD'03 algorithm on seeded random corpora
(including every boundary class: ng = 0, ng = 1, 1 < ng < w), and
planted-clone tests assert the detection semantics the operators
exist for.  Plan tests pin the no-UDF / no-content-shuffle claims.
"""

import random

import pytest
from pyspark.sql import functions as F

from selfclean_spark.operators import codeclean as CC

K, W, B, M = CC.WINNOW_K, CC.WINNOW_W, CC.WINNOW_B, CC.WINNOW_M


def _py_winnow(s: str):
    """Pure-Python winnowing: (n_grams, n_fp, xor, min, max)."""
    s = s.strip()
    ng = max(len(s) - K + 1, 0)
    hs = []
    for i in range(ng):
        acc = 0
        for t in range(K):
            acc = (acc * B + ord(s[i + t])) % M
        hs.append(acc)
    if ng == 0:
        return (0, 0, 0, 0, 0)
    sel: list[tuple[int, int]] = []
    for j in range(max(ng - W + 1, 1)):
        win = hs[j : j + W]
        p = j + win.index(min(win))  # leftmost-min tie rule
        if (p, hs[p]) not in sel:
            sel.append((p, hs[p]))
    xs = [h for _, h in sel]
    x = 0
    for h in xs:
        x ^= h
    return (ng, len(sel), x, min(xs), max(xs))


def _fp_set(s: str) -> set[int]:
    s = s.strip()
    ng = max(len(s) - K + 1, 0)
    hs = []
    for i in range(ng):
        acc = 0
        for t in range(K):
            acc = (acc * B + ord(s[i + t])) % M
        hs.append(acc)
    if ng == 0:
        return set()
    out = set()
    for j in range(max(ng - W + 1, 1)):
        win = hs[j : j + W]
        out.add(hs[j + win.index(min(win))])
    return out


def _rand_text(rng: random.Random, n_words: int) -> str:
    vocab = "alpha beta gamma delta merge batch spark row key value".split()
    return " ".join(rng.choice(vocab) for _ in range(n_words))


@pytest.mark.parametrize("impl", ["arrow", "native"])
def test_winnow_kernel_differential(spark, impl):
    """Seeded random corpus incl. every gram-count boundary class —
    BOTH Spark impls == pure-Python winnowing, field for field."""
    rng = random.Random(7)
    texts = [
        "",  # ng = 0 (empty)
        "short",  # ng = 0 (len < k)
        "x" * K,  # ng = 1
        "abcdefghijklmnopqrstuvwxy",  # 1 < ng = 6 < w
        " padded with spaces  ",  # trim path, ng = 0 after trim
        "y" * (K + W - 1),  # ng = w exactly (single full window)
    ] + [_rand_text(rng, rng.randint(3, 60)) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_fp"], r["fp_xor"], r["fp_min"], r["fp_max"])
        for r in CC.winnow_fingerprints(df, "doc_id", "text", impl=impl).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), (impl, i, repr(t))


def test_winnow_pair_impls_identical(spark):
    """The arrow and native pair paths are bit-identical on the real
    corpus — the A/B contract that lets the fast path ship."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = CC.winnow_clone_pairs(docs, "doc_id", "text", impl="arrow").collect()
    b = CC.winnow_clone_pairs(docs, "doc_id", "text", impl="native").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_winnow_guarantee_on_cloned_span(spark):
    """The paper's guarantee, end to end: a cloned span of length
    >= w + k - 1 shares at least one fingerprint; a ~300-char cloned
    span comfortably clears min_shared, and the pure-Python fingerprint
    intersection matches Spark's n_shared exactly."""
    rng = random.Random(13)
    span = _rand_text(rng, 55)
    assert len(span) >= W + K - 1
    a = _rand_text(rng, 30) + " " + span
    bq = span + " " + _rand_text(rng, 30)
    noise = [_rand_text(rng, 45) for _ in range(6)]
    docs = [a, bq] + noise
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rows = CC.winnow_clone_pairs(df, "doc_id", "text", min_shared=5).collect()
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in rows}
    assert (0, 1) in got
    expected = len(_fp_set(a) & _fp_set(bq))
    assert got[(0, 1)] == expected
    assert expected >= 5


def test_winnow_exact_clone_full_overlap(spark):
    """An exact clone shares its entire fingerprint set: overlap_ppm
    is exactly 1_000_000."""
    rng = random.Random(29)
    t = _rand_text(rng, 50)
    df = spark.createDataFrame(
        [(0, t), (1, t), (2, _rand_text(rng, 50))],
        "doc_id long, text string",
    )
    rows = CC.winnow_clone_pairs(df, "doc_id", "text", min_shared=5).collect()
    got = {(r["id_a"], r["id_b"]): r for r in rows}
    assert got[(0, 1)]["overlap_ppm"] == 1_000_000


def test_block_clone_pairs_planted(spark):
    """Two files sharing exactly two aligned 8-token blocks are
    reported with n_shared = 2; unrelated files are not paired."""
    rng = random.Random(41)
    block1 = _rand_text(rng, 8)
    block2 = _rand_text(rng, 8)
    a = " ".join([block1, block2, _rand_text(rng, 8)])
    bq = " ".join([block1, block2, _rand_text(rng, 8)])
    c = _rand_text(rng, 24)
    df = spark.createDataFrame(
        [(0, a), (1, bq), (2, c)], "doc_id long, text string"
    )
    rows = CC.block_clone_pairs(df, "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_shared"]) == (0, 1, 2)
    # 2 of 3 blocks of the smaller file
    assert r["coverage_ppm"] == 2 * 1_000_000 // 3


def test_block_clone_unaligned_copy_not_matched(spark):
    """Alignment sensitivity is the documented semantics: shifting a
    copied region by one token breaks block identity (winnowing covers
    the alignment-free case)."""
    rng = random.Random(43)
    blocks = _rand_text(rng, 16)
    a = blocks + " " + _rand_text(rng, 8)
    bq = "shifted " + blocks  # one-token shift, same 16-token content
    df = spark.createDataFrame(
        [(0, a), (1, bq)], "doc_id long, text string"
    )
    assert CC.block_clone_pairs(df, "doc_id", "text").count() == 0


def test_winnow_plan_native_no_udf_single_exchange(spark):
    """impl='native' claims map-only whole-stage-codegen: no Python
    evaluation node, no key-partitioned shuffle — the only Exchanges
    are the output sort (range) and the conditional single-split scan
    fan-out (round-robin; identity at lake scale).  Counted by
    partitioning TYPE, not total (ADVICE r5 #3: totals are brittle)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        CC.winnow_fingerprints(docs, "doc_id", "text", impl="native")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 1, plan


def test_winnow_plan_arrow_one_pass_pruned(spark):
    """impl='arrow' (default): exactly ONE MapInPandas, no row-wise
    Python, scan pruned to (doc_id, text), single output-sort
    Exchange."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        CC.winnow_fingerprints(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_clone_pair_plans_shuffle_no_content(spark):
    """Both pair operators shuffle only ids + 8-byte fingerprints /
    32-hex digests — the text column never rides a hash-partitioned
    Exchange, and there is no CartesianProduct."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (CC.winnow_clone_pairs, CC.block_clone_pairs):
        plan = (
            op(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text" not in line, line


def test_import_cooccurrence_pairs_independent_recompute(spark):
    """Third implementation of the import co-occurrence graph: pure
    pandas/itertools over the same parquet, planted the same way —
    independent of BOTH the Spark map-side array enumeration and the
    DuckDB unnest-self-join oracle."""
    import itertools

    import pandas as pd

    from selfclean_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    got = (
        Q.import_cooccurrence_pairs(spark, sf)
        .toPandas()
        .sort_values(["mod_a", "mod_b"])
        .reset_index(drop=True)
    )

    pdf = pd.read_parquet(sf + "/documents.parquet", columns=["doc_id"])
    # ADVICE r5 #1: Python % is FLOORED mod while Spark/DuckDB % is
    # TRUNCATED — they agree only for non-negative doc_id.  Assert the
    # assumption so a future signed-id corpus fails loudly here instead
    # of with a confusing count mismatch below.
    assert (pdf["doc_id"].astype("int64") >= 0).all(), (
        "pure-Python recompute assumes non-negative doc_id (floored vs "
        "truncated %)"
    )
    counts = {}
    for i in pdf["doc_id"].astype("int64"):
        mods = [f"mod{i % 7}", f"mod{i % 5 + 7}"]
        if i % 3 == 0:
            mods.append(f"mod{i % 11 + 12}")
        for a, b in itertools.combinations(sorted(mods), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in counts.items()],
            columns=["mod_a", "mod_b", "n_docs"],
        )
        .sort_values(["mod_a", "mod_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_import_cooccurrence_plan_map_side(spark):
    """Pair enumeration is map-side (array self-product): exactly two
    Exchanges — the pair rollup and the output sort — no join, no
    Python."""
    from selfclean_spark import queries as Q

    plan = (
        Q.import_cooccurrence_pairs(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2, plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
