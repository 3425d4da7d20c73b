"""Unit tests for the standalone corpus operators (dedup family,
similarity search, text analysis) on tiny analytic fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfclean_spark.functions import text as T
from selfclean_spark.operators import dedup as D
from selfclean_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 0
        (2, "alpha beta gamma delta epsilon zeta eta iota"),    # near dup of 0
        (3, "completely different words entirely unrelated text here now"),
        (4, "alpha  beta\tgamma delta epsilon zeta eta theta"), # ws variant of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    groups = D.exact_dup_groups(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2
    assert groups[0]["representative"] == 0


def test_exact_dup_pairs(docs):
    pairs = {(r.id_a, r.id_b) for r in D.exact_dup_pairs(docs, "doc_id", "text").collect()}
    assert pairs == {(0, 1)}


def test_exact_components(docs):
    comps = {r.id: r.component_id for r in D.exact_components(docs, "doc_id", "text").collect()}
    assert comps[0] == comps[1] == 0
    assert comps[2] == 2 and comps[3] == 3 and comps[4] == 4


def test_token_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.token_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0  # whitespace variant: same token set
    assert pairs[(0, 2)] == pytest.approx(7 / 9)
    assert (0, 3) not in pairs


def test_minhash_lsh_pairs_finds_clones(docs):
    edges = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert edges[(0, 1)] == 1.0  # exact clone verified at jaccard 1


def test_simhash_near_pairs(docs):
    pairs = {(r.id_a, r.id_b) for r in D.simhash_near_pairs(docs, "doc_id", "text").collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


# -- similarity ---------------------------------------------------------------

@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 2.0]),          # cosine 1 with 0
        (2, [float(x) for x in base + rng.standard_normal(8) * 0.05]),
        (3, [float(x) for x in -base]),               # cosine -1 with 0
        (4, [float(x) for x in rng.standard_normal(8)]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(vecs):
    res = S.cosine_topk(vecs, vecs.filter("vec_id = 0"), k=2)
    rows = sorted(res.collect(), key=lambda r: r.knn_rank)
    assert rows[0].neighbor_id == 1 and rows[0].cosine == pytest.approx(1.0)
    assert rows[1].neighbor_id == 2 and rows[1].cosine > 0.9


def test_lsh_topk_contains_true_neighbor(vecs):
    res = S.lsh_topk(vecs, k=2, n_bits=4, n_tables=8)
    got = {
        (r.query_id, r.neighbor_id)
        for r in res.collect()
        if r.knn_rank == 1
    }
    # scaled copy lands in identical sign buckets in every table
    assert (0, 1) in got and (1, 0) in got


def test_embedding_cosine_dup_pairs(vecs):
    pairs = {
        (r.id_a, r.id_b)
        for r in S.embedding_cosine_dup_pairs(vecs, threshold=0.99, n_bits=4, n_tables=8).collect()
    }
    assert (0, 1) in pairs
    assert (0, 3) not in pairs  # opposite direction


# -- text analysis ------------------------------------------------------------

def test_text_functions(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "a b"), (2, "   ")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].tc == 4
    assert by_id[1].tc == 2
    assert by_id[2].tc == 0
    # fingerprint is whitespace-insensitive
    df2 = spark.createDataFrame(
        [(0, "The  quick\tbrown fox"), (1, "the quick brown fox")],
        "doc_id long, text string",
    )
    fps = [r.fp for r in df2.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [(0, "reasonable words " * 60), (1, "!!!! ???? ####"), (2, "ok")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.q for r in df.select("doc_id", T.quality_score("text").alias("q")).collect()}
    assert 0.0 <= min(rows.values()) and max(rows.values()) <= 1.0
    assert rows[0] > rows[1]  # clean prose beats punctuation soup
