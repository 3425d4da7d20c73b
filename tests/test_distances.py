"""Distance-kernel registry tests (SURVEY §2.10 pluggability).

≙ reference: the custom distance hook (selfclean_cleaner.py:39-40,
77-80) and the projective metric (distances/projective_distance.py:
6-35) — parity is asserted against a direct NumPy transcription of the
reference formula.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfclean_spark.functions.distances import (
    DISTANCE_KERNELS,
    get_distance,
    register_distance,
)
from selfclean_spark.operators.similarity import distance_topk


def _ref_projective(x: np.ndarray, y: np.ndarray) -> float:
    """Direct transcription of projective_distance.py:6-35."""
    nx, ny = x / np.linalg.norm(x), y / np.linalg.norm(y)
    return min(np.linalg.norm(nx - ny), np.linalg.norm(nx + ny)) / np.sqrt(2)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((12, 16))
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(12)]
    # id 100 = the antipode of id 0: projective distance 0, cosine distance 2
    rows.append((100, [float(-v) for v in vecs[0]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), vecs


def test_projective_matches_reference_formula(spark, vec_df):
    df, vecs = vec_df
    a = df.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (F.col("ib") < 100))
        .withColumn("d", get_distance("projective")("va", "vb"))
        .collect()
    )
    assert pairs
    for r in pairs:
        assert abs(r["d"] - _ref_projective(vecs[r["ia"]], vecs[r["ib"]])) < 1e-12


def test_swapping_kernel_changes_ranking(vec_df):
    """The antipodal vector is the NEAREST neighbor projectively and
    the FARTHEST cosine-wise — swapping the registered kernel must flip
    the verified scores/ranking."""
    df, _ = vec_df
    q = df.filter(F.col("vec_id") == 0)
    proj = distance_topk(df, q, k=12, metric="projective").collect()
    cos = distance_topk(df, q, k=12, metric="cosine").collect()
    proj_first = next(r for r in proj if r.knn_rank == 1)
    assert proj_first.neighbor_id == 100 and proj_first.dist == 0.0
    cos_last = max(cos, key=lambda r: r.knn_rank)
    assert cos_last.neighbor_id == 100 and abs(cos_last.dist - 2.0) < 1e-9


def test_registry_rejects_unknown_and_accepts_custom(vec_df):
    df, _ = vec_df
    with pytest.raises(KeyError, match="registered"):
        get_distance("no-such-metric")

    @register_distance("_test_constant")
    def const_kernel(a: str, b: str):
        return F.lit(0.5)

    try:
        q = df.filter(F.col("vec_id") == 0)
        out = distance_topk(df, q, k=3, metric="_test_constant").collect()
        assert all(r.dist == 0.5 for r in out)
        # constant distance ⇒ ties broken deterministically by id
        assert [r.neighbor_id for r in out] == sorted(r.neighbor_id for r in out)
    finally:
        DISTANCE_KERNELS.pop("_test_constant", None)
