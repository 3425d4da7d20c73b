"""Spark-side exact all-pairs oracle: agrees with the kernel directly
and refuses unsafe sizes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfclean_spark.config import SignatureConfig
from selfclean_spark.functions import sketches
from selfclean_spark.operators.oracle import exact_all_pairs

CFG = SignatureConfig()


def test_matches_driver_side_kernel(spark):
    texts = [
        "def a(): return 1",
        "def a(): return 1",
        "def a(): return 2",
        "something else entirely different here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, content string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard for r in exact_all_pairs(df, CFG).collect()
    }
    assert len(got) == 6
    for (a, b), j in got.items():
        expected = sketches.exact_jaccard(
            sketches.shingle(texts[a], CFG), sketches.shingle(texts[b], CFG)
        )
        assert abs(j - expected) < 1e-12
    assert got[(0, 1)] == 1.0


def test_refuses_large_input(spark):
    df = spark.range(0, 50).select(
        F.col("id"), F.lit("x").alias("content")
    )
    with pytest.raises(ValueError, match="O\\(N²\\)|refusing"):
        exact_all_pairs(df, CFG, max_rows=10)
