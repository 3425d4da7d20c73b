"""Stage 4 — exact verification of LSH candidates.

Reference analog: the reference computes *exact* pairwise distances for
every pair (selfclean/cleaner/selfclean_cleaner.py:137-144); we compute
exact Jaccard only for the LSH candidates (J5 in SURVEY.md §2.4), which
preserves exactness of every reported score while touching ~|edges|
instead of N² pairs.

Three tiers, cheapest first (all but the last JVM-native):

1. **MinHash estimate** — fraction of agreeing signature positions,
   native ``zip_with``/``filter``/``size`` over the two arrays.
2. **SimHash Hamming** — native ``bit_count(a ^ b)``.
   A pair skips exact verification only if BOTH the Hamming distance is
   large AND the MinHash estimate is far below threshold — a
   recall-safe conjunction (a true ≥τ pair fails it with probability
   ≈ P[Binomial(128, τ) < 64·τ] ≈ 10⁻⁶ at τ=0.8).
3. **Exact Jaccard + suffix-array substring confirm** — Arrow-batched
   ``mapInPandas`` over (content_a, content_b); re-shingles the two
   contents with the same config (so "exact" means exact w.r.t. the
   reference shingle config, the BASELINE.json recall definition) and
   runs the per-partition suffix-array containment kernel.

An edge is verified iff ``jaccard ≥ τ`` OR verbatim containment.
``dist = 1 − jaccard`` (the reference's similarity→distance flip,
selfclean_cleaner.py:142-144, clipped to [0,1] at :147-149 — Jaccard is
already in [0,1] so the clip is structural here).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from selfclean_spark.config import PipelineConfig
from selfclean_spark.functions import sketches
from selfclean_spark.functions.suffix import sa_contains, suffix_array

VERIFIED_SCHEMA = StructType(
    [
        StructField("id_a", LongType(), False),
        StructField("id_b", LongType(), False),
        StructField("sha_a", StringType(), False),
        StructField("sha_b", StringType(), False),
        StructField("n_bands_hit", IntegerType(), True),
        StructField("jaccard_est", DoubleType(), True),
        StructField("hamming", IntegerType(), True),
        StructField("jaccard", DoubleType(), False),
        StructField("substring", BooleanType(), False),
        StructField("dist", DoubleType(), False),
    ]
)


def enrich_candidates(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Attach per-side sketches and compute the native tiers (estimate +
    Hamming).  Two hash joins on the long id key; signature rows are
    narrow (no content)."""
    sig_a = signatures.select(
        F.col("id").alias("id_a"),
        F.col("minhash").alias("minhash_a"),
        F.col("simhash").alias("simhash_a"),
    )
    sig_b = signatures.select(
        F.col("id").alias("id_b"),
        F.col("minhash").alias("minhash_b"),
        F.col("simhash").alias("simhash_b"),
    )
    n_perm = "cast(size(minhash_a) as double)"
    return (
        pairs.join(sig_a, "id_a").join(sig_b, "id_b")
        .withColumn(
            "jaccard_est",
            F.expr(
                "size(filter(zip_with(minhash_a, minhash_b, (x, y) -> x = y), v -> v))"
                f" / {n_perm}"
            ),
        )
        .withColumn(
            "hamming", F.expr("cast(bit_count(simhash_a ^ simhash_b) as int)")
        )
        .drop("minhash_a", "minhash_b", "simhash_a", "simhash_b")
    )


def verify_candidates(
    pairs: DataFrame, ingested: DataFrame, signatures: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Candidate pairs → verified_edges (FIXTURES.md §5 schema)."""
    sig_cfg = cfg.signature
    enriched = enrich_candidates(pairs, signatures)
    # recall-safe cheap reject: drop only if far by BOTH sketches
    survivors = enriched.filter(
        ~(
            (F.col("hamming") > F.lit(cfg.max_hamming))
            & (F.col("jaccard_est") < F.lit(cfg.jaccard_threshold / 2.0))
        )
    )
    content = ingested.select("id", "content_sha", "content")
    with_content = (
        survivors.join(
            content.select(
                F.col("id").alias("id_a"),
                F.col("content_sha").alias("sha_a"),
                F.col("content").alias("content_a"),
            ),
            "id_a",
        )
        .join(
            content.select(
                F.col("id").alias("id_b"),
                F.col("content_sha").alias("sha_b"),
                F.col("content").alias("content_b"),
            ),
            "id_b",
        )
        .select(
            "id_a", "id_b", "sha_a", "sha_b", "n_bands_hit",
            "jaccard_est", "hamming", "content_a", "content_b",
        )
    )

    tau = cfg.jaccard_threshold
    check_sub = cfg.check_substring

    def verify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch caches: shingle once per doc, suffix-array once per
        # unique haystack (a doc in k candidate pairs pays each cost once)
        for pdf in batches:
            n = len(pdf)
            jac = np.empty(n, dtype=np.float64)
            sub = np.zeros(n, dtype=bool)
            ca = pdf["content_a"].to_numpy()
            cb = pdf["content_b"].to_numpy()
            sha_a = pdf["sha_a"].to_numpy()
            sha_b = pdf["sha_b"].to_numpy()
            shingle_cache: dict[str, np.ndarray] = {}
            sa_cache: dict[str, np.ndarray] = {}

            def shingles_of(sha: str, text: str) -> np.ndarray:
                s = shingle_cache.get(sha)
                if s is None:
                    s = shingle_cache[sha] = sketches.shingle(text, sig_cfg)
                return s

            for i in range(n):
                if sha_a[i] == sha_b[i]:
                    jac[i] = 1.0
                    sub[i] = True
                    continue
                sa = shingles_of(sha_a[i], ca[i])
                sb = shingles_of(sha_b[i], cb[i])
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                jac[i] = inter / union if union else 1.0
                if not check_sub or jac[i] >= tau:
                    continue  # already an edge (or confirm disabled)
                # rescue path: suffix-array containment confirm, gated
                # by shingle containment (a true substring pair has
                # essentially all inner shingles inside the outer doc)
                containment = inter / min(sa.size, sb.size)
                if containment < 0.9:
                    continue
                inner, outer = (ca[i], cb[i]) if len(ca[i]) <= len(cb[i]) else (cb[i], ca[i])
                outer_sha = sha_b[i] if len(ca[i]) <= len(cb[i]) else sha_a[i]
                hay = outer.encode("utf-8", "surrogatepass")
                sarr = sa_cache.get(outer_sha)
                if sarr is None:
                    sarr = sa_cache[outer_sha] = suffix_array(hay)
                sub[i] = sa_contains(
                    hay, sarr, inner.encode("utf-8", "surrogatepass")
                )
            out = pdf.drop(columns=["content_a", "content_b"]).copy()
            out["jaccard"] = jac
            out["substring"] = sub
            out["dist"] = 1.0 - jac
            yield out

    verified = with_content.mapInPandas(verify_batches, schema=VERIFIED_SCHEMA)
    edge_pred = (F.col("jaccard") >= F.lit(tau)) | F.col("substring")
    return verified.filter(edge_pred)
