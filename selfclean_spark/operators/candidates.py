"""Stage 2/3 — LSH candidate generation (the cross-join killer).

Reference analog: the blocked N×N pairwise-distance cross join
(selfclean/cleaner/selfclean_cleaner.py:121-146) and its approximate
Annoy-kNN alternative (selfclean/cleaner/near_duplicates/
embedding_distance_mixin.py:92-127).  Both are replaced by a
self-equi-join on LSH band keys: two rows meet iff at least one of
their b=32 MinHash bands hashes identically — probability
1-(1-s^r)^b of meeting at Jaccard s (≈0.99999995 at s=0.8 with r=4),
which is what buys the ≥0.99 recall gate sub-quadratically.

Skew handling (north rule: salted-key shuffle / explicit partitioning):

* **Hot-bucket cap** — degenerate band buckets (empty files, license
  boilerplate: thousands of rows sharing a band hash) would produce
  m² join rows.  Buckets larger than ``band_bucket_cap`` are dropped
  *before* the join and logged via the returned stats (never silent —
  SURVEY.md §4.2).  Rows in a dropped bucket still meet through their
  31 other bands unless they are pathological in all of them.
* **AQE skew-join** — enabled in the session as backstop for buckets
  under the cap but still skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(
    bands: DataFrame,
    band_bucket_cap: int,
) -> tuple[DataFrame, DataFrame]:
    """(id, band_id, band_hash) → (candidate pairs, dropped-bucket log).

    Returns
    -------
    pairs : DataFrame(id_a, id_b, n_bands_hit) with id_a < id_b, distinct.
    dropped : DataFrame(band_id, band_hash, bucket_size) — buckets over
        the cap, for the stage-metrics sidecar.
    """
    sizes = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    dropped = sizes.filter(F.col("bucket_size") > band_bucket_cap)
    # keep only ids in surviving buckets; the join with sizes is on the
    # same keys as the grouping so it reuses the exchange (no 2nd shuffle)
    keep = (
        bands.join(
            sizes.filter(F.col("bucket_size") <= band_bucket_cap).select(
                "band_id", "band_hash"
            ),
            on=["band_id", "band_hash"],
            how="inner",
        )
    )
    a = keep.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id_a")
    )
    b = keep.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id_b")
    )
    pairs = (
        a.join(b, on=["band_id", "band_hash"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )
    return pairs, dropped


def exact_duplicate_pairs(ingested: DataFrame) -> DataFrame:
    """Verbatim duplicates via sha256 equality — the degenerate fast
    path (reference: planted exact duplicate must rank first with
    distance 0, tests/.../test_embedding_distance.py:22-40).

    A groupBy on the 256-bit digest shuffles only (id, sha); no content
    moves.  Pairs are emitted per sha-group; group sizes are dup-cluster
    sizes (small), so the within-group pair expansion is cheap.
    """
    sha_groups = ingested.select("id", "content_sha")
    a = sha_groups.select(F.col("content_sha"), F.col("id").alias("id_a"))
    b = sha_groups.select(F.col("content_sha"), F.col("id").alias("id_b"))
    return (
        a.join(b, "content_sha")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
