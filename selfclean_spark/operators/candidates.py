"""Stage 2/3 — LSH candidate generation (the cross-join killer).

Reference analog: the blocked N×N pairwise-distance cross join
(selfclean/cleaner/selfclean_cleaner.py:121-146) and its approximate
Annoy-kNN alternative (selfclean/cleaner/near_duplicates/
embedding_distance_mixin.py:92-127).  Both are replaced by LSH band
blocking: two rows meet iff at least one of their b=32 MinHash bands
hashes identically — probability 1-(1-s^r)^b of meeting at Jaccard s
(≈0.99999995 at s=0.8 with r=4), which buys the ≥0.99 recall gate
sub-quadratically.

Physical design (one shuffle, no self-join):

    bands (id, band_id, band_hash)          narrow, computed on the fly
      → groupBy(band_id, band_hash)         THE shuffle
      → collect_list(id) per bucket         ≤ cap ids (1.6 KB at cap 200)
      → native pair expansion               transform/slice lambdas, JVM
      → groupBy(id_a, id_b) count           dedup across bands

A self-equi-join formulation was measured to scan the signature table
4× (band hashes recomputed per side and for the bucket-size filter);
the bucket-explode form reads it once.  Buckets larger than
``band_bucket_cap`` are emitted to a dropped-log instead of expanding
(m² pairs from boilerplate/empty-file buckets) — never silent
(SURVEY.md §4.2); rows in a dropped bucket still meet through their 31
other bands, and verbatim duplicates are additionally guaranteed by
the sha-equality fast path below.

Skew: the shuffle key is (band_id, band_hash) — uniform by
construction (xxhash64 of minhash slices); the cap bounds any residual
value skew, AQE skew-join stays on as backstop for the later joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_EXPANSION = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> "
    "struct(least(x, y) as id_a, greatest(x, y) as id_b))))"
)


def _buckets(keyed: DataFrame, key_cols: list[str]) -> DataFrame:
    return keyed.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    ).withColumn("bucket_size", F.size("ids"))


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
    buckets = _buckets(bands, ["band_id", "band_hash"]).persist()
    dropped = buckets.filter(F.col("bucket_size") > band_bucket_cap).select(
        "band_id", "band_hash", "bucket_size"
    )
    pairs = (
        buckets.filter(
            (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= band_bucket_cap)
        )
        .select(F.explode(F.expr(_PAIR_EXPANSION)).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )
    return pairs, dropped


def exact_duplicate_pairs(ingested: DataFrame) -> DataFrame:
    """Verbatim duplicates via sha256 equality — the degenerate fast
    path (reference: planted exact duplicate must rank first with
    distance 0, tests/.../test_embedding_distance.py:22-40).

    Same bucket-explode shape on the 256-bit digest: shuffles only
    (sha, id); group sizes are dup-cluster sizes, so expansion is
    bounded by real duplication, not by hash skew.
    """
    keyed = ingested.select("id", F.col("content_sha"))
    return (
        _buckets(keyed, ["content_sha"])
        .filter(F.col("bucket_size") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPANSION)).alias("p"))
        .select("p.id_a", "p.id_b")
    )
