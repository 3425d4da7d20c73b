"""Stage 2/3 — LSH candidate generation (the cross-join killer).

Reference analog: the blocked N×N pairwise-distance cross join
(selfclean/cleaner/selfclean_cleaner.py:121-146) and its approximate
Annoy-kNN alternative (selfclean/cleaner/near_duplicates/
embedding_distance_mixin.py:92-127).  Both are replaced by LSH band
blocking: two rows meet iff at least one of their b MinHash bands
hashes identically — probability 1-(1-s^r)^b of meeting at Jaccard s
(≈0.99995 at s=0.8 with the default r=5/b=25), which buys the ≥0.99
recall gate sub-quadratically.

Physical design (one shuffle, no self-join):

    bands (id, band_hash)                   narrow, computed on the fly
      → groupBy(band_hash)                  THE shuffle (16 B/row)
      → collect_list(id) per bucket         ≤ cap ids (1.6 KB at cap 200)
      → native pair expansion               transform/slice lambdas, JVM
      → groupBy(id_a, id_b) count           dedup across bands

The band index is folded into ``band_hash`` by ``signatures.
band_hashes`` (xxhash64 over (slice, band_id)), so the single long IS
the bucket key — r3 dropped the redundant band_id column from the
hottest exchange.  A self-equi-join formulation was measured to scan
the signature table 4× (band hashes recomputed per side and for the
bucket-size filter); the bucket-explode form reads it once.  Buckets
larger than ``band_bucket_cap`` are emitted to a dropped-log instead
of expanding (m² pairs from boilerplate/empty-file buckets) — never
silent (SURVEY.md §4.2); rows in a dropped bucket still meet through
their b-1 other bands, and verbatim duplicates are additionally
guaranteed by the sha-equality fast path below.

Skew: the shuffle key is band_hash — uniform by construction (xxhash64
of minhash slices); the cap bounds any residual value skew, AQE
skew-join stays on as backstop for the later joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_PAIR_EXPANSION = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> "
    "struct(least(x, y) as id_a, greatest(x, y) as id_b))))"
)


def candidate_pairs(
    bands: DataFrame,
    band_bucket_cap: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(id, band_hash) → (candidate pairs, dropped-bucket log).

    Hot-key safety: bucket sizes are counted FIRST (partial/map-side
    aggregation handles arbitrarily hot keys), over-cap keys are
    filtered out, and only then does ``collect_list`` materialize a
    bucket — so a degenerate key (empty files, license boilerplate at
    10^6 copies) can never pull a multi-GB list into one task.  The
    size-filter join and the collect groupBy share the same key, so
    Catalyst reuses the exchange (one shuffle of ``bands`` total).

    ``observation``: an optional ``pyspark.sql.Observation`` attached to
    the bucket-size relation INSIDE the pairs plan — after the caller's
    first action over ``pairs`` it yields ``dropped_band_buckets`` and
    ``max_bucket_size`` with zero extra jobs (the dropped-log count used
    to be a second action over a persisted sizes table; the observation
    removes both the action and the persist from the hot path).

    Returns
    -------
    pairs : DataFrame(id_a, id_b, n_bands_hit) with id_a < id_b, distinct.
    dropped : DataFrame(band_hash, bucket_size) — buckets over the cap,
        for callers that want the detailed sidecar (reading it is a
        separate action; metrics-only callers should pass
        ``observation`` instead).
    """
    keys = ["band_hash"]
    sizes = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("bucket_size"))
    if observation is not None:
        sizes = sizes.observe(
            observation,
            F.sum(
                F.when(F.col("bucket_size") > band_bucket_cap, 1).otherwise(0)
            ).alias("dropped_band_buckets"),
            F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_bucket_size"),
        )
    dropped = sizes.filter(F.col("bucket_size") > band_bucket_cap)
    eligible = sizes.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= band_bucket_cap)
    ).select(*keys)
    pairs = (
        bands.join(eligible, keys, "inner")  # semi-shaped: eligible is distinct
        .groupBy(*keys)
        # no sort_array: the expansion orients every pair via
        # least/greatest and the final groupBy dedups, so the output
        # SET is identical for any list order — the per-bucket sort
        # bought nothing (r3)
        .agg(F.collect_list("id").alias("ids"))
        .select(F.explode(F.expr(_PAIR_EXPANSION)).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )
    return pairs, dropped


def exact_duplicate_pairs(id_sha: DataFrame, pair_cap: int = 200) -> DataFrame:
    """Verbatim duplicates via sha256 equality — the degenerate fast
    path (reference: planted exact duplicate must rank first with
    distance 0, tests/.../test_embedding_distance.py:22-40).

    ``id_sha``: any relation carrying (id, content_sha).  Pass the
    checkpointed SIGNATURE table, not the raw source — the signature
    stage already computed and invariant-checked content_sha, so this
    stage never re-reads content or re-hashes (at 100 TB that is the
    difference between scanning 100 TB and scanning ~50 GB of digests).

    Groups of ≤ ``pair_cap`` members emit all m(m-1)/2 pairs (the full
    ranking the reference asserts); larger groups — the 10^6-copy
    boilerplate case — emit STAR edges (min-id → member) instead:
    linear in group size, same connected components, and the ranking
    still contains every member at distance 0 via its star edge.
    """
    keyed = id_sha.select("id", "content_sha")
    sizes = keyed.groupBy("content_sha").agg(
        F.count(F.lit(1)).alias("n"), F.min("id").alias("min_id")
    )
    # small groups: collect ≤ pair_cap ids per task and expand all pairs
    small_keys = sizes.filter(
        (F.col("n") >= 2) & (F.col("n") <= pair_cap)
    ).select("content_sha")
    full = (
        keyed.join(small_keys, "content_sha", "inner")
        .groupBy("content_sha")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .select(F.explode(F.expr(_PAIR_EXPANSION)).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    # giant groups: NEVER collected — star edges come from joining each
    # member against the group minimum (a 10^8-copy boilerplate group
    # stays (10^8 rows × 16 bytes) spread across partitions, not one
    # collect_list task)
    star = (
        keyed.join(
            sizes.filter(F.col("n") > pair_cap).select("content_sha", "min_id"),
            "content_sha",
            "inner",
        )
        .filter(F.col("id") != F.col("min_id"))
        .select(F.col("min_id").alias("id_a"), F.col("id").alias("id_b"))
    )
    return full.unionByName(star)
