"""Stage 2/3 — LSH candidate generation (the cross-join killer).

Reference analog: the blocked N×N pairwise-distance cross join
(selfclean/cleaner/selfclean_cleaner.py:121-146) and its approximate
Annoy-kNN alternative (selfclean/cleaner/near_duplicates/
embedding_distance_mixin.py:92-127).  Both are replaced by LSH band
blocking: two rows meet iff at least one of their b MinHash bands
hashes identically — probability 1-(1-s^r)^b of meeting at Jaccard s
(≈0.99995 at s=0.8 with the default r=5/b=25), which buys the ≥0.99
recall gate sub-quadratically.

Physical design (one band shuffle, reused; codegen'd join expansion):

    bands (id, band_hash)                   narrow, computed on the fly
      → Exchange(band_hash)                 THE shuffle (16 B/row), once
      → count window / cap filter / SHJ self-join   all off that shuffle
      → (id_a < id_b) raw pair stream       whole-stage codegen
      → groupBy(id_a, id_b) count           dedup across bands

The band index is folded into ``band_hash`` by ``signatures.
band_hashes`` (xxhash64 over the band's minhash elements + band_id),
so the single long IS the bucket key — r3 dropped the redundant
band_id column from the hottest exchange.  Buckets larger than
``band_bucket_cap`` are emitted to a dropped-log instead of expanding
(m² pairs from boilerplate/empty-file buckets) — never silent
(SURVEY.md §4.2); rows in a dropped bucket still meet through their
b-1 other bands, and verbatim duplicates are additionally guaranteed
by the sha-equality fast path below.

Skew: the shuffle key is band_hash — uniform by construction (xxhash64
of minhash values); the cap bounds any residual value skew, AQE
skew-join stays on as backstop for the later joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

_PAIR_EXPANSION = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> "
    "struct(least(x, y) as id_a, greatest(x, y) as id_b))))"
)


def band_pair_stream(
    bands: DataFrame,
    band_bucket_cap: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(id, band_hash) → RAW co-bucket pair stream, pre-deduplication.

    One output row per (pair, band) co-occurrence — callers that need
    per-pair band counts aggregate downstream (``candidate_pairs``), and
    callers that fuse other edge sources into the same pair-level
    groupBy (the pipeline unions sha-equality exact edges) avoid paying
    a second full shuffle of the pair set (r3: the
    aggregate-union-aggregate chain was two sequential pair exchanges).

    Physical shape (r6 rework — guide §2.4 "two operations keyed the
    same way can share one exchange"):

        bands → Exchange(band_hash)                  THE shuffle, once
          ├─ Window count(*) over band_hash → cap filter → join side a
          └─ Window count(*) over band_hash → cap filter → join side b
                                  └── SHJ self-join → (id_a < id_b)

    * Bucket sizing is a COUNT WINDOW over the band exchange instead of
      the r3 repartition→persist→groupBy→semi-join chain: the window's
      partition key equals the join key, so its output partitioning
      feeds the self-join directly and AQE stage reuse serves both join
      sides from the ONE materialized shuffle.  This removes, per edge
      query: the explicit ``repartition`` node, the block-manager cache
      (write + bookkeeping + 3 cached reads of ~16 B/row × b bands —
      at 10⁹ files a ~400 GB cache the shuffle files already hold), the
      bucket-size aggregation exchange, and the capping semi-join.
      Bucket membership is unchanged: the window count equals the old
      groupBy count, and the 2 ≤ n ≤ cap filter keeps exactly the same
      rows, so candidate sets — and every downstream fingerprint — are
      bit-identical (A/B-verified at sf0.1 and against the DuckDB
      oracles at sf0.001).
    * Expansion is a codegen'd shuffled-hash self-equi-join, not
      collect_list + nested transform/slice lambdas: higher-order
      Catalyst lambdas evaluate interpreted PER ELEMENT, which at the
      measured ~200× bucket amplification (27.8M co-bucket rows from
      123k final pairs at the 300k bench corpus) made the expansion
      itself the stage bottleneck — the join form streams the same
      m(m-1)/2 pairs per bucket through whole-stage codegen at ~2× the
      throughput, and the ``shuffle_hash`` hint keeps AQE from
      broadcasting a multi-hundred-MB build side (the GC-thrash mode
      measured with the default planner).
    * Hot-key safety: the window count is evaluated before any pair is
      emitted, so a degenerate key (empty files, license boilerplate at
      10^6 copies) is filtered from BOTH join sides and never
      materializes m² pairs.  Per-partition SHJ build sides are bounded
      by the cap filter + uniform xxhash64 keys; AQE skew handling
      stays on as backstop.

    ``observation``: an optional ``pyspark.sql.Observation`` attached to
    join side a's pre-filter stream (evaluated exactly once) — after the
    caller's first action it yields ``dropped_band_buckets`` and
    ``max_bucket_size`` with zero extra jobs.  The observed side orders
    its window by ``id`` so a ``row_number() == 1`` row deterministically
    represents each bucket; the count frame is pinned to the full
    partition so ``bs`` is the whole-bucket size either way.

    Returns ``(raw_pairs, dropped_log)`` — ``dropped_log`` is a lazy
    sidecar relation (band_hash, bucket_size of every over-cap bucket);
    reading it is a separate action, metrics-only callers should pass
    ``observation`` instead.
    """
    keys = ["band_hash"]
    w = Window.partitionBy(*keys)
    in_cap = (F.col("bs") >= 2) & (F.col("bs") <= band_bucket_cap)
    plain = bands.select(
        "id", *keys, F.count(F.lit(1)).over(w).alias("bs")
    )
    if observation is not None:
        wo = w.orderBy("id")
        full = wo.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        a_src = (
            bands.select(
                "id",
                *keys,
                F.count(F.lit(1)).over(full).alias("bs"),
                F.row_number().over(wo).alias("rn"),
            )
            .observe(
                observation,
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("bs") > band_bucket_cap) & (F.col("rn") == 1),
                            1,
                        )
                    ),
                    F.lit(0),
                ).alias("dropped_band_buckets"),
                F.coalesce(F.max("bs"), F.lit(0)).alias("max_bucket_size"),
            )
            .filter(in_cap)
        )
    else:
        a_src = plain.filter(in_cap)
    b_src = plain.filter(in_cap)
    raw = (
        a_src.select(*keys, F.col("id").alias("id_a"))
        .join(
            b_src.select(*keys, F.col("id").alias("id_b")).hint("shuffle_hash"),
            keys,
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    dropped = (
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > band_bucket_cap)
    )
    return raw, dropped


def candidate_pairs(
    bands: DataFrame,
    band_bucket_cap: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(id, band_hash) → (candidate pairs, dropped-bucket log).

    Thin aggregation over ``band_pair_stream`` (see there for the
    hot-key/exchange-reuse story): per-pair band-hit counts for callers
    that consume the deduplicated pair set directly.

    Returns
    -------
    pairs : DataFrame(id_a, id_b, n_bands_hit) with id_a < id_b, distinct.
    dropped : DataFrame(band_hash, bucket_size) — buckets over the cap,
        for callers that want the detailed sidecar (reading it is a
        separate action; metrics-only callers should pass
        ``observation`` instead).
    """
    raw, dropped = band_pair_stream(bands, band_bucket_cap, observation)
    pairs = raw.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_bands_hit")
    )
    return pairs, dropped


def incremental_candidate_pairs(
    new_bands: DataFrame,
    all_bands: DataFrame,
    band_bucket_cap: int,
    touched_keys: list[int] | None = None,
) -> DataFrame:
    """New×all LSH candidate join — the incremental-index complement
    of :func:`candidate_pairs`: candidates always carry ≥1 endpoint
    from ``new_bands`` (new×old and new×new; old×old pairs are the
    base index's own business).

    ``all_bands`` must be the ACCUMULATED index (base ∪ new): bucket
    sizes — and the hot-bucket cap — are evaluated on the accumulated
    state, the same dropped-bucket semantics the streaming path
    documents (``streaming.incremental.dedup_batch``, which delegates
    here).  ``countDistinct`` not ``count``: a new×new pair appears in
    BOTH orientations of the asymmetric join, a new×old pair in one —
    the distinct band-key count is orientation-proof either way.

    100-TB shape: a bucket with no NEW member can never emit a
    ≥1-new-endpoint candidate, so the accumulated index is pruned to
    the new batch's band keys FIRST (a semi-join AQE broadcasts when
    the batch is micro) — the full index is never shuffled on behalf
    of a small batch; bucket sizes (and the hot-bucket cap, which must
    see ACCUMULATED size) are then computed over the pruned slice
    only, which contains every member of every touched bucket and is
    therefore exactly the accumulated size for those buckets.

    ``touched_keys``: callers whose new side is a BOUNDED micro-batch
    (e.g. the 15 planted wrapper docs of
    ``queries.substring_containment_pairs``) may pre-collect the new
    band keys and pass them here — the prune then becomes a map-side
    literal ``isin`` filter (the dynamic-partition-pruning shape, two
    fewer stage boundaries than the semi-join).  Unbounded callers
    (streaming batches) pass None and get the semi-join.
    """
    keys = ["band_hash"]
    if touched_keys is not None:
        all_touched = all_bands.filter(F.col("band_hash").isin(touched_keys))
    else:
        touched = new_bands.select(*keys).distinct()
        # no broadcast hint: micro-batches broadcast via AQE runtime
        # stats; a large streaming batch falls back to a shuffled
        # semi-join
        all_touched = all_bands.join(touched, keys, "leftsemi")
    sizes = all_touched.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    eligible = sizes.filter(
        (F.col("n") >= 2) & (F.col("n") <= band_bucket_cap)
    ).select(*keys)
    new_side = new_bands.join(eligible, keys).select(
        *keys, F.col("id").alias("id_new")
    )
    all_side = all_touched.join(eligible, keys).select(
        *keys, F.col("id").alias("id_other")
    )
    return (
        new_side.join(all_side, keys)
        .filter(F.col("id_new") != F.col("id_other"))
        .select(
            "band_hash",
            F.least("id_new", "id_other").alias("id_a"),
            F.greatest("id_new", "id_other").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("band_hash").alias("n_bands_hit"))
    )


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
