"""Stage 5 — distributed connected components (large-star / small-star).

Reference analog: single-linkage agglomerative clustering over the
condensed distance vector (selfclean/cleaner/off_topic_samples/
lad_mixin.py:18 ``scipy.cluster.hierarchy.single``) and, semantically,
the "these two samples are the same" verdict of the near-duplicate
ranking.  A full dendrogram is inherently sequential/driver-side; the
scalable semantics the north rule fixes is the *flat* clustering at the
verified-edge threshold: connected components of the dup graph.

Algorithm: alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — converges in
O(log² n) rounds on any graph, each round two shuffles
(groupBy-min + self-join), no vertex state on the driver.

    large-star: every node links its larger neighbors to its minimum
                neighbor (or itself);
    small-star: every node links its smaller-or-equal neighbors to the
                minimum of those.

Convergence check: the edge multiset is fingerprinted with
count + xor/sum of xxhash64(u, v); iteration stops when the fingerprint
is stable (deterministic, one tiny aggregate per round — no
``exceptAll`` shuffle).  ``localCheckpoint`` each round cuts lineage
(SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _checkpoint_with_fingerprint(
    edges: DataFrame, tag: str
) -> tuple[DataFrame, tuple[int, int]]:
    """Materialize one CC round (localCheckpoint, cuts lineage) and
    collect its convergence fingerprint DURING that same action via an
    Observation — one job per round instead of two."""
    obs = Observation(tag)
    observed = edges.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    )
    out = observed.localCheckpoint(eager=True)
    got = obs.get
    return out, (int(got["n"]), int(got["h"]))


def _large_star(edges: DataFrame) -> DataFrame:
    # symmetrize: both orientations
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient toward the smaller endpoint: u keeps neighbors v <= u
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    le = sym.filter(F.col("v") <= F.col("u"))
    mins = le.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        le.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return linked


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> tuple[DataFrame, int]:
    """(id_a, id_b) edge list → (id, component_id) with component_id =
    min id in the component; singletons are NOT emitted (callers join
    with the id universe and ``coalesce(component_id, id)``).

    Returns (components, rounds_used).
    """
    cur = (
        edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if cur.isEmpty():
        spark = edges.sparkSession
        empty = spark.createDataFrame([], "id long, component_id long")
        return empty, 0

    prev_fp = (-1, -1)
    rounds = 0
    for rounds in range(1, max_iterations + 1):
        cur, fp = _checkpoint_with_fingerprint(
            _small_star(_large_star(cur)), f"cc_round_{rounds}"
        )
        if fp == prev_fp:
            break
        prev_fp = fp
    # fixed point: every edge is (member → component-min)
    comps = cur.select(
        F.col("u").alias("id"), F.col("v").alias("component_id")
    ).union(
        cur.select(F.col("v").alias("id"), F.col("v").alias("component_id"))
    )
    comps = comps.groupBy("id").agg(F.min("component_id").alias("component_id"))
    return comps, rounds


def with_singletons(components: DataFrame, universe: DataFrame) -> DataFrame:
    """Left-join the id universe so every row gets a component
    (singleton ⇒ its own id)."""
    return (
        universe.select("id")
        .join(components, "id", "left")
        .select(
            "id", F.coalesce("component_id", F.col("id")).alias("component_id")
        )
    )
