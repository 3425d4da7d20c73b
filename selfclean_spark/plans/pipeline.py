"""End-to-end dedup pipeline: orchestration + checkpoint/resume + metrics.

The stage DAG (SURVEY.md §3.4):

    code_files ──ingest──▶ ingested(id, sha)          (virtual projection)
        └─▶ signatures(minhash, simhash)              [checkpoint]
              └─▶ bands ─▶ candidates(id_a, id_b)     [checkpoint]
                    └─▶ verified_edges                [checkpoint]
                          └─▶ components              [checkpoint]
                          └─▶ rankings / auto-cuts    (results API)

Reference analog of the lifecycle: SelfCleanCleaner.fit → predict
(selfclean/cleaner/selfclean_cleaner.py:88-180, 182-246); its memmap
spill files (:105-114) are our checkpoint tables.  Resume = skip any
stage whose checkpoint exists under the same config hash — re-running a
killed job reproduces byte-identical outputs because every kernel is
seeded and every table is keyed (no positional state).

Per-stage metrics (north rule): rows in/out, skew ratio (max/avg rows
per shuffle key of the stage's dominant key), shuffle bytes (from the
Spark status API where available).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from selfclean_spark.catalog import ParquetCatalog, StageMetrics, now
from selfclean_spark.config import PipelineConfig
from selfclean_spark.operators import candidates as cand_ops
from selfclean_spark.operators import components as comp_ops
from selfclean_spark.operators import ingest as ingest_ops
from selfclean_spark.operators import ranking as rank_ops
from selfclean_spark.operators import signatures as sig_ops
from selfclean_spark.operators import verify as verify_ops
from selfclean_spark.operators.autoclean import (
    EXACT_QUANTILE_MAX_ROWS,
    fraction_cut,
)
from selfclean_spark.results import IssueManager, IssueTypes

log = logging.getLogger(__name__)

# Durable checkpoints (north rule: signatures, candidate edges, component
# labels — plus verified edges, our scored edge table).  Ingest is a
# VIRTUAL stage: id = xxhash64(repo,path,commit) and sha256(content) are
# deterministic projections, so persisting a full copy of the source
# (2 GB/150k files) buys no resumability — the first durable artifact is
# the signature table, after which `content` never re-enters the plan.
STAGES = ["signatures", "candidates", "verified_edges", "components"]


@dataclass
class DedupPipeline:
    spark: SparkSession
    catalog: ParquetCatalog
    config: PipelineConfig = field(default_factory=PipelineConfig)
    assert_invariants: bool = True

    # ------------------------------------------------------------------ utils

    def _shuffle_bytes(self) -> int:
        """Total shuffle-write bytes so far (JVM status API; cumulative,
        recorded per stage as a delta by the caller)."""
        try:
            tracker = self.spark.sparkContext._jsc.sc().statusTracker()
            total = 0
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info is not None:
                    total += info.shuffleWriteBytes() if hasattr(info, "shuffleWriteBytes") else 0
            return total
        except Exception:  # status API shape varies; metrics are best-effort
            return 0

    def _source_sha_fingerprint(self) -> tuple[int, int]:
        """(row count, xor of xxhash64(id, content_sha)) over the source
        identity dimension — computed once per run and compared against
        full-universe stage fingerprints (multiset equality w.h.p.)."""
        if getattr(self, "_src_fp", None) is None:
            row = self._id_sha.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64(id, content_sha))"), F.lit(0)
                ).alias("fp"),
            ).collect()[0]
            self._src_fp = (int(row["n"]), int(row["fp"]))
        return self._src_fp

    @staticmethod
    def _rows_and_skew(df: DataFrame, key_cols: list[str]) -> tuple[int, float]:
        """(row count, max/avg rows per key) in ONE aggregation job —
        the skew number the north rule asks for, without a second scan."""
        if not key_cols:
            return df.count(), 1.0
        stats = (
            df.groupBy(*key_cols)
            .count()
            .agg(
                F.sum("count").alias("total"),
                F.max("count").alias("mx"),
                F.avg("count").alias("av"),
            )
            .collect()[0]
        )
        if not stats["av"]:
            return 0, 1.0
        return int(stats["total"]), float(stats["mx"]) / float(stats["av"])

    def _run_stage(
        self,
        name: str,
        build,  # () -> (DataFrame, dict extra, list[str] skew_keys)
        rows_in: int,
        force: bool = False,
    ) -> DataFrame:
        cfg_hash = self.config.config_hash()
        if not force and self.catalog.exists(name, cfg_hash):
            log.info("stage %s: checkpoint hit, skipping", name)
            return self.catalog.read(name)
        started = now()
        df, extra, skew_keys = build()
        # sha256 invariant for full-universe stages rides the write action
        # as an Observation (xor-fingerprint of (id, content_sha)) — zero
        # extra jobs; compared against the source dimension's fingerprint
        inv_obs: Observation | None = None
        if self.assert_invariants and "content_sha" in df.columns:
            inv_obs = Observation(f"{name}_sha_inv")
            df = df.observe(
                inv_obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64(id, content_sha))"), F.lit(0)
                ).alias("fp"),
            )
        shuffle_before = self._shuffle_bytes()
        t_build = now()
        out = self.catalog.write(
            name,
            df,
            StageMetrics(
                stage=name,
                rows_in=rows_in,
                rows_out=-1,  # patched below (stats job over the checkpoint)
                skew_ratio=-1.0,
                shuffle_bytes=shuffle_before,
                config_hash=cfg_hash,
                started_at=started,
                finished_at=now(),
                # Observations resolve only after the action; the final
                # extra dict is patched into the manifest below
                extra={k: v for k, v in extra.items() if not isinstance(v, Observation)},
            ),
        )
        t_write = now()
        # resolve any Observation placed in extra by the stage builder
        # (metrics collected during the write — no separate action)
        for key, val in list(extra.items()):
            if isinstance(val, Observation):
                extra.pop(key)
                extra.update(val.get)
        if extra.get("dropped_band_buckets"):
            log.warning(
                "stage %s: dropped %s hot band-buckets (max size %s)",
                name, extra["dropped_band_buckets"], extra.get("max_bucket_size"),
            )
        rows_out, skew = self._rows_and_skew(out, skew_keys)
        t_stats = now()
        if inv_obs is not None:
            got = inv_obs.get
            want_n, want_fp = self._source_sha_fingerprint()
            if (got["n"], got["fp"]) != (want_n, want_fp):
                raise AssertionError(
                    f"stage {name}: sha256 invariant violation "
                    f"(fingerprint {got} != source {(want_n, want_fp)})"
                )
        t_invariant = now()
        extra["phase_secs"] = {
            "build": round(t_build - started, 2),
            "write": round(t_write - t_build, 2),
            "stats": round(t_stats - t_write, 2),
            "invariant": round(t_invariant - t_stats, 2),
        }
        manifest = self.catalog._load_manifest()
        manifest["stages"][name]["rows_out"] = rows_out
        manifest["metrics"][-1]["rows_out"] = rows_out
        manifest["metrics"][-1]["skew_ratio"] = skew
        manifest["metrics"][-1]["extra"] = extra
        manifest["metrics"][-1]["finished_at"] = now()
        self.catalog._save_manifest(manifest)
        return out

    # -------------------------------------------------------------------- run

    def run(
        self,
        code_files: DataFrame,
        force: bool = False,
        issue_types: set[str] | None = None,
    ) -> IssueManager:
        """Run the pipeline; ``issue_types`` selects which rankings to
        compute (≙ reference's per-issue dispatch,
        selfclean_cleaner.py:191-213 / P6 in SURVEY.md §2.3).  Stages
        0-5 always run (they feed every issue); None = all."""
        cfg = self.config
        if cfg.shuffle_partitions:
            self.spark.conf.set(
                "spark.sql.shuffle.partitions", str(cfg.shuffle_partitions)
            )

        n_input = code_files.count()

        # stage 0: ingest (virtual — deterministic projection, see STAGES)
        ingested = ingest_ops.with_identity(code_files)
        self._ingested = ingested
        # the (id, sha) dimension backs every invariant check; pin the
        # narrow projection so each check doesn't re-hash the source
        self._id_sha = (
            ingested.select("id", "content_sha").persist(StorageLevel.DISK_ONLY)
        )
        metadata = ingest_ops.metadata_of(ingested)

        # stage 1: signatures ---------------------------------------------
        signatures = self._run_stage(
            "signatures",
            lambda: (sig_ops.compute_signatures(ingested, cfg.signature), {}, []),
            rows_in=n_input,
            force=force,
        )

        # stage 2+3: bands → candidates ------------------------------------
        def build_candidates():
            bands = sig_ops.band_hashes(signatures, cfg.signature)
            # dropped-bucket accounting rides the stage write as an
            # Observation (no second action, no persist of the sizes
            # table); _run_stage resolves it into the metrics sidecar
            # after the write — logged, never silent (SURVEY.md §4.2)
            dropped_obs = Observation("dropped_band_buckets")
            raw, _dropped = cand_ops.band_pair_stream(
                bands, cfg.band_bucket_cap, observation=dropped_obs
            )
            extra = {"band_buckets": dropped_obs}
            # exact-dup pairs (sha equality) are injected so capped hot
            # buckets can never lose verbatim duplicates; sourced from
            # the checkpointed signature table (narrow — no content
            # re-read, no second sha256 pass over the corpus).  The raw
            # co-bucket stream and the exact edges flow into ONE
            # pair-level aggregation (r3: the previous
            # aggregate→union→aggregate chain shuffled the full pair
            # set twice; fusing drops a stage + an exchange from the
            # candidates critical path) — semantics unchanged:
            # n_bands_hit = band-hit count for LSH pairs, lsh_bands for
            # sha-equal pairs (which trivially hit every band), and the
            # min_bands_hit precision filter never drops an exact pair.
            exact = cand_ops.exact_duplicate_pairs(
                signatures, pair_cap=cfg.band_bucket_cap
            )
            all_pairs = (
                raw.select("id_a", "id_b", F.lit(False).alias("is_exact"))
                .unionByName(
                    exact.select("id_a", "id_b", F.lit(True).alias("is_exact"))
                )
                .groupBy("id_a", "id_b")
                .agg(
                    F.sum(F.when(~F.col("is_exact"), 1).otherwise(0)).alias(
                        "bands_hit"
                    ),
                    F.max("is_exact").alias("is_exact"),
                )
                .filter(
                    F.col("is_exact")
                    | (F.col("bands_hit") >= cfg.min_bands_hit)
                )
                .select(
                    "id_a",
                    "id_b",
                    F.when(
                        F.col("is_exact"), F.lit(cfg.signature.lsh_bands)
                    )
                    .otherwise(F.col("bands_hit"))
                    .cast("long")
                    .alias("n_bands_hit"),
                )
            )
            return all_pairs, extra, ["id_a"]

        candidates = self._run_stage(
            "candidates", build_candidates, rows_in=n_input, force=force
        )

        # stage 4: verification --------------------------------------------
        # rows_in comes from the candidates stage's manifest (patched by
        # _run_stage's stats pass) — no extra count job over the checkpoint
        cand_rows = self.catalog.rows_out("candidates")

        def build_verified():
            edges = verify_ops.verify_candidates(
                candidates, ingested, signatures, cfg
            )
            # verification-mix lineage rides the stage write (no extra
            # job): how many edges came from the sha fast path vs exact
            # shingle Jaccard vs the substring rescue
            mix = Observation("verify_mix")
            edges = edges.observe(
                mix,
                F.sum(
                    F.when(F.col("sha_a") == F.col("sha_b"), 1).otherwise(0)
                ).alias("exact_sha_edges"),
                F.sum(
                    F.when(
                        F.col("substring") & (F.col("sha_a") != F.col("sha_b")), 1
                    ).otherwise(0)
                ).alias("substring_rescued"),
                F.avg("jaccard").alias("mean_jaccard"),
            )
            return edges, {"verify_mix": mix}, ["id_a"]

        verified = self._run_stage(
            "verified_edges",
            build_verified,
            rows_in=cand_rows if cand_rows is not None else candidates.count(),
            force=force,
        )
        if self.assert_invariants:
            self._assert_edge_shas(verified, ingested)

        # stage 5: connected components -------------------------------------
        def build_components():
            comps, rounds = comp_ops.connected_components(
                verified, cfg.cc_max_iterations
            )
            full = comp_ops.with_singletons(comps, ingested)
            return full, {"cc_rounds": rounds}, ["component_id"]

        components = self._run_stage(
            "components", build_components, rows_in=n_input, force=force
        )

        # stage 6: rankings --------------------------------------------------
        wanted = issue_types or {
            "near_duplicates", "off_topic_samples", "label_errors",
        }
        manager = IssueManager()
        # row counts for every ranking are already known from the stage
        # manifests — pass the exact-vs-approx quantile choice explicitly
        # so each fraction_cut runs its fused single-aggregation path
        # instead of a count-then-quantile pair of jobs
        # an unknown edge count (manifest crash between checkpoint write
        # and the stats patch leaves it unset) must NOT force the exact
        # path — None lets fraction_cut's auto mode count first
        edge_rows = self.catalog.rows_out("verified_edges")
        pair_exact = (
            None if edge_rows is None or edge_rows < 0
            else edge_rows <= EXACT_QUANTILE_MAX_ROWS
        )
        doc_exact = n_input <= EXACT_QUANTILE_MAX_ROWS

        # rankings are registered as THUNKS (see IssueManager): global
        # ranking needs an eager partition-count collect, so building a
        # ranking nobody reads would add driver actions to every run —
        # the reference likewise computes each issue at predict() time
        # (selfclean_cleaner.py:182-213).  fraction_cut fits land in
        # manager.meta["fits"] when the ranking is first accessed.
        def _cut(ranked, col, pair, key):
            if not cfg.auto_cleaning:
                return ranked
            ranked, fit = fraction_cut(
                ranked, col, n_samples=n_input,
                alpha=cfg.cleaner_alpha, q=cfg.cleaner_q, pair_scores=pair,
                exact_quantiles=pair_exact if pair else doc_exact,
            )
            manager.meta.setdefault("fits", {})[key] = fit
            return ranked

        if "near_duplicates" in wanted:
            manager.register(
                IssueTypes.NEAR_DUPLICATES,
                lambda: _cut(
                    rank_ops.near_duplicate_ranking(verified, metadata),
                    "dist", True, "near_duplicates",
                ),
            )
            manager.register("knn_edges", lambda: rank_ops.knn_edges(verified))
        if "off_topic_samples" in wanted:
            manager.register(
                IssueTypes.OFF_TOPIC_SAMPLES,
                lambda: _cut(
                    rank_ops.isolation_ranking(signatures, metadata),
                    "score", False, "off_topic_samples",
                ),
            )
            manager.register(
                "quantile_isolation",
                lambda: rank_ops.quantile_isolation_ranking(verified, ingested),
            )
        if "label_errors" in wanted:
            manager.register(
                IssueTypes.LABEL_ERRORS,
                lambda: _cut(
                    rank_ops.lang_mismatch_ranking(verified, metadata),
                    "score", False, "label_errors",
                ),
            )
        manager.register(IssueTypes.COMPONENTS, components)
        manager.register("verified_edges", verified)
        manager.register("signatures", signatures)
        manager.register("metadata", metadata)
        return manager

    def _assert_edge_shas(self, verified: DataFrame, ingested: DataFrame) -> None:
        """sha invariant for the pair table — both endpoints checked in
        ONE join job (the two per-side joins were fused; at scale this
        is a single sort-merge on the id key over the unioned sides)."""
        sides = verified.select(
            F.col("id_a").alias("id"), F.col("sha_a").alias("content_sha")
        ).union(
            verified.select(
                F.col("id_b").alias("id"), F.col("sha_b").alias("content_sha")
            )
        )
        bad = ingest_ops.assert_sha_invariant(sides, self._id_sha)
        if bad:
            raise AssertionError(
                f"verified_edges: {bad} sha256 invariant violations"
            )
