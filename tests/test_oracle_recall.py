"""The BASELINE.json recall gate: dup-pair recall ≥ 0.99 vs an exact
oracle at the same shingle/signature config, plus cluster parity.

≙ the reference's approx-vs-exact agreement test
(tests/unittests/cleaner/test_selfclean_cleaner.py:186-209: Annoy
approximate kNN must match the exact full ranking) re-expressed per the
north rule as pair-recall + cluster-membership assertions.

Oracle construction (FIXTURES.md §4): exact Jaccard over the *same*
shingle sets the pipeline uses, computed by a (DuckDB) join over the
full pair space; truth = pairs ≥ τ; oracle components = union-find over
truth pairs on the driver.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from selfclean_spark.catalog import ParquetCatalog
from selfclean_spark.config import PipelineConfig, SignatureConfig
from selfclean_spark.functions import sketches
from selfclean_spark.plans.pipeline import DedupPipeline
from selfclean_spark.synth import generate_code_files

TAU = 0.8
CFG = PipelineConfig(
    signature=SignatureConfig(),  # reference config: char 5-grams, 128 perms
    jaccard_threshold=TAU,
    check_substring=False,  # parity needs identical edge rules both sides
)


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


@pytest.fixture(scope="module")
def corpus():
    return generate_code_files(n_rows=500, seed=123)


@pytest.fixture(scope="module")
def oracle_pairs(corpus):
    """Exact Jaccard for every pair sharing ≥1 shingle, via DuckDB over
    the same shingle sets the pipeline computes."""
    texts = corpus.code_files["content"].tolist()
    rows = []
    sizes = {}
    for i, t in enumerate(texts):
        sh = sketches.shingle(t, CFG.signature)
        sizes[i] = sh.size
        rows.append(pd.DataFrame({"doc": i, "sh": sh.astype("int64")}))
    postings = pd.concat(rows, ignore_index=True)
    con = duckdb.connect()
    con.register("postings", postings)
    sizes_df = pd.DataFrame(
        {"doc": list(sizes.keys()), "n": list(sizes.values())}
    )
    con.register("sizes", sizes_df)
    pairs = con.sql(
        """
        WITH common AS (
          SELECT a.doc AS ia, b.doc AS ib, count(*)::BIGINT AS c
          FROM postings a JOIN postings b USING (sh)
          WHERE a.doc < b.doc GROUP BY 1, 2
        )
        SELECT ia, ib, c::DOUBLE / (sa.n + sb.n - c) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc = ia
        JOIN sizes sb ON sb.doc = ib
        """
    ).df()
    return pairs


@pytest.fixture(scope="module")
def pipeline_result(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("recall_ckpt"))
    code_files = spark.createDataFrame(corpus.code_files)
    pipe = DedupPipeline(spark, ParquetCatalog(spark, root), CFG)
    manager = pipe.run(code_files)
    # map engine ids → corpus row positions via path (unique in synth)
    meta = manager["metadata"].select("id", "path").toPandas()
    path_to_pos = {p: i for i, p in enumerate(corpus.code_files["path"])}
    id_to_pos = {r.id: path_to_pos[r.path] for r in meta.itertuples()}
    edges = manager["verified_edges"].select("id_a", "id_b", "jaccard").toPandas()
    comps = manager["components"].toPandas()
    return edges, comps, id_to_pos


def test_recall_ge_099(oracle_pairs, pipeline_result):
    edges, _comps, id_to_pos = pipeline_result
    truth = {
        (min(r.ia, r.ib), max(r.ia, r.ib))
        for r in oracle_pairs[oracle_pairs.jaccard >= TAU].itertuples()
    }
    assert truth, "fixture must contain duplicate pairs above τ"
    predicted = {
        tuple(sorted((id_to_pos[r.id_a], id_to_pos[r.id_b])))
        for r in edges[edges.jaccard >= TAU].itertuples()
    }
    recall = len(predicted & truth) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99 ({len(truth)} truth pairs)"


def test_no_false_positives(oracle_pairs, pipeline_result):
    """Verification computes exact Jaccard ⇒ precision must be 1.0."""
    edges, _comps, id_to_pos = pipeline_result
    truth = {
        (min(r.ia, r.ib), max(r.ia, r.ib))
        for r in oracle_pairs[oracle_pairs.jaccard >= TAU].itertuples()
    }
    predicted = {
        tuple(sorted((id_to_pos[r.id_a], id_to_pos[r.id_b])))
        for r in edges[edges.jaccard >= TAU].itertuples()
    }
    assert predicted <= truth, f"false positives: {sorted(predicted - truth)[:5]}"


def test_cluster_parity_with_oracle(oracle_pairs, pipeline_result):
    """Pipeline components == oracle threshold-graph components
    (compared as canonical min-labeled partitions over all rows)."""
    _edges, comps, id_to_pos = pipeline_result
    uf = UnionFind()
    for r in oracle_pairs[oracle_pairs.jaccard >= TAU].itertuples():
        uf.union(int(r.ia), int(r.ib))
    n = len(id_to_pos)
    oracle_label = {i: uf.find(i) for i in range(n)}
    engine_label_by_pos: dict[int, int] = {}
    for r in comps.itertuples():
        engine_label_by_pos[id_to_pos[r.id]] = r.component_id
    # canonicalize both partitions: map each cluster to min member pos
    def canonical(labels: dict[int, int]) -> dict[int, int]:
        groups: dict[int, list[int]] = {}
        for pos, lbl in labels.items():
            groups.setdefault(lbl, []).append(pos)
        out = {}
        for members in groups.values():
            m = min(members)
            for pos in members:
                out[pos] = m
        return out

    assert canonical(engine_label_by_pos) == canonical(oracle_label)


def test_jaccard_values_exact(oracle_pairs, pipeline_result):
    """Every verified edge's jaccard equals the oracle's exactly
    (same shingle sets, exact set arithmetic — not an estimate)."""
    edges, _comps, id_to_pos = pipeline_result
    oracle_map = {
        (min(r.ia, r.ib), max(r.ia, r.ib)): r.jaccard
        for r in oracle_pairs.itertuples()
    }
    checked = 0
    for r in edges.itertuples():
        key = tuple(sorted((id_to_pos[r.id_a], id_to_pos[r.id_b])))
        if key in oracle_map:
            assert abs(r.jaccard - oracle_map[key]) < 1e-12
            checked += 1
    assert checked == len(edges)


# ---------------------------------------------------------------------------
# Randomized differential family (VERDICT r4 next-round #5): seeded random
# corpora × random (shingle mode/width, bands, rows, bucket caps) vs the
# brute-force crossJoin oracle — the SemDeDup split-equivalence pattern
# (test_semdedup.py::test_hot_cell_split_equivalence_randomized) applied to
# the text LSH path.  Near-dup families are planted at similarity well above
# the banding knee for every drawn (b, r), so recall must be ≥0.99 at each
# config, precision exactly 1.0 (verification is exact), jaccard values
# bit-equal to the oracle, and threshold-graph components identical.
# ---------------------------------------------------------------------------

RAND_TAU = 0.7


def _random_corpus(seed: int) -> list[tuple[int, str]]:
    """Seeded corpus: a few families of high-similarity token edits of a
    base doc, plus unrelated background docs over the same vocabulary."""
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(400)]
    rows: list[tuple[int, str]] = []
    nid = 0
    for _ in range(int(rng.integers(3, 7))):
        base = list(rng.choice(vocab, size=int(rng.integers(60, 120))))
        for _ in range(int(rng.integers(2, 8))):
            doc = list(base)
            # ≤3% token substitutions keeps family Jaccard ≥ ~0.85
            for _ in range(int(rng.integers(0, max(2, len(doc) // 33)))):
                doc[int(rng.integers(len(doc)))] = str(rng.choice(vocab))
            rows.append((nid, " ".join(doc)))
            nid += 1
    for _ in range(int(rng.integers(60, 120))):
        rows.append(
            (nid, " ".join(rng.choice(vocab, size=int(rng.integers(30, 90)))))
        )
        nid += 1
    return rows


def _random_cfg(seed: int) -> PipelineConfig:
    rng = np.random.default_rng(seed + 9_000)
    if rng.integers(2) == 0:
        sig = SignatureConfig(
            shingle_mode="token",
            shingle_w=int(rng.integers(2, 4)),
            lsh_rows=int(rng.choice([3, 4, 5])),
            lsh_bands=0,  # fixed up below
        )
    else:
        sig = SignatureConfig(
            shingle_mode="char",
            shingle_k=int(rng.integers(4, 7)),
            lsh_rows=int(rng.choice([3, 4, 5])),
            lsh_bands=0,
        )
    # use the whole signature: b = floor(P / r) — steepest curve the
    # drawn r admits; recall at s ≥ 0.85 is ≥ 1-(1-0.85^5)^25 ≈ 1-5e-6
    object.__setattr__(sig, "lsh_bands", sig.num_perm // sig.lsh_rows)
    return PipelineConfig(
        signature=sig,
        jaccard_threshold=RAND_TAU,
        check_substring=False,
        band_bucket_cap=int(rng.choice([64, 256, 1024])),
    )


@pytest.mark.parametrize("corpus_seed", [11, 22, 33])
@pytest.mark.parametrize("cfg_seed", [1, 2, 3])
def test_lsh_randomized_differential(spark, corpus_seed, cfg_seed):
    from selfclean_spark import caching
    from selfclean_spark.operators import components as comp_ops
    from selfclean_spark.operators import dedup as D
    from selfclean_spark.operators.oracle import exact_all_pairs

    rows = _random_corpus(corpus_seed)
    cfg = _random_cfg(cfg_seed * 100 + corpus_seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        edges = (
            D.minhash_lsh_pairs(df, "doc_id", "text", cfg)
            .select("id_a", "id_b", "jaccard")
            .toPandas()
        )
        truth = (
            exact_all_pairs(
                df.selectExpr("doc_id as id", "text as content"), cfg.signature
            )
            .filter(F.col("jaccard") >= RAND_TAU)
            .toPandas()
        )
        truth_pairs = {
            (int(r.id_a), int(r.id_b)): r.jaccard for r in truth.itertuples()
        }
        assert truth_pairs, "corpus must plant pairs above τ"
        got_pairs = {
            (min(int(r.id_a), int(r.id_b)), max(int(r.id_a), int(r.id_b))): r.jaccard
            for r in edges.itertuples()
        }
        # precision 1.0 + values bit-equal (both sides hash the same
        # shingle sets; verification is exact set arithmetic)
        for pair, j in got_pairs.items():
            assert pair in truth_pairs, f"false positive {pair} cfg={cfg}"
            assert abs(j - truth_pairs[pair]) < 1e-12
        recall = len(got_pairs) / len(truth_pairs)
        assert recall >= 0.99, (
            f"recall {recall:.4f} over {len(truth_pairs)} truth pairs "
            f"(corpus {corpus_seed}, cfg {cfg.signature})"
        )
        # component parity over the threshold graph
        comps, _rounds = comp_ops.connected_components(
            spark.createDataFrame(
                [(a, b) for a, b in got_pairs], "id_a long, id_b long"
            )
        )
        uf = UnionFind()
        for a, b in truth_pairs:
            uf.union(a, b)
        oracle_groups: dict[int, set[int]] = {}
        for node in {x for p in truth_pairs for x in p}:
            oracle_groups.setdefault(uf.find(node), set()).add(node)
        engine_groups: dict[int, set[int]] = {}
        for r in comps.toPandas().itertuples():
            engine_groups.setdefault(int(r.component_id), set()).add(int(r.id))
        assert sorted(map(sorted, engine_groups.values())) == sorted(
            map(sorted, oracle_groups.values())
        )
    finally:
        caching.unpersist_all()


@pytest.mark.parametrize("corpus_seed", [31, 32, 33])
@pytest.mark.parametrize("max_h", [3, 8])
def test_simhash_randomized_differential(spark, corpus_seed, max_h):
    """SimHash Manku blocking is EXACT within its radius when no block
    is capped: on seeded random corpora the pair set must equal the
    brute-force popcount-over-all-pairs answer — both directions (no
    false positive, no missed pair), at two radii."""
    from selfclean_spark.config import SignatureConfig
    from selfclean_spark.operators import dedup as D
    from selfclean_spark.operators import signatures as sig_ops

    rows = _random_corpus(corpus_seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r.id: r.simhash & (2**64 - 1)
        for r in sig_ops.compute_signatures(
            df.select(
                F.col("doc_id").alias("id"),
                F.col("text").alias("content"),
                F.sha2("text", 256).alias("content_sha"),
            ),
            SignatureConfig(),
        ).collect()
    }
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= max_h
    }
    got = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(
            df, "doc_id", "text", max_hamming=max_h, block_cap=10**6
        ).collect()
    }
    assert got == brute, (
        f"seed={corpus_seed} h={max_h}: "
        f"missed={sorted(brute - got)[:5]} extra={sorted(got - brute)[:5]}"
    )
    assert brute, "corpus must contain at least one in-radius pair"
