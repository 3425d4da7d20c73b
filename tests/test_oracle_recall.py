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
