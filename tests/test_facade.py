"""Facade parity with the reference's entry-point surface
(selfclean/cleaner/selfclean.py:127-217 + integration suite
tests/integration_tests/test_selfclean_IT.py result-shape assertions)."""

import pytest

from selfclean_spark.facade import SelfCleanSpark
from selfclean_spark.synth import generate_code_files


@pytest.fixture(scope="module")
def issues(spark, tmp_path_factory):
    tables = generate_code_files(n_rows=120, seed=21)
    src = str(tmp_path_factory.mktemp("facade") / "cf")
    spark.createDataFrame(tables.code_files).write.parquet(src)
    sc = SelfCleanSpark(
        checkpoint_root=str(tmp_path_factory.mktemp("facade_ckpt")),
        spark=spark,
        auto_cleaning=True,
    )
    return sc.run_on_parquet(src)


def test_all_issue_types_present(issues):
    for key in ("near_duplicates", "off_topic_samples", "label_errors", "components"):
        assert issues[key] is not None, key


def test_reference_aliases(issues):
    assert issues["irrelevants"] is issues["off_topic_samples"]
    assert issues["approx_near_duplicates"] is issues["near_duplicates"]


def test_return_as_df_has_metadata_columns(issues):
    """≙ issue_manager.py:39-62 df conversion with metadata mapped in."""
    pdf = issues.get_issues("near_duplicates", return_as_df=True)
    for col in ("rank", "id_a", "id_b", "dist", "repo_a", "path_a", "repo_b", "path_b"):
        assert col in pdf.columns
    assert "auto_issue" in pdf.columns  # auto_cleaning=True adds the flag


def test_issue_subset_selection(spark, tmp_path):
    """≙ issue-subset test (test_selfclean_cleaner.py:134-167)."""
    tables = generate_code_files(n_rows=60, seed=22)
    src = str(tmp_path / "cf")
    spark.createDataFrame(tables.code_files).write.parquet(src)
    sc = SelfCleanSpark(checkpoint_root=str(tmp_path / "ckpt"), spark=spark)
    issues = sc.run_on_parquet(src, issues_to_detect=["near_duplicates"])
    assert issues["near_duplicates"] is not None
    assert issues["off_topic_samples"] is None
    assert issues["label_errors"] is None
    assert issues["components"] is not None  # clustering always runs
