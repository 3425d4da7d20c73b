"""Result-API tests ≙ reference tests/unittests/cleaner/
test_issue_manager.py:46-75 (df conversion columns, alias support)."""

import pandas as pd

from selfclean_spark.results import IssueManager, IssueTypes


def _mgr(spark):
    mgr = IssueManager()
    df = spark.createDataFrame([(1, 0.5), (2, 0.1)], "id long, score double")
    mgr.register(IssueTypes.OFF_TOPIC_SAMPLES, df)
    mgr.register("near_duplicates", df)
    return mgr, df


def test_enum_and_string_access(spark):
    mgr, df = _mgr(spark)
    assert mgr[IssueTypes.OFF_TOPIC_SAMPLES] is df
    assert mgr["off_topic_samples"] is df
    assert mgr["near_duplicates"] is df


def test_backwards_compat_alias(spark):
    """≙ issue_manager.py:66-75 'irrelevants' alias."""
    mgr, df = _mgr(spark)
    assert mgr["irrelevants"] is df
    assert mgr["isolation"] is df


def test_unknown_returns_none(spark):
    mgr, _ = _mgr(spark)
    assert mgr["nonsense"] is None
    assert mgr.get_issues("nonsense") is None


def test_return_as_df(spark):
    mgr, _ = _mgr(spark)
    pdf = mgr.get_issues("near_duplicates", return_as_df=True)
    assert isinstance(pdf, pd.DataFrame)
    assert list(pdf.columns) == ["id", "score"]
    assert len(pdf) == 2


def test_keys(spark):
    mgr, _ = _mgr(spark)
    assert set(mgr.keys()) == {"off_topic_samples", "near_duplicates"}
