"""Plot sinks (S7): distributed exports + gated matplotlib renders.

Reference parity target: selfclean/utils/plotting.py:13-187 — the
inspection grid, the frac-cut histogram, the sensitivity curve.  In
this sandbox matplotlib is absent, so the render functions must raise
a clear ImportError while the export half stays fully functional.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfclean_spark.operators.autoclean import fraction_cut
from selfclean_spark.results import IssueManager
from selfclean_spark.sinks import plots


def _has_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def ranked_manager(spark):
    df = spark.range(100).select(
        (F.col("id") + 1).alias("rank"),
        F.col("id").alias("id"),
        (F.col("id") / 100.0).alias("score"),
        F.lit("python").alias("lang"),
    )
    mgr = IssueManager()
    mgr.register("off_topic_samples", df)
    mgr.register("metadata", df.select("id", "lang"))  # no rank col: skipped
    return mgr


def test_inspection_export_topn(ranked_manager):
    tables = plots.inspection_export(ranked_manager, top_n=7)
    assert set(tables) == {"off_topic_samples"}  # rank-less frames skipped
    pdf = tables["off_topic_samples"]
    assert len(pdf) == 7
    assert list(pdf["rank"]) == list(range(1, 8))


def test_frac_cut_export_histogram(spark):
    rng = np.random.default_rng(11)
    vals = rng.uniform(0.01, 0.99, size=500).tolist() + [0.0, 1.0, 0.0]
    scores = spark.createDataFrame([(float(v),) for v in vals], "score double")
    hist = plots.frac_cut_export(scores, "score", bins=40)
    assert len(hist) == 40
    assert int(hist["count"].sum()) == 500  # out-of-range rows excluded
    # contiguous, monotone bins
    assert (hist["bin_right"].to_numpy() > hist["bin_left"].to_numpy()).all()
    np.testing.assert_allclose(
        hist["bin_left"].to_numpy()[1:], hist["bin_right"].to_numpy()[:-1]
    )


def test_frac_cut_export_degenerate(spark):
    scores = spark.createDataFrame([(0.0,), (1.0,)], "score double")
    hist = plots.frac_cut_export(scores, "score", bins=10)
    assert len(hist) == 0


def test_sensitivity_export_shape():
    pdf = plots.sensitivity_export([(1.0, 2.0), (10.0, 20.0)])
    assert list(pdf.columns) == ["x", "y"]
    assert len(pdf) == 2


@pytest.mark.skipif(_has_matplotlib(), reason="matplotlib present: gate n/a")
def test_renders_gated_without_matplotlib(spark, ranked_manager):
    scores = spark.createDataFrame([(0.2,), (0.4,)], "score double")
    flagged, fit = fraction_cut(scores, "score", n_samples=2)
    with pytest.raises(ImportError, match="inspection_export"):
        plots.plot_inspection_result(ranked_manager)
    with pytest.raises(ImportError, match="frac_cut_export"):
        plots.plot_frac_cut(flagged, "score", fit)
    with pytest.raises(ImportError, match="sensitivity_export"):
        plots.plot_sensitivity([(1.0, 1.0)], "y", "x")


@pytest.mark.skipif(not _has_matplotlib(), reason="matplotlib absent")
def test_renders_with_matplotlib(tmp_path, spark, ranked_manager):
    scores = spark.range(200).select(
        ((F.col("id") + 1) / 201.0).alias("score")
    )
    flagged, fit = fraction_cut(scores, "score", n_samples=200)
    p1 = str(tmp_path / "grid.png")
    plots.plot_inspection_result(ranked_manager, 5, output_path=p1)
    p2 = str(tmp_path / "cut.png")
    plots.plot_frac_cut(flagged, "score", fit, output_path=p2)
    p3 = str(tmp_path / "sens.png")
    plots.plot_sensitivity([(1.0, 1.1), (10.0, 9.0)], "y", "x", output_path=p3)
    import os

    assert all(os.path.getsize(p) > 0 for p in (p1, p2, p3))
