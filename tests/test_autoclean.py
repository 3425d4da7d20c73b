"""fraction_cut auto-threshold tests.

≙ reference tests/unittests/cleaner/test_auto_cleaning.py:26-38 (auto
cleaning adds the auto_issues key) and :69-90 (changing cut-off params
must change ONLY the flagged set, never scores/indices), plus a numeric
equivalence check of the distributed quantile fit against the
reference's NumPy formula (auto_cleaning_mixin.py:91-154).
"""

import math

import numpy as np
import pytest

from selfclean_spark.operators.autoclean import fraction_cut, logistic_ppf


def _reference_fraction_cut(scores: np.ndarray, n: int, alpha: float, q: float,
                            pair_scores: bool) -> tuple[float, int]:
    """Direct NumPy transcription of the reference formula
    (auto_cleaning_mixin.py:100-125) for cross-checking."""
    if pair_scores:
        alpha = alpha**2
    m = len(scores)  # reference: M = len(scores) BEFORE the range filter
    s = scores[(scores > 0) & (scores < 1)]
    logit = np.log(s / (1 - s))
    p1, p2 = alpha, (0.5 * alpha) ** 0.5
    q1 = np.quantile(logit, p1)
    q2 = np.quantile(logit, p2)
    scale = (q2 - q1) / (logistic_ppf(p2) - logistic_ppf(p1))
    loc = q1 - logistic_ppf(p1) * scale
    prob = q * p1 * n / m
    cutoff = logistic_ppf(prob) * scale + loc
    return cutoff, int((logit < cutoff).sum())


@pytest.fixture(scope="module")
def scores_df(spark):
    rng = np.random.default_rng(42)
    vals = np.clip(rng.beta(5, 2, size=4000), 1e-6, 1 - 1e-6)
    vals[:25] = rng.uniform(1e-5, 1e-3, size=25)  # a low tail to cut
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, score double"
    ), vals


def test_matches_reference_formula(scores_df):
    df, vals = scores_df
    flagged, fit = fraction_cut(df, "score", n_samples=4000, alpha=0.1, q=0.05)
    ref_cutoff, ref_n = _reference_fraction_cut(vals, 4000, 0.1, 0.05, False)
    # exact percentile in Spark vs np.quantile: same linear interpolation
    assert math.isclose(fit.cutoff_logit, ref_cutoff, rel_tol=1e-9)
    assert fit.n_flagged == ref_n
    assert fit.n_flagged > 0


def test_cut_params_do_not_change_scores(scores_df):
    """≙ test_auto_cleaning.py:69-90 — scores/ordering invariant."""
    df, _ = scores_df
    a, _ = fraction_cut(df, "score", n_samples=4000, alpha=0.1, q=0.05)
    b, _ = fraction_cut(df, "score", n_samples=4000, alpha=0.01, q=0.20)
    pa = a.drop("auto_issue").orderBy("id").toPandas()
    pb = b.drop("auto_issue").orderBy("id").toPandas()
    assert pa.equals(pb)


def test_adds_auto_issue_column_only(scores_df):
    df, _ = scores_df
    flagged, _ = fraction_cut(df, "score", n_samples=4000, alpha=0.1, q=0.05)
    assert set(flagged.columns) - set(df.columns) == {"auto_issue"}


def test_pair_scores_squares_alpha(scores_df):
    """≙ auto_cleaning_mixin.py:102-105 (alpha**2 for the pair table)."""
    df, vals = scores_df
    _, fit_pair = fraction_cut(
        df, "score", n_samples=4000, alpha=0.1, q=0.05, pair_scores=True
    )
    ref_cutoff, _ = _reference_fraction_cut(vals, 4000, 0.1, 0.05, True)
    assert math.isclose(fit_pair.cutoff_logit, ref_cutoff, rel_tol=1e-9)


def test_m_counts_out_of_range_scores(spark):
    """The exclusion probability uses M = len(scores) BEFORE the (0,1)
    filter (auto_cleaning_mixin.py:102-113) — dedup outputs carry many
    dist==0 exact-dup pairs, so the counts genuinely differ."""
    rng = np.random.default_rng(7)
    vals = np.clip(rng.beta(5, 2, size=2000), 1e-6, 1 - 1e-6)
    vals[:20] = rng.uniform(1e-5, 1e-3, size=20)
    padded = np.concatenate([vals, np.zeros(500), np.ones(300)])  # out-of-range mass
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(padded)], "id long, score double"
    )
    _, fit = fraction_cut(df, "score", n_samples=2800, alpha=0.1, q=0.05)
    ref_cutoff, ref_n = _reference_fraction_cut(padded, 2800, 0.1, 0.05, False)
    assert math.isclose(fit.cutoff_logit, ref_cutoff, rel_tol=1e-9)
    assert fit.n_flagged == ref_n


def test_approx_quantile_path_invariance(scores_df):
    """§5.2.6 on the scale path: approxQuantile with tight rel-err must
    reproduce the exact fit on this distribution, and forcing either
    path must never change scores/ordering (only the flag set may)."""
    df, vals = scores_df
    exact_df, exact_fit = fraction_cut(
        df, "score", n_samples=4000, alpha=0.1, q=0.05, exact_quantiles=True
    )
    approx_df, approx_fit = fraction_cut(
        df, "score", n_samples=4000, alpha=0.1, q=0.05,
        exact_quantiles=False, approx_rel_err=1e-6,
    )
    # GK returns the nearest order statistic while exact percentile
    # interpolates between adjacent ones — on 4000 rows that bounds the
    # cutoff gap by one inter-sample step (≲1% here, shrinking as 1/n)
    assert math.isclose(approx_fit.cutoff_logit, exact_fit.cutoff_logit, rel_tol=0.01)
    pa = exact_df.drop("auto_issue").orderBy("id").toPandas()
    pb = approx_df.drop("auto_issue").orderBy("id").toPandas()
    assert pa.equals(pb)


def test_degenerate_inputs(spark):
    # all zeros / all out of (0,1): nothing flagged, no crash
    df = spark.createDataFrame([(i, 0.0) for i in range(10)], "id long, score double")
    flagged, fit = fraction_cut(df, "score", n_samples=10)
    assert fit.n_flagged == 0
    assert flagged.filter("auto_issue").count() == 0
