"""Plot sinks (S7 in SURVEY.md §2) — reference parity for
selfclean/utils/plotting.py:13-127 (plot_inspection_result,
plot_frac_cut, plot_sensitivity).

Spark-first split: everything that touches the full relation is
computed DISTRIBUTED and reduced to a small pandas frame (top-N rows,
histogram bin counts); the matplotlib render is a thin driver-side
layer gated behind an import-try (the sandbox has no matplotlib — the
export half is fully usable and tested without it).

The reference plots image grids (it is an image-dataset tool); this
engine's rows are source files, so the inspection "grid" is a table of
the top-N ranked rows per issue with their metadata — same information
surface (ranking order, ids, scores), text-native.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING, Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from selfclean_spark.operators.autoclean import FractionCut
    from selfclean_spark.results import IssueManager


def _try_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


# --------------------------------------------------------------- exports


def inspection_export(
    manager: "IssueManager", top_n: int = 10
) -> dict[str, pd.DataFrame]:
    """Top-``top_n`` rows of every ranked issue as small pandas frames —
    the data behind the reference's inspection grid
    (plotting.py:13-99 iterates ``issue_manager[...]["indices"][:N]``).

    Distributed part: each ranking is already globally ranked; the
    ``filter(rank <= N)`` prunes executor-side before the bounded
    ``toPandas()`` (never a full collect).
    """
    out: dict[str, pd.DataFrame] = {}
    for key in manager.keys():
        df = manager[key]
        if df is None or "rank" not in df.columns:
            continue
        out[key] = (
            df.filter(F.col("rank") <= top_n).orderBy("rank").toPandas()
        )
    return out


def frac_cut_export(
    scores: DataFrame, score_col: str, bins: int = 80
) -> pd.DataFrame:
    """Distributed histogram of the LOGIT-transformed scores — the data
    behind the reference's ``subplot_frac_cut`` histogram
    (plotting.py:130-166 ``ax.hist(logit_scores, bins=...)``).

    One aggregation finds the logit range, one groupBy bins it; the
    result is ``bins`` rows regardless of input size.
    """
    in_range = scores.filter(
        (F.col(score_col) > 0) & (F.col(score_col) < 1)
    ).select(
        F.log(F.col(score_col) / (1.0 - F.col(score_col))).alias("_logit")
    )
    rng = in_range.agg(
        F.min("_logit").alias("lo"), F.max("_logit").alias("hi")
    ).collect()[0]
    if rng["lo"] is None or rng["hi"] is None:
        return pd.DataFrame({"bin_left": [], "bin_right": [], "count": []})
    lo, hi = float(rng["lo"]), float(rng["hi"])
    if not math.isfinite(lo) or not math.isfinite(hi) or hi <= lo:
        return pd.DataFrame({"bin_left": [], "bin_right": [], "count": []})
    width = (hi - lo) / bins
    hist = (
        in_range.select(
            F.least(
                F.floor((F.col("_logit") - F.lit(lo)) / F.lit(width)),
                F.lit(bins - 1),
            )
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bucket")
        .toPandas()
    )
    full = pd.DataFrame({"bucket": range(bins)})
    hist = full.merge(hist, on="bucket", how="left").fillna({"count": 0})
    hist["bin_left"] = lo + hist["bucket"] * width
    hist["bin_right"] = hist["bin_left"] + width
    return hist[["bin_left", "bin_right", "count"]].astype(
        {"count": "int64"}
    )


def sensitivity_export(result: Any) -> pd.DataFrame:
    """Normalize a (k, 2) array-like of (x, y) sensitivity points —
    reference plot_sensitivity input (plotting.py:168-187)."""
    df = pd.DataFrame(result, columns=["x", "y"]).astype("float64")
    return df


# --------------------------------------------------------------- renders


def plot_inspection_result(
    manager: "IssueManager",
    plot_top_n: int = 10,
    output_path: str | None = None,
    figsize: tuple = (10, 8),
):
    """Reference plot_inspection_result (plotting.py:13-99): one row of
    panels per issue type, top-N ranked items each.  Panels render the
    ranked rows as text cards (id, score, metadata) instead of images."""
    plt = _try_matplotlib()
    if plt is None:
        raise ImportError(
            "matplotlib is not installed; use "
            "sinks.plots.inspection_export() for the plot data"
        )
    tables = inspection_export(manager, plot_top_n)
    if not tables:
        raise ValueError("no ranked issues registered in the manager")
    fig, axes = plt.subplots(len(tables), 1, figsize=figsize, squeeze=False)
    for ax_row, (key, pdf) in zip(axes, tables.items()):
        ax = ax_row[0]
        ax.axis("off")
        ax.set_title(key, fontsize=10, loc="left")
        cols = [c for c in pdf.columns if not c.startswith("_")][:6]
        if len(pdf):
            tab = ax.table(
                cellText=pdf[cols].astype(str).values,
                colLabels=cols,
                loc="center",
            )
            tab.auto_set_font_size(False)
            tab.set_fontsize(6)
    fig.tight_layout()
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_frac_cut(
    scores: DataFrame,
    score_col: str,
    fit: "FractionCut",
    bins: int = 80,
    output_path: str | None = None,
):
    """Reference plot_frac_cut (plotting.py:101-166): log-density
    histogram of logit scores, logistic-pdf overlay between cutoff and
    q2, vlines at q1/q2 (fit range) and the outlier cutoff."""
    plt = _try_matplotlib()
    if plt is None:
        raise ImportError(
            "matplotlib is not installed; use "
            "sinks.plots.frac_cut_export() for the histogram data"
        )
    hist = frac_cut_export(scores, score_col, bins=bins)
    fig, ax = plt.subplots(1, 1, figsize=(4, 3))
    if len(hist):
        widths = hist["bin_right"] - hist["bin_left"]
        total = hist["count"].sum()
        density = hist["count"] / (total * widths)
        ax.step(hist["bin_left"], density, where="post", label="scores")
        ax.set_yscale("log")
    for x, style, label in (
        (fit.q1, ":", "left-tail range"),
        (fit.q2, ":", None),
        (fit.cutoff_logit, "--", "outlier cutoff"),
    ):
        if math.isfinite(x):
            ax.axvline(x=x, linestyle=style, linewidth=1.4, label=label)
    if fit.scale > 0 and math.isfinite(fit.cutoff_logit):
        import numpy as np

        x_grid = np.linspace(fit.cutoff_logit, fit.q2, 101)
        z = (x_grid - fit.loc) / fit.scale
        pdf = np.exp(-z) / (fit.scale * (1.0 + np.exp(-z)) ** 2)
        ax.plot(x_grid, pdf, label="distribution fit")
    ax.set_ylabel("Probability Density")
    ax.set_xlabel("logit(score)")
    ax.legend(fontsize=6)
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_sensitivity(
    result: Any,
    ylabel: str,
    xlabel: str,
    output_path: str | None = None,
):
    """Reference plot_sensitivity (plotting.py:168-187): log-log (x, y)
    curve plus the identity line."""
    plt = _try_matplotlib()
    if plt is None:
        raise ImportError(
            "matplotlib is not installed; use "
            "sinks.plots.sensitivity_export() for the data"
        )
    pdf = sensitivity_export(result)
    fig, ax = plt.subplots(1, 1, figsize=(4, 3))
    ax.plot(pdf["x"], pdf["y"], marker="o")
    ax.plot(pdf["x"], pdf["x"])
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_ylabel(ylabel)
    ax.set_xlabel(xlabel)
    if output_path is not None:
        fig.savefig(output_path, bbox_inches="tight")
    plt.close(fig)
    return fig
