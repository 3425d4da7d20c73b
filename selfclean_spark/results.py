"""Result API — the IssueManager analog.

Reference: selfclean/cleaner/issue_manager.py:18-71 — a dict of
``{issue_type: {"indices", "scores", ["auto_issues"]}}`` whose
``get_issues(..., return_as_df=True)`` materializes a pandas DataFrame
with path/label metadata mapped in positionally (:39-62).

Here every issue is already a (lazily planned) DataFrame with metadata
joined by key, so the manager is a thin registry: typed access, the
``return_as_df`` flavor is ``.toPandas()`` on demand, and the
backwards-compat alias the reference keeps ("irrelevants" →
off_topic_samples, issue_manager.py:66-75) maps "off_topic_samples" →
our isolation ranking.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

import pandas as pd
from pyspark.sql import DataFrame


class IssueTypes(Enum):
    """≙ reference enum selfclean/cleaner/issue_manager.py:9-15."""

    NEAR_DUPLICATES = "near_duplicates"
    OFF_TOPIC_SAMPLES = "off_topic_samples"  # isolation ranking
    LABEL_ERRORS = "label_errors"  # lang-mismatch ranking
    COMPONENTS = "components"  # ours: flat dup clusters


_ALIASES = {
    "irrelevants": "off_topic_samples",  # issue_manager.py:66-75
    "isolation": "off_topic_samples",
    "lang_mismatch": "label_errors",
    "clusters": "components",
    # the reference's approximate path returns this key when
    # approximate_nn=True (selfclean_cleaner.py:198-200); our near-dup
    # ranking IS the (verified) approximate path
    "approx_near_duplicates": "near_duplicates",
}


@dataclass
class IssueManager:
    """Rankings may be registered as THUNKS (zero-arg callables) and are
    built on first access — ``DedupPipeline.run`` registers them lazily
    so the stage pipeline's wall never pays for a ranking nobody reads
    (the reference computes each issue at ``predict()`` time too,
    selfclean_cleaner.py:182-213; an eager global-rank collect in the
    constructor is a Spark anti-pattern)."""

    issues: dict[str, DataFrame] = field(default_factory=dict)
    meta: dict[str, dict] = field(default_factory=dict)

    def register(self, issue_type: str | IssueTypes, df, **meta) -> None:
        """``df``: a DataFrame, or a zero-arg callable returning one
        (resolved and cached on first access)."""
        key = issue_type.value if isinstance(issue_type, IssueTypes) else issue_type
        self.issues[key] = df
        if meta:
            self.meta[key] = meta

    def keys(self) -> list[str]:
        return list(self.issues)

    def __getitem__(self, issue_type: str | IssueTypes) -> DataFrame | None:
        key = issue_type.value if isinstance(issue_type, IssueTypes) else issue_type
        key = _ALIASES.get(key, key)
        val = self.issues.get(key)
        if val is not None and callable(val) and not isinstance(val, DataFrame):
            val = val()
            self.issues[key] = val
        return val

    def get_issues(
        self, issue_type: str | IssueTypes, return_as_df: bool = False
    ) -> DataFrame | pd.DataFrame | None:
        df = self[issue_type]
        if df is None:
            return None
        return df.toPandas() if return_as_df else df
