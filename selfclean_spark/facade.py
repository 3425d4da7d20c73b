"""User-facing facade — the reference's entry-point shape, Spark-first.

Reference: ``SelfClean().run_on_image_folder(path)`` /
``run_on_dataset(ds)`` (selfclean/cleaner/selfclean.py:127-217) return
an IssueManager after featurize → fit → predict.  A reference user
switches by replacing the image folder with a code_files
parquet path / Iceberg table and keeping the same call shape:

    from selfclean_spark.facade import SelfCleanSpark
    issues = SelfCleanSpark(checkpoint_root="/ckpt/run1").run_on_parquet(
        "/data/code_files",
        issues_to_detect=["near_duplicates", "label_errors"],
    )
    issues.get_issues("near_duplicates", return_as_df=True)

``issues_to_detect`` mirrors the reference's IssueTypes dispatch
(selfclean_cleaner.py:182-213); ``auto_cleaning`` mirrors
AutoCleaningMixin's flag (auto_cleaning_mixin.py:20-35).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from selfclean_spark.catalog import ParquetCatalog
from selfclean_spark.config import PipelineConfig, SignatureConfig
from selfclean_spark.plans.pipeline import DedupPipeline
from selfclean_spark.results import IssueManager
from selfclean_spark.session import get_spark
from selfclean_spark.sources.code_files import read_code_files


class SelfCleanSpark:
    """≙ reference class ``SelfClean`` (selfclean/cleaner/selfclean.py:77)."""

    def __init__(
        self,
        checkpoint_root: str,
        spark: SparkSession | None = None,
        signature: SignatureConfig | None = None,
        jaccard_threshold: float = 0.8,
        auto_cleaning: bool = False,
        **pipeline_kwargs,
    ):
        self.spark = spark or get_spark("selfclean-spark")
        self.config = PipelineConfig(
            signature=signature or SignatureConfig(),
            jaccard_threshold=jaccard_threshold,
            auto_cleaning=auto_cleaning,
            **pipeline_kwargs,
        )
        self.pipeline = DedupPipeline(
            self.spark, ParquetCatalog(self.spark, checkpoint_root), self.config
        )

    def run_on_parquet(
        self,
        path: str,
        issues_to_detect: Iterable[str] | None = None,
        force: bool = False,
    ) -> IssueManager:
        """≙ run_on_image_folder (selfclean.py:127-173): path → issues."""
        return self.run_on_dataframe(
            read_code_files(self.spark, path), issues_to_detect, force
        )

    def run_on_table(
        self,
        fqn: str,
        issues_to_detect: Iterable[str] | None = None,
        force: bool = False,
    ) -> IssueManager:
        """Iceberg/HMS table variant (``catalog.db.table``)."""
        return self.run_on_dataframe(
            read_code_files(self.spark, f"table:{fqn}"), issues_to_detect, force
        )

    def run_on_dataframe(
        self,
        code_files: DataFrame,
        issues_to_detect: Iterable[str] | None = None,
        force: bool = False,
    ) -> IssueManager:
        """≙ run_on_dataset (selfclean.py:175-217): any relation with the
        code_files columns."""
        issue_types = set(issues_to_detect) if issues_to_detect else None
        return self.pipeline.run(code_files, force=force, issue_types=issue_types)
