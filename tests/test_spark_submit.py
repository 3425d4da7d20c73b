"""North-rule launch-path check: the pipeline runs via
``spark-submit --py-files selfclean_spark.zip`` exactly as a cluster
would launch it (the zip is the ONLY way the package reaches
executors there — no repo on sys.path), end to end from a parquet
source to checkpointed components.

The subprocess gets a scrubbed PYTHONPATH so the import genuinely
resolves from the --py-files archive, not from the repo checkout.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # tiny deterministic corpus written by the session fixture
    sys.path.insert(0, REPO)
    from selfclean_spark.synth import generate_code_files

    source = str(tmp_path / "src_parquet")
    spark.createDataFrame(
        generate_code_files(n_rows=80, seed=11).code_files
    ).write.mode("overwrite").parquet(source)

    zip_path = str(tmp_path / "selfclean_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
        check=True, capture_output=True,
    )

    ckpt = str(tmp_path / "ckpt")
    out_json = str(tmp_path / "summary.json")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_main.py"),
            "--source", source,
            "--checkpoint-root", ckpt,
            "--output-json", out_json,
        ],
        env=env, capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.load(open(out_json))
    # the synth corpus plants duplicates — the submitted run must find them
    assert summary["verified_edges"] > 0
    assert 0 < summary["components"] < 80
    stages = {m["stage"] for m in summary["stage_metrics"]}
    assert {"signatures", "candidates", "verified_edges", "components"} <= stages
    # checkpoints are durable and resumable artifacts
    assert os.path.isdir(os.path.join(ckpt, "components"))
