"""Pipeline orchestration (stage DAG, checkpoints, resume, lineage)."""
