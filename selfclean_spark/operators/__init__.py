"""Pipeline stage operators (each: DataFrame -> DataFrame, pure plan
builders — no actions except where a stage is inherently iterative)."""
