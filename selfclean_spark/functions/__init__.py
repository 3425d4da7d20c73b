"""Vectorized NumPy kernels and native-expression helpers.

Everything in this package is either (a) a pure NumPy function invoked
inside Arrow-batched pandas UDFs (the ONLY Python that runs on
executors), or (b) a builder of native pyspark.sql.functions column
expressions (JVM-side, whole-stage-codegen'd).
"""
