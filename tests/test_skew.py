"""Salted-shuffle utilities: result parity with the plain operators on
a corpus with a deliberately hot key, and plan-shape checks."""

from pyspark.sql import functions as F

from selfclean_spark.functions.skew import salted_collect_list, salted_join


def _skewed(spark):
    # one hot repo owns ~90% of rows
    rows = [(i, "monorepo" if i % 10 else f"repo{i}", float(i)) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, repo string, v double").repartition(8)


def test_salted_join_parity(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("monorepo", "go"), ("repo10", "py"), ("repo20", "rs")],
        "repo string, lang string",
    )
    plain = big.join(small, ["repo"]).select("id", "repo", "lang")
    salted = salted_join(big, small, ["repo"], n_salts=8).select("id", "repo", "lang")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_parity(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("monorepo", "go")], "repo string, lang string")
    plain = big.join(small, ["repo"], "left").select("id", "lang")
    salted = salted_join(big, small, ["repo"], n_salts=4, how="left").select("id", "lang")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_collect_list_parity(spark):
    df = _skewed(spark)
    got = {
        r.repo: list(r.vs)
        for r in salted_collect_list(df, ["repo"], "v", n_salts=8).collect()
    }
    want = {
        r.repo: sorted(r.vs)
        for r in df.groupBy("repo").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows really do carry distinct salts (the property
    that breaks the single-task straggler)."""
    big = _skewed(spark)
    salted = big.withColumn("_salt", F.spark_partition_id() % F.lit(8))
    n_salts = (
        salted.filter(F.col("repo") == "monorepo").select("_salt").distinct().count()
    )
    assert n_salts > 1
