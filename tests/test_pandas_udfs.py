"""Pandas-UDF escape hatch: numerically agrees with the JVM
higher-order-function path; plan shows the Arrow (not row-pickle)
evaluator."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.functions.pandas_udfs import cosine_udf
from gresearch_parquet_benchmarking_spark.functions.vector import (
    cosine_similarity,
    to_double_array,
)
from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def _pairs(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    a = emb.select(F.col("vec_id").alias("ia"), to_double_array("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), to_double_array("embedding").alias("vb"))
    return a.join(b, F.col("ia") < F.col("ib"))


def test_udf_matches_builtin_cosine(spark):
    pairs = _pairs(spark)
    both = pairs.select(
        "ia",
        "ib",
        cosine_similarity(F.col("va"), F.col("vb")).alias("jvm"),
        cosine_udf(F.col("va"), F.col("vb")).alias("py"),
    )
    worst = both.agg(F.max(F.abs(F.col("jvm") - F.col("py")))).collect()[0][0]
    # numpy pairwise summation vs sequential fold: equal to ~1e-15
    assert worst < 1e-12, worst


def test_udf_uses_arrow_evaluator(spark):
    pairs = _pairs(spark).select(cosine_udf(F.col("va"), F.col("vb")).alias("c"))
    plan = formatted_plan(pairs)
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
