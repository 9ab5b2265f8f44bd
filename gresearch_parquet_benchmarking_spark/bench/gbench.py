"""google-benchmark-shaped JSON results (H3) + the Spark parser (A9).

The reference's FlatBuffers suite emits google-benchmark JSON
(/root/reference/src/pq_fb_ns_data_generator.cc:654-675 via
--benchmark_format) which scripts/vizualize_flatbuffers_benchmark.py
parses by splitting `name` on '/' and grouping series (:17-25,74-79).
The engine mirrors both sides: `write_gbench_json` emits the same
shape from harness rows; `parse_gbench` is the Spark-side A9 operator
(read json → explode benchmarks → split name → typed columns).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_gbench_json(rows: list[dict], path: str, context: dict | None = None) -> str:
    """Emit harness measurements in google-benchmark's schema:
    {"context": {...}, "benchmarks": [{"name": "BM_X/args", "real_time":
    ns, "cpu_time": ns, "iterations": n, ...counters}]}."""
    benchmarks = []
    for r in rows:
        r = dict(r)
        name = r.pop("name")
        real_ns = float(r.pop("real_time_ns"))
        benchmarks.append(
            {
                "name": name,
                "run_type": "iteration",
                "iterations": int(r.pop("iterations", 1)),
                "real_time": real_ns,
                "cpu_time": float(r.pop("cpu_time_ns", real_ns)),
                "time_unit": "ns",
                **r,
            }
        )
    doc = {"context": context or {"library_build_type": "release"}, "benchmarks": benchmarks}
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def parse_gbench(spark: SparkSession, path: str) -> DataFrame:
    """A9: google-benchmark JSON → one typed row per benchmark run,
    with the slash-separated name decomposed into (benchmark, arg0,
    arg1, ...) like the reference's visualizer."""
    raw = spark.read.option("multiLine", "true").json(path)
    b = raw.select(F.explode("benchmarks").alias("b")).select("b.*")
    parts = F.split(F.col("name"), "/")
    # F.get (not getItem): names have variable arg counts and ANSI mode
    # raises on out-of-bounds array indexes
    return b.select(
        F.col("name"),
        F.get(parts, 0).alias("benchmark"),
        F.get(parts, 1).cast("long").alias("arg0"),
        F.get(parts, 2).cast("long").alias("arg1"),
        (F.col("real_time") / 1e6).alias("real_time_ms"),
        (F.col("cpu_time") / 1e6).alias("cpu_time_ms"),
        F.col("iterations").cast("long").alias("iterations"),
    )
