"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference Parquet benchmarking suite
(Neelaksh-Singh/gresearch_parquet_benchmarking), re-expressed Spark-first.

Layout (SURVEY.md §7):
    session.py      SparkSession factory + knob map
    sources/        data generators (G1-G5), table catalog, readers (R1-R7)
    operators/      relational query surface, dedup, similarity, text, report
    functions/      reusable column-expression builders (vector math, text)
    plans/          plan-inspection helpers (pushdown/broadcast assertions)
    streaming/      structured-streaming operators over the events table
    bench/          benchmark harness (H1-H5) + writer sweeps (S1-S4)
"""

__version__ = "0.1.0"
