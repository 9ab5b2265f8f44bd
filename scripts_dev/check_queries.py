"""Dev loop: run every registered query against its DuckDB oracle and
report pass/fail. Usage: python scripts_dev/check_queries.py [sf_dir] [name...]"""
import sys, time, traceback
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from gresearch_parquet_benchmarking_spark.session import get_spark
from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_queries, all_oracle_sql, release_persists,
)
from oracle_utils import run_compare

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

qs, oracles = all_queries(), all_oracle_sql()
fails = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.perf_counter()
    try:
        if name in oracles:
            problems = run_compare(spark, name, fn, oracles[name], sf_dir)
            n_rows = fn(spark, sf_dir).count()
            if n_rows == 0:
                print("  [ZERO-ROW WARNING]", end=" ")
        else:
            n = fn(spark, sf_dir).count()
            problems = [] if n >= 0 else ["negative count?!"]
            print(f"  (rows-only: {n} rows)", end=" ")
    except Exception as ex:
        problems = [f"EXCEPTION: {type(ex).__name__}: {ex}"]
        traceback.print_exc()
    finally:
        release_persists()  # drop tracked caches between queries
    dt = time.perf_counter() - t0
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name} ({dt:.1f}s)")
    for p in problems:
        print(f"     - {p}")
    fails += bool(problems)
print(f"\n{len([n for n in qs if not only or n in only])-fails} passed, {fails} failed")
spark.stop()
sys.exit(1 if fails else 0)
