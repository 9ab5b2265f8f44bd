"""Driver-path simulation: a VANILLA SparkSession (no engine confs —
the driver builds its own session and the engine must self-apply
everything) + the __spark_entry__ contract + the same compare helper,
over the current _WINDOW_PRIORITY at the driver gate SF. Run before
every rotation lands: a window query that is green under the engine
session but depends on an engine conf fails HERE, not in the round's
CORRECTNESS artifact.

Usage: python scripts_dev/check_window_vanilla.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import SparkSession


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from oracle_utils import run_compare

    from gresearch_parquet_benchmarking_spark.operators.registry import (
        _WINDOW_PRIORITY,
        release_persists,
    )

    qs, oracles = e.queries(), e.oracle_sql()
    fails = 0
    for name in _WINDOW_PRIORITY:
        try:
            problems = run_compare(spark, name, qs[name], oracles[name], sf)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            problems = [f"EXCEPTION {type(ex).__name__}: {ex}"]
        finally:
            release_persists()
        if problems:
            fails += 1
            print("FAIL", name, problems[:2])
    n = len(_WINDOW_PRIORITY)
    print(f"window check: {n - fails}/{n} passed on a vanilla session")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
