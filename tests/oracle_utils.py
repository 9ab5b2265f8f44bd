"""Oracle-differential comparison utilities, mimicking the driver's
CORRECTNESS gate: run the Spark query and the DuckDB SQL twin on the
same parquet tables, then compare row-count + schema-shape +
order-insensitive values (exact for ints/strings, bit-exact for
doubles — the engine's determinism contract, registry.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from gresearch_parquet_benchmarking_spark.sources.tables import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(map(str.lower, actual.columns)) != sorted(map(str.lower, expected.columns)):
        problems.append(
            f"column sets differ: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
        )
        return problems
    expected = expected.rename(
        columns={e: a for a in actual.columns for e in expected.columns if e.lower() == a.lower()}
    )
    if len(actual) != len(expected):
        problems.append(f"row counts differ: spark={len(actual)} oracle={len(expected)}")
    # Typed check, emulating the driver's value-hash gate: DuckDB's
    # SUM(integer) returns HUGEINT (pandas float64 / arrow decimal128)
    # while Spark returns BIGINT — values compare equal in pandas but
    # the driver hashes typed values and fails. Flag int-vs-float kind
    # mismatches so the uncast-SUM class of bug is caught locally.
    for c in actual.columns:
        ak, ek = actual[c].dtype.kind, expected[c].dtype.kind
        if {ak, ek} == {"i", "f"} or {ak, ek} == {"u", "f"}:
            problems.append(
                f"column {c!r}: dtype kind mismatch spark={actual[c].dtype} "
                f"oracle={expected[c].dtype} (driver hash gate fails on typed "
                f"values — cast the oracle, e.g. CAST(SUM(x) AS BIGINT))"
            )
    a = _normalize(actual)
    e = _normalize(expected)
    if len(a) == len(e):
        for c in a.columns:
            av, ev = a[c], e[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
                bad = 0
                worst = 0.0
                for x, y in zip(av.astype(float), ev.astype(float)):
                    if (isinstance(x, float) and math.isnan(x)) and (
                        isinstance(y, float) and math.isnan(y)
                    ):
                        continue
                    if x != y:
                        bad += 1
                        worst = max(worst, abs((x or 0) - (y or 0)))
                if bad:
                    problems.append(f"column {c!r}: {bad} float mismatches, worst abs diff {worst:g}")
            else:
                neq = ~(av.eq(ev) | (av.isna() & ev.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"column {c!r}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={av.iloc[i]!r} oracle={ev.iloc[i]!r}"
                    )
    return problems


def run_compare(spark, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    actual = fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        expected = con.sql(sql).df()
    finally:
        con.close()
    return compare_frames(actual, expected)
