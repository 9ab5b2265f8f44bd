"""Property-based tests (hypothesis) for the determinism contract:
for arbitrary float data, the engine's decimal-sum/md5-hash recipes
must agree with DuckDB bit-for-bit — not just on the shipped testdata.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

SETTINGS = dict(
    max_examples=5,  # Spark jobs per example — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


@given(values=st.lists(st.tuples(st.sampled_from("abc"), floats), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_decimal_sum_matches_duckdb(spark, values):
    df = spark.createDataFrame(values, "k string, v double")
    got = {
        r.k: r.s
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", values)
    want = dict(
        con.sql(
            "SELECT k, CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) FROM t GROUP BY k"
        ).fetchall()
    )
    assert got == want  # bit-exact, both engines


@given(texts=st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_md5_hash64_matches_duckdb(spark, texts):
    from gresearch_parquet_benchmarking_spark.functions.text_funcs import md5_hash64

    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, "t string")
    got = sorted(r.h for r in df.select(md5_hash64(F.col("t")).alias("h")).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(
        x[0] for x in con.sql("SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT FROM t").fetchall()
    )
    assert got == want


@given(
    vals=st.lists(floats, min_size=2, max_size=64),
)
@settings(**SETTINGS)
def test_rowwise_double_arithmetic_matches(spark, vals):
    """Per-row IEEE products/sums are identical across engines (the
    premise that lets row expressions be decimal-cast post hoc)."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v double")
    got = {r.i: r.e for r in df.select("i", (F.col("v") * 1.1 + 3.0).alias("e")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.sql("SELECT i, v * 1.1 + 3.0 FROM t").fetchall())
    assert got == want


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.integers(min_value=1, max_value=600)),
        min_size=1,
        max_size=120,
    )
)
@settings(**SETTINGS)
def test_sequence_packing_invariants_random_corpora(spark, docs):
    """Packing invariants hold for ARBITRARY corpora, not just the
    shipped testdata: every doc starts in the bin its exclusive prefix
    sum selects, token totals are conserved per bin, and a doc spans
    iff its tokens cross the next bin boundary."""
    from pyspark.sql import Window as W

    from gresearch_parquet_benchmarking_spark.operators.pipeline3 import PACK_BUDGET

    rows = [(i, lang, n) for i, (lang, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    got = (
        df.withColumn("off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"off div {PACK_BUDGET}"))
        .withColumn("end_bin", F.expr(f"(off + n_tok - 1) div {PACK_BUDGET}"))
        .collect()
    )
    # python reference model: sequential concat per lang
    offsets: dict[str, int] = {}
    for r in sorted(got, key=lambda r: (r.lang, r.doc_id)):
        off = offsets.get(r.lang, 0)
        assert r.off == off
        assert r.bin == off // PACK_BUDGET
        assert r.end_bin == (off + r.n_tok - 1) // PACK_BUDGET
        assert (r.end_bin > r.bin) == (off % PACK_BUDGET + r.n_tok > PACK_BUDGET)
        offsets[r.lang] = off + r.n_tok


# ---------------------------------------------------------------------------
# Buffered-funnel machine ≡ vectorized batch semantics (round 6)
# ---------------------------------------------------------------------------

_events = st.lists(
    st.tuples(st.sampled_from([0, 1, 2]), st.integers(min_value=0, max_value=50)),
    min_size=0,
    max_size=40,
)


@given(evs=_events, split=st.integers(min_value=0, max_value=40))
@settings(max_examples=300, deadline=None)
def test_ordered_machine_equals_batch_semantics(evs, split):
    """The buffered funnel replays (ts, code) events through the
    sequential machine in sorted order, possibly across several sealed
    prefixes. For ANY event multiset and ANY seal split point, that
    must equal the one-shot min-based batch semantics the lean funnel
    (and the oracle SQL) computes — the composition property the whole
    out-of-order design rests on. Pure Python: no Spark session."""
    import numpy as np

    from gresearch_parquet_benchmarking_spark.streaming.stateful_funnel import (
        _advance,
        _advance_ordered,
    )

    pairs = [(ts, code) for code, ts in evs]
    # one-shot batch semantics over the full multiset (the r13 kernel
    # takes coded tinyint/ts numpy arrays; evs codes ARE the kernel's
    # _VIEW/_CLICK/_PURCHASE codes)
    et = np.array([c for _, c in pairs], dtype=np.int8)
    ts_arr = np.array([t for t, _ in pairs], dtype=np.int64)
    want = (
        _advance(None, None, None, et, ts_arr)
        if len(pairs)
        else (None, None, None)
    )
    # sequential machine over the sorted stream, split into two sealed
    # prefixes at an arbitrary point of the SORTED order
    ordered = sorted(pairs)
    cut = min(split, len(ordered))
    v = c = p = None
    v, c, p = _advance_ordered(v, c, p, ordered[:cut])
    v, c, p = _advance_ordered(v, c, p, ordered[cut:])
    assert (v, c, p) == tuple(want)
