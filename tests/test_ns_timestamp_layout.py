"""Regression guard for CLAUDE.md rule 4: events.parquet has shipped
as both TIMESTAMP(MICROS) and TIMESTAMP(NANOS) across driver testdata
generations. This builds a NANOS-layout twin of the sf0.001 testdata —
with sub-microsecond jitter so events that TIE at µs precision are
DISTINCT at ns precision (the advisor's round-4 failure scenario) —
and runs every batch event query against its DuckDB oracle on it.
Both engines see the same file, so any µs/ns truncation or ordering
divergence between the Spark builder and the oracle SQL breaks the
value hash here before a regenerated driver testdata can."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMOKE
from oracle_utils import run_compare

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_oracle_sql,
    all_queries,
    release_persists,
)
from gresearch_parquet_benchmarking_spark.sources.tables import TABLES, table_path

QUERIES = all_queries()
ORACLES = all_oracle_sql()

# batch queries whose oracle reads the events table (streaming twins
# exercise the same loader through their own suite)
EVENT_QUERIES = sorted(
    name
    for name, sql in ORACLES.items()
    if "events" in sql and not name.startswith("stream_")
)


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ns_testdata")
    for t in TABLES:
        src = table_path(SF_SMOKE, t)
        if t != "events":
            shutil.copy(src, os.path.join(str(out), os.path.basename(src)))
    ev = pq.read_table(table_path(SF_SMOKE, "events"))
    ts_us = pc.cast(ev["ts"], pa.int64()).combine_chunks()  # epoch µs
    # ns = µs * 1000 + (event_id % 997): sub-µs jitter, so µs-tied
    # events become ns-distinct — both engines read the same jittered
    # file, so only µs/ns handling differences can diverge
    import numpy as np

    eid = pc.cast(ev["event_id"], pa.int64()).combine_chunks().to_numpy()
    ts_ns = pa.array(ts_us.to_numpy() * 1000 + (eid % 997), type=pa.int64())
    ev = ev.set_column(
        ev.schema.get_field_index("ts"),
        "ts",
        pc.cast(ts_ns, pa.timestamp("ns")),
    )
    dest = os.path.join(str(out), "events.parquet")
    pq.write_table(ev, dest, version="2.6", coerce_timestamps=None)
    # the file must actually carry the NANOS physical annotation
    meta = pq.read_schema(dest)
    assert "ns" in str(meta.field("ts").type), meta
    return str(out)


def test_event_query_list_nonempty():
    assert len(EVENT_QUERIES) >= 10, EVENT_QUERIES


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_oracle_match_on_nanos_layout(spark, ns_dir, name):
    problems = run_compare(spark, name, QUERIES[name], ORACLES[name], ns_dir)
    release_persists()
    assert not problems, f"{name} (NANOS layout): " + "; ".join(problems)
