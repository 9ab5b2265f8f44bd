"""Multimodal-column operators: image/audio/video payloads modeled as
opaque ``binary`` columns with typed metadata structs, plus the
Arrow-batched decode/feature-extract plumbing.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (``_fake_decode_batch``) — the
Spark-side plumbing (schema, mapInPandas batch shape, partitioning) is
real and oracle-tested: the fake's arithmetic has an exact SQL twin.

Scale: payload bytes never shuffle — metadata extraction is map-side;
the Pandas UDF path moves Arrow batches (maxRecordsPerBatch sized in
session.py) so a 100 TB binary corpus streams through executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import query
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def attach_binary_payload(doc: DataFrame) -> DataFrame:
    """Model each document as a multimodal asset: the utf-8 bytes stand
    in for an opaque media payload, with a typed metadata struct
    (mime kind, byte size, checksum) — the schema a real image/audio
    table would carry."""
    payload = F.encode(F.col("text"), "utf-8")
    kind = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return doc.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(F.col("text"), 256).alias("sha256"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                        WHEN 1 THEN 'audio/wav'
                                        ELSE 'video/mp4' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct, flattened for the oracle:
    byte size and checksum computed from the payload column itself."""
    doc = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(doc)
    return assets.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    ).orderBy("doc_id")


# --- decode kernel (STUB: no codecs in this container) ---------------------

DECODE_SCHEMA = (
    "doc_id long, kind string, width int, height int, n_frames int, decode_ok boolean"
)


def _fake_decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic FAKE decoder standing in for PIL/ffmpeg: derives
    'decoded' dimensions from payload size. A real deployment swaps
    only this function; the mapInPandas plumbing is unchanged.
    Raising NotImplementedError here would be the honest no-codec
    behavior; the fake keeps the pipeline testable end-to-end."""
    n_bytes = batch["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "width": (16 + n_bytes % 240).astype("int32"),
            "height": (16 + (n_bytes // 7) % 240).astype("int32"),
            "n_frames": ((n_bytes % 24) + 1).astype("int32"),
            "decode_ok": n_bytes > 0,
        }
    )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas — batches stream through
    Python without materializing a partition at once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode_batch(batch)

    flat = assets.select("doc_id", F.col("meta.kind").alias("kind"), "payload")
    return flat.mapInPandas(run, schema=DECODE_SCHEMA)


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                        WHEN 1 THEN 'audio/wav'
                                        ELSE 'video/mp4' END AS kind,
           CAST(16 + octet_length(encode(text)) % 240 AS INT) AS width,
           CAST(16 + (octet_length(encode(text)) // 7) % 240 AS INT) AS height,
           CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames,
           octet_length(encode(text)) > 0 AS decode_ok
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: attach payload → Arrow-batched
    mapInPandas decode (fake kernel) → typed feature columns. The
    oracle recomputes the fake's arithmetic in SQL, proving the UDF
    plumbing (schema, batching, types) end-to-end."""
    doc = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(attach_binary_payload(doc))
    return decoded.orderBy("doc_id")


@query(
    "multimodal_size_by_kind",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                        WHEN 1 THEN 'audio/wav'
                                        ELSE 'video/mp4' END AS kind,
           COUNT(*) AS n_assets,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           MAX(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
    FROM documents
    GROUP BY 1
    ORDER BY kind
    """,
)
def multimodal_size_by_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting per modality — integer sums, exact."""
    doc = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(doc)
    return (
        assets.groupBy(F.col("meta.kind").alias("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
        )
        .orderBy("kind")
    )


# --- resize / frame-sample kernels (same stub-decode contract) -------------

RESIZE_SCHEMA = "doc_id long, width int, height int, r_width int, r_height int"


def _fake_resize_batch(batch: pd.DataFrame, target: int = 64) -> pd.DataFrame:
    """FAKE resize: fit-within-target with integer aspect math (a real
    kernel swaps in PIL.Image.thumbnail; plumbing identical)."""
    w = batch["width"].astype("int64")
    h = batch["height"].astype("int64")
    landscape = w >= h
    rw = landscape * target + (~landscape) * ((w * target) // h).clip(lower=1)
    rh = (~landscape) * target + landscape * ((h * target) // w).clip(lower=1)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "width": batch["width"],
            "height": batch["height"],
            "r_width": rw.astype("int32"),
            "r_height": rh.astype("int32"),
        }
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH decoded AS (
        SELECT doc_id,
               CAST(16 + octet_length(encode(text)) % 240 AS INT) AS width,
               CAST(16 + (octet_length(encode(text)) // 7) % 240 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(CASE WHEN width >= height THEN 64
                     ELSE GREATEST((width * 64) // height, 1) END AS INT) AS r_width,
           CAST(CASE WHEN width >= height THEN GREATEST((height * 64) // width, 1)
                     ELSE 64 END AS INT) AS r_height
    FROM decoded
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage Arrow-batched pipeline: decode (mapInPandas) → resize
    (mapInPandas) — the multi-kernel chaining a real image pipeline
    needs; both kernels are swappable fakes with SQL-twin arithmetic."""
    doc = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(attach_binary_payload(doc))

    def run(batches):
        for batch in batches:
            yield _fake_resize_batch(batch)

    return (
        decoded.select("doc_id", "width", "height")
        .mapInPandas(run, schema=RESIZE_SCHEMA)
        .orderBy("doc_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH decoded AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                                            WHEN 1 THEN 'audio/wav'
                                            ELSE 'video/mp4' END AS kind,
               CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames
        FROM documents
    )
    SELECT doc_id, n_frames,
           array_to_string(list_transform(range(0, LEAST(n_frames, 4)),
                           i -> i * GREATEST(n_frames // 4, 1)), ',') AS sampled_frames,
           CAST(LEN(range(0, LEAST(n_frames, 4))) AS BIGINT) AS n_sampled
    FROM decoded
    WHERE kind = 'video/mp4'
    ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform frame sampling for video assets: ≤4 frames at stride
    n//4 — built-in sequence/transform (no UDF needed for the sampling
    itself; only the decode was Python)."""
    doc = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(attach_binary_payload(doc))
    n = F.col("n_frames")
    k = F.least(n, F.lit(4))
    stride = F.greatest(F.floor(n / 4).cast("int"), F.lit(1))
    frames = F.transform(F.sequence(F.lit(0), k - 1), lambda i: i * stride)
    return (
        decoded.filter(F.col("kind") == "video/mp4")
        .select(
            "doc_id",
            "n_frames",
            F.array_join(frames, ",").alias("sampled_frames"),
            k.cast("long").alias("n_sampled"),
        )
        .orderBy("doc_id")
    )
