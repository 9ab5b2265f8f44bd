"""Z-order (Morton-curve) clustering layout: multi-dimensional
row-group skipping.

The reference's statistics story (metadata_benchmark.cc:44-79) measures
stats decode; what the stats BUY at 100 TB is row-group skipping, and
skipping quality is a layout property. A single-column sort gives
perfect min/max ranges on one dimension and none on any other
(tests/test_layout_skipping.py); interleaving the bits of several
rank-normalized dimensions (the Morton / Z-order curve every lakehouse
engine ships — Delta OPTIMIZE ZORDER, Iceberg rewrite zorder) gives
partial skipping on EVERY participating dimension.

Spark-first: the z-key is pure built-in expressions (shiftleft /
shiftright / bitwiseAND — whole-stage codegen, no UDF); min/max
normalization is one tiny aggregate broadcast back onto the scan; the
physical clustering is ``repartitionByRange(z) + sortWithinPartitions
(z)`` — exactly the shuffle a cluster-scale rewrite performs, with one
sorted file per range partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 10  # 2^10 buckets per dimension; 2 dims → 20-bit z-key


def _bucketize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min/max-normalize ``col`` into [0, 2^bits) as a long. NULLs and
    degenerate (mn == mx) dimensions land in bucket 0."""
    n = F.lit((1 << bits) - 1)
    span = mx - mn
    scaled = F.when(
        col.isNull() | (span <= 0), F.lit(0).cast("long")
    ).otherwise(
        F.least(n, F.floor((col.cast("double") - mn) / span * (1 << bits)).cast("long"))
    )
    return F.greatest(scaled, F.lit(0).cast("long"))


def zorder_key(buckets: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each bucket column into one
    Morton key — bit b of dimension i lands at position b*ndims + i."""
    ndims = len(buckets)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(buckets):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * ndims + i)
    return key


def _numeric_view(df: DataFrame, c: str) -> Column:
    """``c`` as a double: temporal types go through epoch-µs (ANSI
    forbids a direct timestamp→double cast), numerics cast directly."""
    dt = df.schema[c].dataType.typeName()
    if dt in ("timestamp", "timestamp_ntz", "date"):
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    return F.col(c).cast("double")


def zorder_by(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Return ``df`` physically clustered along the Z-order curve of
    ``cols`` (numeric/date/timestamp). Write the result with
    ``write_parquet(row_group_rows=...)`` to get row groups whose
    min/max stats are tight in every listed dimension.

    Scale shape: one O(1)-row min/max aggregate (broadcast), a map-side
    key expression, then a single range shuffle — the same cost as any
    global sort, which a 100 TB OPTIMIZE job pays once per rewrite and
    amortizes over every subsequent multi-dimensional scan."""
    numeric = {c: _numeric_view(df, c) for c in cols}
    stats = df.agg(
        *[F.min(numeric[c]).alias(f"__mn_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"__mx_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    buckets = [
        _bucketize(numeric[c], F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
        for c in cols
    ]
    keyed = with_stats.withColumn("__z", zorder_key(buckets, bits))
    npart = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    return (
        keyed.repartitionByRange(npart, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
    )
