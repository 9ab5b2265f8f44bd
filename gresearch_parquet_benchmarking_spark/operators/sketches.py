"""Deterministic cross-engine sketches: KMV distinct, HLL registers,
Bloom membership, and count-min frequency.

The existing ``agg_approx_sketches`` entry is rows-only because Spark's
HLL++/t-digest sketch values are engine-specific. These four rebuild
the same sketch *families* on top of md5 (the repo's only cross-engine
hash — CLAUDE.md rule 3), so every register, bitmap word, and counter
is bit-identical between Spark and DuckDB and the full value-hash gate
applies. That matters at 100 TB for two reasons:

* Sketches are THE tool for distinct counts / membership / heavy
  hitters over data too big to hold exactly — each build here is one
  map-side pass plus a constant-width shuffle (hash / register /
  bitmap-word keys, never raw values), and the merged state per group
  is O(k) / O(m) / O(words) / O(depth×width) — kilobytes regardless of
  input size, so the reduce side never grows with data volume.
* A deterministic sketch can be *verified* by a differential oracle;
  an engine-native one can only be eyeballed. Pipelines that gate data
  quality on sketch output (e.g. dedup-rate monitors) need the former.

No Python in any plan: md5 / conv / shiftleft / bit_or / bit_count /
bin are all JVM built-ins inside whole-stage codegen.

Estimator math (all published):
* KMV (k-minimum-values): with k-th smallest of n distinct uniform
  hashes in [0, M), E[h_k] ≈ k·M/(n+1) → n̂ = (k−1)·M/h_k
  (Bar-Yossef et al., RANDOM 2002).
* HLL raw estimator: α_m·m²/Σ 2^(−ρ_j) (Flajolet et al., AofA 2007);
  the 2^(−ρ) sum is kept EXACT by scaling to integers: Σ 2^(55−ρ)
  as BIGINT (ρ ≤ 55 ⇒ no overflow at m=64), one double division at
  the end — no float-accumulation order dependence.
* Bloom: 2 independent md5 hashes into 4×62 = 248 bits per group.
* Count-min: depth 3 × width 256, estimate = min over rows
  (Cormode & Muthukrishnan, J.Alg 2005).

Reference parity: the reference has no sketch suite (its aggregation
surface is gbench timing tables, scripts/visualize_stats.py:30-106);
this extends SURVEY.md §2.9's training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    md5_hash64,
    sql_md5_hash64,
)
from gresearch_parquet_benchmarking_spark.operators.registry import query, track_persist
from gresearch_parquet_benchmarking_spark.sources.events import load_events
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

HASH_BITS = 60                      # 15 hex chars; < 2^63 so BIGINT-safe
M_SCALE = float(1 << 60)            # hash domain size as exact double
KMV_K = 64
HLL_M = 64                          # p=6 → 64 registers
HLL_RHO_MAX = 55                    # 54-bit suffix → ρ ∈ [1, 55]
HLL_POW_SCALE = 1 << 55             # Σ 2^(55−ρ) ≤ 64·2^54 = 2^60: exact
# α_64·m²·2^55 — single premultiplied double constant, embedded with
# repr() on both engines so the one division is the only float op.
HLL_EST_NUM = 0.709 * (HLL_M * HLL_M) * float(HLL_POW_SCALE)
BLOOM_BITS = 248                    # 4 words × 62 bits (sign-safe shifts)
BLOOM_WORD_BITS = 62
CM_DEPTH = 3
CM_WIDTH = 256


def _h60(c, salt: str | None = None):
    c = c.cast("string")
    if salt is not None:
        c = F.concat(F.lit(f"{salt}|"), c)
    return md5_hash64(c, bits=HASH_BITS)


def _sql_h60(expr: str, salt: str | None = None) -> str:
    e = f"CAST({expr} AS VARCHAR)"
    if salt is not None:
        e = f"'{salt}|' || {e}"
    return sql_md5_hash64(e, bits=HASH_BITS)


# ---------------------------------------------------------------------------
# KMV distinct estimator
# ---------------------------------------------------------------------------

@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT o_orderpriority,
               {_sql_h60('o_custkey')} AS h
        FROM orders
    ), r AS (
        SELECT o_orderpriority, h,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
        FROM h
    ), t AS (
        SELECT o_orderpriority, COUNT(*)::BIGINT AS k_seen, MAX(h) AS kth_hash
        FROM r WHERE rn <= {KMV_K} GROUP BY o_orderpriority
    ), e AS (
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey)::BIGINT AS exact_distinct
        FROM orders GROUP BY o_orderpriority
    )
    SELECT t.o_orderpriority, k_seen, kth_hash,
           ROUND(CASE WHEN k_seen < {KMV_K} THEN CAST(k_seen AS DOUBLE)
                 ELSE {float(KMV_K - 1)!r} * {M_SCALE!r} / CAST(kth_hash AS DOUBLE)
                 END, 4) AS est_distinct,
           exact_distinct
    FROM t JOIN e USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct o_custkey per order priority via k-minimum-values.

    Scale shape: the shuffle carries (group, 60-bit hash) pairs only —
    constant width — and the window keeps k rows per group. At 100 TB
    the refinement is a per-partition top-k partial (mapPartitions
    heap) before the shuffle so only n_partitions·k rows move; the
    merged sketch is still just the k smallest hashes.
    """
    o = load_table(spark, sf_dir, "orders")
    h = (
        o.select("o_orderpriority", _h60(F.col("o_custkey")).alias("h"))
        .dropDuplicates(["o_orderpriority", "h"])
    )
    w = W.partitionBy("o_orderpriority").orderBy("h")
    t = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("k_seen"),
            F.max("h").alias("kth_hash"),
        )
    )
    e = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    est = F.round(
        F.when(F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")).otherwise(
            F.lit(float(KMV_K - 1)) * F.lit(M_SCALE) / F.col("kth_hash").cast("double")
        ),
        4,
    )
    return (
        t.join(e, "o_orderpriority")
        .select(
            "o_orderpriority", "k_seen", "kth_hash",
            est.alias("est_distinct"), "exact_distinct",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# HLL registers (exact-integer power sum)
# ---------------------------------------------------------------------------

@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH b AS (
        SELECT o_orderpriority,
               {_sql_h60('o_custkey')} AS h
        FROM orders
    ), rows_ AS (
        SELECT o_orderpriority,
               h % {HLL_M} AS reg,
               h >> 6 AS w
        FROM b
    ), regs AS (
        SELECT o_orderpriority, reg,
               MAX(CASE WHEN w = 0 THEN {HLL_RHO_MAX}
                   ELSE {HLL_RHO_MAX} - LENGTH(bin(w)) END) AS rho
        FROM rows_ GROUP BY o_orderpriority, reg
    ), g AS (
        SELECT o_orderpriority,
               COUNT(*)::BIGINT AS m_used,
               SUM(1::BIGINT << ({HLL_RHO_MAX} - rho))::BIGINT AS s_present
        FROM regs GROUP BY o_orderpriority
    ), e AS (
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey)::BIGINT AS exact_distinct
        FROM orders GROUP BY o_orderpriority
    )
    SELECT g.o_orderpriority, m_used,
           s_present + ({HLL_M} - m_used) * {HLL_POW_SCALE} AS s_scaled,
           ROUND({HLL_EST_NUM!r}
                 / CAST(s_present + ({HLL_M} - m_used) * {HLL_POW_SCALE} AS DOUBLE),
                 4) AS est_distinct,
           exact_distinct
    FROM g JOIN e USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog raw estimator with bit-exact registers.

    ρ (leading-zero rank of the 54-bit hash suffix) is computed with
    LENGTH(bin(w)) — identical in both engines since neither pads —
    and the harmonic sum Σ2^(−ρ) is scaled to exact BIGINTs
    (Σ 2^(55−ρ), max 2^60) so no float accumulation order can differ.
    Scale shape: map-side register extraction, shuffle key is
    (group, register) — at most m=64 rows per group survive the
    partial MAX, so the merge traffic is O(m) per group regardless of
    input rows. The raw estimator (no small/large-range correction) is
    intentional: corrections branch on the estimate, the demo pins the
    register pipeline; exact_distinct rides along for calibration.
    """
    o = load_table(spark, sf_dir, "orders")
    b = o.select("o_orderpriority", _h60(F.col("o_custkey")).alias("h"))
    rows = b.select(
        "o_orderpriority",
        (F.col("h") % HLL_M).alias("reg"),
        F.shiftright("h", 6).alias("w"),
    )
    rho = F.when(F.col("w") == 0, HLL_RHO_MAX).otherwise(
        HLL_RHO_MAX - F.length(F.bin("w"))
    )
    regs = (
        rows.withColumn("rho", rho)
        .groupBy("o_orderpriority", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    g = regs.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("m_used"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - rho)")).cast("long").alias("s_present"),
    )
    e = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    out = g.withColumn(
        "s_scaled",
        F.col("s_present") + (HLL_M - F.col("m_used")) * F.lit(HLL_POW_SCALE),
    ).withColumn(
        "est_distinct",
        F.round(F.lit(HLL_EST_NUM) / F.col("s_scaled").cast("double"), 4),
    )
    return (
        out.join(e, "o_orderpriority")
        .select("o_orderpriority", "m_used", "s_scaled", "est_distinct", "exact_distinct")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Bloom filter membership
# ---------------------------------------------------------------------------

@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH ins AS (
        SELECT DISTINCT o_orderpriority AS grp, o_custkey AS ck FROM orders
    ), pos AS (
        SELECT grp,
               {_sql_h60('ck', 'b1')} % {BLOOM_BITS} AS p1,
               {_sql_h60('ck', 'b2')} % {BLOOM_BITS} AS p2
        FROM ins
    ), bits AS (
        SELECT grp, p1 AS pos FROM pos
        UNION ALL
        SELECT grp, p2 AS pos FROM pos
    ), bloom AS (
        SELECT grp, pos // {BLOOM_WORD_BITS} AS word_idx,
               bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT))::BIGINT AS mask
        FROM bits GROUP BY grp, pos // {BLOOM_WORD_BITS}
    ), stats AS (
        SELECT grp, SUM(bit_count(mask))::BIGINT AS bits_set FROM bloom GROUP BY grp
    ), probe AS (
        SELECT c_custkey AS ck FROM customer WHERE c_custkey % 3 = 0
    ), pp AS (
        SELECT g.grp, p.ck,
               {_sql_h60('p.ck', 'b1')} % {BLOOM_BITS} AS p1,
               {_sql_h60('p.ck', 'b2')} % {BLOOM_BITS} AS p2
        FROM probe p CROSS JOIN (SELECT DISTINCT grp FROM ins) g
    ), checked AS (
        SELECT pp.grp, pp.ck,
               CASE WHEN (COALESCE(b1.mask, 0) & (1::BIGINT << CAST(pp.p1 % {BLOOM_WORD_BITS} AS INT))) <> 0
                     AND (COALESCE(b2.mask, 0) & (1::BIGINT << CAST(pp.p2 % {BLOOM_WORD_BITS} AS INT))) <> 0
                    THEN 1 ELSE 0 END AS hit,
               CASE WHEN i.ck IS NOT NULL THEN 1 ELSE 0 END AS present
        FROM pp
        LEFT JOIN bloom b1 ON b1.grp = pp.grp AND b1.word_idx = pp.p1 // {BLOOM_WORD_BITS}
        LEFT JOIN bloom b2 ON b2.grp = pp.grp AND b2.word_idx = pp.p2 // {BLOOM_WORD_BITS}
        LEFT JOIN ins i ON i.grp = pp.grp AND i.ck = pp.ck
    )
    SELECT c.grp AS o_orderpriority,
           COUNT(*)::BIGINT AS n_probed,
           SUM(c.hit)::BIGINT AS n_hits,
           SUM(c.present)::BIGINT AS n_present,
           SUM(CASE WHEN c.hit = 1 AND c.present = 0 THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
           MAX(s.bits_set) AS bits_set
    FROM checked c JOIN stats s ON s.grp = c.grp
    GROUP BY c.grp
    ORDER BY c.grp
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 248-bit Bloom filter with a false-positive audit.

    Build: each inserted key sets 2 md5-derived bits; the bitmap is a
    bit_or aggregate over (group, word) — 4 BIGINT words per group, so
    the reduce state is 32 bytes/group no matter how many keys stream
    in. Probe: customers with c_custkey % 3 = 0 (TPC-H leaves ~1/3 of
    customers order-less, so the probe set mixes members and
    non-members) against every group's filter via a broadcast of the
    20-row bloom table; n_false_pos audits the advertised FP rate.
    No bit ever recomputed driver-side — membership is a JVM bitwise
    AND in the join projection.
    """
    o = load_table(spark, sf_dir, "orders")
    ins = o.select(
        F.col("o_orderpriority").alias("grp"), F.col("o_custkey").alias("ck")
    ).distinct()
    pos = ins.select(
        "grp",
        (_h60(F.col("ck"), "b1") % BLOOM_BITS).alias("p1"),
        (_h60(F.col("ck"), "b2") % BLOOM_BITS).alias("p2"),
    )
    bits = pos.select("grp", F.explode(F.array("p1", "p2")).alias("pos"))
    bloom = (
        bits.select(
            "grp",
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD_BITS} AS INT))").alias("m"),
        )
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("m").alias("mask"))
    )
    stats = bloom.groupBy("grp").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("bits_set")
    )
    probe = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("ck"))
    )
    groups = ins.select("grp").distinct()
    pp = probe.crossJoin(F.broadcast(groups)).select(
        "grp", "ck",
        (_h60(F.col("ck"), "b1") % BLOOM_BITS).alias("p1"),
        (_h60(F.col("ck"), "b2") % BLOOM_BITS).alias("p2"),
    )
    b1 = bloom.select(
        F.col("grp").alias("g1"), F.col("word_idx").alias("w1"), F.col("mask").alias("mask1")
    )
    b2 = bloom.select(
        F.col("grp").alias("g2"), F.col("word_idx").alias("w2"), F.col("mask").alias("mask2")
    )
    mem = ins.withColumn("present_flag", F.lit(1))
    checked = (
        pp.join(
            F.broadcast(b1),
            (F.col("grp") == F.col("g1"))
            & ((F.col("p1") / BLOOM_WORD_BITS).cast("long") == F.col("w1")),
            "left",
        )
        .join(
            F.broadcast(b2),
            (F.col("grp") == F.col("g2"))
            & ((F.col("p2") / BLOOM_WORD_BITS).cast("long") == F.col("w2")),
            "left",
        )
        .join(mem, ["grp", "ck"], "left")
        .select(
            "grp",
            F.when(
                (
                    F.coalesce(F.col("mask1"), F.lit(0)).bitwiseAND(
                        F.expr(f"shiftleft(1L, CAST(p1 % {BLOOM_WORD_BITS} AS INT))")
                    )
                    != 0
                )
                & (
                    F.coalesce(F.col("mask2"), F.lit(0)).bitwiseAND(
                        F.expr(f"shiftleft(1L, CAST(p2 % {BLOOM_WORD_BITS} AS INT))")
                    )
                    != 0
                ),
                1,
            )
            .otherwise(0)
            .alias("hit"),
            F.coalesce(F.col("present_flag"), F.lit(0)).alias("present"),
        )
    )
    agg = checked.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_probed"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.sum("present").cast("long").alias("n_present"),
        F.sum(
            F.when((F.col("hit") == 1) & (F.col("present") == 0), 1).otherwise(0)
        ).cast("long").alias("n_false_pos"),
    )
    return (
        agg.join(stats, "grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "n_probed", "n_hits", "n_present", "n_false_pos", "bits_set",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Count-min frequency
# ---------------------------------------------------------------------------

@query(
    "sketch_countmin_freq",
    oracle=f"""
    WITH rows_ AS (
        SELECT p_brand, j,
               {_sql_h60("CAST(j AS VARCHAR) || '|' || p_brand")} % {CM_WIDTH} AS bucket
        FROM part CROSS JOIN (VALUES (0), (1), (2)) AS depth(j)
    ), cm AS (
        SELECT j, bucket, COUNT(*)::BIGINT AS cnt
        FROM rows_ GROUP BY j, bucket
    ), probe AS (
        SELECT DISTINCT p_brand, j,
               {_sql_h60("CAST(j AS VARCHAR) || '|' || p_brand")} % {CM_WIDTH} AS bucket
        FROM part CROSS JOIN (VALUES (0), (1), (2)) AS depth(j)
    ), est AS (
        SELECT p.p_brand, MIN(c.cnt) AS est_freq
        FROM probe p JOIN cm c ON c.j = p.j AND c.bucket = p.bucket
        GROUP BY p.p_brand
    ), e AS (
        SELECT p_brand, COUNT(*)::BIGINT AS exact_freq FROM part GROUP BY p_brand
    )
    SELECT est.p_brand, est_freq, exact_freq
    FROM est JOIN e USING (p_brand)
    ORDER BY est.p_brand
    """,
)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (3×256) over part.p_brand with exact audit.

    Build is one scan: each row maps to CM_DEPTH (row, bucket) cells
    via salted md5, the count aggregate is map-side partial, and the
    whole sketch is ≤ 768 cells — broadcastable state that absorbs any
    input volume. Estimate = min over depth rows (one-sided: collisions
    only inflate, so est_freq ≥ exact_freq always — the test pins it).
    The salt folds the depth index into the hash input, which is how a
    single md5 primitive yields CM_DEPTH pairwise-independent-enough
    hash rows without a second hash family.
    """
    p = load_table(spark, sf_dir, "part")
    depth = F.explode(F.array(*[F.lit(j) for j in range(CM_DEPTH)])).alias("j")
    rows = p.select("p_brand").select("p_brand", depth)
    bucket = (
        _h60(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("p_brand")))
        % CM_WIDTH
    ).alias("bucket")
    cm = (
        rows.select("j", bucket)
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    probe = (
        p.select("p_brand").distinct().select("p_brand", depth).select("p_brand", "j", bucket)
    )
    est = (
        probe.join(F.broadcast(cm), ["j", "bucket"])
        .groupBy("p_brand")
        .agg(F.min("cnt").alias("est_freq"))
    )
    e = p.groupBy("p_brand").agg(F.count("*").cast("long").alias("exact_freq"))
    return est.join(e, "p_brand").select(
        "p_brand", "est_freq", "exact_freq"
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# HLL mergeability: rolling-window distinct from per-day registers
# ---------------------------------------------------------------------------

ROLL_DAYS = 3
_US_PER_DAY = 86_400_000_000


@query(
    "sketch_hll_rolling_users",
    oracle=f"""
    WITH e AS (
        SELECT epoch_us(ts) // {_US_PER_DAY} AS day,
               {_sql_h60('user_id')} AS h,
               user_id
        FROM events
    ),
    day_regs AS (
        SELECT day, h % {HLL_M} AS reg,
               MAX(CASE WHEN h >> 6 = 0 THEN {HLL_RHO_MAX}
                   ELSE {HLL_RHO_MAX} - LENGTH(bin(h >> 6)) END) AS rho
        FROM e GROUP BY day, reg
    ),
    bounds AS (SELECT MAX(day) AS max_day FROM e),
    merged AS (
        SELECT d.day + k.k AS day, d.reg, MAX(d.rho) AS rho
        FROM day_regs d
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
        CROSS JOIN bounds b
        WHERE d.day + k.k <= b.max_day
        GROUP BY 1, 2
    ),
    g AS (
        SELECT day, COUNT(*)::BIGINT AS m_used,
               SUM(1::BIGINT << ({HLL_RHO_MAX} - rho))::BIGINT AS s_present
        FROM merged GROUP BY day
    ),
    exact_w AS (
        SELECT a.day + k.k AS day, a.user_id
        FROM (SELECT DISTINCT day, user_id FROM e) a
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
        CROSS JOIN bounds b
        WHERE a.day + k.k <= b.max_day
    ),
    x AS (SELECT day, COUNT(DISTINCT user_id)::BIGINT AS exact_distinct
          FROM exact_w GROUP BY day)
    SELECT g.day, m_used,
           s_present + ({HLL_M} - m_used) * {HLL_POW_SCALE} AS s_scaled,
           ROUND({HLL_EST_NUM!r}
                 / CAST(s_present + ({HLL_M} - m_used) * {HLL_POW_SCALE} AS DOUBLE),
                 4) AS est_distinct,
           exact_distinct
    FROM g JOIN x USING (day)
    ORDER BY day
    """,
)
def sketch_hll_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLL_DAYS}-day distinct users from MERGED per-day HLL
    registers — the mergeability demo that justifies sketches at
    100 TB: the per-day register table (≤ m={HLL_M} rows per day) is
    the only input to every window; raw events are scanned ONCE to
    build it, and any window [d−2, d] is a register-wise MAX over 3×m
    tiny rows. The exact twin must rescan 3 days of raw (day, user)
    pairs per window — the cost the sketch amortizes away. Day ids are
    integer epoch-days; windows are clipped to days ≤ max(day) so every
    emitted window has full data on its right edge.

    Scale shape: register extraction map-side (shuffle key (day, reg),
    ≤ m rows/day survive the partial MAX); the rolling merge explodes
    the register table (not the events) 3×; everything downstream is
    O(days × m)."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    e = load_events(spark, sf_dir).select(
        F.expr(f"ts_us div {_US_PER_DAY}").alias("day"),
        _h60(F.col("user_id")).alias("h"),
        "user_id",
    )
    rho = F.when(F.shiftright("h", 6) == 0, HLL_RHO_MAX).otherwise(
        HLL_RHO_MAX - F.length(F.bin(F.shiftright("h", 6)))
    )
    day_regs = (
        e.select("day", (F.col("h") % HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    bounds = e.agg(F.max("day").alias("max_day"))
    offsets = F.explode(F.array(*[F.lit(k) for k in range(ROLL_DAYS)])).alias("k")
    merged = (
        day_regs.crossJoin(F.broadcast(bounds))
        .select("day", "reg", "rho", "max_day", offsets)
        .withColumn("wday", F.col("day") + F.col("k"))
        .filter(F.col("wday") <= F.col("max_day"))
        .groupBy(F.col("wday").alias("day"), "reg")
        .agg(F.max("rho").alias("rho"))
    )
    g = merged.groupBy("day").agg(
        F.count("*").cast("long").alias("m_used"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - rho)")).cast("long").alias("s_present"),
    )
    exact_w = (
        e.select("day", "user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("day", "user_id", "max_day", offsets)
        .withColumn("wday", F.col("day") + F.col("k"))
        .filter(F.col("wday") <= F.col("max_day"))
    )
    x = exact_w.groupBy(F.col("wday").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    out = g.withColumn(
        "s_scaled",
        F.col("s_present") + (HLL_M - F.col("m_used")) * F.lit(HLL_POW_SCALE),
    ).withColumn(
        "est_distinct",
        F.round(F.lit(HLL_EST_NUM) / F.col("s_scaled").cast("double"), 4),
    )
    return (
        out.join(x, "day")
        .select("day", "m_used", "s_scaled", "est_distinct", "exact_distinct")
        .orderBy("day")
    )


@query(
    "sketch_kmv_setops",
    oracle=f"""
    WITH ab AS (
        SELECT {_sql_h60('user_id')} AS h,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ),
    r AS (
        SELECT h, in_a, in_b,
               row_number() OVER (ORDER BY h) AS rn
        FROM ab
    ),
    sk AS (
        SELECT COUNT(*)::BIGINT AS k_seen, MAX(h) AS theta,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS k_both
        FROM r WHERE rn <= {KMV_K}
    ),
    ex AS (
        SELECT COUNT(*)::BIGINT AS exact_union,
               CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS exact_inter
        FROM ab
    )
    SELECT sk.k_seen, sk.theta, sk.k_both,
           ROUND(CASE WHEN sk.k_seen < {KMV_K} THEN CAST(sk.k_seen AS DOUBLE)
                 ELSE {float(KMV_K - 1)!r} * {M_SCALE!r} / CAST(sk.theta AS DOUBLE)
                 END, 4) AS union_est,
           ROUND(sk.k_both * 1.0 / sk.k_seen, 6) AS jaccard_est,
           ROUND((sk.k_both * 1.0 / sk.k_seen)
                 * CASE WHEN sk.k_seen < {KMV_K} THEN CAST(sk.k_seen AS DOUBLE)
                   ELSE {float(KMV_K - 1)!r} * {M_SCALE!r} / CAST(sk.theta AS DOUBLE)
                   END, 4) AS inter_est,
           ex.exact_union, ex.exact_inter
    FROM sk CROSS JOIN ex
    """,
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches (Dasgupta et
    al. 2016, "Theta-Sketch Framework"): estimate |clickers ∪ buyers|
    from the union sketch's k-th minimum, and |clickers ∩ buyers| as
    (fraction of the union's k minima present in both sets) × the
    union estimate — the sketch algebra that answers audience-overlap
    questions without ever materializing either set. Exact values ride
    along for the error readout.

    Scale shape: one pass folds events to (hash, in_a, in_b) with
    map-side partials — constant-width rows, membership flags merged
    by MAX — and the sketch is the k smallest of that relation (at
    100 TB: per-partition top-k heap before one k·partitions-row
    merge, as sketch_kmv_distinct documents). Set ops never touch raw
    sets again — that is the point of the sketch.

    Determinism: md5-derived 60-bit hashes are identical on both
    engines; counts and flags are integers; the estimators are one
    IEEE tree each."""
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    ab = ev.groupBy(_h60(F.col("user_id")).alias("h")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("in_b"),
    )
    ab = track_persist(ab)
    sk = (
        ab.withColumn("rn", F.row_number().over(W.orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
        .agg(
            F.count(F.lit(1)).alias("k_seen"),
            F.max("h").alias("theta"),
            F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
            .cast("long")
            .alias("k_both"),
        )
    )
    ex = ab.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("exact_inter"),
    )
    union_est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(M_SCALE) / F.col("theta").cast("double")
    )
    jac = F.col("k_both") * F.lit(1.0) / F.col("k_seen")
    return sk.crossJoin(F.broadcast(ex)).select(
        "k_seen",
        "theta",
        "k_both",
        F.round(union_est, 4).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 4).alias("inter_est"),
        "exact_union",
        "exact_inter",
    )


HIST_BINS = 256
HIST_QS = (50, 90, 99)


@query(
    "sketch_quantile_histogram",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ),
    pars AS (
        SELECT MIN(c) AS mn, COUNT(*)::BIGINT AS n,
               ((MAX(c) - MIN(c)) // {HIST_BINS}) + 1 AS w
        FROM cents
    ),
    binned AS (SELECT c, (c - p.mn) // p.w AS bin FROM cents, pars p),
    hist AS (SELECT bin, COUNT(*)::BIGINT AS cnt FROM binned GROUP BY bin),
    cum AS (
        SELECT bin, cnt,
               SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cm
        FROM hist
    ),
    qs AS (SELECT unnest([{', '.join(str(q) for q in HIST_QS)}]) AS q_pct),
    tgt AS (
        SELECT q.q_pct, (p.n * q.q_pct + 99) // 100 AS k, p.n, p.mn, p.w
        FROM qs q, pars p
    ),
    sel AS (
        SELECT t.q_pct, t.k, t.n, t.mn, t.w, MIN(c.bin) AS b
        FROM tgt t JOIN cum c ON c.cm >= t.k
        GROUP BY t.q_pct, t.k, t.n, t.mn, t.w
    ),
    sel2 AS (
        SELECT s.q_pct, s.k, s.n, s.mn, s.w, s.b,
               s.k - (c.cm - c.cnt) AS kprime
        FROM sel s JOIN cum c ON s.b = c.bin
    ),
    ranked AS (
        SELECT s.q_pct, s.n, s.mn, s.w, s.b, s.kprime, b2.c,
               row_number() OVER (PARTITION BY s.q_pct ORDER BY b2.c) AS rn
        FROM sel2 s JOIN binned b2 ON b2.bin = s.b
    )
    SELECT CAST(q_pct AS BIGINT) AS q_pct, n AS n_rows,
           c AS exact_cents,
           mn + b * w + w // 2 AS est_cents,
           w AS bin_width_cents,
           ABS(mn + b * w + w // 2 - c) <= w AS within_bound
    FROM ranked WHERE rn = kprime ORDER BY q_pct
    """,
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE equi-width histogram quantile sketch over
    lineitem.l_extendedprice, PLUS the exact order statistics it
    approximates — computed distributed, without ever globally sorting
    the data. The sketch is {HIST_BINS} integer bin counters (merge =
    counter-wise ADD, the property that lets 1000 executors each build
    one and a reduce combine them at 100 TB); its quantile estimate is
    the midpoint of the bin holding the target rank, so the error is
    bounded by one bin width BY CONSTRUCTION — and the query proves it,
    emitting estimate, exact, and the bound check side by side.

    The exact quantile uses the sketch as a PARTITIONER (two-pass
    distributed order statistic): the cumulative histogram (a ≤256-row
    metadata table) locates the bin holding rank k and the residual
    rank k' within it; a per-bin window then ranks ONLY the rows of
    the ≤3 target bins — ~n/{HIST_BINS} rows each — never the corpus.
    That is the textbook out-of-core selection algorithm, and why this
    query needs no `percentile` built-in.

    Determinism: prices enter as FLOOR(price·100) BIGINT cents; every
    quantity here — bins, counts, ranks, midpoints, bounds — is exact
    integer arithmetic, so the twin matches bit-for-bit with no float
    anywhere."""
    cents = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    # persisted: the 1-row stats frame feeds BOTH the binning crossJoin
    # and the rank-target build — without it each consumer re-runs the
    # min/max scan of lineitem (two extra full column scans in the AQE
    # plan before this boundary).
    pars = track_persist(
        cents.agg(
            F.min("c").alias("mn"),
            F.count(F.lit(1)).alias("n"),
            (
                F.expr(f"(max(c) - min(c)) div {HIST_BINS}") + F.lit(1)
            ).alias("w"),
        )
    )
    binned = track_persist(
        cents.crossJoin(F.broadcast(pars)).select(
            "c", F.expr("(c - mn) div w").alias("bin")
        )
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt")
        .over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
        .alias("cm"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q_pct")
    )
    tgt = qs.crossJoin(F.broadcast(pars)).select(
        "q_pct",
        F.expr("(n * q_pct + 99) div 100").alias("k"),
        "n",
        "mn",
        "w",
    )
    sel = (
        tgt.join(F.broadcast(cum), F.col("cm") >= F.col("k"))
        .groupBy("q_pct", "k", "n", "mn", "w")
        .agg(F.min("bin").alias("b"))
    )
    sel2 = sel.join(
        F.broadcast(cum.select(F.col("bin").alias("b"), "cnt", "cm")), "b"
    ).select(
        "q_pct", "k", "n", "mn", "w", "b",
        (F.col("k") - (F.col("cm") - F.col("cnt"))).alias("kprime"),
    )
    ranked = binned.join(F.broadcast(sel2), binned.bin == sel2.b)
    wq = W.partitionBy("q_pct").orderBy("c")
    est = F.col("mn") + F.col("b") * F.col("w") + F.expr("w div 2")
    return (
        ranked.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == F.col("kprime"))
        .select(
            F.col("q_pct").cast("long").alias("q_pct"),
            F.col("n").alias("n_rows"),
            F.col("c").alias("exact_cents"),
            est.alias("est_cents"),
            F.col("w").alias("bin_width_cents"),
            (F.abs(est - F.col("c")) <= F.col("w")).alias("within_bound"),
        )
        .orderBy("q_pct")
    )
