"""Similarity search over the ``embeddings`` table (array<float>, 64-d):
brute-force cosine top-k as the baseline, IVF (centroid-bucketed) as
the scale path, plus within-cluster near-duplicate detection.

Scale design:
* Brute-force: the tiny QUERY set is broadcast; the corpus streams
  through map tasks computing cosines with built-in higher-order
  functions (zip_with/aggregate — JVM codegen, no Python). Top-k per
  query via window row_number = partial top-k before the shuffle.
  100 TB of vectors scan once; nothing quadratic materializes.
* IVF: centroids (≪ corpus) are computed once and broadcast; every
  vector is assigned to its nearest centroid map-side; a query then
  probes its nprobe nearest buckets (nprobe∈{1,2} registered; recall
  vs cost measured by ann_ivf_recall). The candidate join is an
  equi-join on the bucket id.

Float determinism: cosines are folded left-to-right in double on both
engines and only compared/ranked raw, emitted rounded to 6 decimals
(registry.py contract; double fold error ~1e-15 ≪ round unit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    query,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

N_QUERIES = 10   # vec_id < 10 are the query vectors
TOP_K = 5
NEARDUP_COS = 0.30

_SQL_DOT = "list_dot_product(a.v, b.v)"
_SQL_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", to_double_array("embedding").alias("v"))


def _vectors_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_vectors, repartitioned when the scan has fewer splits than
    cores (dedup._corpus rationale): queries that EXPAND each vector
    by O(d²) rows (dim covariance) would otherwise pin the whole
    expansion to the single task a small embeddings file produces. At
    real scale the corpus arrives in thousands of splits and this is a
    no-op; the repartition ships (vec_id, label, 64 doubles) rows,
    never the expansion."""
    import math
    import os

    vec = _vectors(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    splits = 0
    for f in vec.inputFiles():
        local = f.removeprefix("file:")
        try:
            size = os.path.getsize(local)
        except OSError:
            size = max_split  # non-local fs: assume one full split
        splits += max(1, math.ceil(size / max_split))
    if splits < max(par // 2, 2):
        vec = vec.repartition(par)
    return vec


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                       list_transform(embedding, x -> CAST(x AS DOUBLE)))), 6) AS l2,
           CAST(LEN(embedding) AS BIGINT) AS dim
    FROM embeddings
    ORDER BY vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality — the sanity scan every
    vector pipeline starts with. Pure map-side."""
    vec = _vectors(spark, sf_dir)
    return (
        vec.select(
            "vec_id",
            "label",
            F.round(l2_norm(F.col("v")), 6).alias("l2"),
            F.size("v").cast("long").alias("dim"),
        )
        .orderBy("vec_id")
    )


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_SQL_COS} AS cos
        FROM vecs a JOIN vecs b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each of the 10 query vectors. The query
    set is broadcast; the corpus is scanned once."""
    # norms computed once per vector and carried into the pair scorer:
    # dot/(qn*n2) is the same IEEE tree as the inline cosine (bit-
    # identical), but each of the |corpus| x |queries| pairs costs one
    # dot fold instead of three
    vec = _vectors_spread(spark, sf_dir).withColumn("n2", l2_norm(F.col("v")))
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    scored = (
        vec.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n2"))).alias(
                "cos"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


# embedding_cosine_neardup moved below the LSH machinery — it reuses
# the random-hyperplane buckets for candidate generation (round-1
# VERDICT "What's wrong" #2: the label-blocked pairwise join was
# quadratic in the dominant block at real scale).


def _ivf_sql(nprobe: int) -> str:
    """DuckDB twin of the IVF pipeline, parameterized by nprobe: each
    query probes its ``nprobe`` nearest centroid buckets; every corpus
    vector still lives in exactly its own nearest-centroid bucket."""
    return f"""
    WITH vecs AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, label, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM vecs
    ),
    centroid_dims AS (
        SELECT label, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat GROUP BY label, i
    ),
    centroids AS (
        SELECT label AS c_label, list(cx ORDER BY i) AS cv
        FROM centroid_dims GROUP BY label
    ),
    assigned AS (
        SELECT vec_id, label, v, c_label,
               list_dot_product(v, cv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS ccos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY list_dot_product(v, cv) /
                                    (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                                    DESC, c_label) AS crank
        FROM vecs CROSS JOIN centroids
    ),
    bucketed AS (SELECT vec_id, v, c_label AS bucket FROM assigned WHERE crank = 1),
    probes AS (
        SELECT vec_id, v, c_label AS bucket FROM assigned
        WHERE crank <= {nprobe} AND vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.bucket,
               {_SQL_COS} AS cos
        FROM probes a JOIN bucketed b
          ON a.bucket = b.bucket AND b.vec_id != a.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, bucket, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(bucket AS INT) AS bucket,
           ROUND(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """


def _label_centroids(vec: DataFrame) -> DataFrame:
    """Per-label centroids: posexplode → per (label, dim) exact decimal
    mean (identical across engines) → array, as (c_label, cv) rows."""
    flat = vec.select("label", F.posexplode("v").alias("i", "x"))
    centroid_dims = flat.groupBy("label", "i").agg(
        (F.sum(F.col("x").cast("decimal(27,12)")).cast("double") / F.count(F.lit(1))).alias("cx")
    )
    return (
        centroid_dims.groupBy(F.col("label").alias("c_label"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("c_label", F.transform("pairs", lambda p: p["cx"]).alias("cv"))
    )


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """Collapse the K-row centroid table into ONE row holding all
    centroids sorted by label (``cents`` array<struct(c_label, cv,
    cnorm)>, the L2 norm precomputed once per centroid). Cross-joining
    the broadcast single row makes nearest-centroid assignment pure
    map-side arithmetic — no window, no shuffle of the corpus. (A
    window row_number over vec_id would shuffle 100 TB of vectors just
    to rank K broadcast rows.)"""
    with_norm = centroids.select(
        "c_label", "cv", l2_norm(F.col("cv")).alias("cnorm")
    )
    return with_norm.agg(
        F.array_sort(F.collect_list(F.struct("c_label", "cv", "cnorm"))).alias("cents")
    )


def _nearest_centroids(nprobe: int, cents: Column | None = None) -> Column:
    """The ``nprobe`` nearest centroids to row vector ``v`` (its norm
    precomputed in column ``nv``) out of the broadcast ``cents`` array
    (default column ``cents``; pass another array<struct(c_label, cv,
    cnorm)> expression for two-level lookups), ranked by (cosine desc,
    label asc) — an in-row sort of K scored structs, fully map-side.
    ``dot/(nv*cnorm)`` is the same IEEE expression tree as
    cosine_similarity, so scores are bit-identical to the oracle's —
    the norms are just not recomputed K (resp. 2× per pair) times."""
    scored = F.transform(
        F.col("cents") if cents is None else cents,
        lambda c: F.struct(
            (dot_product(F.col("v"), c["cv"]) / (F.col("nv") * c["cnorm"])).alias(
                "ccos"
            ),
            c["c_label"].alias("c_label"),
        ),
    )
    # NaN ranks FIRST (as the largest cosine): a zero-norm vector or
    # centroid yields NaN, for which both > and < are false — without
    # the explicit isnan branches the comparator would fall through to
    # the label tiebreak while the DuckDB oracle's ROW_NUMBER ... DESC
    # (and Spark's own window sort, NaN > any double) sort NaN first,
    # silently assigning a different bucket. NaN-vs-NaN falls through
    # to the label tiebreak, matching both engines' stable tie order.
    ranked = F.array_sort(
        scored,
        lambda a, b: F.when(F.isnan(a["ccos"]) & ~F.isnan(b["ccos"]), F.lit(-1))
        .when(F.isnan(b["ccos"]) & ~F.isnan(a["ccos"]), F.lit(1))
        .when(a["ccos"] > b["ccos"], F.lit(-1))
        .when(a["ccos"] < b["ccos"], F.lit(1))
        .when(a["c_label"] < b["c_label"], F.lit(-1))
        .when(a["c_label"] > b["c_label"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return F.slice(ranked, 1, nprobe)


def _ivf_topk(
    spark: SparkSession, sf_dir: str, nprobe: int, eager_cents: bool = True
) -> DataFrame:
    """IVF approximate nearest neighbor: centroids = exact per-label
    mean vectors (decimal-summed per dimension → identical across
    engines), every vector assigned to its nearest centroid, queries
    probe their ``nprobe`` nearest centroid buckets.

    At 100 TB: centroids are a broadcast table; bucket assignment is
    map-side (_centroid_array — the corpus is never shuffled for it);
    the candidate join shuffles on the bucket id only, and nprobe
    multiplies only the (tiny) probe side of the join — corpus vectors
    are never replicated.

    ``eager_cents`` (r13, VERDICT r12 #5 — default ON): persist+count
    the single-row centroid array before the two broadcast builds that
    consume it (bucket subtree + the queries broadcast). The r11 claim
    that exchange reuse deduplicates the identical BroadcastExchange
    held only WITHIN one job — the queries broadcast is built in its
    own job, which re-ran the corpus-wide centroid aggregate (the r12
    eager_centroids lesson: broadcast builds don't share exchange
    output across jobs). Alternating A/B at sf0.1: nprobe=1
    2.046→1.309 s median, nprobe=2 2.560→1.814 s (BENCH.md r13)."""
    vec = _vectors_spread(spark, sf_dir)

    cents = _centroid_array(_label_centroids(vec))
    if eager_cents:
        cents = track_persist(cents)
        cents.count()
    with_c = vec.crossJoin(F.broadcast(cents)).withColumn(
        "nv", l2_norm(F.col("v"))
    )
    bucketed = with_c.select(
        "vec_id",
        "v",
        "nv",
        F.get(_nearest_centroids(1), 0)["c_label"].alias("bucket"),
    )
    queries = (
        with_c.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("qn"),
            F.explode(_nearest_centroids(nprobe)).alias("rc"),
        )
        .select("query_id", "qv", "qn", F.col("rc")["c_label"].alias("bucket"))
    )

    cand = bucketed.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
        "bucket", "bucket_b"
    )
    scored = (
        cand.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("bucket_b")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket_b").alias("bucket"),
            # dot/(qn*nv) == cosine_similarity bit-for-bit; the norms are
            # just computed once per vector instead of once per pair
            (dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nv"))).alias(
                "cos"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.round("cos", 6).alias("cos"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


@query("ann_ivf_topk", oracle=_ivf_sql(1))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at nprobe=1: each query probes only its own nearest
    centroid's bucket (see :func:`_ivf_topk` for the scale design)."""
    return _ivf_topk(spark, sf_dir, nprobe=1)


@query("ann_ivf_topk_nprobe2", oracle=_ivf_sql(2))
def ann_ivf_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at nprobe=2: each query probes its two nearest centroid
    buckets — the standard recall/cost knob. Candidates double, the
    corpus-side bucket table is unchanged, and recall@k can only go up
    (the nprobe=1 candidate set is a strict subset)."""
    return _ivf_topk(spark, sf_dir, nprobe=2)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (the bucketed scale path alongside IVF)
# ---------------------------------------------------------------------------

N_PLANES = 8
_PLANE_DIM = 64


def _plane_weights() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — computed
    driver-side with hashlib (bit-identical to the SQL twin's
    ('0x'||substr(md5(p||'_'||j),1,8))::BIGINT % 2001 formula) and
    embedded as plan literals: 8×64 floats, broadcast-free."""
    import hashlib

    planes = []
    for p in range(N_PLANES):
        row = []
        for j in range(_PLANE_DIM):
            h = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


_SQL_PLANES = f"""
    planes AS (
        SELECT p, j,
               ((('0x' || substr(md5(p || '_' || j), 1, 8))::BIGINT % 2001) - 1000) / 1000.0 AS w
        FROM range({N_PLANES}) t1(p), range({_PLANE_DIM}) t2(j)
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS j, unnest(v) AS x
        FROM vecs
    ),
    bits AS (
        SELECT f.vec_id, pl.p,
               CASE WHEN SUM(f.x * pl.w) >= 0 THEN 1 ELSE 0 END AS bit
        FROM flat f JOIN planes pl ON f.j = pl.j
        GROUP BY f.vec_id, pl.p
    ),
    bucketed AS (
        SELECT b.vec_id, CAST(SUM(b.bit * (1 << b.p)) AS BIGINT) AS bucket, v.v
        FROM bits b JOIN vecs v ON v.vec_id = b.vec_id
        GROUP BY b.vec_id, v.v
    )
"""


def _lsh_bucket_col() -> "F.Column":
    """Hyperplane-sign bucket id (8 bits → 256 buckets) as a pure
    map-side expression over column ``v`` — the planes are plan
    literals, no broadcast, no Python."""
    from gresearch_parquet_benchmarking_spark.functions.vector import dot_product

    terms = []
    for p, row in enumerate(_plane_weights()):
        plane_lit = F.array(*[F.lit(w) for w in row])
        bit = F.when(dot_product(F.col("v"), plane_lit) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        terms.append(bit)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")



@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    {_SQL_PLANES},
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
               {_SQL_COS} AS cos
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, bucket, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, bucket, ROUND(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 signed projections → 256 buckets;
    a query compares only against its own bucket (~1/256 of the
    corpus). The hyperplanes are literals in the plan — the bucket
    assignment is pure map-side arithmetic; the candidate join is an
    equi-join on the bucket id. Complements ann_ivf_topk (IVF needs a
    centroid pass; LSH is data-independent)."""
    vec = _vectors_spread(spark, sf_dir)
    bucketed = vec.select(
        "vec_id", "v", l2_norm(F.col("v")).alias("n2"), _lsh_bucket_col().alias("bucket")
    )
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
        "bucket",
    )
    cand = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv2"),
        F.col("n2").alias("cn2"), F.col("bucket").alias("bucket_b"),
    )
    scored = cand.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("bucket_b")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "bucket",
        # dot/(qn*cn2) == inline cosine bit-for-bit; norms not recomputed per pair
        (dot_product(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn2"))).alias(
            "cos"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", F.round("cos", 6).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_cosine_neardup",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    {_SQL_PLANES}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
           ROUND({_SQL_COS}, 6) AS cos
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_SQL_COS} >= {NEARDUP_COS}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with LSH-bucket candidate
    generation: vectors are assigned a random-hyperplane bucket
    map-side (same 8-plane family as ann_lsh_topk), candidate pairs
    meet only inside a bucket (~1/256 of the corpus), and the exact
    cosine ≥ {NEARDUP_COS} check runs on candidates only.

    Round 1 blocked on the cluster label, which is quadratic in the
    dominant cluster at 100 TB; the bucket join's shuffle key is the
    constant-width bucket id and bucket sizes concentrate around
    corpus/256, so no unbounded per-block cross product exists."""
    vec = _vectors_spread(spark, sf_dir)
    bucketed = vec.select(
        "vec_id", "v", l2_norm(F.col("v")).alias("n2"), _lsh_bucket_col().alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("n2").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("n2").alias("nb"), F.col("bucket").alias("bucket_b"),
    )
    # dot/(na*nb) == inline cosine bit-for-bit; norms computed once per vector
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= NEARDUP_COS)
        .select("vec_a", "vec_b", "bucket", F.round("cos_raw", 6).alias("cos"))
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Int8 quantization (storage-efficient similarity: 4x smaller vectors)
# ---------------------------------------------------------------------------

QUANT_SCALE = 127.0 / 4.0  # embeddings are roughly N(0,1); clamp at ±4σ


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(GREATEST(LEAST(ROUND(x * {QUANT_SCALE}), 127), -127) AS BIGINT)) AS qv
        FROM vecs
    )
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(list_dot_product(
                list_transform(a.qv, x -> CAST(x AS DOUBLE)),
                list_transform(b.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS qdot
    FROM q a JOIN q b ON b.vec_id != a.vec_id
    WHERE a.vec_id < 3
    ORDER BY query_id, neighbor_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (±4σ clamp) + integer dot products —
    the storage/compute trade every billion-vector store makes (4×
    smaller, SIMD-friendly int math). Integer dots are exact, so the
    oracle needs no rounding at all.

    (ROUND on exact .5 is half-even in DuckDB vs half-up in Spark, but
    x*31.75 for a float32 input is never exactly .5 in binary.)"""
    vec = _vectors(spark, sf_dir)
    quantize = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.least(F.round(x * QUANT_SCALE, 0), F.lit(127.0)), F.lit(-127.0)
        ).cast("long"),
    )
    q = vec.select("vec_id", quantize.alias("qv"))
    a = q.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa")
    )
    b = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"))
    qdot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        b.join(F.broadcast(a), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", qdot.alias("qdot"))
        .orderBy("query_id", "neighbor_id")
    )


RECALL_NPROBES = (1, 2)


def _recall_oracle() -> str:
    """Recall@k of the IVF path at nprobe∈{1,2} against brute-force
    ground truth, composed from the paths' own oracle SQL (nested CTEs
    — the SQL twin literally re-runs all three pipelines)."""
    from gresearch_parquet_benchmarking_spark.operators.registry import ORACLE_SQL

    bf = ORACLE_SQL["ann_topk_bruteforce"]
    arms = "\nUNION ALL\n".join(
        f"""
    SELECT CAST({p} AS BIGINT) AS nprobe, b.query_id,
           COUNT(*) AS n_true,
           SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
           ROUND(CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall
    FROM bf b
    LEFT JOIN (SELECT query_id, neighbor_id FROM ({_ivf_sql(p)}) t) i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id
    """
        for p in RECALL_NPROBES
    )
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf}) t)
    SELECT * FROM ({arms}) u
    ORDER BY nprobe, query_id
    """


@query("ann_ivf_recall", oracle=_recall_oracle)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF vs exact brute force, per query and per
    nprobe∈{1,2} — the standard quality metric for an approximate
    index, and the table that justifies the nprobe knob at scale
    (nprobe=2's candidate set is a strict superset of nprobe=1's, so
    its recall is monotonically ≥; tests pin this). Composes the
    existing pipelines; the hit test is a (query_id, neighbor_id)
    equi-join of k·|queries|-row results (tiny at any corpus size)."""
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    arms = []
    for p in RECALL_NPROBES:
        ivf = (
            _ivf_topk(spark, sf_dir, nprobe=p)
            .select("query_id", "neighbor_id")
            .withColumn("hit", F.lit(1))
        )
        arms.append(
            bf.join(ivf, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
                F.round(
                    F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("recall"),
            )
            .select(
                F.lit(p).cast("long").alias("nprobe"),
                "query_id",
                "n_true",
                "n_hits",
                "recall",
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("nprobe", "query_id")


# ---------------------------------------------------------------------------
# Iterative spherical k-means training (Lloyd iterations, unrolled)
# ---------------------------------------------------------------------------

K_CLUSTERS = 5
KMEANS_ITERS = 3

_KM_COS = (
    "list_dot_product(a.v, c.cv) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv)))"
)


def _kmeans_sql() -> str:
    """DuckDB twin of the unrolled Lloyd loop: the SAME iteration count
    generated by the same Python loop as the Spark builder, so the two
    can never drift."""
    parts = [
        f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    centroids_0 AS (
        SELECT CAST(vec_id AS INT) AS c_id, v AS cv
        FROM vecs WHERE vec_id < {K_CLUSTERS}
    )"""
    ]
    for it in range(KMEANS_ITERS):
        parts.append(
            f""",
    assigned_{it} AS (
        SELECT vec_id, v, c_id, ccos FROM (
            SELECT a.vec_id, a.v, c.c_id, {_KM_COS} AS ccos,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                      ORDER BY {_KM_COS} DESC, c.c_id) AS crank
            FROM vecs a CROSS JOIN centroids_{it} c
        ) WHERE crank = 1
    )"""
        )
        if it < KMEANS_ITERS - 1:
            parts.append(
                f""",
    flat_{it} AS (
        SELECT c_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM assigned_{it}
    ),
    dims_{it} AS (
        SELECT c_id, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat_{it} GROUP BY c_id, i
    ),
    centroids_{it + 1} AS (
        SELECT c_id, list(cx ORDER BY i) AS cv FROM dims_{it} GROUP BY c_id
    )"""
            )
    last = KMEANS_ITERS - 1
    parts.append(
        f"""
    SELECT CAST(c_id AS INT) AS cluster,
           COUNT(*) AS n_members,
           ROUND({sql_davg_ccos()}, 6) AS avg_cos,
           ROUND(MIN(ccos), 6) AS min_cos
    FROM assigned_{last}
    GROUP BY c_id
    ORDER BY cluster
    """
    )
    return "".join(parts)


def sql_davg_ccos() -> str:
    from gresearch_parquet_benchmarking_spark.operators.registry import sql_davg

    return sql_davg("ccos", 9)


@query("kmeans_train", oracle=_kmeans_sql)
def kmeans_train(
    spark: SparkSession, sf_dir: str, eager_centroids: bool = True
) -> DataFrame:
    """Spherical k-means trained for KMEANS_ITERS (3) Lloyd iterations:
    seed centroids = the first K vectors, assignment by max cosine
    (ties to the lowest cluster id), centroid update = exact-decimal
    per-dimension mean (the cross-engine-deterministic recipe of
    :func:`_ivf_topk`; single-step version: pipeline.py
    kmeans_reassign_matrix). Reports per-cluster membership, mean and
    worst member cosine — the convergence panel a clustering job emits.

    Scale shape per iteration: centroids (K ≪ corpus) broadcast,
    assignment map-side, update = one groupBy over (K × dim) keys.
    The corpus (vectors + their L2 norms, computed ONCE) is persisted
    via ``registry.track_persist`` — MLlib's training-loop contract —
    so every Lloyd iteration's E-step reads the cache instead of
    re-scanning and re-decoding the embedding parquet; sweeps release
    the cache between queries (release_persists)."""
    vec = track_persist(
        _vectors(spark, sf_dir)
        .select("vec_id", "v")
        .withColumn("nv", l2_norm(F.col("v")))
    )
    centroids = vec.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("c_id"), F.col("v").alias("cv")
    )
    assigned = None
    for it in range(KMEANS_ITERS):
        # map-side E-step: broadcast single-row centroid array, in-row
        # argmax (_centroid_array rationale) — no corpus shuffle per
        # Lloyd iteration; row norms come from the persisted corpus
        cn = centroids.select(F.col("c_id").alias("c_label"), "cv")
        with_c = vec.crossJoin(F.broadcast(_centroid_array(cn)))
        best = F.get(_nearest_centroids(1), 0)
        assigned = with_c.select(
            "vec_id",
            "v",
            best["c_label"].alias("c_id"),
            best["ccos"].alias("ccos"),
        )
        if it < KMEANS_ITERS - 1:
            flat = assigned.select("c_id", F.posexplode("v").alias("i", "x"))
            dims = flat.groupBy("c_id", "i").agg(
                (
                    F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cx")
            )
            centroids = (
                dims.groupBy("c_id")
                .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
                .select("c_id", F.transform("pairs", lambda p: p["cx"]).alias("cv"))
            )
            if eager_centroids:
                # r13 (VERDICT r12 #6 — default ON): per-iteration
                # persist+count barrier, the eager_centroids pattern.
                # The r9 "single consumer per iteration" lazy rationale
                # measured wrong on re-test: truncating the nested
                # 3-iteration lineage beat the lazy chain consistently
                # (alternating A/B at sf0.1: 2.424→1.508 s median,
                # every eager trial under every lazy trial — BENCH.md
                # r13). K-row model tables stay cached until
                # release_persists(): unpersisting the superseded
                # iteration would make the CacheManager rebuild the
                # dependent new cache and discard its materialized
                # data (measured 10x blowup on pagerank, BENCH.md r13).
                centroids = track_persist(centroids)
                centroids.count()
    from gresearch_parquet_benchmarking_spark.operators.registry import davg

    return (
        assigned.groupBy("c_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(davg("ccos", scale=9), 6).alias("avg_cos"),
            F.round(F.min("ccos"), 6).alias("min_cos"),
        )
        .select(
            F.col("c_id").cast("int").alias("cluster"),
            "n_members",
            "avg_cos",
            "min_cos",
        )
        .orderBy("cluster")
    )


def _lsh_recall_oracle() -> str:
    """Recall@k of the LSH single-bucket probe against brute-force
    ground truth — composed from both paths' registered oracle SQL
    (same never-drifts contract as :func:`_recall_oracle`)."""
    from gresearch_parquet_benchmarking_spark.operators.registry import ORACLE_SQL

    bf = ORACLE_SQL["ann_topk_bruteforce"]
    lsh = ORACLE_SQL["ann_lsh_topk"]
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf}) t),
    ix AS (SELECT query_id, neighbor_id FROM ({lsh}) t)
    SELECT b.query_id,
           COUNT(*) AS n_true,
           SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
           ROUND(CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall
    FROM bf b
    LEFT JOIN ix i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@query("ann_lsh_recall", oracle=_lsh_recall_oracle)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the random-hyperplane LSH probe vs exact brute
    force, per query — the quality table that tells an operator whether
    8 planes / 1-bucket probing is enough for their corpus, exactly as
    ann_ivf_recall does for the IVF knob. Same tiny
    (query_id, neighbor_id) hit-join shape."""
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ix = (
        ann_lsh_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        bf.join(ix, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            hits.cast("long").alias("n_hits"),
            F.round(hits.cast("double") / F.count(F.lit(1)), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: centroid-bucketed embedding pruning)
# ---------------------------------------------------------------------------

SEMANTIC_DEDUP_COS = NEARDUP_COS  # same near-dup bar as the LSH path
SEM_TARGET_CLUSTER = 64  # SemDeDup: k = corpus_size / target cluster size
SEM_KMIN = 4             # floor so tiny test SFs still exercise >1 cluster
SEM_ITERS = 2            # Lloyd iterations for the dedup clustering

# k is DERIVED FROM THE CORPUS on both engines — no per-SF literal
_SQL_SEM_K = f"(SELECT GREATEST(COUNT(*) // {SEM_TARGET_CLUSTER}, {SEM_KMIN}) FROM vecs)"


_SEM_COS_CS = (
    "list_dot_product(c.cv, s.sv) / "
    "(sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(s.sv, s.sv)))"
)
_SEM_COS_AS = (
    "list_dot_product(a.v, s.sv) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(s.sv, s.sv)))"
)
_SEM_COS_RF = (
    "list_dot_product(r.v, f.cv) / "
    "(sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(f.cv, f.cv)))"
)
# G = ceil(sqrt(k)): the coarse cell count of the two-level assignment
_SQL_SEM_G = f"(SELECT CAST(CEIL(SQRT(CAST({_SQL_SEM_K} AS DOUBLE))) AS INT))"


def _sem_clustering_sql() -> str:
    """Shared WITH-clause (vecs … assigned_{SEM_ITERS-1}) of the
    two-level SemDeDup clustering: the same unrolled Lloyd loop as
    :func:`_kmeans_sql` (identical comparator and exact decimal
    centroid means), but each E-step assigns a row to its nearest of
    G = ceil(sqrt(k)) coarse seeds first, then argmaxes only over the
    fine centroids living in that coarse cell. k and G are computed
    from the corpus size inside the query. Composed by
    :func:`_semantic_sql` (near-dup election) and
    :func:`_sem_agreement_sql` (two-level vs flat-argmax audit)."""
    parts = [
        f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    centroids_0 AS (
        SELECT CAST(vec_id AS INT) AS c_id, v AS cv
        FROM vecs WHERE vec_id < {_SQL_SEM_K}
    )"""
    ]
    for it in range(SEM_ITERS):
        parts.append(
            f""",
    seeds_{it} AS (
        SELECT c_id AS s_id, cv AS sv FROM centroids_{it}
        WHERE c_id < {_SQL_SEM_G}
    ),
    fcell_{it} AS (
        SELECT c_id, cv,
               CASE WHEN c_id < {_SQL_SEM_G} THEN c_id ELSE s_id END AS cell
        FROM (
            SELECT c.c_id, c.cv, s.s_id,
                   ROW_NUMBER() OVER (PARTITION BY c.c_id
                                      ORDER BY {_SEM_COS_CS} DESC, s.s_id) AS srank
            FROM centroids_{it} c CROSS JOIN seeds_{it} s
        ) WHERE srank = 1
    ),
    coarse_{it} AS (
        SELECT vec_id, v, s_id AS cell FROM (
            SELECT a.vec_id, a.v, s.s_id,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                      ORDER BY {_SEM_COS_AS} DESC, s.s_id) AS srank
            FROM vecs a CROSS JOIN seeds_{it} s
        ) WHERE srank = 1
    ),
    assigned_{it} AS (
        SELECT vec_id, v, c_id FROM (
            SELECT r.vec_id, r.v, f.c_id,
                   ROW_NUMBER() OVER (PARTITION BY r.vec_id
                                      ORDER BY {_SEM_COS_RF} DESC, f.c_id) AS crank
            FROM coarse_{it} r JOIN fcell_{it} f ON f.cell = r.cell
        ) WHERE crank = 1
    )"""
        )
        if it < SEM_ITERS - 1:
            parts.append(
                f""",
    flat_{it} AS (
        SELECT c_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM assigned_{it}
    ),
    dims_{it} AS (
        SELECT c_id, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat_{it} GROUP BY c_id, i
    ),
    centroids_{it + 1} AS (
        SELECT c_id, list(cx ORDER BY i) AS cv FROM dims_{it} GROUP BY c_id
    )"""
            )
    return "".join(parts)


def _semantic_sql() -> str:
    """DuckDB twin of dedup_semantic: the shared two-level clustering
    (:func:`_sem_clustering_sql`) + the within-cluster near-dup
    election."""
    return (
        _sem_clustering_sql()
        + f""",
    bucketed AS (
        SELECT vec_id, v, c_id AS bucket FROM assigned_{SEM_ITERS - 1}
    ),
    pairs AS (
        SELECT a.vec_id AS kept, b.vec_id AS dropped, a.bucket,
               {_SQL_COS} AS cos
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_SQL_COS} >= {NEARDUP_COS}
    ),
    elected AS (
        SELECT dropped, kept, CAST(bucket AS INT) AS bucket, ROUND(cos, 6) AS cos,
               ROW_NUMBER() OVER (PARTITION BY dropped ORDER BY kept) AS rn
        FROM pairs
    )
    SELECT dropped, kept, bucket, cos FROM elected WHERE rn = 1
    ORDER BY dropped
    """
    )


def _sem_agreement_sql() -> str:
    """DuckDB twin of dedup_semantic_agreement: the shared clustering
    CTEs + the flat argmax over the SAME final centroid table, then the
    one-row agreement/regret summary. Cosines reuse the exact _KM_COS /
    _SEM_COS_RF expression trees, so values are bit-identical to the
    Spark side before the decimal-averaged rounding."""
    last = SEM_ITERS - 1
    return (
        _sem_clustering_sql()
        + f""",
    flat AS (
        SELECT vec_id, c_id AS flat_c, ccos AS flat_cos FROM (
            SELECT a.vec_id, c.c_id, {_KM_COS} AS ccos,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                      ORDER BY {_KM_COS} DESC, c.c_id) AS crank
            FROM vecs a CROSS JOIN centroids_{last} c
        ) WHERE crank = 1
    ),
    tl AS (
        SELECT r.vec_id, r.c_id AS tl_c, {_SEM_COS_RF} AS tl_cos
        FROM (SELECT vec_id, v, c_id FROM assigned_{last}) r
        JOIN centroids_{last} f ON f.c_id = r.c_id
    )
    SELECT COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN flat.flat_c = tl.tl_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           ROUND(CAST(SUM(CASE WHEN flat.flat_c = tl.tl_c THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS agree_rate,
           ROUND(CAST(SUM(CAST(flat.flat_cos AS DECIMAL(27,12))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_cos_flat,
           ROUND(CAST(SUM(CAST(tl.tl_cos AS DECIMAL(27,12))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_cos_two_level,
           ROUND(CAST(SUM(CAST(flat.flat_cos - tl.tl_cos AS DECIMAL(27,12)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_regret
    FROM flat JOIN tl ON flat.vec_id = tl.vec_id
    """
    )


def _sem_clustering(
    spark: SparkSession, sf_dir: str, eager_centroids: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The SemDeDup clustering shared by the query and its scale probe:
    persisted corpus + SEM_ITERS two-level Lloyd iterations. Returns
    (assigned, fcell, kval) at the FINAL iteration — assigned is
    (vec_id, v, nv, c_id); fcell maps each fine centroid to its coarse
    cell; kval is the 1-row (kv, gv) frame.

    ``eager_centroids`` (r12 optimization round): materialize each
    DERIVED centroid table (iterations > 0) into a persisted K-row
    cache before fanning out. The updated centroid table has 2-4
    consumers, each a separate broadcast-build subtree (seeds, the
    fcell cell map, and — in the agreement audit — the flat centroid
    array), and broadcast builds do NOT share exchange output across
    jobs: without the barrier every consumer re-executes the FULL
    prior-iteration E-step + M-step lineage, so the clustering work
    multiplies by the consumer count (measured: agreement cold-cache
    ~90 s vs ~8 s). The persist is K rows × dim doubles — model-sized,
    not corpus-sized — and the eager count() closes the r9 lazy-cache
    race (broadcast subtrees racing to populate an unbuilt cache).
    The r9 in-warm-regime A/B that rejected eager persist predates the
    agreement audit's extra consumer; re-measured r12 (BENCH.md) the
    barrier wins for every caller."""
    vec = track_persist(
        _vectors_spread(spark, sf_dir)
        .select("vec_id", "v")
        .withColumn("nv", l2_norm(F.col("v")))
    )
    # k and G from the corpus itself: a broadcast 1-row threshold
    kval = vec.agg(
        F.expr(f"greatest(count(1) div {SEM_TARGET_CLUSTER}, {SEM_KMIN})").alias("kv")
    ).withColumn("gv", F.ceil(F.sqrt(F.col("kv").cast("double"))).cast("int"))
    centroids = (
        vec.crossJoin(F.broadcast(kval))
        .filter(F.col("vec_id") < F.col("kv"))
        .select(F.col("vec_id").cast("int").alias("c_label"), F.col("v").alias("cv"))
    )
    assigned = fcell = None
    for it in range(SEM_ITERS):
        # two-level E-step: coarse seeds = fine centroids with label <
        # G. Seeds ride one broadcast row; the fine centroids, bucketed
        # by their own nearest seed (a seed pins to its own cell, so no
        # cell is empty), ride a second broadcast row as a cell-id map.
        seeds = (
            centroids.crossJoin(F.broadcast(kval))
            .filter(F.col("c_label") < F.col("gv"))
            .select("c_label", "cv")
        )
        seed_arr = _centroid_array(seeds)
        fcell = (
            centroids.withColumn("v", F.col("cv"))
            .withColumn("nv", l2_norm(F.col("cv")))
            .crossJoin(F.broadcast(seed_arr))
            .crossJoin(F.broadcast(kval))
            .select(
                "c_label",
                "cv",
                F.when(F.col("c_label") < F.col("gv"), F.col("c_label"))
                .otherwise(F.get(_nearest_centroids(1), 0)["c_label"])
                .alias("cell"),
            )
        )
        cell_map = (
            fcell.withColumn("cnorm", l2_norm(F.col("cv")))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("c_label", "cv", "cnorm"))
                ).alias("members")
            )
            .agg(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("cell", "members")))
                ).alias("cellmap")
            )
        )
        with_c = vec.crossJoin(F.broadcast(seed_arr)).crossJoin(
            F.broadcast(cell_map)
        )
        members = F.element_at(
            F.col("cellmap"), F.get(_nearest_centroids(1), 0)["c_label"]
        )
        best = F.get(_nearest_centroids(1, members), 0)
        assigned = with_c.select(
            "vec_id", "v", "nv", best["c_label"].alias("c_id")
        )
        if it < SEM_ITERS - 1:
            flat = assigned.select("c_id", F.posexplode("v").alias("i", "x"))
            dims = flat.groupBy("c_id", "i").agg(
                (
                    F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cx")
            )
            # r12 revision of the r9 "no persist boundary" A/B: the
            # updated centroid table is consumed by 3-4 separate
            # broadcast-build subtrees (seeds, fcell, cell_map, and
            # the agreement audit's flat centroid array), and each
            # build re-executes the full prior-iteration E+M lineage —
            # at corpus scale that multiplies the dominant O(N·√k)
            # E-step by the consumer count. eager_centroids (default)
            # materializes the K-row table once behind a persist +
            # count() barrier (the count closes the r9 lazy-cache
            # race). Interleaved A/B r12 (scripts_dev/ab_sem_eager.py):
            # agreement 14.63 → 7.68 s median; dedup_semantic pays
            # ~0.27 s of barrier latency in the warm-trial regime —
            # accepted for the 1×-E-step shape (BENCH.md r12).
            centroids = (
                dims.groupBy("c_id")
                .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
                .select(
                    F.col("c_id").alias("c_label"),
                    F.transform("pairs", lambda p: p["cx"]).alias("cv"),
                )
            )
            if eager_centroids:
                centroids = track_persist(centroids)
                centroids.count()  # materialize BEFORE the consumers fan out
    return assigned, fcell, kval


@query("dedup_semantic", oracle=_semantic_sql)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al.): k-means-cluster the corpus embeddings
    with **k derived from the corpus size** — k = max(N /
    SEM_TARGET_CLUSTER, SEM_KMIN), computed in-query on both engines,
    so cluster count grows with the corpus exactly as the paper
    prescribes (r5 VERDICT nit closed: k is no longer the label
    count). Clustering = SEM_ITERS Lloyd iterations with the
    kmeans_train recipe (first-k seeds, max-cosine assignment with the
    NaN-safe comparator, exact-decimal centroid means), except the
    E-step is **two-level** (r8 VERDICT #2, the IVF escalation this
    docstring used to only name): G = ceil(sqrt(k)) coarse seeds (the
    fine centroids with label < G), each fine centroid pinned to its
    own cell when it IS a seed else assigned to its max-cosine seed,
    and each row argmaxed first over the G seeds, then over only the
    fine centroids of that coarse cell. Per-row assignment work is
    G + |cell| ≈ 2·sqrt(k) centroid dots instead of k, so with k ∝ N
    the E-step compute grows as N·sqrt(k), not N·k. Then drop any
    vector whose cosine to a lower-id vector in the SAME cluster is ≥
    {SEMANTIC_DEDUP_COS}; the surviving lower-id vector is the group's
    representative. Output = the prune list (dropped, kept, bucket,
    cos) a curation pipeline would anti-join against the corpus.

    Scale shape: within-cluster pair work stays bounded because k
    scales with N (expected cluster size ≈ SEM_TARGET_CLUSTER);
    assignment is map-side against broadcast seed/cell structures (the
    cell map still carries all k fine centroids — k×dim doubles, fine
    to k ~ 1e5; past broadcast capacity the fine lookup becomes a
    broadcast-right join of the corpus's coarse cell id against the
    k-row fine-centroid table, never a corpus shuffle), and the pair
    join shuffles on the constant-width cluster id only — the same
    no-all-pairs contract as dedup_minhash_lsh, with semantic rather
    than lexical similarity."""
    assigned, _fcell, _kval = _sem_clustering(spark, sf_dir)
    # the bucket table feeds BOTH sides of the pair join — persist it
    # (the 100 TB analog: materialize the cluster-assignment index once);
    # norms ride along so each pair costs one dot fold, not three
    bucketed = track_persist(
        assigned.select("vec_id", "v", "nv", F.col("c_id").alias("bucket"))
    )

    a = bucketed.select(
        F.col("vec_id").alias("kept"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("dropped"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("kept") < F.col("dropped")),
        )
        # dot/(na*nb) == cosine_similarity bit-for-bit (same IEEE tree)
        .withColumn(
            "cos", dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos") >= SEMANTIC_DEDUP_COS)
    )
    welect = W.partitionBy("dropped").orderBy(F.asc("kept"))
    return (
        pairs.withColumn("rn", F.row_number().over(welect))
        .filter(F.col("rn") == 1)
        .select(
            "dropped",
            "kept",
            F.col("bucket").cast("int").alias("bucket"),
            F.round("cos", 6).alias("cos"),
        )
        .orderBy("dropped")
    )


@query("dedup_semantic_agreement", oracle=_sem_agreement_sql)
def dedup_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the r9 two-level E-step graduation: for the FINAL
    Lloyd iteration's centroid table, compare dedup_semantic's
    two-level assignment (coarse seed → within-cell argmax) against
    the flat argmax over ALL k fine centroids — the recall-table
    pattern ann_ivf_recall applies to the IVF probe knob, applied to
    the assignment rule itself. One summary row: agreement rate plus
    the decimal-averaged chosen-centroid cosines under each rule and
    the mean regret (flat minus two-level, ≥ 0 by optimality of the
    flat argmax) — the number that tells an operator whether
    G = ceil(sqrt(k)) coarse cells are enough for their corpus.

    Scale shape: identical to dedup_semantic's E-step (map-side
    against broadcast structures) plus one flat argmax pass kept for
    the audit only — the audit is the one place the O(N·k) rule is
    deliberately retained, to measure what the production rule gives
    up. Cosines on both engines are the same IEEE trees; sums go
    through decimal accumulators before the rounded doubles."""
    assigned, fcell, _kval = _sem_clustering(spark, sf_dir)
    cents_all = _centroid_array(fcell.select("c_label", "cv"))
    joined = assigned.crossJoin(F.broadcast(cents_all))
    flat_best = F.get(_nearest_centroids(1), 0)
    chosen = F.get(
        F.filter(F.col("cents"), lambda c: c["c_label"] == F.col("c_id")), 0
    )
    tl_cos = dot_product(F.col("v"), chosen["cv"]) / (
        F.col("nv") * chosen["cnorm"]
    )
    per_row = joined.select(
        (flat_best["c_label"] == F.col("c_id")).cast("long").alias("agree"),
        flat_best["ccos"].alias("flat_cos"),
        tl_cos.alias("tl_cos"),
    )
    from gresearch_parquet_benchmarking_spark.operators.registry import davg

    return per_row.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("agree").cast("long").alias("n_agree"),
        F.round(F.sum("agree").cast("double") / F.count(F.lit(1)), 6).alias(
            "agree_rate"
        ),
        F.round(davg("flat_cos", scale=12), 6).alias("avg_cos_flat"),
        F.round(davg("tl_cos", scale=12), 6).alias("avg_cos_two_level"),
        F.round(
            davg(F.col("flat_cos") - F.col("tl_cos"), scale=12), 6
        ).alias("avg_regret"),
    )


# ---------------------------------------------------------------------------
# Embedding statistics / preprocessing (round 5)
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 8  # product-quantization subspaces (64-d → 8 × 8-d)


@query(
    "embedding_dim_covariance",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM v
    ),
    means AS (
        SELECT i, CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mx
        FROM flat GROUP BY i
    ),
    exy AS (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(CAST(a.x * b.x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS exy
        FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    )
    SELECT CAST(e.i AS BIGINT) AS i, CAST(e.j AS BIGINT) AS j,
           ROUND(e.exy - ma.mx * mb.mx, 8) AS cov
    FROM exy e JOIN means ma ON e.i = ma.i JOIN means mb ON e.j = mb.i
    ORDER BY i, j
    """,
)
def embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle dimension-covariance matrix of the embedding
    corpus (diagonal = per-dimension variance) — the collapse/whitening
    diagnostic an embedding pipeline monitors.

    Scale shape: the outer product is built IN-ROW (nested transform
    over the vector, d(d+1)/2 structs) and aggregated with map-side
    partial sums — the shuffle carries only d² keys × partial
    accumulators, never row-level data; per-dim means are a d-row
    broadcastable table joined at the end. Cross-engine exact: E[xy]
    and E[x] are decimal-accumulated; cov = exy − mx·my is IEEE on
    deterministic doubles. At much higher d, cap pairs to a
    top-variance subset first (same shape, fewer keys)."""
    vec = _vectors_spread(spark, sf_dir).select("vec_id", "v")
    flat = vec.select(F.posexplode("v").alias("i", "x"))
    means = flat.groupBy("i").agg(
        (F.sum(F.col("x").cast("decimal(27,12)")).cast("double") / F.count(F.lit(1))).alias("mx")
    )
    # upper-triangle outer product via two chained Generates: explode
    # dim i, then explode the suffix slice v[i..] — builds exactly
    # d(d+1)/2 rows per vector with no intermediate struct array (the
    # first cut built d² structs in-row and filtered; 2.6× slower at
    # sf0.1)
    upper = vec.select("v", F.posexplode("v").alias("i", "x")).select(
        "i",
        "x",
        F.posexplode(F.slice(F.col("v"), F.col("i") + 1, F.size("v"))).alias(
            "k", "y"
        ),
    )
    exy = (
        upper.select(
            "i",
            (F.col("i") + F.col("k")).alias("j"),
            (F.col("x") * F.col("y")).alias("xy"),
        )
        .groupBy("i", "j")
        .agg(
            (
                F.sum(F.col("xy").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("exy")
        )
    )
    ma = means.select(F.col("i").alias("i"), F.col("mx").alias("mi"))
    mb = means.select(F.col("i").alias("j"), F.col("mx").alias("mj"))
    return (
        exy.join(ma, "i")
        .join(mb, "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.round(F.col("exy") - F.col("mi") * F.col("mj"), 8).alias("cov"),
        )
        .orderBy("i", "j")
    )


@query(
    "embedding_whitening",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM v
    ),
    st AS (
        SELECT i, mx, sqrt(ex2 - mx * mx) AS sd
        FROM (
            SELECT i,
                   CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mx,
                   CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS ex2
            FROM flat GROUP BY i
        )
    ),
    wl AS (
        SELECT f.vec_id,
               list((f.x - st.mx) / st.sd ORDER BY f.i) AS z
        FROM flat f JOIN st ON f.i = st.i
        GROUP BY f.vec_id
    )
    SELECT v.vec_id,
           ROUND(sqrt(list_dot_product(v.v, v.v)), 6) AS l2_raw,
           ROUND(sqrt(list_dot_product(wl.z, wl.z)), 6) AS l2_white,
           ROUND(list_max(list_transform(wl.z, e -> ABS(e))), 6) AS max_abs_z
    FROM v JOIN wl ON v.vec_id = wl.vec_id
    ORDER BY v.vec_id
    """,
)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (diagonal whitening): z_i =
    (x_i − μ_i)/σ_i, reporting each vector's norm before/after and its
    max |z| (the outlier screen). Preprocessing every
    cosine-similarity index wants when dimensions have uneven scale.

    Scale shape: the d-row (μ, σ) table collapses to a single-row
    sorted array and broadcasts (the _centroid_array trick) — the
    transform is pure map-side in-row arithmetic. The corpus is
    scanned twice (once for the stats, once for the transform) but
    never shuffled: the stats aggregation partial-combines map-side,
    so only d keys × decimal accumulators cross the wire. Determinism:
    μ/σ² are decimal-accumulated; per-element (x−μ)/σ is IEEE; norms
    fold sequentially in-row on both engines (list_dot_product
    twin)."""
    vec = _vectors(spark, sf_dir).select("vec_id", "v")
    flat = vec.select(F.posexplode("v").alias("i", "x"))
    st = (
        flat.groupBy("i")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mx"),
            (
                F.sum((F.col("x") * F.col("x")).cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("ex2"),
        )
        .select(
            "i", "mx", F.sqrt(F.col("ex2") - F.col("mx") * F.col("mx")).alias("sd")
        )
    )
    stats_row = st.agg(
        F.array_sort(F.collect_list(F.struct("i", "mx", "sd"))).alias("stats")
    )
    z = F.transform(
        F.col("v"),
        lambda x, i: (x - F.get(F.col("stats"), i)["mx"])
        / F.get(F.col("stats"), i)["sd"],
    )
    return (
        vec.crossJoin(F.broadcast(stats_row))
        .select(
            "vec_id",
            F.round(l2_norm(F.col("v")), 6).alias("l2_raw"),
            F.round(l2_norm(z), 6).alias("l2_white"),
            F.round(F.array_max(F.transform(z, lambda e: F.abs(e))), 6).alias(
                "max_abs_z"
            ),
        )
        .orderBy("vec_id")
    )


PQ_SUB_DIM = 8  # 64-d / PQ_SUBSPACES

# Shared SQL CTE chain for the PQ family (ann_pq_codebook,
# ann_ivf_pq_topk): corpus → subvectors → per-(subspace, label)
# codebooks. DuckDB list slice is 1-based end-INCLUSIVE (CLAUDE.md
# rule 5). ``src`` names the vector CTE the chain splits — "vecs"
# (raw) for the codebook-distortion query, "vecs_n" (unit-normalized,
# spherical PQ) for the ADC search whose ground truth is cosine.
def _pq_sql_ctes(src: str = "vecs") -> str:
    return f"""
    vecs AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    vecs_n AS (
        SELECT vec_id, label,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v
        FROM vecs
    ),
    sub AS (
        SELECT vec_id, label, m,
               v[m * {PQ_SUB_DIM} + 1 : m * {PQ_SUB_DIM} + {PQ_SUB_DIM}] AS sv
        FROM {src} CROSS JOIN (SELECT unnest(range(0, {PQ_SUBSPACES})) AS m)
    ),
    flat AS (
        SELECT label, m, generate_subscripts(sv, 1) AS i, unnest(sv) AS x FROM sub
    ),
    dims AS (
        SELECT m, label, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat GROUP BY m, label, i
    ),
    cb AS (
        SELECT m, label AS cw, list(cx ORDER BY i) AS cv
        FROM dims GROUP BY m, label
    )"""


_PQ_SQL_CTES = _pq_sql_ctes()

# d²(s, c) = ⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩ — the same IEEE tree as the Spark
# side's dot_product folds
_SQL_PQ_D2 = (
    "list_dot_product({s}, {s}) - 2 * list_dot_product({s}, {c})"
    " + list_dot_product({c}, {c})"
)


def _pq_sub(vec: DataFrame) -> DataFrame:
    """Map-side split into (vec_id, label, m, sv) subvector rows."""
    return vec.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1)),
                lambda m: F.slice(F.col("v"), m * PQ_SUB_DIM + 1, PQ_SUB_DIM),
            )
        ).alias("m", "sv"),
    )


def _pq_codebook(sub: DataFrame) -> DataFrame:
    """Per-(subspace, codeword) centroid subvectors with precomputed
    ⟨c,c⟩: exact decimal per-dimension means (cm, cw, cv, c2)."""
    flat = sub.select("label", "m", F.posexplode("sv").alias("i", "x"))
    dims = flat.groupBy("m", "label", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx")
    )
    return (
        dims.groupBy("m", F.col("label").alias("cw"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            F.col("m").alias("cm"),
            "cw",
            F.transform("pairs", lambda p: p["cx"]).alias("cv"),
        )
        .withColumn("c2", dot_product(F.col("cv"), F.col("cv")))
    )


def _pq_best() -> Column:
    """In-row nearest-codeword struct (d2, cw) for a subvector row
    against the broadcast ``cbs`` codebook array — ties to the lowest
    codeword; argmin by comparator, fully map-side."""
    ss = dot_product(F.col("sv"), F.col("sv"))
    cands = F.filter(F.col("cbs"), lambda c: c["cm"] == F.col("m"))
    scored = F.transform(
        cands,
        lambda c: F.struct(
            (ss - F.lit(2.0) * dot_product(F.col("sv"), c["cv"]) + c["c2"]).alias("d2"),
            c["cw"].alias("cw"),
        ),
    )
    return F.get(
        F.array_sort(
            scored,
            lambda a, b: F.when(a["d2"] < b["d2"], F.lit(-1))
            .when(a["d2"] > b["d2"], F.lit(1))
            .when(a["cw"] < b["cw"], F.lit(-1))
            .when(a["cw"] > b["cw"], F.lit(1))
            .otherwise(F.lit(0)),
        ),
        0,
    )


@query(
    "ann_pq_codebook",
    oracle=f"""
    WITH {_PQ_SQL_CTES},
    scored AS (
        SELECT s.vec_id, s.m, c.cw,
               {_SQL_PQ_D2.format(s='s.sv', c='c.cv')} AS d2,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY {_SQL_PQ_D2.format(s='s.sv', c='c.cv')} ASC, c.cw
               ) AS rnk
        FROM sub s JOIN cb c ON s.m = c.m
    )
    SELECT CAST(m AS BIGINT) AS subspace, CAST(cw AS BIGINT) AS codeword,
           COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(d2 AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6)
               AS avg_sq_dist
    FROM scored WHERE rnk = 1
    GROUP BY m, cw
    ORDER BY subspace, codeword
    """,
)
def ann_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: the vector splits into PQ_SUBSPACES
    contiguous 8-d subvectors; each subspace gets a 10-codeword
    codebook (exact per-label subvector means — the deterministic
    seeding used by the IVF/k-means family) and every subvector is
    assigned to its nearest codeword by squared L2. Reports per
    (subspace, codeword) population and mean quantization distortion —
    the table that decides codebook size before compressing a 100 TB
    vector corpus 32× (64 floats → 8 codes).

    Scale shape: subvector explosion is map-side (M rows per vector,
    constant M); codebooks (M × 10 rows) collapse to ONE broadcast
    array row, assignment is in-row argmin (no corpus shuffle — the
    _centroid_array rationale); the only aggregation shuffles M × 10
    constant-width keys. Determinism: codeword means are
    decimal-accumulated; d² = ⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩ is the identical
    IEEE tree on both engines (sequential in-row folds); ties break to
    the lowest codeword."""
    vec = _vectors_spread(spark, sf_dir)
    sub = _pq_sub(vec)
    cb_row = _pq_codebook(sub).agg(
        F.array_sort(F.collect_list(F.struct("cm", "cw", "cv", "c2"))).alias("cbs")
    )
    best = _pq_best()
    assigned = sub.crossJoin(F.broadcast(cb_row)).select(
        F.col("m").cast("long").alias("subspace"),
        best["cw"].cast("long").alias("codeword"),
        best["d2"].alias("d2"),
    )
    return (
        assigned.groupBy("subspace", "codeword")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.round(
                F.sum(F.col("d2").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_sq_dist"),
        )
        .orderBy("subspace", "codeword")
    )


_SQL_IVF_COS = (
    "list_dot_product(v, cv2) / "
    "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv2, cv2)))"
)


def _bucket_assignment(vec: DataFrame) -> DataFrame:
    """(vec_id, bucket): nearest-centroid IVF assignment — map-side
    argmax against the broadcast centroid array (the corpus never
    shuffles for assignment). Shared by ann_ivf_pq_topk and the
    scale-shape probe (plans/scale_probes.py), which derives the
    probed-bucket candidate count from exactly this relation."""
    with_c = vec.crossJoin(
        F.broadcast(_centroid_array(_label_centroids(vec)))
    ).withColumn("nv", l2_norm(F.col("v")))
    return with_c.select(
        "vec_id", F.get(_nearest_centroids(1), 0)["c_label"].alias("bucket")
    )


@query(
    "ann_ivf_pq_topk",
    oracle=f"""
    WITH {_pq_sql_ctes('vecs_n')},
    cflat AS (
        SELECT vec_id, label, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM vecs
    ),
    cdims AS (
        SELECT label, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM cflat GROUP BY label, i
    ),
    cents AS (
        SELECT label AS c_label, list(cx ORDER BY i) AS cv2
        FROM cdims GROUP BY label
    ),
    assigned AS (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY {_SQL_IVF_COS} DESC, c_label) AS crank
        FROM vecs CROSS JOIN cents
    ),
    bucketed AS (SELECT vec_id, c_label AS bucket FROM assigned WHERE crank = 1),
    codes AS (
        SELECT vec_id, m, cw AS code FROM (
            SELECT s.vec_id, s.m, c.cw,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_SQL_PQ_D2.format(s='s.sv', c='c.cv')} ASC, c.cw
                   ) AS rnk
            FROM sub s JOIN cb c ON s.m = c.m
        ) WHERE rnk = 1
    ),
    dt AS (
        SELECT s.vec_id AS query_id, s.m, c.cw,
               {_SQL_PQ_D2.format(s='s.sv', c='c.cv')} AS d2
        FROM sub s JOIN cb c ON s.m = c.m
        WHERE s.vec_id < {N_QUERIES}
    ),
    probes AS (
        SELECT vec_id AS query_id, bucket FROM bucketed WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT p.query_id, b.vec_id
        FROM probes p JOIN bucketed b
          ON p.bucket = b.bucket AND b.vec_id != p.query_id
    ),
    adc AS (
        SELECT c.query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(dt.d2 AS DECIMAL(27,12))) AS DOUBLE) AS adc
        FROM cand c
        JOIN codes co ON c.vec_id = co.vec_id
        JOIN dt ON dt.query_id = c.query_id AND dt.m = co.m AND dt.cw = co.code
        GROUP BY c.query_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adc ASC, neighbor_id) AS BIGINT) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, ROUND(adc, 6) AS adc, rank
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def ann_ivf_pq_topk(
    spark: SparkSession, sf_dir: str, eager_sub: bool = True
) -> DataFrame:
    """IVF-PQ asymmetric-distance search (the Jégou et al. IVFADC
    composition, the index layout production vector stores actually
    deploy at 100 TB): the corpus lives as 8 PQ codeword ids per
    vector (32× compression); a query probes its IVF bucket and scores
    candidates by table lookup — per (query, subspace, codeword)
    squared distances are precomputed ONCE into a distance table, so
    scoring a candidate is M integer lookups + a sum, never a 64-d
    float fold.

    Scale shape: bucket assignment and code assignment are map-side
    against broadcast centroid/codebook arrays (corpus never shuffles
    for either; assignment table persisted across the probe and
    candidate uses); the distance table is queries × M × K rows —
    broadcast; the candidate join shuffles bucket ids only; the ADC
    sum is a decimal aggregation over constant-M rows per candidate
    (order-free, cross-engine exact). Ranking ties break on
    neighbor_id (rule: full unique tiebreaker)."""
    vec = _vectors(spark, sf_dir)
    bucketed = track_persist(_bucket_assignment(vec))
    # spherical PQ: encode UNIT vectors, so ADC's squared L2 is
    # 2 − 2·cos — monotone in the cosine the ground truth ranks by
    # (raw-vector L2 would rank by a different metric; measured recall
    # 0.14 vs cosine truth before this normalization). The per-element
    # division mirrors the oracle's x / sqrt(list_dot_product(v, v))
    # exactly.
    # r12 optimization round: evaluate the norm ONCE per row. A
    # higher-order lambda body is evaluated per ELEMENT, so the former
    # transform(v, x -> x / l2_norm(v)) re-ran the full d-element norm
    # fold for every element — O(d²) per row on the path that feeds
    # the whole PQ pipeline (sub → codebook → codes → ADC).
    # array_repeat evaluates its element argument once per row;
    # dividing by the identical double is bit-identical to the old
    # expression (oracle re-gated at sf0.001/0.01).
    vecn = vec.select(
        "vec_id",
        "label",
        F.zip_with(
            F.col("v"),
            F.array_repeat(l2_norm(F.col("v")), F.size(F.col("v"))),
            lambda x, n: x / n,
        ).alias("v"),
    )
    sub = _pq_sub(vecn)
    if eager_sub:
        # r13 (default ON): persist the (corpus × M)-row subvector
        # table — its lineage (normalize + slice-explode over the full
        # corpus) is otherwise re-run by the codebook build AND the
        # main codes plan (the qsub consumer is filter-pushed and
        # cheap). No count barrier: the codebook build is the first
        # consumer and fills the cache as a side effect. Alternating
        # A/B at sf0.1 (3 rounds, BENCH.md r13): warm medians equal
        # (~3.1 s both), but lazy windows hit 5.5-24.6 s cold/semi-warm
        # while eager never exceeded 3.8 s — the persist removes the
        # duplicated corpus pass that makes the cold path pathological.
        sub = track_persist(sub)
    # persist the 80-row codebook: it feeds BOTH the broadcast argmin
    # array and the query distance table — without the persist the
    # corpus-wide codebook aggregation runs once per consumer
    cb = track_persist(_pq_codebook(sub))
    cb_row = cb.agg(
        F.array_sort(F.collect_list(F.struct("cm", "cw", "cv", "c2"))).alias("cbs")
    )
    best = _pq_best()
    codes = sub.crossJoin(F.broadcast(cb_row)).select(
        "vec_id", "m", best["cw"].alias("code")
    )
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("m").alias("qm"), "sv"
    )
    d2 = (
        dot_product(F.col("sv"), F.col("sv"))
        - F.lit(2.0) * dot_product(F.col("sv"), F.col("cv"))
        + F.col("c2")
    )
    dt = qsub.join(cb, F.col("qm") == F.col("cm")).select(
        "query_id", F.col("qm").alias("dm"), "cw", d2.alias("d2")
    )
    probes = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("bucket").alias("qbucket")
    )
    cand = bucketed.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id")
    joined = cand.join(codes, "vec_id").join(
        F.broadcast(dt),
        (dt["query_id"] == cand["query_id"])
        & (F.col("dm") == F.col("m"))
        & (F.col("cw") == F.col("code")),
    )
    adc = joined.groupBy(cand["query_id"].alias("query_id"), "vec_id").agg(
        F.sum(dt["d2"].cast("decimal(27,12)")).cast("double").alias("adc")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("adc", 6).alias("adc"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _pq_recall_oracle() -> str:
    """Recall@k of the IVF-PQ (ADC) path against brute-force ground
    truth, composed from both paths' own oracle SQL (the _recall_oracle
    pattern)."""
    from gresearch_parquet_benchmarking_spark.operators.registry import ORACLE_SQL

    bf = ORACLE_SQL["ann_topk_bruteforce"]
    pq = ORACLE_SQL["ann_ivf_pq_topk"]
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf}) t),
    pq AS (SELECT query_id, neighbor_id FROM ({pq}) t)
    SELECT b.query_id AS query_id,
           COUNT(*) AS n_true,
           SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
           ROUND(CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall
    FROM bf b
    LEFT JOIN pq p
      ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@query("ann_ivf_pq_recall", oracle=_pq_recall_oracle)
def ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-PQ (ADC) search vs exact brute force, per
    query — completes the per-index quality tables (IVF: ann_ivf_recall,
    LSH: ann_lsh_recall): the number that prices PQ's 32× compression
    in lost recall and decides codebook size / nprobe at deployment.
    Composes the existing pipelines; the hit test is a tiny
    (query_id, neighbor_id) equi-join."""
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    pq = (
        ann_ivf_pq_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Top principal component: matrix-free power iteration (round 5)
# ---------------------------------------------------------------------------

PCA_ITERS = 3
EMB_DIM = 64


def _pca_sql() -> str:
    """DuckDB twin of the unrolled power iteration — generated by the
    same Python loop as the Spark builder (the kmeans-oracle pattern),
    so iteration count and expression trees can never drift."""
    inv_sqrt_d = f"(1.0 / sqrt({EMB_DIM}.0))"
    parts = [
        f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM vecs
    ),
    means AS (
        SELECT i, CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS mx
        FROM flat GROUP BY i
    ),
    mu AS (SELECT list(mx ORDER BY i) AS mu FROM means),
    cvecs AS (
        SELECT vec_id, [v[k] - mu[k] FOR k IN range(1, len(v) + 1)] AS c
        FROM vecs CROSS JOIN mu
    ),
    v_0 AS (SELECT [{inv_sqrt_d} FOR k IN range(1, {EMB_DIM} + 1)] AS vt)"""
    ]
    for it in range(PCA_ITERS):
        parts.append(
            f""",
    y_{it} AS (
        SELECT i,
               CAST(SUM(CAST(s * c[i + 1] AS DECIMAL(27,12))) AS DOUBLE) AS y
        FROM (
            SELECT c, list_dot_product(c, vt) AS s
            FROM cvecs CROSS JOIN v_{it}
        ) CROSS JOIN (SELECT unnest(range(0, {EMB_DIM})) AS i)
        GROUP BY i
    ),
    v_{it + 1} AS (
        SELECT list(y / sqrt(n2) ORDER BY i) AS vt
        FROM y_{it} CROSS JOIN (
            SELECT CAST(SUM(CAST(y * y AS DECIMAL(27,12))) AS DOUBLE) AS n2
            FROM y_{it}
        )
    )"""
        )
    last = PCA_ITERS
    parts.append(
        f""",
    eig AS (
        SELECT CAST(SUM(CAST(list_dot_product(c, vt) * list_dot_product(c, vt)
                             AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS eigenvalue
        FROM cvecs CROSS JOIN v_{last}
    )
    SELECT CAST(i AS BIGINT) AS i,
           ROUND(vt[i + 1], 6) AS loading,
           ROUND(eigenvalue, 4) AS eigenvalue
    FROM (SELECT unnest(range(0, {EMB_DIM})) AS i)
         CROSS JOIN v_{last} CROSS JOIN eig
    ORDER BY i
    """
    )
    return "".join(parts)


@query("embedding_pca_power_iteration", oracle=_pca_sql)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by MATRIX-FREE
    power iteration: v ← normalize(Σ_rows ⟨c, v⟩·c) for PCA_ITERS
    rounds over mean-centered vectors — the d×d covariance matrix is
    never materialized, so the same code runs at any d. Emits the
    64 loadings plus the Rayleigh-quotient eigenvalue (top explained
    variance) — the anisotropy/collapse diagnostic an embedding
    pipeline tracks (and the first step of the whitening rotation
    embedding_whitening's diagonal scaling approximates).

    Scale shape per iteration: the current direction is a broadcast
    single-row array; ⟨c, v⟩ and the per-row contribution s·c_j are
    map-side in-row folds; the only shuffle is a d-key decimal
    aggregation (map-side partial). The corpus is persisted centered
    once (track_persist) — the Lloyd-loop contract of kmeans_train.
    Determinism: per-dim sums are decimal-accumulated; dots fold
    in-row on both engines; v0 = 1/√d is sign-deterministic."""
    vec = _vectors_spread(spark, sf_dir).select("vec_id", "v")
    flat = vec.select(F.posexplode("v").alias("i", "x"))
    means = flat.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mx")
    )
    mu_row = means.agg(
        F.array_sort(F.collect_list(F.struct("i", "mx"))).alias("mus")
    )
    centered = track_persist(
        vec.crossJoin(F.broadcast(mu_row)).select(
            "vec_id",
            F.transform(
                F.col("v"), lambda x, i: x - F.get(F.col("mus"), i)["mx"]
            ).alias("c"),
        )
    )
    # v0 = 1/sqrt(d) everywhere (sign-deterministic start)
    vt_row = spark.range(1).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
            lambda _: F.lit(1.0) / F.sqrt(F.lit(float(EMB_DIM))),
        ).alias("vt")
    )
    for _ in range(PCA_ITERS):
        s = dot_product(F.col("c"), F.col("vt"))
        contrib = centered.crossJoin(F.broadcast(vt_row)).select(
            F.posexplode(
                F.transform(F.col("c"), lambda cj: s * cj)
            ).alias("i", "sc")
        )
        y = contrib.groupBy("i").agg(
            F.sum(F.col("sc").cast("decimal(27,12)")).cast("double").alias("y")
        )
        # decimal-accumulate the norm too (rule 1): a plain double SUM
        # is order-dependent and would propagate through 3 iterations
        # into the rounded loadings — a latent hash-gate flake.
        n2 = y.agg(
            F.sum((F.col("y") * F.col("y")).cast("decimal(27,12)"))
            .cast("double")
            .alias("n2")
        )
        # persist the ONE-ROW direction: without it each iteration's
        # broadcast stage re-runs every earlier iteration's corpus
        # aggregation through vt's lineage (the kmeans-lineage lesson;
        # measured 5.4 s -> ~2 s at sf0.1). d doubles per round — free.
        vt_row = track_persist(
            y.crossJoin(F.broadcast(n2))
            .groupBy()
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("i", (F.col("y") / F.sqrt("n2")).alias("u")))
                ).alias("pairs")
            )
            .select(F.transform("pairs", lambda p: p["u"]).alias("vt"))
        )
    # Rayleigh quotient: mean squared projection on the final direction
    proj = centered.crossJoin(F.broadcast(vt_row)).select(
        (dot_product(F.col("c"), F.col("vt")) ** 2).alias("p2")
    )
    eig = proj.agg(
        (
            F.sum(F.col("p2").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("eigenvalue")
    )
    return (
        vt_row.select(F.posexplode("vt").alias("i", "loading"))
        .crossJoin(F.broadcast(eig))
        .select(
            F.col("i").cast("long").alias("i"),
            F.round("loading", 6).alias("loading"),
            F.round("eigenvalue", 4).alias("eigenvalue"),
        )
        .orderBy("i")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (round 6)
# ---------------------------------------------------------------------------

MMR_POOL = 10    # relevance candidates per query fed to the re-ranker
MMR_SELECT = 3   # diversified results returned
MMR_LAMBDA = 0.5  # exact binary fraction: 0.5*x is bit-deterministic


def _mmr_sql() -> str:
    """DuckDB twin of the greedy MMR loop, unrolled from the same
    Python constants as the Spark builder (the kmeans never-drifts
    contract). Scores stay RAW doubles until the final ROUND — both
    engines compute rel and sim with the same IEEE expression tree, and
    0.5·rel − 0.5·msim is exact halving, so the greedy argmax picks the
    same item on both sides."""
    lam, mu = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    parts = [
        f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.v AS v,
               {_SQL_COS} AS rel
        FROM vecs a JOIN vecs b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT query_id, neighbor_id, v, rel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {MMR_POOL}
    ),
    sims AS (
        SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
               {_SQL_COS} AS sim
        FROM cand a JOIN cand b
          ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
    ),
    sel_1 AS (
        SELECT query_id, neighbor_id, rel, 1 AS step FROM (
            SELECT query_id, neighbor_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, neighbor_id) AS rnk
            FROM cand
        ) WHERE rnk = 1
    )"""
    ]
    for k in range(2, MMR_SELECT + 1):
        parts.append(
            f""",
    ms_{k} AS (
        SELECT s.query_id, s.ida AS neighbor_id, MAX(s.sim) AS msim
        FROM sims s JOIN sel_{k - 1} p
          ON s.query_id = p.query_id AND s.idb = p.neighbor_id
        GROUP BY s.query_id, s.ida
    ),
    pick_{k} AS (
        SELECT query_id, neighbor_id, rel, {k} AS step FROM (
            SELECT c.query_id, c.neighbor_id, c.rel,
                   ROW_NUMBER() OVER (PARTITION BY c.query_id
                       ORDER BY {lam} * c.rel - {mu} * m.msim DESC,
                                c.neighbor_id) AS prnk
            FROM cand c
            JOIN ms_{k} m
              ON c.query_id = m.query_id AND c.neighbor_id = m.neighbor_id
            WHERE NOT EXISTS (SELECT 1 FROM sel_{k - 1} p
                              WHERE p.query_id = c.query_id
                                AND p.neighbor_id = c.neighbor_id)
        ) WHERE prnk = 1
    ),
    sel_{k} AS (
        SELECT * FROM sel_{k - 1} UNION ALL SELECT * FROM pick_{k}
    )"""
        )
    parts.append(
        f"""
    SELECT query_id, CAST(step AS BIGINT) AS step, neighbor_id,
           ROUND(rel, 6) AS rel
    FROM sel_{MMR_SELECT}
    ORDER BY query_id, step
    """
    )
    return "".join(parts)


@query("ann_mmr_diversified_topk", oracle=_mmr_sql)
def ann_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein):
    from each query's exact top-{MMR_POOL} relevance pool, greedily
    select {MMR_SELECT} results maximizing
    λ·rel(c) − (1−λ)·max_{{s∈selected}} sim(c, s) — the standard
    redundancy-suppressing retrieval head over an ANN index (a RAG
    pipeline's final stage). Emits (query_id, step, neighbor_id, rel):
    step 1 is the plain top-1; later steps trade relevance for
    diversity.

    Scale shape: the O(|corpus|) work is exactly the bruteforce scorer
    (broadcast queries, one corpus scan); everything after operates on
    {MMR_POOL} rows/query — the candidate pool and its {MMR_POOL}²
    pairwise sims are persisted once, and each greedy step is a
    max-aggregation + argmax over pool-sized tables keyed by query_id
    (constant-width shuffle keys). λ = {MMR_LAMBDA} is an exact binary
    fraction so the score arithmetic is bit-deterministic; ties break
    on neighbor_id."""
    lam, mu = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    vec = _vectors_spread(spark, sf_dir).withColumn("n2", l2_norm(F.col("v")))
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    scored = vec.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "v",
        "n2",
        (dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n2"))).alias(
            "rel"
        ),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("neighbor_id"))
    cand = track_persist(
        scored.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= MMR_POOL)
        .select("query_id", "neighbor_id", "v", "n2", "rel", "rnk")
    )
    a = cand.select(
        "query_id",
        F.col("neighbor_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("n2").alias("na"),
    )
    b = cand.select(
        F.col("query_id").alias("qb"),
        F.col("neighbor_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("n2").alias("nb"),
    )
    sims = track_persist(
        a.join(b, (F.col("query_id") == F.col("qb")) & (F.col("ida") != F.col("idb")))
        .select(
            "query_id",
            "ida",
            "idb",
            (dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "sim"
            ),
        )
    )
    selected = (
        cand.filter(F.col("rnk") == 1)
        .select("query_id", "neighbor_id", "rel", F.lit(1).alias("step"))
    )
    for k in range(2, MMR_SELECT + 1):
        ms = (
            sims.join(
                selected.select("query_id", F.col("neighbor_id").alias("idb")),
                ["query_id", "idb"],
            )
            .groupBy("query_id", "ida")
            .agg(F.max("sim").alias("msim"))
            .withColumnRenamed("ida", "neighbor_id")
        )
        rem = cand.join(
            selected.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        wp = W.partitionBy("query_id").orderBy(
            F.desc(F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("msim")),
            F.asc("neighbor_id"),
        )
        pick = (
            rem.join(ms, ["query_id", "neighbor_id"])
            .withColumn("prnk", F.row_number().over(wp))
            .filter(F.col("prnk") == 1)
            .select("query_id", "neighbor_id", "rel", F.lit(k).alias("step"))
        )
        selected = selected.unionByName(pick)
    return selected.select(
        "query_id",
        F.col("step").cast("long").alias("step"),
        "neighbor_id",
        F.round("rel", 6).alias("rel"),
    ).orderBy("query_id", "step")


# ---------------------------------------------------------------------------
# Near-dup threshold sweep (round 6): the SemDeDup/epsilon calibration
# ---------------------------------------------------------------------------

NEARDUP_SWEEP = (0.3, 0.5, 0.7, 0.9)


@query(
    "embedding_neardup_threshold_sweep",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    {_SQL_PLANES}
    , pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_SQL_COS} AS cos
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    n AS (SELECT COUNT(*) AS corpus_n FROM vecs)
    SELECT t.thr AS threshold,
           COUNT(*) AS n_cand_pairs,
           CAST(SUM(CASE WHEN p.cos >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN p.cos >= t.thr THEN p.vec_b END)
                AS BIGINT) AS n_dropped,
           ROUND(COUNT(DISTINCT CASE WHEN p.cos >= t.thr THEN p.vec_b END)
                 * 1.0 / ANY_VALUE(n.corpus_n), 6) AS drop_share
    FROM pairs p
    CROSS JOIN (VALUES {", ".join(f"({t})" for t in NEARDUP_SWEEP)}) t(thr)
    CROSS JOIN n
    GROUP BY t.thr
    ORDER BY threshold
    """,
)
def embedding_neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon calibration for embedding near-dup pruning: over the
    LSH-bucket candidate pairs (embedding_cosine_neardup's generator),
    count qualifying pairs and distinct pruned vectors at each
    threshold in {NEARDUP_SWEEP} in ONE pass — the sweep that picks
    SemDeDup's epsilon (too low over-prunes paraphrases; too high
    misses templates). drop_share is the corpus fraction each epsilon
    would remove.

    Scale shape: candidates meet only inside an LSH bucket (the
    no-all-pairs contract); the sweep multiplies the CANDIDATE table
    (not the corpus) by |thresholds| broadcast rows; counts aggregate
    with map-side partials keyed by (threshold, vec_b) for the
    distinct. Threshold literals parse to identical doubles on both
    engines, so the >= cuts agree bitwise."""
    vec = _vectors_spread(spark, sf_dir)
    bucketed = vec.select(
        "vec_id", "v", l2_norm(F.col("v")).alias("n2"), _lsh_bucket_col().alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("n2").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("n2").alias("nb"), F.col("bucket").alias("bucket_b"),
    )
    cos = dot_product(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = a.join(
        b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b"))
    ).select("vec_a", "vec_b", cos.alias("cos"))
    n = vec.agg(F.count(F.lit(1)).alias("corpus_n"))
    thr = F.explode(F.array(*[F.lit(t) for t in NEARDUP_SWEEP])).alias("threshold")
    hit = F.when(F.col("cos") >= F.col("threshold"), F.col("vec_b"))
    return (
        pairs.select("vec_a", "vec_b", "cos", thr)
        .crossJoin(F.broadcast(n))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n_cand_pairs"),
            F.sum(F.when(F.col("cos") >= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs"),
            F.count_distinct(hit).cast("long").alias("n_dropped"),
            F.round(
                F.count_distinct(hit) * F.lit(1.0) / F.first("corpus_n"), 6
            ).alias("drop_share"),
        )
        .orderBy("threshold")
    )


RANGE_RADIUS = 0.3  # cosine radius; literal parses identically on both engines


@query(
    "ann_range_search",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_SQL_COS} AS cos
        FROM vecs a JOIN vecs b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN cos >= {RANGE_RADIUS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_in_range,
           ROUND(MAX(CASE WHEN cos >= {RANGE_RADIUS} THEN cos END), 6)
               AS max_cos,
           ROUND(MIN(CASE WHEN cos >= {RANGE_RADIUS} THEN cos END), 6)
               AS min_cos
    FROM scored
    GROUP BY query_id
    ORDER BY query_id
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search — the OTHER vector-search API next to
    top-k: for each query vector, every corpus vector within cosine
    radius {RANGE_RADIUS}, rolled up per query (count + the range's
    cosine extremes). Top-k answers "give me the best k"; range search
    answers "give me everything this similar" — the right primitive
    for dedup sweeps and recall-bounded retrieval where the neighbor
    count is data-dependent.

    Scale shape: identical to the bruteforce scorer (broadcast query
    set, one corpus scan, map-side dot folds); the rollup aggregates
    per query_id with map-side partials, so the result is |queries|
    rows regardless of how many neighbors fall inside the radius —
    the full pair list never materializes past the aggregation.
    Radius comparisons hit raw doubles on both engines; MAX/MIN are
    order-free."""
    vec = _vectors_spread(spark, sf_dir).withColumn("n2", l2_norm(F.col("v")))
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    scored = vec.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        (dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n2"))).alias(
            "cos"
        ),
    )
    inr = F.when(F.col("cos") >= RANGE_RADIUS, F.col("cos"))
    return (
        scored.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("cos") >= RANGE_RADIUS, 1).otherwise(0))
            .cast("long")
            .alias("n_in_range"),
            F.round(F.max(inr), 6).alias("max_cos"),
            F.round(F.min(inr), 6).alias("min_cos"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall (round 6)
# ---------------------------------------------------------------------------

MRL_DIMS = (16, 32)  # prefix widths evaluated against the full-dim truth


def _mrl_sql() -> str:
    """DuckDB twin of the truncation sweep, composed from the
    brute-force oracle (the ann_ivf_recall pattern: the SQL literally
    re-runs ground truth plus one truncated arm per prefix width)."""
    from gresearch_parquet_benchmarking_spark.operators.registry import ORACLE_SQL

    bf = ORACLE_SQL["ann_topk_bruteforce"]

    def trunc_arm(d: int) -> str:
        cos = (
            f"list_dot_product(a.t, b.t) / "
            f"(sqrt(list_dot_product(a.t, a.t)) * sqrt(list_dot_product(b.t, b.t)))"
        )
        return f"""
    SELECT CAST({d} AS BIGINT) AS mrl_dim, bf.query_id,
           COUNT(*) AS n_true,
           CAST(SUM(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall
    FROM bf
    LEFT JOIN (
        SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {cos} DESC, b.vec_id) AS rnk
            FROM tvecs_{d} a JOIN tvecs_{d} b ON b.vec_id != a.vec_id
            WHERE a.vec_id < {N_QUERIES}
        ) r WHERE rnk <= {TOP_K}
    ) tr ON bf.query_id = tr.query_id AND bf.neighbor_id = tr.neighbor_id
    GROUP BY bf.query_id
    """

    tvecs = ",\n".join(
        f"""
    tvecs_{d} AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE))[1:{d}] AS t
        FROM embeddings
    )"""
        for d in MRL_DIMS
    )
    arms = "\nUNION ALL\n".join(trunc_arm(d) for d in MRL_DIMS)
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf}) t),
    {tvecs}
    SELECT * FROM ({arms}) u
    ORDER BY mrl_dim, query_id
    """


@query("embedding_matryoshka_recall", oracle=_mrl_sql)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation sweep: recall@5 of cosine top-k computed
    on the FIRST d dims (d ∈ MRL_DIMS) against the full-dim exact
    top-5 — the table that decides how far an MRL-style embedding can
    be truncated before retrieval quality pays (Kusupati et al. 2022,
    "Matryoshka Representation Learning"). At 100 TB this is the
    cheapest capacity lever a vector pipeline has: storing d=16 of 64
    cuts index bytes 4x, and this query measures exactly what that
    costs in recall.

    Scale shape per arm: identical to ann_topk_bruteforce (broadcast
    query set, one corpus scan, map-side prefix-slice + dot folds,
    per-query top-k window over |queries|·k rows); the hit test is a
    tiny equi-join. The corpus is scanned once per arm but the slice
    happens before the pair join, so shorter prefixes fold cheaper.
    Determinism: prefix cosine uses the carried-norm IEEE tree
    (dot/(qn·n2) ≡ inline); ranking ties break on neighbor_id."""
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    vec = _vectors_spread(spark, sf_dir)
    arms = []
    for d in MRL_DIMS:
        tv = vec.select(
            "vec_id", F.slice(F.col("v"), 1, d).alias("t")
        ).withColumn("n2", l2_norm(F.col("t")))
        queries = tv.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("t").alias("qt"),
            F.col("n2").alias("qn"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc(
                (dot_product(F.col("qt"), F.col("t")) / (F.col("qn") * F.col("n2")))
            ),
            F.asc("vec_id"),
        )
        tr = (
            tv.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
            .withColumn("hit", F.lit(1))
        )
        arms.append(
            bf.join(tr, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("long")
                .alias("n_hits"),
                F.round(
                    F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("recall"),
            )
            .select(
                F.lit(d).cast("long").alias("mrl_dim"),
                "query_id",
                "n_true",
                "n_hits",
                "recall",
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("mrl_dim", "query_id")


# ---------------------------------------------------------------------------
# Hard-negative mining (round 6)
# ---------------------------------------------------------------------------

HARDNEG_K = 5


@query(
    "ann_hard_negative_mining",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, a.label AS query_label,
               b.vec_id AS neighbor_id, b.label AS neighbor_label,
               {_SQL_COS} AS cos
        FROM vecs a JOIN vecs b
          ON b.vec_id != a.vec_id AND b.label != a.label
        WHERE a.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS BIGINT)
                   AS rank
        FROM scored
    )
    SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
           neighbor_id, CAST(neighbor_label AS BIGINT) AS neighbor_label,
           ROUND(cos, 6) AS cos, rank
    FROM ranked WHERE rank <= {HARDNEG_K}
    ORDER BY query_id, rank
    """,
)
def ann_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each query vector, the top-k most
    COSINE-SIMILAR corpus vectors with a DIFFERENT label — the
    candidates that sit closest to the decision boundary. This is the
    negative-sampling step of contrastive retrieval training (DPR /
    ANCE style): random negatives are trivially separable, so the
    training signal comes from exactly the pairs this query surfaces.

    Scale shape: identical to ann_topk_bruteforce (broadcast query
    set, one corpus scan, map-side dot folds, per-query top-k window)
    — the label inequality is applied IN the join condition, so
    same-label pairs never materialize. In production the scorer side
    swaps to the IVF/PQ candidate generator unchanged; the mining
    semantics live entirely in the label predicate + ranking.
    Determinism: carried-norm IEEE cosine, rounded after ranking,
    neighbor_id tiebreaker."""
    vec = _vectors_spread(spark, sf_dir).withColumn("n2", l2_norm(F.col("v")))
    queries = vec.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    scored = vec.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("query_label")),
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        (dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n2"))).alias(
            "cos"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HARDNEG_K)
        .select(
            "query_id",
            F.col("query_label").cast("long").alias("query_label"),
            "neighbor_id",
            F.col("neighbor_label").cast("long").alias("neighbor_label"),
            F.round("cos", 6).alias("cos"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# kNN classifier evaluation (round 6)
# ---------------------------------------------------------------------------


def _knn_eval_sql() -> str:
    """Composed from the brute-force oracle (ann_ivf_recall pattern):
    majority vote over the exact top-k's labels, ties to the smaller
    label, scored against the query's own label."""
    from gresearch_parquet_benchmarking_spark.operators.registry import ORACLE_SQL

    bf = ORACLE_SQL["ann_topk_bruteforce"]
    return f"""
    WITH bf AS (SELECT query_id, neighbor_id FROM ({bf}) t),
    votes AS (
        SELECT bf.query_id, e.label, COUNT(*) AS votes
        FROM bf JOIN embeddings e ON bf.neighbor_id = e.vec_id
        GROUP BY bf.query_id, e.label
    ),
    pred AS (
        SELECT query_id, label AS pred_label, votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, label) AS r
        FROM votes
    )
    SELECT p.query_id,
           CAST(q.label AS BIGINT) AS true_label,
           CAST(p.pred_label AS BIGINT) AS pred_label,
           CAST(p.votes AS BIGINT) AS votes,
           p.pred_label = q.label AS correct
    FROM pred p JOIN embeddings q ON p.query_id = q.vec_id
    WHERE p.r = 1
    ORDER BY p.query_id
    """


@query("ann_knn_classifier_eval", oracle=_knn_eval_sql)
def ann_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier evaluation: predict each query vector's label by
    majority vote over its exact cosine top-{TOP_K} (ties to the
    smaller label), scored against the query's own label — the
    standard embedding-quality probe (if labels aren't recoverable
    from neighborhoods, the space is mis-trained; Cover & Hart 1967
    is the classical result this eval rests on).

    Scale shape: the expensive part IS ann_topk_bruteforce (broadcast
    queries, one corpus scan); everything after is |queries|·k rows —
    a label lookup join against the corpus keyed by vec_id, a tiny
    vote aggregate, one window. Swapping the candidate generator to
    IVF/PQ changes recall, not this eval's plumbing.
    Determinism: integer votes; double-tie goes to the smaller label;
    the boolean is an integer comparison."""
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    vec = _vectors(spark, sf_dir)
    labels = vec.select("vec_id", "label")
    votes = (
        bf.join(labels, bf.neighbor_id == labels.vec_id)
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = vec.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(truth, "query_id")
        .select(
            "query_id",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid-search algebra)
# ---------------------------------------------------------------------------

RRF_K = 60        # the canonical RRF constant (Cormack et al. 2009)
RRF_DEPTH = 20    # per-arm candidate depth fed into the fusion


@query(
    "ann_rrf_fusion",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    normed AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n2 FROM vecs
    ),
    arm_cos AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_dot_product(a.v, b.v) / (a.n2 * b.n2) DESC,
                            b.vec_id) AS BIGINT) AS rank_cos
        FROM normed a JOIN normed b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
        QUALIFY rank_cos <= {RRF_DEPTH}
    ),
    q AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(GREATEST(LEAST(ROUND(x * {QUANT_SCALE}), 127), -127) AS BIGINT)) AS qv
        FROM vecs
    ),
    arm_q AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY CAST(list_dot_product(
                       list_transform(a.qv, x -> CAST(x AS DOUBLE)),
                       list_transform(b.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) DESC,
                            b.vec_id) AS BIGINT) AS rank_q
        FROM q a JOIN q b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
        QUALIFY rank_q <= {RRF_DEPTH}
    ),
    fused AS (
        SELECT COALESCE(c.query_id, i.query_id) AS query_id,
               COALESCE(c.neighbor_id, i.neighbor_id) AS neighbor_id,
               COALESCE(1.0 / ({RRF_K} + c.rank_cos), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + i.rank_q), 0.0) AS rrf,
               COALESCE(c.rank_cos, -1) AS rank_cos,
               COALESCE(i.rank_q, -1) AS rank_q
        FROM arm_cos c
        FULL OUTER JOIN arm_q i
          ON c.query_id = i.query_id AND c.neighbor_id = i.neighbor_id
    )
    SELECT query_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id) AS BIGINT)
             AS fused_rank,
           neighbor_id, ROUND(rrf, 6) AS rrf, rank_cos, rank_q
    FROM fused
    QUALIFY fused_rank <= {TOP_K}
    ORDER BY query_id, fused_rank
    """,
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009:
    1/(k+rank) summed across systems, k=60) of two retrieval arms over
    the same corpus — exact float32 cosine and symmetric-int8
    quantized dot — the fusion algebra behind every hybrid
    (lexical+vector or multi-index) search stack: rank-based, so
    incomparable score scales fuse without calibration.

    Scale shape: each arm is the broadcast-queries map-side scan the
    brute-force/quantized queries already use, cut to a DEPTH-bounded
    per-query candidate list by the same per-query top-k window; the
    fusion full-outer join then runs on ≤ 2·DEPTH rows per query —
    constant work per query regardless of corpus size. In production
    the arms are index-backed (IVF-PQ / inverted lists); the fusion
    algebra is identical.

    Determinism: ranks are integers from windows whose sort keys are
    per-row IEEE doubles (cosine) and exact integers (quantized dot),
    both neighbor-tiebroken; the RRF score is a two-term per-row sum
    of exactly-representable-denominator reciprocals — no aggregation
    sums anywhere, so no decimal accumulator is needed."""
    vec = _vectors(spark, sf_dir).withColumn("n2", l2_norm(F.col("v")))
    queries = vec.filter(F.col("vec_id") < N_QUERIES)

    # arm 1: exact cosine, depth-bounded
    qa = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn"),
    )
    cos = dot_product(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n2"))
    wc = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    arm_cos = (
        vec.join(F.broadcast(qa), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .withColumn("rank_cos", F.row_number().over(wc).cast("long"))
        .filter(F.col("rank_cos") <= RRF_DEPTH)
        .select("query_id", "neighbor_id", "rank_cos")
    )

    # arm 2: int8 symmetric quantization, exact integer dot
    quantize = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.least(F.round(x * QUANT_SCALE, 0), F.lit(127.0)), F.lit(-127.0)
        ).cast("long"),
    )
    q = _vectors(spark, sf_dir).select("vec_id", quantize.alias("qv2"))
    qb = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("qv2").alias("qq")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("qv2"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("n_id"))
    arm_q = (
        q.join(F.broadcast(qb), F.col("vec_id") != F.col("q_id"))
        .select(
            F.col("q_id"), F.col("vec_id").alias("n_id"), qdot.alias("qdot")
        )
        .withColumn("rank_q", F.row_number().over(wq).cast("long"))
        .filter(F.col("rank_q") <= RRF_DEPTH)
        .select("q_id", "n_id", "rank_q")
    )

    fused = arm_cos.join(
        arm_q,
        (F.col("query_id") == F.col("q_id"))
        & (F.col("neighbor_id") == F.col("n_id")),
        "full_outer",
    ).select(
        F.coalesce("query_id", "q_id").alias("query_id"),
        F.coalesce("neighbor_id", "n_id").alias("neighbor_id"),
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_cos")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_q")), F.lit(0.0))
        ).alias("rrf"),
        F.coalesce("rank_cos", F.lit(-1)).alias("rank_cos"),
        F.coalesce("rank_q", F.lit(-1)).alias("rank_q"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "query_id", "fused_rank", "neighbor_id",
            F.round("rrf", 6).alias("rrf"), "rank_cos", "rank_q",
        )
        .orderBy("query_id", "fused_rank")
    )


INT8_LEVELS = 255  # 8-bit scalar quantization levels (0..255)


@query(
    "embedding_int8_quant_error",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x
        FROM vecs
    ),
    st AS (
        SELECT i, MIN(x) AS mn, (MAX(x) - MIN(x)) / {INT8_LEVELS} AS sc
        FROM flat GROUP BY i
    ),
    qd AS (
        SELECT f.vec_id, f.i, f.x,
               CASE WHEN st.sc > 0
                    THEN st.mn + LEAST(GREATEST(
                             FLOOR((f.x - st.mn) / st.sc + 0.5), 0),
                             {INT8_LEVELS}) * st.sc
                    ELSE st.mn END AS deq
        FROM flat f JOIN st ON f.i = st.i
    ),
    dv AS (
        SELECT vec_id,
               list(deq - x ORDER BY i) AS diff,
               list(deq ORDER BY i) AS deq
        FROM qd GROUP BY vec_id
    ),
    per AS (
        SELECT v.vec_id,
               list_dot_product(d.diff, d.diff) / len(v.v) AS mse,
               list_max(list_transform(d.diff, e -> ABS(e))) AS max_abs_err,
               list_dot_product(v.v, d.deq)
                 / (sqrt(list_dot_product(v.v, v.v))
                    * sqrt(list_dot_product(d.deq, d.deq))) AS cos
        FROM vecs v JOIN dv d USING (vec_id)
    )
    SELECT COUNT(*)::BIGINT AS n_vecs,
           ROUND(CAST(SUM(CAST(mse AS DECIMAL(27,14))) AS DOUBLE)
                 / COUNT(*), 10) AS mean_mse,
           ROUND(MAX(max_abs_err), 10) AS worst_abs_err,
           ROUND(CAST(SUM(CAST(cos AS DECIMAL(27,14))) AS DOUBLE)
                 / COUNT(*), 10) AS mean_cos,
           ROUND(MIN(cos), 10) AS worst_cos
    FROM per
    """,
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar INT8 quantization fidelity: per-dimension min/max
    calibration (the asymmetric-affine scheme FAISS SQ8 / every
    production vector store ships), quantize → dequantize, and report
    reconstruction MSE, worst per-element error, and cosine retention
    — the memory-4x-compression vs recall trade measured, completing
    the quantization family next to PQ (`ann_pq_codebook`) and
    truncation (`embedding_matryoshka_recall`).

    Scale shape: calibration is a d-key aggregation with map-side
    partials (only min/max accumulators cross the wire); the d-row
    stats table collapses to one sorted array and BROADCASTS (the
    _centroid_array/whitening trick), so quantization and error
    metrics are pure in-row map-side arithmetic — the corpus is never
    shuffled, and the rollup returns one row.

    Determinism: min/max of doubles are exact; scale is one division;
    floor(t + 0.5) and the clamp are bit-identical on identical
    inputs; per-vector folds run in array order on both engines
    (functions.vector precision contract); corpus means
    decimal-accumulate (rule 1)."""
    vec = _vectors(spark, sf_dir).select("vec_id", "v")
    flat = vec.select(F.posexplode("v").alias("i", "x"))
    st = flat.groupBy("i").agg(
        F.min("x").alias("mn"),
        ((F.max("x") - F.min("x")) / INT8_LEVELS).alias("sc"),
    )
    stats_row = st.agg(
        F.array_sort(F.collect_list(F.struct("i", "mn", "sc"))).alias("stats")
    )
    def _deq(x, i):
        mn = F.get(F.col("stats"), i)["mn"]
        sc = F.get(F.col("stats"), i)["sc"]
        q = F.least(
            F.greatest(F.floor((x - mn) / sc + F.lit(0.5)), F.lit(0)),
            F.lit(INT8_LEVELS),
        )
        return F.when(sc > 0, mn + q * sc).otherwise(mn)

    deq = F.transform(F.col("v"), _deq)
    diff = F.zip_with(deq, F.col("v"), lambda a, b: a - b)
    per = vec.crossJoin(F.broadcast(stats_row)).select(
        (dot_product(diff, diff) / F.size("v")).alias("mse"),
        F.array_max(F.transform(diff, lambda e: F.abs(e))).alias("max_abs_err"),
        (
            dot_product(F.col("v"), deq) / (l2_norm(F.col("v")) * l2_norm(deq))
        ).alias("cos"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.col("mse").cast("decimal(27,14)")).cast("double")
            / F.count(F.lit(1)),
            10,
        ).alias("mean_mse"),
        F.round(F.max("max_abs_err"), 10).alias("worst_abs_err"),
        F.round(
            F.sum(F.col("cos").cast("decimal(27,14)")).cast("double")
            / F.count(F.lit(1)),
            10,
        ).alias("mean_cos"),
        F.round(F.min("cos"), 10).alias("worst_cos"),
    )


HAM_WORDS = 2     # 64 sign bits packed as 2 x 32-bit BIGINT words
HAM_WORD_BITS = 32


def _sql_pack_word(lo: int) -> str:
    return (
        f"CAST(list_sum(list_transform(range(0, {HAM_WORD_BITS}), "
        f"i -> CASE WHEN v[{lo} + i + 1] > 0 "
        f"THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


@query(
    "ann_binary_hamming_recall",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    packed AS (
        SELECT vec_id,
               {_sql_pack_word(0)} AS w1,
               {_sql_pack_word(HAM_WORD_BITS)} AS w2
        FROM vecs
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               bit_count(xor(q.w1, c.w1)) + bit_count(xor(q.w2, c.w2))
                   AS hamming
        FROM packed q JOIN packed c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ham_top AS (
        SELECT query_id, neighbor_id, hamming,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY hamming, neighbor_id) AS BIGINT) AS rank
        FROM scored
    ),
    ix AS (
        SELECT query_id, neighbor_id, 1 AS hit
        FROM ham_top WHERE rank <= {TOP_K}
    ),
    bf AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_SQL_COS} AS cos
        FROM vecs a JOIN vecs b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    bf_top AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS rank
            FROM bf
        ) WHERE rank <= {TOP_K}
    )
    SELECT bf_top.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(COALESCE(ix.hit, 0)) AS BIGINT) AS n_hits,
           ROUND(SUM(COALESCE(ix.hit, 0)) * 1.0 / COUNT(*), 6) AS recall
    FROM bf_top LEFT JOIN ix
      ON bf_top.query_id = ix.query_id
     AND bf_top.neighbor_id = ix.neighbor_id
    GROUP BY bf_top.query_id ORDER BY bf_top.query_id
    """,
)
def ann_binary_hamming_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-BIT binary embeddings: each vector collapses to its 64 sign
    bits (two 32-bit BIGINT words), search is Hamming distance via
    XOR + popcount, and the output is recall@{TOP_K} against the exact
    cosine truth — the last rung of the quantization ladder this repo
    measures (float32 → int8 → PQ → Matryoshka-truncate → 1 bit, a
    32× memory cut whose quality THIS table prices). Sign-bit Hamming
    approximates angular distance (Charikar 2002 — the same hyperplane
    identity the LSH probe uses; here every dimension is a hyperplane).

    Scale shape: packing is one in-row fold per vector — the corpus
    collapses to (vec_id, 2 BIGINTs) BEFORE the query join, so the
    distance pass streams 16-byte rows against a broadcast 10-row
    query set and each pair costs two XOR+popcounts, not a 64-term dot
    fold. Per-query top-k is the standard WindowGroupLimit shape; the
    recall join runs on |queries|·k rows.

    Determinism: sign bits, packed words, XOR, popcount, and ranks are
    all exact integers; ties in Hamming break on neighbor_id (rule 8);
    recall is one division of exact counts."""

    def _word(lo: int):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(HAM_WORD_BITS - 1)),
            F.lit(0).cast("long"),
            # shiftleft()'s bit count must be a Python literal, so the
            # in-lambda power-of-two is pow(2, i) — exact in double for
            # i < 32, cast back to the exact BIGINT
            lambda acc, i: acc
            + F.when(
                F.get(F.col("v"), i + F.lit(lo)) > 0,
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    vec = _vectors(spark, sf_dir).select("vec_id", "v")
    packed = track_persist(
        vec.select(
            "vec_id",
            _word(0).alias("w1"),
            _word(HAM_WORD_BITS).alias("w2"),
        )
    )
    q = packed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w1").alias("qw1"),
        F.col("w2").alias("qw2"),
    )
    scored = packed.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.col("qw1").bitwiseXOR(F.col("w1")))
            + F.bit_count(F.col("qw2").bitwiseXOR(F.col("w2")))
        ).alias("hamming"),
    )
    wh = W.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    ix = (
        scored.withColumn("rank", F.row_number().over(wh))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        bf.join(ix, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            hits.cast("long").alias("n_hits"),
            F.round(hits.cast("double") / F.count(F.lit(1)), 6).alias("recall"),
        )
        .orderBy("query_id")
    )
