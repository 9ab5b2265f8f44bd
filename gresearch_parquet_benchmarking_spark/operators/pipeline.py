"""Training-data-pipeline operators beyond dedup/similarity/text:
benchmark-contamination detection, blocklist redaction, repetition
scoring, stratified sampling, token chunking, a k-means reassignment
step, and a pairwise-similarity histogram.

These extend the LLM-pipeline surface (SURVEY.md §2.9, north-star
extensions) — absent from the reference. All are Spark-first:

* Text ops run on built-in functions only (split / higher-order
  transform / md5) — whole-stage codegen, no Python in the plan.
* Contamination is a shingle-hash equi-join (constant-width BIGINT
  shuffle keys), never a doc×doc pairwise comparison: at 100 TB the
  benchmark side is tiny and broadcastable, and the corpus side
  shuffles (hash, doc_id) pairs only — raw text never crosses the
  wire.
* The k-means step reuses the IVF machinery: exact-decimal centroid
  means (order-independent, so bit-identical to the DuckDB twin) and
  a broadcast cross join for assignment — one corpus scan, no
  all-pairs.
* Chunking explodes per-document token windows map-side; the output
  is (doc_id, chunk) rows, the shape a tokenizer/packing stage
  consumes downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    md5_hash64,
    sql_md5_hash64,
    tokens_col,
)
from gresearch_parquet_benchmarking_spark.functions.vector import (
    cosine_similarity,
    l2_norm,
)
from gresearch_parquet_benchmarking_spark.operators.dedup import _shingles, _SQL_SHINGLES
from gresearch_parquet_benchmarking_spark.operators.registry import query, sql_davg
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

# Every doc_id ≡ 0 (mod 11) plays the "held-out benchmark" role for
# the contamination check; the rest are the training corpus.
EVAL_MOD = 11
# Tokens a filtering pass would scrub (stand-ins for PII/boilerplate
# terms — the synthetic corpus has no digits/emails, so the blocklist
# uses words that actually occur).
BLOCKLIST = ("customer", "value", "key")
REDACTED = "[REDACTED]"
CHUNK_TOKENS = 40
SAMPLE_PER_LANG = 20


@query(
    "text_contamination_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    eval_sh AS (
        SELECT doc_id, {sql_md5_hash64('s')} AS h
        FROM (SELECT doc_id, UNNEST(shingles) AS s FROM sh
              WHERE doc_id % {EVAL_MOD} = 0)
    ),
    train_sh AS (
        SELECT DISTINCT {sql_md5_hash64('s')} AS h
        FROM (SELECT UNNEST(shingles) AS s FROM sh
              WHERE doc_id % {EVAL_MOD} <> 0)
    ),
    hits AS (
        SELECT e.doc_id, COUNT(*) AS n_contaminated
        FROM eval_sh e JOIN train_sh t ON e.h = t.h
        GROUP BY e.doc_id
    ),
    base AS (
        SELECT doc_id, CAST(LEN(shingles) AS BIGINT) AS n_shingles
        FROM sh WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT b.doc_id, b.n_shingles,
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           ROUND(CASE WHEN b.n_shingles = 0 THEN 0.0
                      ELSE CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
                           / b.n_shingles END, 6) AS contamination_rate
    FROM base b LEFT JOIN hits h USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each held-out doc's
    distinct token 3-grams that also occur anywhere in the training
    corpus. Shingle-hash semi-join — no pairwise doc comparison; at
    100 TB the eval side is small and broadcastable."""
    doc = load_table(spark, sf_dir, "documents")
    sh = doc.select(
        "doc_id", _shingles(tokens_col("text")).alias("shingles")
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = (
        sh.filter(is_eval)
        .select("doc_id", F.explode("shingles").alias("s"))
        .select("doc_id", md5_hash64(F.col("s")).alias("h"))
    )
    train_sh = (
        sh.filter(~is_eval)
        .select(F.explode("shingles").alias("s"))
        .select(md5_hash64(F.col("s")).alias("h"))
        .distinct()
    )
    hits = (
        eval_sh.join(train_sh, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    base = sh.filter(is_eval).select(
        "doc_id", F.size("shingles").cast("long").alias("n_shingles")
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
                    F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
                    / F.col("n_shingles")
                ),
                6,
            ).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


_SQL_BLOCK = ", ".join(f"'{t}'" for t in BLOCKLIST)


@query(
    "text_redact_blocklist",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(LEN(list_filter(toks, t -> t IN ({_SQL_BLOCK}))) AS BIGINT) AS n_redacted,
           md5(array_to_string(
               list_transform(toks, t -> CASE WHEN t IN ({_SQL_BLOCK})
                                              THEN '{REDACTED}' ELSE t END),
               ' ')) AS redacted_md5
    FROM toks
    ORDER BY doc_id
    """,
)
def text_redact_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level blocklist redaction (the PII/boilerplate-scrub
    shape): per-doc replacement count + digest of the redacted text.
    Pure map-side higher-order functions; the redacted text itself
    never shuffles — only its md5 does."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    hit = lambda t: t.isin(*BLOCKLIST)  # noqa: E731
    red = F.transform(toks, lambda t: F.when(hit(t), F.lit(REDACTED)).otherwise(t))
    return (
        doc.select(
            "doc_id",
            F.size(F.filter(toks, hit)).cast("long").alias("n_redacted"),
            F.md5(F.concat_ws(" ", red)).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, toks,
               CASE WHEN LEN(toks) >= 3 THEN LEN(toks) - 2 ELSE 0 END AS n_total,
               LEN({_SQL_SHINGLES}) AS n_distinct
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    SELECT doc_id,
           CAST(n_total AS BIGINT) AS n_trigrams,
           CAST(n_distinct AS BIGINT) AS n_distinct_trigrams,
           ROUND(CASE WHEN n_total = 0 THEN 0.0
                      ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_total END,
                 6) AS repetition_ratio
    FROM t
    ORDER BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signal: share of repeated token 3-grams per document
    (1 − distinct/total). Boilerplate- and spam-heavy docs score
    high. Map-side only."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    total = F.when(n >= 3, n - 2).otherwise(F.lit(0))
    ndist = F.size(_shingles(toks))
    return (
        doc.select(
            "doc_id",
            total.cast("long").alias("n_trigrams"),
            ndist.cast("long").alias("n_distinct_trigrams"),
            F.round(
                F.when(total == 0, F.lit(0.0)).otherwise(
                    F.lit(1.0) - ndist.cast("double") / total
                ),
                6,
            ).alias("repetition_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rk
        FROM documents
    )
    WHERE rk <= {SAMPLE_PER_LANG}
    ORDER BY lang, rk
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced deterministic sampling: top-N per language
    ordered by md5(text) — a seedable, engine-independent shuffle.
    At 100 TB this is one window per lang partition; skewed languages
    stay bounded because only N rows survive per partition (rank
    filter is pushed into the window via WindowGroupLimit)."""
    doc = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        doc.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= SAMPLE_PER_LANG)
        .orderBy("lang", "rk")
    )


@query(
    "text_chunk_tokens",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, toks,
               CAST(CEIL(LEN(toks) / {CHUNK_TOKENS}.0) AS INT) AS n_chunks
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    chunks AS (
        SELECT doc_id, UNNEST(range(0, n_chunks)) AS chunk_id, toks
        FROM t
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(LEN(toks[chunk_id * {CHUNK_TOKENS} + 1 :
                     LEAST((chunk_id + 1) * {CHUNK_TOKENS}, LEN(toks))]) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(
               toks[chunk_id * {CHUNK_TOKENS} + 1 :
                    LEAST((chunk_id + 1) * {CHUNK_TOKENS}, LEN(toks))],
               ' ')) AS chunk_md5
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (the packing stage before
    tokenization): each doc becomes ⌈n/40⌉ windows of ≤40 tokens,
    emitted as (doc_id, chunk_id, len, digest) rows. Map-side
    explode — output rows are narrow; chunk text is digested, not
    carried. DuckDB's list slice is end-INCLUSIVE (`[a:b]` keeps b),
    so the twin uses `i*C+1 : LEAST((i+1)*C, n)` to match Spark's
    F.slice(toks, i*C+1, C)."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunk = lambda i: F.slice(F.col("toks"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS)  # noqa: E731
    rows = doc.select(
        "doc_id",
        F.explode(
            F.when(
                n > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_id"),
        toks.alias("toks"),
    )
    c = chunk(F.col("chunk_id"))
    return (
        rows.select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(c).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", c)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# Embedding-side pipeline ops
# ---------------------------------------------------------------------------

_SQL_VECS = (
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    " FROM embeddings"
)
# Exact-decimal per-dimension mean → order-independent, bit-identical
# to the Spark side (same contract as ann_ivf_topk's centroids).
_SQL_CENTROIDS = """
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
    )
"""
_SQL_CCOS = (
    "list_dot_product(v, cv) / "
    "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def _label_centroids(vec: DataFrame) -> DataFrame:
    """Per-label centroid via posexplode + exact decimal mean
    (ann_ivf_topk's M-step, factored for reuse)."""
    flat = vec.select("label", F.posexplode("v").alias("i", "x"))
    centroid_dims = flat.groupBy("label", "i").agg(
        (F.sum(F.col("x").cast("decimal(27,12)")).cast("double") / F.count(F.lit(1))).alias("cx")
    )
    return (
        centroid_dims.groupBy(F.col("label").alias("c_label"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("c_label", F.transform("pairs", lambda p: p["cx"]).alias("cv"))
    )


@query(
    "kmeans_reassign_matrix",
    oracle=f"""
    WITH vecs AS ({_SQL_VECS}),
    {_SQL_CENTROIDS},
    assigned AS (
        SELECT vec_id, label, c_label,
               {_SQL_CCOS} AS ccos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY {_SQL_CCOS} DESC, c_label) AS crank
        FROM vecs CROSS JOIN centroids
    )
    SELECT CAST(label AS INT) AS label,
           CAST(c_label AS INT) AS assigned,
           COUNT(*) AS n,
           {sql_davg('ROUND(ccos, 6)', 6)} AS avg_cos
    FROM assigned WHERE crank = 1
    GROUP BY label, c_label
    ORDER BY label, assigned
    """,
)
def kmeans_reassign_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means E-step over the label clustering: recompute label
    centroids (exact decimal means), reassign every vector to its
    nearest centroid by cosine, and emit the (old label → assigned
    cluster) migration matrix — the cluster-stability diagnostic a
    curation pipeline tracks between iterations. Centroids broadcast;
    one corpus scan; shuffle is the k×k matrix aggregation only."""
    from gresearch_parquet_benchmarking_spark.operators.similarity import (
        _centroid_array,
        _nearest_centroids,
    )

    vec = _vectors(spark, sf_dir)
    # map-side assignment against the broadcast single-row centroid
    # array (similarity._centroid_array rationale: never shuffle the
    # corpus to rank K broadcast rows); dot/(nv*cnorm) is bit-identical
    # to the inline cosine
    with_c = vec.crossJoin(
        F.broadcast(_centroid_array(_label_centroids(vec)))
    ).withColumn("nv", l2_norm(F.col("v")))
    best = F.get(_nearest_centroids(1), 0)
    assigned = with_c.select(
        "vec_id",
        "label",
        best["c_label"].alias("c_label"),
        best["ccos"].alias("ccos"),
    )
    return (
        assigned.groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("c_label").cast("int").alias("assigned"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round("ccos", 6).cast("decimal(27,6)")).cast("double")
                / F.count("ccos")
            ).cast("double").alias("avg_cos"),
        )
        .orderBy("label", "assigned")
    )


@query(
    "embedding_sim_histogram",
    oracle=f"""
    WITH vecs AS ({_SQL_VECS}),
    pairs AS (
        SELECT a.vec_id,
               list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                 AS cos
        FROM vecs a JOIN vecs b ON b.vec_id = a.vec_id + 1
    )
    SELECT CAST(LEAST(GREATEST(FLOOR((cos + 1.0) * 10), 0), 19) AS INT) AS bucket,
           COUNT(*) AS n_pairs,
           {sql_davg('ROUND(cos, 6)', 6)} AS avg_cos
    FROM pairs
    GROUP BY 1
    ORDER BY bucket
    """,
)
def embedding_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution sanity-check for an embedding space: cosine of
    consecutive (vec_id, vec_id+1) pairs bucketed into 20 bins over
    [−1, 1]. The pairing is an equi-join on vec_id+1 (narrow shuffle,
    no pairwise blowup); per-bin counts aggregate map-side."""
    vec = _vectors(spark, sf_dir)
    a = vec.select(F.col("vec_id"), F.col("v").alias("va"))
    b = vec.select((F.col("vec_id") - 1).alias("vec_id"), F.col("v").alias("vb"))
    pairs = a.join(b, "vec_id").select(
        cosine_similarity(F.col("va"), F.col("vb")).alias("cos")
    )
    bucket = (
        F.least(
            F.greatest(F.floor((F.col("cos") + 1.0) * 10), F.lit(0)), F.lit(19)
        )
        .cast("int")
        .alias("bucket")
    )
    return (
        pairs.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.round("cos", 6).cast("decimal(27,6)")).cast("double")
                / F.count("cos")
            ).cast("double").alias("avg_cos"),
        )
        .orderBy("bucket")
    )


@query(
    "dedup_chunk_boilerplate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    c AS (
        SELECT doc_id,
               UNNEST(range(0, CAST(CEIL(LEN(toks) / {CHUNK_TOKENS}.0) AS INT))) AS i,
               toks
        FROM t
    ),
    h AS (
        SELECT doc_id,
               md5(array_to_string(
                   toks[i * {CHUNK_TOKENS} + 1 :
                        LEAST((i + 1) * {CHUNK_TOKENS}, LEN(toks))], ' ')) AS chunk_md5,
               CAST(LEN(toks[i * {CHUNK_TOKENS} + 1 :
                             LEAST((i + 1) * {CHUNK_TOKENS}, LEN(toks))]) AS BIGINT)
                   AS n_chunk_tokens
        FROM c
    )
    SELECT chunk_md5,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_occurrences,
           MAX(n_chunk_tokens) AS n_chunk_tokens
    FROM h
    GROUP BY chunk_md5
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_md5
    """,
)
def dedup_chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level (chunk) dedup — the boilerplate detector every
    web-scale curation pipeline runs (headers, license blocks, nav
    text repeat across documents even when whole-document dedup finds
    nothing). Reuses text_chunk_tokens' fixed-{CHUNK_TOKENS}-token
    chunking; a chunk digest appearing in ≥2 distinct documents is
    boilerplate, reported with its document reach and occurrence
    count. Chunk text never crosses the wire — the shuffle key is the
    constant-width md5, the same 100 TB contract as dedup_exact."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(CHUNK_TOKENS))).cast("int")
    rows = doc.select(
        "doc_id",
        F.explode(
            F.when(
                n > 0, F.sequence(F.lit(0), n_chunks - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        toks.alias("toks"),
    )
    c = F.slice(F.col("toks"), F.col("i") * CHUNK_TOKENS + 1, CHUNK_TOKENS)
    hashed = rows.select(
        "doc_id",
        F.md5(F.concat_ws(" ", c)).alias("chunk_md5"),
        F.size(c).cast("long").alias("n_chunk_tokens"),
    )
    return (
        hashed.groupBy("chunk_md5")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("n_chunk_tokens").alias("n_chunk_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "chunk_md5")
    )
