"""Training-data pipeline operators, part 2: corpus n-gram statistics,
deterministic train/eval splitting, quality-filter funnels, length
histograms, duplication-rate accounting, token percentiles, vocabulary
co-occurrence, character entropy, and daily anomaly scoring.

Like ``pipeline.py`` these extend the reference surface (SURVEY.md
§2.9) with the operations a 100 TB LLM-data pipeline runs daily. All
hot paths are built-in-function only (whole-stage codegen, no Python);
every aggregation gets map-side partial combine; the only joins are
per-doc-bounded (vocabulary co-occurrence caps each doc at ≤12 tokens
before its self-join) or broadcast (12-row vocabulary).

Partitioning note: unlike dedup's signature pipelines these queries
do NOT pre-spread a single-split input — measured at sf0.1, the
per-row work (~tens of µs: zip_with bigrams, char explode) is smaller
than the extra exchange + stage the repartition costs, the same
trade-off that made the round-3 dedup_exact fix a win in reverse. At
real scale the input arrives multi-split and the question vanishes.

Determinism notes (registry.py contract): integer sums cast to BIGINT
in the oracles (CLAUDE.md rule 1a); transcendental terms (log2) are
rounded to 9 dp then DECIMAL-accumulated so partial-agg order cannot
leak into the result; z-scores are computed from exact integer/decimal
window sums with an identical scalar formula on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    md5_hash64,
    sql_md5_hash64,
    tokens_col,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    davg,
    iso_date,
    query,
    sql_davg,
    sql_iso_date,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.operators.text import STOPWORDS
from gresearch_parquet_benchmarking_spark.sources.events import load_events
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@query(
    "text_bigram_counts",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (
        SELECT UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bigram
        FROM (SELECT string_split(text, ' ') AS t FROM documents)
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 40
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-40 bigrams. The bigram list is built map-side with a
    zip_with over two shifted slices (no Python, no join); the groupBy
    shuffles (bigram, partial-count) only — at 100 TB the map-side
    combine collapses per-partition duplicates before the exchange."""
    doc = load_table(spark, sf_dir, "documents")
    t = tokens_col("text")
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        doc.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(40)
    )


_SPLIT_HASH = sql_md5_hash64("CAST(doc_id AS VARCHAR)")


@query(
    "train_test_split_hash",
    oracle=f"""
    SELECT CASE WHEN {_SPLIT_HASH} % 100 < 90 THEN 'train' ELSE 'eval' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg('n_chars')} AS avg_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
)
def train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/eval assignment by content-independent
    doc_id hash — the reproducible-split primitive every training run
    needs. Pure map-side expression; reruns on any cluster layout give
    identical splits (md5, not engine-native hash — CLAUDE.md rule 3)."""
    doc = load_table(spark, sf_dir, "documents")
    split = F.when(
        md5_hash64(F.col("doc_id").cast("string")) % 100 < 90, "train"
    ).otherwise("eval")
    return (
        doc.groupBy(split.alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            davg("n_chars", alias="avg_chars"),
        )
        .orderBy("split", "lang")
    )


_SQL_STOPSET = "', '".join(STOPWORDS)


@query(
    "quality_filter_funnel",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           SUM(CASE WHEN pass_len THEN 1 ELSE 0 END)::BIGINT AS n_pass_len,
           SUM(CASE WHEN pass_len AND pass_uniq THEN 1 ELSE 0 END)::BIGINT AS n_pass_uniq,
           SUM(CASE WHEN pass_len AND pass_uniq AND pass_stop THEN 1 ELSE 0 END)::BIGINT
               AS n_pass_stop,
           ROUND(CAST(SUM(CASE WHEN pass_len AND pass_uniq AND pass_stop THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS retention
    FROM (
        SELECT lang,
               LEN(toks) >= 40 AS pass_len,
               CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks) >= 0.3 AS pass_uniq,
               CAST(LEN(list_filter(toks, t -> t IN ('{_SQL_STOPSET}'))) AS DOUBLE)
                   / LEN(toks) <= 0.3 AS pass_stop
        FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY lang
    ORDER BY lang
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-filter funnel (length → uniqueness → stopword
    ratio): how many docs survive each gate, per language — the
    yield-accounting view a data-curation run reports. One map-side
    pass computes all three predicates from one tokenization; the
    ratio comparisons are exact IEEE divisions (identical on both
    engines), so no rounding is needed before the threshold test."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    pass_len = n >= 40
    pass_uniq = F.size(F.array_distinct(toks)).cast("double") / n >= 0.3
    stop_arr = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    pass_stop = F.size(stop_arr).cast("double") / n <= 0.3
    staged = doc.select(
        "lang",
        pass_len.alias("pass_len"),
        pass_uniq.alias("pass_uniq"),
        pass_stop.alias("pass_stop"),
    )
    survive_all = F.col("pass_len") & F.col("pass_uniq") & F.col("pass_stop")
    return (
        staged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("pass_len"), 1).otherwise(0)).cast("long").alias("n_pass_len"),
            F.sum(F.when(F.col("pass_len") & F.col("pass_uniq"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass_uniq"),
            F.sum(F.when(survive_all, 1).otherwise(0)).cast("long").alias("n_pass_stop"),
            F.round(
                F.sum(F.when(survive_all, 1).otherwise(0)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("retention"),
        )
        .orderBy("lang")
    )


@query(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(LENGTH(bin(n_chars)) AS BIGINT) AS bucket,
           (1::BIGINT << (CAST(LENGTH(bin(n_chars)) AS INT) - 1))::BIGINT AS bucket_lo,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY bucket NULLS FIRST
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram. The bucket is the BIT
    LENGTH of n_chars (length of its binary rendering) — exact integer
    arithmetic on both engines, avoiding cross-engine log2 ulp drift on
    bucket boundaries. Map-side bucket + tiny groupBy."""
    doc = load_table(spark, sf_dir, "documents")
    bucket = F.length(F.bin("n_chars")).cast("long")
    return (
        doc.select(
            bucket.alias("bucket"),
            F.expr(
                "CAST(shiftleft(1L, CAST(length(bin(n_chars)) AS INT) - 1) AS BIGINT)"
            ).alias("bucket_lo"),
            "n_chars",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        # NULLS FIRST pinned on both engines: a NULL n_chars yields a
        # NULL bucket, which Spark (asc default) sorts first but DuckDB
        # sorts last — explicit pin keeps the value-hash row order stable.
        .orderBy(F.asc_nulls_first("bucket"))
    )


@query(
    "dup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           (COUNT(*) - COUNT(DISTINCT md5(text)))::BIGINT AS n_dup,
           ROUND(CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
               AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplication rate per source — the contamination dashboard
    number that decides which crawls to drop. distinct-count runs on
    the constant-width md5 digest, so document text never shuffles
    (same trick as dedup_exact); two-phase distinct aggregate."""
    doc = load_table(spark, sf_dir, "documents")
    uniq = F.countDistinct(F.md5("text"))
    return (
        doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            uniq.alias("n_unique"),
            (F.count(F.lit(1)) - uniq).cast("long").alias("n_dup"),
            F.round((F.count(F.lit(1)) - uniq).cast("double") / F.count(F.lit(1)), 6).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )


@query(
    "token_percentiles_by_lang",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(quantile_cont(n_tokens, 0.25) AS DOUBLE), 6) AS q25,
           ROUND(CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE), 6) AS median,
           ROUND(CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE), 6) AS q90,
           MAX(n_tokens) AS max_tokens
    FROM (
        SELECT lang, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    GROUP BY lang
    ORDER BY lang
    """,
)
def token_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution per language (exact interpolated
    percentiles; Spark `percentile` ≙ DuckDB quantile_cont — precedent
    agg_percentiles). Sequence-length planning input for training:
    context-window fill rates come straight off these quantiles."""
    doc = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col("text")).cast("long")
    return (
        doc.select("lang", n_tokens.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n_tokens", F.lit(0.25)).cast("double"), 6).alias("q25"),
            F.round(F.percentile("n_tokens", F.lit(0.5)).cast("double"), 6).alias("median"),
            F.round(F.percentile("n_tokens", F.lit(0.9)).cast("double"), 6).alias("q90"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


VOCAB_K = 12


@query(
    "vocab_cooccurrence",
    oracle=f"""
    WITH exploded AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS tf FROM exploded
            GROUP BY token ORDER BY tf DESC, token LIMIT {VOCAB_K}
        )
    ),
    d AS (
        SELECT DISTINCT doc_id, token FROM exploded
        WHERE token IN (SELECT token FROM vocab)
    )
    SELECT a.token AS w1, b.token AS w2, COUNT(*) AS n_docs
    FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2
    ORDER BY n_docs DESC, w1, w2
    LIMIT 50
    """,
)
def vocab_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document co-occurrence counts for the top-12 vocabulary (the
    word2vec/PMI precursor). Scale posture: the vocabulary is a 12-row
    broadcast, each doc contributes ≤12 distinct vocab tokens, so the
    doc_id self-join is ≤66 pairs per doc — linear in corpus size, no
    unbounded cross product. The deterministic tf DESC, token tiebreak
    pins the vocabulary on both engines."""
    doc = load_table(spark, sf_dir, "documents")
    exploded = doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    vocab = (
        exploded.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(VOCAB_K)
        .select("token")
    )
    # Persist the filtered (doc_id, vocab-token) pairs: they feed BOTH
    # sides of the self-join — without persist Spark re-executes the
    # explode + vocab aggregate per alias branch (same pattern as the
    # LSH signature persist, dedup.py). At 100 TB this materializes as
    # an intermediate table; persist is the local analog. Tracked so
    # sweeps can release the cache between queries (registry.py).
    d = track_persist(
        doc.select("doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("token"))
        .join(F.broadcast(vocab), "token")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(F.col("a.token").alias("w1"), F.col("b.token").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("w1"), F.asc("w2"))
        .limit(50)
    )


@query(
    "text_char_entropy",
    oracle="""
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_chars_total,
           n_distinct_chars,
           ROUND(log2(CAST(total AS DOUBLE)) - CAST(s AS DOUBLE) / total, 6) AS entropy_bits
    FROM (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS total,
               COUNT(*) AS n_distinct_chars,
               SUM(CAST(ROUND(cnt * log2(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(27,9))) AS s
        FROM (
            SELECT doc_id, ch, COUNT(*) AS cnt
            FROM (
                SELECT doc_id, UNNEST(regexp_extract_all(text, '.')) AS ch
                FROM documents
            )
            GROUP BY doc_id, ch
        )
        GROUP BY doc_id
    )
    ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (bits) — a classic junk /
    boilerplate detector. Identity H = log2(N) - Σ c·log2(c) / N keeps
    the per-term log2 over small INTEGER counts; each term is rounded
    to 9 dp and DECIMAL-accumulated so IEEE summation order (Spark
    partials vs DuckDB) cannot change the result. Shuffles only
    (doc_id, ch, partial-count) pairs."""
    doc = load_table(spark, sf_dir, "documents")
    chars = doc.select(
        "doc_id", F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch")
    )
    per = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    term = F.round(F.col("cnt") * F.log2(F.col("cnt").cast("double")), 9).cast(
        "decimal(27,9)"
    )
    stats = per.groupBy("doc_id").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(term).alias("s"),
    )
    return (
        stats.select(
            "doc_id",
            F.col("total").cast("long").alias("n_chars_total"),
            "n_distinct_chars",
            F.round(
                F.log2(F.col("total").cast("double"))
                - F.col("s").cast("double") / F.col("total"),
                6,
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


@query(
    "events_daily_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, {sql_iso_date("date_trunc('day', ts)")} AS day,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day, n,
               COUNT(*) OVER (PARTITION BY event_type) AS k,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS s,
               CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                    OVER (PARTITION BY event_type) AS DOUBLE) AS ss
        FROM daily
    )
    SELECT event_type, day, n,
           CASE WHEN k > 1 AND ss - s * s / k > 0
                THEN ROUND((n - s / k) / sqrt((ss - s * s / k) / (k - 1)), 6)
                ELSE NULL END AS zscore
    FROM scored
    ORDER BY event_type, day
    """,
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume z-scores per type — the monitoring query that
    flags ingest anomalies. Mean/std are derived from EXACT integer
    window sums (Σn, Σn²) with one identical scalar formula on both
    engines — no float accumulation order anywhere; sqrt and division
    are IEEE-deterministic. Two shuffles total (daily rollup, per-type
    window), both on low-cardinality keys. The squares accumulate as
    DECIMAL(38,0) (exact, order-independent), so Σn² has no BIGINT
    ceiling — daily counts up to ~1e19 per type stay exact."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", iso_date(F.date_trunc("day", "ts_ts"), alias="day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("n").over(w).cast("double").alias("s"),
        F.sum(F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)"))
        .over(w)
        .cast("double")
        .alias("ss"),
    )
    var_num = F.col("ss") - F.col("s") * F.col("s") / F.col("k")
    z = (F.col("n") - F.col("s") / F.col("k")) / F.sqrt(var_num / (F.col("k") - 1))
    return (
        scored.select(
            "event_type",
            "day",
            "n",
            F.when((F.col("k") > 1) & (var_num > 0), F.round(z, 6))
            .otherwise(F.lit(None).cast("double"))
            .alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "unigram_logprob_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(CAST(ROUND(log2(CAST(c AS DOUBLE)), 9) AS DECIMAL(27,9)))
                      AS DOUBLE) / COUNT(*)
                 - log2(CAST((SELECT t FROM total) AS DOUBLE)), 6) AS avg_logprob
    FROM toks JOIN vocab USING (token)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity proxy: per-document average unigram log2-probability
    under the corpus's own unigram model — the classic cheap
    fluency/junk score (low = rare-token soup). avg_logprob =
    Σ log2(c_tok)/n_tokens − log2(T); per-token log2 terms are over
    small integers, rounded to 9 dp and DECIMAL-accumulated (same
    determinism treatment as text_char_entropy). Scale posture: the
    token join shuffles (token, count) pairs — broadcast at small
    vocab, SMJ at web-scale vocab, AQE decides; the corpus total is a
    1-row broadcast, never a collect. The token join key is
    Zipf-skewed ('the' lands in one partition) — the engine session
    runs AQE skew-join, which splits hot partitions; the vocab side is
    one row per token, so no row explosion."""
    doc = load_table(spark, sf_dir, "documents")
    toks = track_persist(
        doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("long").alias("t"))
    term = F.round(F.log2(F.col("c").cast("double")), 9).cast("decimal(27,9)")
    return (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(term).alias("s"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("s").cast("double") / F.col("n_tokens")
                - F.log2(F.col("t").cast("double")),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def _survivorship_oracle() -> str:
    from gresearch_parquet_benchmarking_spark.operators.graph import comp_ctes_sql

    # `corpus` (the neardup variant) is already defined inside the CTE
    # chain — the survivorship accounting reuses it directly.
    return f"""
    WITH RECURSIVE {comp_ctes_sql()}
    SELECT c.source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN k.node IS NULL OR k.component = c.doc_id
               THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           SUM(CASE WHEN k.node IS NOT NULL AND k.component <> c.doc_id
               THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
           ROUND(CAST(SUM(CASE WHEN k.node IS NULL OR k.component = c.doc_id
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS kept_rate
    FROM corpus c
    LEFT JOIN comp k ON c.doc_id = k.node
    GROUP BY c.source
    ORDER BY c.source
    """


@query("dedup_survivorship_by_source", oracle=_survivorship_oracle)
def dedup_survivorship_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup survivorship: near-dup pairs → connected
    components → keep the cluster representative (min doc_id), keep
    every unclustered doc — then account kept/dropped per source. This
    is the number a curation run actually reports ("source X lost 4%
    to near-dups"). One left join of the corpus against the (tiny)
    clustered-node set; the iterative CC cost is shared machinery
    (operators/graph.py)."""
    from gresearch_parquet_benchmarking_spark.operators.dedup import _corpus
    from gresearch_parquet_benchmarking_spark.operators.graph import (
        dedup_connected_components,
    )

    corpus = _corpus(spark, sf_dir, "neardup", spread=False)
    comp = dedup_connected_components(spark, sf_dir).select(
        F.col("doc_id").alias("c_doc"), "cluster_rep"
    )
    joined = corpus.join(comp, corpus.doc_id == F.col("c_doc"), "left")
    kept = F.when(
        F.col("c_doc").isNull() | (F.col("doc_id") == F.col("cluster_rep")), 1
    ).otherwise(0)
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(1 - kept).cast("long").alias("n_dropped"),
            F.round(F.sum(kept).cast("double") / F.count(F.lit(1)), 6).alias("kept_rate"),
        )
        .orderBy("source")
    )


MAD_CONSISTENCY = 0.6745   # Φ⁻¹(0.75): MAD→σ consistency constant
MAD_OUTLIER_Z = 3.5        # Iglewicz & Hoaglin's modified-z cutoff


@query(
    "events_daily_anomaly_mad",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, {sql_iso_date("date_trunc('day', ts)")} AS day,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type,
               CAST(quantile_cont(n, 0.5) AS DOUBLE) AS med
        FROM daily GROUP BY event_type
    ),
    mad AS (
        SELECT d.event_type,
               CAST(quantile_cont(ABS(d.n - m.med), 0.5) AS DOUBLE) AS mad
        FROM daily d JOIN med m USING (event_type)
        GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, d.n,
           ROUND({MAD_CONSISTENCY} * (d.n - m.med) / NULLIF(a.mad, 0.0), 6)
               AS robust_z,
           COALESCE(ABS({MAD_CONSISTENCY} * (d.n - m.med) / NULLIF(a.mad, 0.0))
                    > {MAD_OUTLIER_Z}, FALSE) AS is_outlier
    FROM daily d JOIN med m USING (event_type) JOIN mad a USING (event_type)
    ORDER BY d.event_type, d.day
    """,
)
def events_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly scores: modified z = 0.6745·(n −
    median)/MAD per event type, flagged at |z| > 3.5 (Iglewicz &
    Hoaglin 1993, "How to Detect and Handle Outliers") — the variant a
    production monitor actually runs, because events_daily_anomaly's
    mean/σ z-score lets one giant spike inflate σ enough to mask
    itself, while median/MAD have a 50% breakdown point.

    Scale shape: the same daily rollup as the mean/σ twin, then two
    |types|-key percentile aggregations over the |types|·|days| table
    (metadata-sized at any event volume) joined back broadcast-small.
    Determinism: medians are quantile_cont ≙ F.percentile on exact
    integers; the score is one IEEE tree; MAD=0 (constant series)
    yields NULL score and FALSE flag via the same NULLIF/COALESCE on
    both engines."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", iso_date(F.date_trunc("day", "ts_ts"), alias="day")
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = track_persist(daily)
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).cast("double").alias("med")
    )
    with_med = daily.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5))
        .cast("double")
        .alias("mad")
    )
    z = F.lit(MAD_CONSISTENCY) * (F.col("n") - F.col("med")) / F.nullif(
        F.col("mad"), F.lit(0.0)
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            F.round(z, 6).alias("robust_z"),
            F.coalesce(
                F.abs(z) > MAD_OUTLIER_Z, F.lit(False)
            ).alias("is_outlier"),
        )
        .orderBy("event_type", "day")
    )
