"""Text-analysis operators over the ``documents`` table: token
statistics, term frequency, quality scoring, language-ID heuristic,
document fingerprinting.

These are the LLM-training-data-pipeline extensions (BASELINE.json
north star) — absent from the reference (SURVEY.md §2.9), designed
Spark-first: tokenization and hashing with built-in functions (codegen,
no UDFs), aggregation with map-side partial combine. At 100 TB the
explode-based term frequency shuffles (token, count) partials only —
the map-side combine collapses per-partition duplicates before the
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    norm_fingerprint_col,
    tokens_col,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    query,
    sql_davg,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

# Per-language marker tokens for the n-gram/stopword language-ID
# heuristic. Deterministic and tiny → lives in the plan as literals.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht"),
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "y", "que"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "le", "shi", "bu"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
           n_chars AS n_chars_meta,
           CAST(LEN(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LEN(string_split(text, ' ')), 6) AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token accounting per document."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    return (
        doc.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.length("text").cast("long").alias("n_chars_actual"),
            F.col("n_chars").alias("n_chars_meta"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
            F.round(
                F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
                / F.size(toks),
                6,
            ).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_term_frequency",
    oracle="""
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 50
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term + document frequency, top-50. Explode → groupBy gets
    map-side partial aggregation for tf; df (distinct docs per token)
    is a two-phase distinct-aggregate — both shuffle only (token,·)."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(50)
    )


_SQL_STOPSET = "', '".join(STOPWORDS)

@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_tokens,
           stop_ratio,
           uniq_ratio,
           len_score,
           CAST(CAST(0.4 AS DECIMAL(2,1)) * CAST(len_score AS DECIMAL(18,6))
                + CAST(0.3 AS DECIMAL(2,1)) * CAST(stop_ratio AS DECIMAL(18,6))
                + CAST(0.3 AS DECIMAL(2,1)) * CAST(uniq_ratio AS DECIMAL(18,6))
                AS DOUBLE) AS quality
    FROM (
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               ROUND(CAST(LEN(list_filter(toks, t -> t IN ('{_SQL_STOPSET}'))) AS DOUBLE)
                     / LEN(toks), 6) AS stop_ratio,
               ROUND(CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks), 6) AS uniq_ratio,
               ROUND(LEAST(CAST(LEN(toks) AS DOUBLE) / 50.0, 1.0), 6) AS len_score
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (length / stopword ratio / lexical
    diversity) and a combined score — the filter stage every pretraining
    pipeline runs before dedup."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    n = F.size(toks)
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n, 6
    )
    uniq_ratio = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    len_score = F.round(F.least(n.cast("double") / 50.0, F.lit(1.0)), 6)
    out = doc.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        len_score.alias("len_score"),
    )
    # weighted combination in exact decimal: the rounded-double ratios
    # recover their 6-decimal value under cast, decimal ×/+ are exact,
    # so the final double is bit-identical to the oracle's (a plain
    # double combination can land on a .5e-6 boundary where the two
    # engines' round() implementations disagree)
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    w4 = F.lit("0.4").cast("decimal(2,1)")
    w3 = F.lit("0.3").cast("decimal(2,1)")
    return out.withColumn(
        "quality",
        (w4 * dec("len_score") + w3 * dec("stop_ratio") + w3 * dec("uniq_ratio")).cast("double"),
    ).orderBy("doc_id")


def _sql_marker_count(lang: str) -> str:
    markers = "', '".join(LANG_MARKERS[lang])
    return f"LEN(list_filter(string_split(text, ' '), t -> t IN ('{markers}')))"


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang, predicted_lang,
           (lang = predicted_lang) AS hit
    FROM (
        SELECT doc_id, lang,
               CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                    WHEN s_de THEN 'de'
                    WHEN s_en THEN 'en'
                    WHEN s_es THEN 'es'
                    WHEN s_fr THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM (
            SELECT doc_id, lang,
                   {_sql_marker_count('de')} AS s_de,
                   {_sql_marker_count('en')} AS s_en,
                   {_sql_marker_count('es')} AS s_es,
                   {_sql_marker_count('fr')} AS s_fr,
                   {_sql_marker_count('zh')} AS s_zh
            FROM documents
        )
    )
    ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic. Ties break by the fixed
    language order de<en<es<fr<zh (CASE evaluation order) — identical
    on both engines, so the prediction is fully deterministic."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")

    def _marker_count(markers: tuple[str, ...]):
        # factory closure: F.filter lambdas must take exactly one param
        # (a second is misread as the element index)
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: _marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    predicted = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    return (
        doc.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            predicted.alias("predicted_lang"),
        )
        .withColumn("hit", F.col("labeled_lang") == F.col("predicted_lang"))
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS exact_fp,
           md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS shuffle_fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + token-order-insensitive md5 fingerprints (the keys the
    dedup operators join on)."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.select(
            "doc_id",
            F.md5("text").alias("exact_fp"),
            norm_fingerprint_col("text").alias("shuffle_fp"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_stats_by_lang_source",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg('n_chars')} AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def doc_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum(F.col("n_chars").cast("decimal(27,4)")).cast("double") / F.count("n_chars"))
            .cast("double")
            .alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


_SUBWORD_PATTERN = "[bcdfghjklmnpqrstvwxyz]*[aeiou]+[bcdfghjklmnpqrstvwxyz]*"


@query(
    "text_subword_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '{_SUBWORD_PATTERN}')) AS BIGINT) AS n_subwords,
           CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_words,
           ROUND(CAST(LEN(regexp_extract_all(text, '{_SUBWORD_PATTERN}')) AS DOUBLE)
                 / LEN(string_split(text, ' ')), 6) AS subwords_per_word,
           array_to_string(regexp_extract_all(text, '{_SUBWORD_PATTERN}')[1:4], '|') AS first_subwords
    FROM documents
    ORDER BY doc_id
    """,
)
def text_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword tokenization via a vowel-nucleus regex (the
    whitespace tokenizer's companion — a deterministic stand-in for a
    learned BPE vocab, same counting plumbing). Pure regexp built-ins,
    pattern restricted to the Java/RE2-agreeing subset."""
    doc = load_table(spark, sf_dir, "documents")
    subs = F.regexp_extract_all("text", F.lit(_SUBWORD_PATTERN), F.lit(0))
    words = tokens_col("text")
    return (
        doc.select(
            "doc_id",
            F.size(subs).cast("long").alias("n_subwords"),
            F.size(words).cast("long").alias("n_words"),
            F.round(F.size(subs).cast("double") / F.size(words), 6).alias("subwords_per_word"),
            F.array_join(F.slice(subs, 1, 4), "|").alias("first_subwords"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tokens GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df
        FROM tokens GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT doc_id, token, tfidf, rnk
    FROM ranked WHERE rnk <= 3 AND doc_id < 50
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-document top-3 most distinctive terms (first 50 docs
    for a bounded result). Three aggregations sharing the exploded
    token relation — tf shuffles on (doc, token), df on token, both
    with map-side combine; idf is a broadcast scalar.

    Determinism: tf and df are integer counts; idf = ln(n/df) is a
    deterministic double per token; tf*idf per (doc,token) is one IEEE
    multiply — rank ties broken by token."""
    doc = load_table(spark, sf_dir, "documents")
    tokens = doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = doc.count()  # driver-side scalar: one number, not a collect loop
    scored = (
        tf.join(df, "token")
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "token", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window


def _winnow_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, gs, hv) projection + the winnowed ``fps``
    minima — shared by the query and the scale probe
    (plans/scale_probes.py) so the probe measures exactly the relation
    the query builds. The persist boundary is load-bearing: without it
    Catalyst collapses the projections and INLINES the whole
    md5-gram-hash expression into every one of the ~|doc| sliding-
    window slices — measured 56 s instead of 0.6 s at sf0.01. The
    cached relation materializes (gs, hv) once per doc; the window
    minima then read plain columns."""
    doc = load_table(spark, sf_dir, "documents")
    t = tokens_col("text")
    n = F.size(t)
    grams_raw = F.transform(
        F.sequence(F.lit(0), F.greatest(n - WINNOW_K, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", F.get(t, i), F.get(t, i + 1), F.get(t, i + 2)
        ),
    )
    grams = F.when(n >= WINNOW_K, grams_raw).otherwise(
        F.array().cast("array<string>")
    )
    hv = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
    )
    return track_persist(
        doc.select("doc_id", grams.alias("gs"), hv.alias("hv"))
    ).withColumn(
        "fps",
        F.when(
            F.size("hv") >= WINNOW_W,
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size("hv") - WINNOW_W, F.lit(-1))
                    ),
                    lambda j: F.array_min(F.slice(F.col("hv"), j + 1, WINNOW_W)),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {WINNOW_K}
                    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          FOR i IN range(1, GREATEST(len(t) - 1, 1))]
                    ELSE [] END AS gs
        FROM toks
    ),
    hs AS (
        SELECT doc_id, gs,
               list_transform(gs, g -> ('0x' || substr(md5(g), 1, 8))::BIGINT) AS hv
        FROM grams
    ),
    wins AS (
        SELECT doc_id, gs,
               CASE WHEN len(hv) >= {WINNOW_W}
                    THEN list_distinct([list_min(hv[j : j + {WINNOW_W - 1}])
                                        FOR j IN range(1, GREATEST(len(hv) - {WINNOW_W - 2}, 1))])
                    ELSE [] END AS fps
        FROM hs
    ),
    fp AS (SELECT doc_id, unnest(fps) AS f FROM wins),
    cnt AS (SELECT f, COUNT(*) AS nd FROM fp GROUP BY f),
    per AS (
        SELECT fp.doc_id,
               COUNT(*) AS n_fp,
               CAST(SUM(CASE WHEN cnt.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM fp JOIN cnt USING (f) GROUP BY fp.doc_id
    )
    SELECT w.doc_id,
           CAST(len(w.gs) AS BIGINT) AS n_grams,
           COALESCE(per.n_fp, 0) AS n_fp,
           COALESCE(per.n_shared, 0) AS n_shared
    FROM wins w LEFT JOIN per ON w.doc_id = per.doc_id
    ORDER BY w.doc_id
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every token {WINNOW_K}-gram, slide a {WINNOW_W}-hash window
    and keep each window's minimum — the selected minima are the
    document's fingerprint set, with the winnowing guarantee that any
    shared run of {WINNOW_W}+{WINNOW_K}-1 tokens yields at least one
    shared fingerprint. Reports per doc the gram count, the distinct
    fingerprint count (selection density ≈ 2/(w+1)), and how many of
    its fingerprints appear in other documents — the local-similarity
    signal exact/minhash dedup misses.

    Scale shape: gram hashing and window minima are pure in-row HOFs
    (map-side, codegen); the only shuffle keys are constant-width
    32-bit fingerprints (groupBy with partial counts) and doc_id for
    the join back — document text never crosses an exchange. The
    persist boundary lives in _winnow_base (shared with the scale
    probe); tests/test_scale_shapes.py pins that the md5-per-gram
    chain stays behind it."""
    base = _winnow_base(spark, sf_dir)
    fp = base.select("doc_id", F.explode("fps").alias("f"))
    cnt = fp.groupBy("f").agg(F.count(F.lit(1)).alias("nd"))
    per = (
        fp.join(cnt, "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        base.select("doc_id", F.size("gs").cast("long").alias("n_grams"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_fp"), F.lit(0)).alias("n_fp"),
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
        )
        .orderBy("doc_id")
    )
