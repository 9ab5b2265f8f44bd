"""Search & record-linkage operators: BM25 ranked retrieval and a
blocked fuzzy (edit-distance) self-join.

Two workloads every large corpus eventually runs (SURVEY.md §2.9
extension surface — the reference has no text model at all):

* **BM25** — the lexical-retrieval baseline every RAG / dataset-search
  stack keeps next to its vector index (Robertson & Zaragoza 2009,
  "The Probabilistic Relevance Framework: BM25 and Beyond"). The whole
  computation is three aggregations over one exploded token relation —
  tf on (doc, term), df on term, avgdl globally — then a per-row score
  and a per-term top-k window. Nothing is quadratic; the only shuffles
  are constant-width-keyed.
* **Fuzzy join** — entity resolution by Levenshtein distance. The
  naive form is an all-pairs O(n²) cartesian; the scalable form blocks
  candidates on cheap equality keys first (Christen 2012, "Data
  Matching": blocking is THE standard technique), so the expensive
  distance function runs only inside small blocks. Here: part names
  compared within (noun, p_size) blocks — at 100 TB the block key
  bounds every task's pair count, and a skewed block is visible in the
  output (n_pairs per block) rather than hidden in a straggler.

Determinism: tf/df/dl/block counts are integers; avgdl is a
decimal-accumulated mean; BM25 per-row arithmetic is one IEEE tree on
both engines; scores are ROUNDED to 6 BEFORE ranking with an id
tiebreaker (the text_tfidf_top_terms pattern). Levenshtein is the
classic unit-cost edit distance in both Spark (F.levenshtein) and
DuckDB (levenshtein) — integer, no float at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import tokens_col
from gresearch_parquet_benchmarking_spark.operators.registry import (
    query,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

BM25_K1 = 1.2    # exact binary? no — 1.2 parses to the same double in
BM25_B = 0.75    # both engines (decimal literal → nearest double), and
                 # 0.75 is exact binary; both appear only in per-row math
BM25_TERMS = ("spark", "merge", "vector")  # fixed lexical queries
BM25_TOP = 5


def _bm25_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    n AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CAST(dl AS DECIMAL(27,0))) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    q(term) AS (VALUES {terms}),
    tf AS (
        SELECT t.doc_id, q.term, COUNT(*) AS tf
        FROM toks t JOIN q ON t.token = q.term
        GROUP BY t.doc_id, q.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
               ROUND(
                   LN(1.0 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avgdl)),
                   6) AS score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN n
    ),
    ranked AS (
        SELECT term, doc_id, tf, dl, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY term
                                       ORDER BY score DESC, doc_id) AS BIGINT)
                   AS rnk
        FROM scored
    )
    SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
           score, rnk
    FROM ranked WHERE rnk <= {BM25_TOP}
    ORDER BY term, rnk
    """


def _postings(spark: SparkSession, sf_dir: str):
    """(toks, tf): the exploded token stream and the (doc_id, term, tf)
    postings relation for the fixed BM25 query terms — the term filter
    (a broadcast of |BM25_TERMS| literals) prunes the explode output
    BEFORE the shuffle. Shared by text_bm25_search and the scale-shape
    probe (plans/scale_probes.py), which counts candidate postings from
    exactly this relation."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    qterms = spark.createDataFrame([(t,) for t in BM25_TERMS], ["term"])
    tf = (
        toks.join(F.broadcast(qterms), toks.token == qterms.term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return toks, tf


@query("text_bm25_search", oracle=_bm25_sql)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{BM25_TOP} documents for each fixed query term
    (Robertson/Sparck-Jones idf with the +1 floor — Lucene's variant,
    never negative): score = ln(1+(N−df+0.5)/(df+0.5)) ·
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Scale shape: one token explode feeding a (doc,term) tf aggregate
    (the term filter — a broadcast of |BM25_TERMS| literals — prunes
    the explode output BEFORE the shuffle, so only matching postings
    move); df is |terms| rows derived from tf; dl is a doc-keyed count
    reused for avgdl; the final ranking window partitions by term over
    at most |docs with term| rows. An inverted index materializes
    nothing more than this tf relation — BM25 over a 100 TB corpus is
    exactly these three shuffles.

    Determinism: integer tf/df/dl, decimal-mean avgdl, one IEEE score
    tree, rounded-then-ranked with doc_id tiebreaker."""
    toks, tf = _postings(spark, sf_dir)
    dl = track_persist(
        toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    )
    n_row = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(27,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = track_persist(tf)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    score = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (
            F.col("tf")
            + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_row))
        .select("term", "doc_id", "tf", "dl", score.alias("score"))
    )
    w = W.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= BM25_TOP)
        .select("term", "doc_id", "tf", "dl", "score", "rnk")
        .orderBy("term", "rnk")
    )


FUZZY_MAX_DIST = 3  # edit-distance match threshold within a block


def _blocked_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts with their (noun, p_size) blocking key. Shared by
    fuzzy_join_part_names and the scale-shape probe
    (plans/scale_probes.py), which counts per-block candidate pairs
    from exactly this relation."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.element_at(tokens_col("p_name"), -1).alias("noun"),
    )


@query(
    "fuzzy_join_part_names",
    oracle=f"""
    WITH parts AS (
        SELECT p_partkey, p_name, p_size,
               string_split(p_name, ' ')[-1] AS noun
        FROM part
    ),
    cand AS (
        SELECT a.noun, a.p_size,
               a.p_partkey AS key_a, b.p_partkey AS key_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM parts a JOIN parts b
          ON a.noun = b.noun AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    )
    SELECT noun,
           COUNT(DISTINCT p_size) AS n_blocks,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN dist <= {FUZZY_MAX_DIST} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matches,
           CAST(MIN(dist) AS BIGINT) AS min_dist,
           CAST(MAX(dist) AS BIGINT) AS max_dist
    FROM cand
    GROUP BY noun
    ORDER BY noun
    """,
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: candidate part pairs share a blocking
    key (last name token = the noun, plus p_size), and only those
    pairs pay the Levenshtein evaluation; matches are pairs within
    edit distance {FUZZY_MAX_DIST}. Output: per-noun linkage summary
    (blocks, candidate pairs, matches, distance extremes).

    This is the standard record-linkage decomposition (Christen 2012):
    the all-pairs join is O(n²); equality blocking turns it into
    Σ_blocks O(|block|²) with the block key chosen so blocks stay
    small and bounded. At 100 TB the blocked join is a plain shuffle
    hash join on the compound key — every executor sees complete
    blocks, the per-task pair fanout is |block|², and the per-noun
    n_pairs column IS the skew audit for the chosen key.

    Determinism: everything is an integer (Levenshtein unit costs,
    counts, extremes); pair dedup by p_partkey < p_partkey."""
    parts = _blocked_parts(spark, sf_dir)
    a = parts.select(
        F.col("noun"),
        F.col("p_size"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = parts.select(
        F.col("noun").alias("noun_b"),
        F.col("p_size").alias("size_b"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    cand = a.join(
        b,
        (F.col("noun") == F.col("noun_b"))
        & (F.col("p_size") == F.col("size_b"))
        & (F.col("key_a") < F.col("key_b")),
    ).select(
        "noun",
        "p_size",
        F.levenshtein(F.col("name_a"), F.col("name_b")).alias("dist"),
    )
    return (
        cand.groupBy("noun")
        .agg(
            F.countDistinct("p_size").alias("n_blocks"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("dist") <= FUZZY_MAX_DIST, 1).otherwise(0))
            .cast("long")
            .alias("n_matches"),
            F.min("dist").cast("long").alias("min_dist"),
            F.max("dist").cast("long").alias("max_dist"),
        )
        .orderBy("noun")
    )


NDCG_K = 5  # eval depth — matches the BM25 serving cut


def _ndcg_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    n AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CAST(dl AS DECIMAL(27,0))) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    q(term) AS (VALUES {terms}),
    tf AS (
        SELECT t.doc_id, q.term, COUNT(*) AS tf
        FROM toks t JOIN q ON t.token = q.term
        GROUP BY t.doc_id, q.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.term, tf.doc_id, tf.tf,
               ROUND(
                   LN(1.0 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avgdl)),
                   6) AS score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN n
    ),
    ranked AS (
        SELECT term, doc_id, tf,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY score DESC, doc_id) AS rnk,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id) AS ideal_pos
        FROM scored
    ),
    dcg AS (
        SELECT term,
               CAST(SUM(CAST(CASE WHEN rnk <= {NDCG_K}
                    THEN tf / log2(rnk + 1.0) ELSE 0.0 END
                    AS DECIMAL(27,12))) AS DOUBLE) AS dcg,
               CAST(SUM(CAST(CASE WHEN ideal_pos <= {NDCG_K}
                    THEN tf / log2(ideal_pos + 1.0) ELSE 0.0 END
                    AS DECIMAL(27,12))) AS DOUBLE) AS idcg,
               CAST(SUM(CASE WHEN rnk <= {NDCG_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ranked
        FROM ranked GROUP BY term
    )
    SELECT term, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
           ROUND(dcg / idcg, 6) AS ndcg, n_ranked
    FROM dcg ORDER BY term
    """


@query("retrieval_ndcg_bm25", oracle=_ndcg_sql)
def retrieval_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{NDCG_K} of the BM25 ranking per query term, with graded
    relevance = raw term frequency (the label-free proxy eval: BM25's
    length/saturation normalization is being judged against pure
    occurrence counts — Järvelin & Kekäläinen 2002 nDCG). An nDCG
    well below 1 on a term flags where BM25's dl-normalization
    reorders heavily relative to raw tf — the per-query ranking
    diagnostic every retrieval stack tracks alongside recall.

    Scale shape: identical postings pipeline to text_bm25_search (the
    term-filtered tf relation IS the inverted index slice); both the
    system and ideal rankings are windows over the same term-keyed
    postings partition — one exchange serves both — and the DCG
    rollup is a |terms|-row aggregation.

    Determinism: both DCG sums decimal-accumulate their ≤{NDCG_K}
    irrational gain terms (rule 1); ranks tie-break on doc_id; the
    final division is one IEEE op over identical doubles."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    dl = track_persist(
        toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    )
    n_row = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(27,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    qterms = spark.createDataFrame([(t,) for t in BM25_TERMS], ["term"])
    tf = track_persist(
        toks.join(F.broadcast(qterms), toks.token == qterms.term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    score = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (
            F.col("tf")
            + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_row))
        .select("term", "doc_id", "tf", score.alias("score"))
    )
    wterm = W.partitionBy("term")
    ranked = scored.select(
        "term",
        "tf",
        F.row_number()
        .over(wterm.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rnk"),
        F.row_number()
        .over(wterm.orderBy(F.desc("tf"), F.asc("doc_id")))
        .alias("ideal_pos"),
    )
    gain = F.col("tf") / F.log2(F.col("rnk") + F.lit(1.0))
    igain = F.col("tf") / F.log2(F.col("ideal_pos") + F.lit(1.0))
    agg = ranked.groupBy("term").agg(
        F.sum(
            F.when(F.col("rnk") <= NDCG_K, gain)
            .otherwise(0.0)
            .cast("decimal(27,12)")
        )
        .cast("double")
        .alias("dcg"),
        F.sum(
            F.when(F.col("ideal_pos") <= NDCG_K, igain)
            .otherwise(0.0)
            .cast("decimal(27,12)")
        )
        .cast("double")
        .alias("idcg"),
        F.sum(F.when(F.col("rnk") <= NDCG_K, 1).otherwise(0))
        .cast("long")
        .alias("n_ranked"),
    )
    return agg.select(
        "term",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        "n_ranked",
    ).orderBy("term")
