"""Pipeline-diagnostics operators: classifier evaluation, sketch
calibration, and data-quality/duplication cross-analysis.

The reference has no classifier or sketch surface (SURVEY.md §2.9
extension charter); these are the measurement queries an LLM-data
pipeline runs to TRUST its other stages:

* ``text_langid_confusion`` — the confusion matrix + per-cell
  recall/precision shares for the marker-based language-ID heuristic
  (operators/text.py) against the labeled ``lang`` column — the
  evaluation every classifier-driven filter needs before it routes
  100 TB of documents.
* ``dedup_minhash_calibration`` — MinHash's estimated Jaccard
  (matching signature components / permutations) against the EXACT
  shingle Jaccard, aggregated per signature-agreement level over the
  LSH candidate pairs — the calibration table that decides how many
  permutations/bands a deployment needs (same role ann_ivf_recall
  plays for the IVF index).
* ``quality_vs_dup_lift`` — duplication rate per quality tier and its
  lift over the corpus-wide rate — whether low-quality documents
  duplicate more, which decides filter-before-dedup vs dedup-before-
  filter ordering.

Scale shapes: confusion and lift are map-side expressions + tiny
aggregations (shuffle keys: language codes / md5 fingerprints /
quality tiers — all constant width; document text never crosses an
exchange). Calibration inherits the LSH bucket-join shape from
operators/dedup.py: candidates meet only inside a band bucket, exact
Jaccard runs on candidates only, signatures are persisted across their
two uses (registry.track_persist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    norm_fingerprint_col,
    tokens_col,
)
from gresearch_parquet_benchmarking_spark.operators.dedup import (
    N_BANDS,
    N_MINHASH,
    _corpus,
    _minhash,
    _shingles,
    _sql_corpus,
    _sql_minhash,
    _SQL_SHINGLES,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    davg,
    query,
    sql_davg,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.operators.text import (
    LANG_MARKERS,
    _sql_marker_count,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

# quality-score tier cutpoints (score range ≈ 0.26–0.58 on the corpus
# spec; fixed constants so the bucketing is map-side and cross-engine
# exact — the approx-quantile variant of this trade is
# curriculum_buckets_approx)
Q_LOW, Q_HIGH = 0.48, 0.53


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT lang,
               CASE GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                    WHEN s_de THEN 'de'
                    WHEN s_en THEN 'en'
                    WHEN s_es THEN 'es'
                    WHEN s_fr THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM (
            SELECT lang,
                   {_sql_marker_count('de')} AS s_de,
                   {_sql_marker_count('en')} AS s_en,
                   {_sql_marker_count('es')} AS s_es,
                   {_sql_marker_count('fr')} AS s_fr,
                   {_sql_marker_count('zh')} AS s_zh
            FROM documents
        )
    ),
    cells AS (
        SELECT lang AS labeled_lang, predicted_lang, COUNT(*) AS n_docs
        FROM pred GROUP BY lang, predicted_lang
    )
    SELECT labeled_lang, predicted_lang, n_docs,
           ROUND(n_docs * 1.0 /
                 SUM(n_docs) OVER (PARTITION BY labeled_lang), 6) AS recall_share,
           ROUND(n_docs * 1.0 /
                 SUM(n_docs) OVER (PARTITION BY predicted_lang), 6) AS precision_share
    FROM cells
    ORDER BY labeled_lang, predicted_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: per (labeled, predicted) cell the
    document count plus its share of the labeled row (recall mass) and
    of the predicted column (precision mass). The prediction is the
    deterministic marker heuristic of text_langid (fixed tiebreak
    order de<en<es<fr<zh); shares are double divisions of exact
    integer counts. The corpus-wide scan is map-side; the shuffle keys
    are language-code pairs."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")

    def _marker_count(markers: tuple[str, ...]):
        # factory closure (CLAUDE.md rule 6): F.filter lambdas take
        # exactly one param; the factory freezes `markers` per lang
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: _marker_count(m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    predicted = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    cells = (
        doc.select(F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n = F.col("n_docs").cast("double")
    return (
        cells.select(
            "labeled_lang",
            "predicted_lang",
            "n_docs",
            F.round(
                n / F.sum("n_docs").over(W.partitionBy("labeled_lang")), 6
            ).alias("recall_share"),
            F.round(
                n / F.sum("n_docs").over(W.partitionBy("predicted_lang")), 6
            ).alias("precision_share"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


def _calibration_sql() -> str:
    mh_exprs = ", ".join(f"{_sql_minhash(h)} AS mh{h}" for h in range(N_MINHASH))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, shingles, {b} AS band, mh{2 * b} AS k1, mh{2 * b + 1} AS k2 "
        "FROM sig"
        for b in range(N_BANDS)
    )
    n_match = " + ".join(
        f"CASE WHEN sa.mh{h} = sb.mh{h} THEN 1 ELSE 0 END" for h in range(N_MINHASH)
    )
    return f"""
    WITH corpus AS ({_sql_corpus('neardup')}),
    sh AS (
        SELECT doc_id, {_SQL_SHINGLES} AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
    ),
    sig AS (SELECT doc_id, shingles, {mh_exprs} FROM sh),
    bands AS ({band_rows}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
         AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT ({n_match}) AS n_match,
               CAST(LEN(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                   / LEN(list_distinct(sa.shingles || sb.shingles)) AS jac
        FROM cand c
        JOIN sig sa ON c.doc_a = sa.doc_id
        JOIN sig sb ON c.doc_b = sb.doc_id
    )
    SELECT CAST(n_match AS BIGINT) AS n_match,
           COUNT(*) AS n_pairs,
           ROUND({sql_davg('jac', 12)}, 6) AS avg_exact_jaccard,
           ROUND({sql_davg(f'ABS(n_match / {N_MINHASH}.0 - jac)', 12)}, 6) AS avg_abs_err
    FROM scored
    GROUP BY n_match
    ORDER BY n_match
    """


@query("dedup_minhash_calibration", oracle=_calibration_sql)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration over the LSH candidate pairs: per
    signature-agreement level (0..N_MINHASH matching components) the
    pair count, the mean EXACT shingle Jaccard, and the mean absolute
    error of the MinHash estimate (n_match / N_MINHASH). The table
    that sizes a deployment's permutation/band budget.

    Scale shape = dedup_minhash_lsh: signatures persisted (they feed
    the band join and both sides of the verification join), candidates
    meet only inside (band, k1, k2) buckets, exact Jaccard touches
    candidate PAIRS only — nothing quadratic. The verification join's
    shuffle key is doc_id; the candidate side is a small fraction of
    the corpus (band-collision rate), so AQE broadcasts it and the
    signature table filters map-side — and if candidates outgrow
    broadcast at extreme scale, the join degrades to a doc_id SMJ, not
    an all-pairs product."""
    corpus = _corpus(spark, sf_dir, "neardup")
    sig = track_persist(
        corpus.select("doc_id", _shingles(tokens_col("text")).alias("shingles"))
        .select(
            "doc_id",
            "shingles",
            *[_minhash(F.col("shingles"), h).alias(f"mh{h}") for h in range(N_MINHASH)],
        )
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.col(f"mh{2 * b}").alias("k1"),
                F.col(f"mh{2 * b + 1}").alias("k2"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", "bk.k1", "bk.k2"
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "k1", "k2")
    b_ = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"),
        F.col("k1").alias("k1_b"), F.col("k2").alias("k2_b"),
    )
    cand = (
        a.join(
            b_,
            (F.col("band") == F.col("band_b"))
            & (F.col("k1") == F.col("k1_b"))
            & (F.col("k2") == F.col("k2_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"),
        *[F.col(f"mh{h}").alias(f"a{h}") for h in range(N_MINHASH)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"),
        *[F.col(f"mh{h}").alias(f"b{h}") for h in range(N_MINHASH)],
    )
    n_match = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(N_MINHASH)
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(n_match.alias("n_match"), jac.alias("jac"))
    )
    est_err = F.abs(F.col("n_match") / F.lit(float(N_MINHASH)) - F.col("jac"))
    return (
        scored.groupBy(F.col("n_match").cast("long").alias("n_match"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(davg("jac", scale=12), 6).alias("avg_exact_jaccard"),
            F.round(davg(est_err, scale=12), 6).alias("avg_abs_err"),
        )
        .orderBy("n_match")
    )


@query(
    "quality_vs_dup_lift",
    oracle=f"""
    WITH corpus AS ({_sql_corpus('exact')}),
    scored AS (
        SELECT CASE WHEN quality < {Q_LOW} THEN 'low'
                    WHEN quality < {Q_HIGH} THEN 'mid' ELSE 'high' END AS tier,
               fp
        FROM (
            SELECT CAST(CAST(0.4 AS DECIMAL(2,1)) * CAST(len_score AS DECIMAL(18,6))
                        + CAST(0.3 AS DECIMAL(2,1)) * CAST(stop_ratio AS DECIMAL(18,6))
                        + CAST(0.3 AS DECIMAL(2,1)) * CAST(uniq_ratio AS DECIMAL(18,6))
                        AS DOUBLE) AS quality,
                   fp
            FROM (
                SELECT ROUND(CAST(LEN(list_filter(toks, t -> t IN
                             ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
                             / LEN(toks), 6) AS stop_ratio,
                       ROUND(CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks), 6)
                           AS uniq_ratio,
                       ROUND(LEAST(CAST(LEN(toks) AS DOUBLE) / 50.0, 1.0), 6)
                           AS len_score,
                       md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' '))
                           AS fp
                FROM (SELECT text, string_split(text, ' ') AS toks FROM corpus)
            )
        )
    ),
    flagged AS (
        SELECT tier, (COUNT(*) OVER (PARTITION BY fp) > 1) AS is_dup FROM scored
    ),
    per_tier AS (
        SELECT tier, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
        FROM flagged GROUP BY tier
    ),
    tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs,
               CAST(SUM(n_dups) AS BIGINT) AS all_dups
        FROM per_tier
    )
    SELECT tier, n_docs, n_dups,
           ROUND(n_dups * 1.0 / n_docs, 6) AS dup_rate,
           ROUND((n_dups * 1.0 / n_docs) / (all_dups * 1.0 / all_docs), 6) AS lift
    FROM per_tier, tot
    ORDER BY tier
    """,
)
def quality_vs_dup_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication rate per quality tier and its lift over the
    corpus-wide rate (corpus = documents ∪ planted exact copies, the
    dedup.py planting model, so the rate is nonzero by construction).
    Quality is text_quality_score's exact-decimal combination bucketed
    by fixed cutpoints (map-side — no per-corpus sort); the dup flag
    is a count-over-fingerprint window (constant-width md5 shuffle
    key); the lift denominator is a broadcast 1-row total."""
    corpus = _corpus(spark, sf_dir, "exact", spread=False)
    toks = tokens_col("text")
    n = F.size(toks)
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"))).cast("double") / n,
        6,
    )
    uniq_ratio = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    len_score = F.round(F.least(n.cast("double") / 50.0, F.lit(1.0)), 6)
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    w4 = F.lit("0.4").cast("decimal(2,1)")
    w3 = F.lit("0.3").cast("decimal(2,1)")
    quality = (w4 * dec(len_score) + w3 * dec(stop_ratio) + w3 * dec(uniq_ratio)).cast(
        "double"
    )
    tier = (
        F.when(quality < Q_LOW, "low").when(quality < Q_HIGH, "mid").otherwise("high")
    )
    scored = corpus.select(
        tier.alias("tier"), norm_fingerprint_col("text").alias("fp")
    )
    flagged = scored.select(
        "tier", (F.count(F.lit(1)).over(W.partitionBy("fp")) > 1).alias("is_dup")
    )
    per_tier = flagged.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dups"),
    )
    tot = per_tier.agg(
        F.sum("n_docs").alias("all_docs"), F.sum("n_dups").alias("all_dups")
    )
    rate = F.col("n_dups").cast("double") / F.col("n_docs")
    overall = F.col("all_dups").cast("double") / F.col("all_docs")
    return (
        per_tier.crossJoin(F.broadcast(tot))
        .select(
            "tier",
            "n_docs",
            "n_dups",
            F.round(rate, 6).alias("dup_rate"),
            F.round(rate / overall, 6).alias("lift"),
        )
        .orderBy("tier")
    )


PMI_MIN_COUNT = 10  # bigram support threshold for the collocation table


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
        SELECT token, COUNT(*) AS c
        FROM (SELECT UNNEST(t) AS token FROM toks) GROUP BY token
    ),
    t_uni AS (SELECT CAST(SUM(c) AS BIGINT) AS tu FROM uni),
    bg AS (
        SELECT w1, w2, COUNT(*) AS c_xy
        FROM (
            SELECT UNNEST([t[i] FOR i IN range(1, len(t))]) AS w1,
                   UNNEST([t[i+1] FOR i IN range(1, len(t))]) AS w2
            FROM toks
        )
        GROUP BY w1, w2
    ),
    t_bi AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS tb FROM bg)
    SELECT w1, w2, c_xy,
           ROUND(log2((CAST(c_xy AS DOUBLE) / tb)
                      / ((CAST(u1.c AS DOUBLE) / tu) * (CAST(u2.c AS DOUBLE) / tu))),
                 6) AS pmi
    FROM bg
    JOIN uni u1 ON bg.w1 = u1.token
    JOIN uni u2 ON bg.w2 = u2.token
    CROSS JOIN t_uni CROSS JOIN t_bi
    WHERE c_xy >= {PMI_MIN_COUNT}
    ORDER BY w1, w2
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information for corpus bigrams with support ≥
    PMI_MIN_COUNT: pmi = log2(P(xy) / (P(x)·P(y))) under the corpus's
    own unigram/bigram models — the collocation detector ("new york"
    vs chance co-occurrence) a tokenizer-vocabulary or phrase-mining
    pass runs.

    Scale shape: bigrams are built in-row (zip_with over shifted
    slices, the text_bigram_counts pattern) and count-aggregated with
    map-side combine; the two unigram joins ship (token, count) pairs
    only — Zipf skew on the token key is AQE skew-join territory;
    totals are broadcast 1-row aggregates. Determinism: counts are
    exact integers; the pmi expression is the identical IEEE
    double-division/log2 tree on both engines (the
    unigram_logprob_score treatment), emitted rounded to 6."""
    doc = load_table(spark, sf_dir, "documents")
    t = tokens_col("text")
    toks = doc.select(t.alias("t"))
    uni = (
        toks.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_uni = uni.agg(F.sum("c").cast("long").alias("tu"))
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size(F.col("t")) - 1),
        F.slice(F.col("t"), 2, F.size(F.col("t")) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        toks.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    t_bi = bg.agg(F.sum("c_xy").cast("long").alias("tb"))
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log2(
        (F.col("c_xy").cast("double") / F.col("tb"))
        / (
            (F.col("c1").cast("double") / F.col("tu"))
            * (F.col("c2").cast("double") / F.col("tu"))
        )
    )
    return (
        bg.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(t_uni))
        .crossJoin(F.broadcast(t_bi))
        .select("w1", "w2", "c_xy", F.round(pmi, 6).alias("pmi"))
        .orderBy("w1", "w2")
    )


@query(
    "bigram_logprob_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    doc_bg AS (
        SELECT doc_id,
               UNNEST([t[i] FOR i IN range(1, len(t))]) AS w1,
               UNNEST([t[i+1] FOR i IN range(1, len(t))]) AS w2
        FROM toks
    ),
    bg AS (SELECT w1, w2, COUNT(*) AS c_xy FROM doc_bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM bg GROUP BY w1)
    SELECT d.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(ROUND(log2(CAST(bg.c_xy AS DOUBLE)
                                          / CAST(ctx.c_x AS DOUBLE)), 9)
                               AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*), 6)
               AS avg_logprob
    FROM doc_bg d
    JOIN bg ON d.w1 = bg.w1 AND d.w2 = bg.w2
    JOIN ctx ON d.w1 = ctx.w1
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score: per-document average conditional
    log2-probability log2(c(w1 w2) / c(w1 ·)) under the corpus's own
    bigram model — one LM order deeper than unigram_logprob_score (a
    doc of common words in UNUSUAL order now scores low, which the
    unigram model cannot see). Per-token log terms are rounded to 9 dp
    and DECIMAL-accumulated (the unigram/entropy determinism
    treatment); the context denominator is the bigram table's own
    marginal, so probabilities per context sum exactly to 1.

    Scale shape: bigram counting shuffles (w1, w2, partial-count) with
    map-side combine; the scoring joins ship constant-width count
    pairs keyed by Zipf-skewed tokens — AQE skew-join posture, vocab
    side is one row per (bi)gram. Document text never crosses an
    exchange."""
    doc = load_table(spark, sf_dir, "documents")
    t = tokens_col("text")
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bg = track_persist(
        doc.select("doc_id", F.explode(pairs).alias("p")).select(
            "doc_id", "p.w1", "p.w2"
        )
    )
    bg = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    ctx = bg.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c_x"))
    term = F.round(
        F.log2(F.col("c_xy").cast("double") / F.col("c_x").cast("double")), 9
    ).cast("decimal(27,9)")
    return (
        doc_bg.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality rules (round 6)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 2000
GOPHER_WLEN_LO = 2.0     # mean word length bounds
GOPHER_WLEN_HI = 12.0
GOPHER_SYM_MAX = 0.1     # non-[a-z0-9 ] character share ceiling
GOPHER_UNIQ_MIN = 0.5    # distinct-token ratio floor (dup-line analog)
GOPHER_MIN_STOPS = 2     # distinct required stopwords present
_GOPHER_STOPS = ("the", "a", "of", "and", "to", "in", "is")
_SQL_STOPS = "[" + ", ".join(f"'{s}'" for s in _GOPHER_STOPS) + "]"


def _gopher_flags(doc: DataFrame) -> DataFrame:
    """(lang, f_words, f_wlen, f_symbol, f_uniq, f_stop) — the Gopher
    rule booleans, shared by quality_gopher_rules and the ablation
    matrix (identical expression trees, so the two queries can never
    disagree about what a rule means)."""
    t = tokens_col("text")
    s = F.lower(F.col("text"))
    n = F.size(t)
    mean_wlen = (
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        .cast("double") / n
    )
    sym_ratio = (
        (F.length(s) - F.length(F.regexp_replace(s, "[^a-z0-9 ]", ""))).cast("double")
        / F.length(s)
    )
    uniq_ratio = F.size(F.array_distinct(t)).cast("double") / n
    n_stops = F.size(
        F.array_intersect(F.array_distinct(t), F.array(*[F.lit(x) for x in _GOPHER_STOPS]))
    )
    return doc.select(
        "lang",
        n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias("f_words"),
        mean_wlen.between(GOPHER_WLEN_LO, GOPHER_WLEN_HI).alias("f_wlen"),
        (sym_ratio <= GOPHER_SYM_MAX).alias("f_symbol"),
        (uniq_ratio >= GOPHER_UNIQ_MIN).alias("f_uniq"),
        (n_stops >= GOPHER_MIN_STOPS).alias("f_stop"),
    )


@query(
    "quality_gopher_rules",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               len(t) AS n_tok,
               CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / len(t) AS mean_wlen,
               CAST(len(s) - len(regexp_replace(s, '[^a-z0-9 ]', '', 'g'))
                    AS DOUBLE) / len(s) AS sym_ratio,
               CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uniq_ratio,
               len(list_intersect(list_distinct(t), {_SQL_STOPS})) AS n_stops
        FROM (
            SELECT lang, string_split(text, ' ') AS t, lower(text) AS s
            FROM documents
        )
    ),
    flags AS (
        SELECT lang,
               (n_tok BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS f_words,
               (mean_wlen BETWEEN {GOPHER_WLEN_LO} AND {GOPHER_WLEN_HI}) AS f_wlen,
               (sym_ratio <= {GOPHER_SYM_MAX}) AS f_symbol,
               (uniq_ratio >= {GOPHER_UNIQ_MIN}) AS f_uniq,
               (n_stops >= {GOPHER_MIN_STOPS}) AS f_stop
        FROM scored
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN f_words THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_words,
           CAST(SUM(CASE WHEN f_wlen THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordlen,
           CAST(SUM(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_symbol,
           CAST(SUM(CASE WHEN f_uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_uniq,
           CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stopword,
           CAST(SUM(CASE WHEN f_words AND f_wlen AND f_symbol AND f_uniq AND f_stop
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
           ROUND(SUM(CASE WHEN f_words AND f_wlen AND f_symbol AND f_uniq AND f_stop
                     THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pass_rate
    FROM flags
    GROUP BY lang
    ORDER BY lang
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition/quality filter battery (Rae et al. 2021,
    §A1.1, adapted to this corpus's whitespace tokens): word-count
    bounds, mean-word-length bounds, symbol-character ratio ceiling,
    distinct-token ratio floor (the duplicate-lines analog for
    line-less documents), and a minimum distinct-stopword requirement.
    Reports per-language pass counts per rule plus the all-rules pass
    rate — the dashboard a production filter stage ships with, and the
    per-rule attribution needed to tune any single threshold.

    Scale shape: every rule is a map-side in-row expression over the
    token array; the only shuffle is the per-language count rollup
    (constant-width keys, map-side partial aggregation). Document text
    never crosses an exchange. All rule comparisons are on
    integer-derived doubles (exact ratios of counts), so the booleans
    are bit-deterministic across engines."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    doc = load_table(spark, sf_dir, "documents")
    flags = _gopher_flags(doc)
    def cnt(c):
        return F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")
    all_pass = F.sum(
        F.when(
            F.col("f_words") & F.col("f_wlen") & F.col("f_symbol")
            & F.col("f_uniq") & F.col("f_stop"),
            1,
        ).otherwise(0)
    )
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("f_words").alias("n_pass_words"),
            cnt("f_wlen").alias("n_pass_wordlen"),
            cnt("f_symbol").alias("n_pass_symbol"),
            cnt("f_uniq").alias("n_pass_uniq"),
            cnt("f_stop").alias("n_pass_stopword"),
            all_pass.cast("long").alias("n_pass_all"),
            F.round(all_pass.cast("double") / F.count(F.lit(1)), 6).alias("pass_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# N-gram novelty coverage (round 6): Lee et al.-style incremental novelty
# ---------------------------------------------------------------------------

NOVEL_K = 5  # tokens per novelty n-gram


def _novelty_sql() -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(NOVEL_K)).replace(
        "t[i+0]", "t[i]"
    )
    return f"""
    WITH corpus AS ({_sql_corpus('exact')}),
    toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM corpus),
    grams AS (
        SELECT doc_id, lang,
               CASE WHEN len(t) >= {NOVEL_K}
                    THEN list_distinct([('0x' || substr(md5({gram}), 1, 8))::BIGINT
                          FOR i IN range(1, GREATEST(len(t) - {NOVEL_K - 2}, 1))])
                    ELSE [] END AS gh
        FROM toks
    ),
    sized AS (
        SELECT doc_id, lang, len(gh) AS n_grams, gh FROM grams WHERE len(gh) > 0
    ),
    fp AS (SELECT doc_id, unnest(gh) AS g FROM sized),
    novel AS (
        SELECT first_doc AS doc_id, COUNT(*) AS n_novel FROM (
            SELECT g, MIN(doc_id) AS first_doc FROM fp GROUP BY g
        ) GROUP BY first_doc
    ),
    per AS (
        SELECT s.doc_id, s.lang, CAST(s.n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel
        FROM sized s LEFT JOIN novel n ON s.doc_id = n.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(n_novel * 1.0 / n_grams AS DECIMAL(27,9)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_novelty,
           CAST(SUM(CASE WHEN n_novel = n_grams THEN 1 ELSE 0 END) AS BIGINT)
               AS n_all_novel,
           CAST(SUM(CASE WHEN n_novel = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_no_novel
    FROM per
    GROUP BY lang
    ORDER BY lang
    """


@query("text_novelty_coverage", oracle=_novelty_sql)
def text_novelty_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental n-gram novelty (the signal behind Lee et al.'s
    'Deduplicating Training Data' substring analysis, at {NOVEL_K}-gram
    granularity): a doc's novelty is the share of its DISTINCT
    {NOVEL_K}-gram hashes whose FIRST corpus occurrence (min doc_id) is
    this doc. Planted exact copies (the dedup.py corpus model) have
    novelty 0 by construction — the n_no_novel column is the purge
    candidate count; n_all_novel counts docs contributing only unseen
    text. Per-language rollup with a decimal-deterministic mean.

    Scale shape: gram hashing is a pure in-row HOF over the token
    array (map-side, codegen); novelty is attributed WITHOUT a
    gram-level join back — a doc's novel count is simply how many
    grams have min(doc_id) == doc_id, so after the 32-bit-key
    first-occurrence aggregation (map-side partial MIN) the only join
    is doc-granular (|docs| rows against |docs| rows, never |grams|).
    The r6 first cut joined the exploded gram table back to itself and
    measured 7.9 s at sf0.1; this shape is ~3× cheaper with identical
    output. Document text never crosses an exchange; the corpus scan
    is spread across cores (_corpus spread=True) because per-row gram
    hashing dominates at small file counts."""
    doc = _corpus(spark, sf_dir, "exact", spread=True)
    from gresearch_parquet_benchmarking_spark.functions.text_funcs import md5_hash64

    t = tokens_col("text")
    n = F.size(t)
    grams_raw = F.transform(
        F.sequence(F.lit(0), F.greatest(n - NOVEL_K, F.lit(-1))),
        lambda i: md5_hash64(
            F.concat_ws(" ", *[F.get(t, i + j) for j in range(NOVEL_K)])
        ),
    )
    gh = F.when(n >= NOVEL_K, F.array_distinct(grams_raw)).otherwise(
        F.array().cast("array<bigint>")
    )
    # persist boundary BEFORE any expression referencing gh twice: a
    # projection computing both size(gh) and gh re-evaluates the whole
    # md5-gram expression per alias (projection collapse — the
    # winnowing lesson), doubling the hash pass. The cached relation
    # materializes gh once; size/explode then read a plain column.
    base = track_persist(doc.select("doc_id", "lang", gh.alias("gh")))
    sized = base.select(
        "doc_id", "lang", F.size("gh").cast("long").alias("n_grams")
    ).filter(F.col("n_grams") > 0)
    novel = (
        base.select("doc_id", F.explode("gh").alias("g"))
        .groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    per = sized.join(
        novel, "doc_id", "left"
    ).select(
        "doc_id",
        "lang",
        "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
    )
    ratio = (F.col("n_novel") * F.lit(1.0) / F.col("n_grams")).cast("decimal(27,9)")
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(ratio).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_novelty"),
            F.sum(
                F.when(F.col("n_novel") == F.col("n_grams"), 1).otherwise(0)
            ).cast("long").alias("n_all_novel"),
            F.sum(F.when(F.col("n_novel") == 0, 1).otherwise(0)).cast("long").alias(
                "n_no_novel"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit (round 6)
# ---------------------------------------------------------------------------

ZIPF_TOP = 100  # head terms per language fed to the log-log regression


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH terms AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
        SELECT lang, term, COUNT(*) AS n FROM terms GROUP BY lang, term
    ),
    ranked AS (
        SELECT lang, n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n DESC, term) AS rnk
        FROM counts
    ),
    logs AS (
        SELECT lang,
               ROUND(ln(rnk), 9) AS x,
               ROUND(ln(n), 9) AS y
        FROM ranked WHERE rnk <= {ZIPF_TOP}
    ),
    sums AS (
        SELECT lang,
               COUNT(*) AS k,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) AS sxx
        FROM logs GROUP BY lang
    )
    SELECT lang, k AS n_terms,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 6)
               AS intercept
    FROM sums
    ORDER BY lang
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: ordinary-least-squares slope of
    log-frequency vs log-rank over each language's top-{ZIPF_TOP}
    terms. Natural text sits near slope −1; a corpus drifting toward 0
    (flat head) signals boilerplate/template flooding, and a steep
    slope signals vocabulary collapse — either way the distribution
    check a curation pipeline alarms on. Reports per-language slope
    and intercept.

    Scale shape: term counting shuffles on (lang, term) with map-side
    partials; the per-language rank window runs over term COUNTS (the
    aggregated table, vastly smaller than the corpus) and the head cut
    bounds the regression to {ZIPF_TOP} rows/language. Determinism:
    logs are rounded to 9 decimals per row, all OLS sums are
    decimal-accumulated (rule 1), and the final slope/intercept
    arithmetic is per-row IEEE on identical inputs."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    doc = load_table(spark, sf_dir, "documents")
    counts = (
        doc.select("lang", F.explode(tokens_col("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("term"))
    logs = (
        counts.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(
            "lang",
            F.round(F.log(F.col("rnk").cast("double")), 9).alias("x"),
            F.round(F.log(F.col("n").cast("double")), 9).alias("y"),
        )
    )
    dsum12 = lambda c: F.sum(c.cast("decimal(27,12)")).cast("double")  # noqa: E731
    sums = logs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("k"),
        dsum12(F.col("x")).alias("sx"),
        dsum12(F.col("y")).alias("sy"),
        dsum12(F.col("x") * F.col("y")).alias("sxy"),
        dsum12(F.col("x") * F.col("x")).alias("sxx"),
    )
    k, sx, sy, sxy, sxx = (F.col(c) for c in ("k", "sx", "sy", "sxy", "sxx"))
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return sums.select(
        "lang",
        k.alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / k, 6).alias("intercept"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Tokenizer fertility (round 6)
# ---------------------------------------------------------------------------

_FERT_PATTERN = "[bcdfghjklmnpqrstvwxyz]*[aeiou]+[bcdfghjklmnpqrstvwxyz]*"


@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH per AS (
        SELECT lang,
               CAST(LEN(regexp_extract_all(text, '{_FERT_PATTERN}')) AS BIGINT)
                   AS n_sub,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_sub) AS BIGINT) AS total_subwords,
           ROUND(CAST(SUM(n_sub) AS BIGINT) * 1.0
                 / CAST(SUM(n_words) AS BIGINT), 6) AS fertility,
           ROUND(CAST(SUM(CAST(n_sub * 1.0 / n_words AS DECIMAL(27,9)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_doc_fertility
    FROM per
    GROUP BY lang
    ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) per
    language — the cost metric that decides whether a tokenizer's
    vocab serves a language fairly (high fertility = more sequence
    length per sentence = more compute per token of meaning). Uses the
    deterministic vowel-nucleus subword stand-in shared with
    text_subword_tokens; reports both the corpus-level ratio (total
    subwords / total words — how budgets actually get spent) and the
    per-doc mean (how a typical document experiences it).

    Scale shape: counting is map-side regexp + split per row; the only
    shuffle is the per-language rollup with map-side partial sums.
    Integer sums are exact; the per-doc ratio mean is
    decimal-accumulated (rule 1)."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    doc = load_table(spark, sf_dir, "documents")
    n_sub = F.size(
        F.regexp_extract_all("text", F.lit(_FERT_PATTERN), F.lit(0))
    ).cast("long")
    n_words = F.size(tokens_col("text")).cast("long")
    per = doc.select("lang", n_sub.alias("n_sub"), n_words.alias("n_words"))
    tw = F.sum("n_words").cast("long")
    ts = F.sum("n_sub").cast("long")
    doc_ratio = (F.col("n_sub") * F.lit(1.0) / F.col("n_words")).cast("decimal(27,9)")
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            tw.alias("total_words"),
            ts.alias("total_subwords"),
            F.round(ts * F.lit(1.0) / tw, 6).alias("fertility"),
            F.round(F.sum(doc_ratio).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_doc_fertility"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Gopher-rule ablation matrix (round 6)
# ---------------------------------------------------------------------------

_GOPHER_RULES = ("words", "wlen", "symbol", "uniq", "stop")


def _ablation_sql() -> str:
    """Re-derives the same flags CTE as quality_gopher_rules (same
    module constants), then per rule: total failures and the docs
    failing ONLY that rule — the marginal yield the rule uniquely
    costs (what you get back by dropping it)."""
    flags = f"""
    WITH scored AS (
        SELECT len(t) AS n_tok,
               CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / len(t) AS mean_wlen,
               CAST(len(s) - len(regexp_replace(s, '[^a-z0-9 ]', '', 'g'))
                    AS DOUBLE) / len(s) AS sym_ratio,
               CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uniq_ratio,
               len(list_intersect(list_distinct(t), {_SQL_STOPS})) AS n_stops
        FROM (SELECT string_split(text, ' ') AS t, lower(text) AS s FROM documents)
    ),
    flags AS (
        SELECT (n_tok BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS f_words,
               (mean_wlen BETWEEN {GOPHER_WLEN_LO} AND {GOPHER_WLEN_HI}) AS f_wlen,
               (sym_ratio <= {GOPHER_SYM_MAX}) AS f_symbol,
               (uniq_ratio >= {GOPHER_UNIQ_MIN}) AS f_uniq,
               (n_stops >= {GOPHER_MIN_STOPS}) AS f_stop
        FROM scored
    )"""
    arms = []
    for r in _GOPHER_RULES:
        others = " AND ".join(f"f_{o}" for o in _GOPHER_RULES if o != r)
        arms.append(f"""
    SELECT '{r}' AS rule,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN NOT f_{r} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
           CAST(SUM(CASE WHEN NOT f_{r} AND {others} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fail_only,
           ROUND(SUM(CASE WHEN NOT f_{r} AND {others} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS marginal_drop_rate
    FROM flags""")
    return flags + "\n" + "\nUNION ALL\n".join(arms) + "\nORDER BY rule"


@query("quality_filter_ablation", oracle=_ablation_sql)
def quality_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule ablation of the Gopher filter battery: how many docs
    each rule fails in total, and how many it UNIQUELY removes (fail
    this rule, pass all others) — the marginal-yield attribution a
    filter-tuning session needs before touching any threshold
    (overlapping rules make raw per-rule pass counts misleading;
    n_fail_only is exactly the data returned by dropping the rule).
    Shares quality_gopher_rules' flag expressions via _gopher_flags,
    so the two dashboards can never disagree about rule semantics.

    Scale shape: one map-side flag pass over the corpus persisted
    once, then 5 aggregates over the 5-boolean relation (all map-side
    partials); output is 5 rows."""
    from gresearch_parquet_benchmarking_spark.operators.registry import track_persist
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    flags = track_persist(_gopher_flags(load_table(spark, sf_dir, "documents")))
    arms = []
    for r in _GOPHER_RULES:
        others = [F.col(f"f_{o}") for o in _GOPHER_RULES if o != r]
        others_pass = others[0]
        for o in others[1:]:
            others_pass = others_pass & o
        only = ~F.col(f"f_{r}") & others_pass
        arms.append(
            flags.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(~F.col(f"f_{r}"), 1).otherwise(0))
                .cast("long")
                .alias("n_fail"),
                F.sum(F.when(only, 1).otherwise(0)).cast("long").alias("n_fail_only"),
                F.round(
                    F.sum(F.when(only, 1).otherwise(0)) * F.lit(1.0)
                    / F.count(F.lit(1)),
                    6,
                ).alias("marginal_drop_rate"),
            ).select(
                F.lit(r).alias("rule"),
                "n_docs",
                "n_fail",
                "n_fail_only",
                "marginal_drop_rate",
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("rule")


VOCAB_SWEEP = (100, 1000, 10000)  # candidate vocabulary sizes


@query(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH vocab AS (
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> '' GROUP BY token
    ),
    ranked AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
        FROM vocab
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM ranked
    ),
    sweep(v_size) AS (VALUES {", ".join(f"({v})" for v in VOCAB_SWEEP)})
    SELECT sweep.v_size,
           CAST(SUM(CASE WHEN ranked.rnk <= sweep.v_size THEN 1 ELSE 0 END)
                AS BIGINT) AS n_types_used,
           CAST(SUM(CASE WHEN ranked.rnk <= sweep.v_size THEN ranked.cnt
                    ELSE 0 END) AS BIGINT) AS covered_tokens,
           ROUND(CAST(SUM(CASE WHEN ranked.rnk <= sweep.v_size
                          THEN ranked.cnt ELSE 0 END) AS BIGINT) * 1.0
                 / MIN(tot.total_tokens), 6) AS coverage,
           MIN(tot.total_tokens) AS total_tokens,
           MIN(tot.n_types) AS n_types
    FROM ranked CROSS JOIN sweep CROSS JOIN tot
    GROUP BY sweep.v_size
    ORDER BY sweep.v_size
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus coverage of the top-V frequency vocabulary for V in
    {VOCAB_SWEEP} — the OOV-rate curve that sizes a tokenizer's
    vocabulary (coverage(V) is exactly 1 − OOV-rate under a
    frequency-built word vocab; where the curve flattens is where
    extra vocab stops paying). Zipfian corpora saturate fast — this
    query IS the empirical check.

    Scale shape: the corpus collapses to the word-count vocabulary
    (map-side partials, Heaps-law sublinear size); corpus totals come
    from a plain aggregation of that table, and the frequency RANKING
    only ever matters up to max(VOCAB_SWEEP) — rows ranked past the
    largest cutoff contribute nothing to any hit sum — so the rank
    window runs over a TakeOrdered top-max(VOCAB_SWEEP) frame
    (constant-bounded, ≤{max(VOCAB_SWEEP)} rows), never the full
    vocabulary (which grows with the corpus and was the r9 window
    audit's weakest allowlist bound). The sweep is a
    |V-candidates|-row broadcast cross join onto that top frame —
    each row is scored against all 3 cutoffs in one pass.

    Determinism: integer counts and ranks (cnt DESC, token tiebreak —
    a total order, so the top-{max(VOCAB_SWEEP)} set and its ranks
    are unique); coverage is one double division of exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    # persist the vocab aggregate: BOTH the top-K frame and the corpus
    # totals read it, and relying on ReusedExchange to avoid a second
    # full explode+groupBy corpus scan is session-history-dependent
    # (round-4 lesson; r9 ADVICE). Heaps-law sublinear size — safe to
    # cache at any scale.
    vocab = track_persist(
        docs.select(F.explode(tokens_col("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # distributed top-K (TakeOrdered): only ranks ≤ max(VOCAB_SWEEP)
    # can satisfy any cutoff, so ranking the full vocabulary is wasted
    # work AND an unbounded single-partition window.
    top = vocab.orderBy(F.desc("cnt"), F.asc("token")).limit(max(VOCAB_SWEEP))
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.desc("cnt"), F.asc("token")))
        .alias("rnk"),
    )
    sweep = spark.createDataFrame([(v,) for v in VOCAB_SWEEP], ["v_size"])
    tot = vocab.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    )
    hit = F.col("rnk") <= F.col("v_size")
    return (
        ranked.crossJoin(F.broadcast(sweep))
        .crossJoin(F.broadcast(tot))
        .groupBy("v_size")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_types_used"),
            F.sum(F.when(hit, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.round(
                F.sum(F.when(hit, F.col("cnt")).otherwise(0)).cast("long")
                * F.lit(1.0)
                / F.min("total_tokens"),
                6,
            ).alias("coverage"),
            F.min("total_tokens").alias("total_tokens"),
            F.min("n_types").alias("n_types"),
        )
        .orderBy("v_size")
    )
