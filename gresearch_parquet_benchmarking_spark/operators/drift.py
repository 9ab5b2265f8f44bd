"""Distribution-drift detection: two-sample Kolmogorov–Smirnov and
Population Stability Index over the document corpus.

The pair every production data monitor runs between a reference batch
and a new ingest (here: even vs odd doc_ids — the deterministic stand-
in for "yesterday vs today"): KS gives the supremum ECDF gap with a
distribution-free critical value; PSI (the banking-world standard,
cutoffs 0.1 warn / 0.2 act) gives a binned divergence that names WHERE
the mass moved. Detecting drift on document-length (or quality-score)
distributions is how a training pipeline notices an upstream crawler
or filter changed before the model does.

Scale shape (both): one pass aggregates the corpus down to a
value-keyed (KS) or bin-keyed (PSI) table — |distinct values| and 10
rows respectively — and ALL window/rank work happens on that
aggregate, never the raw rows. The KS window is ordered by value over
the value-aggregated table; PSI's reference cutpoints are exact
percentiles of the per-value aggregate carried as one broadcast array
row. Output is one audit row each.

Determinism: ECDFs are ratios of exact integer cumulative counts; the
KS max is over per-row IEEE doubles. PSI bin assignment is an integer
fold over the broadcast cutpoint array (strict 2-arg lambda, rule 6);
the PSI sum decimal-accumulates its 10 ln-terms (rule 1 — a plain
double SUM over even 10 terms is order-dependent); shares are floored
at PSI_EPS so empty bins contribute a finite, identical term on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import query
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

KS_COEF_05 = 1.358   # c(alpha) at alpha=0.05 for the two-sample KS test
PSI_BINS = 10
PSI_EPS = 1e-6       # share floor for empty bins (standard practice)
PSI_ACT = 0.2        # industry action threshold


@query(
    "drift_ks_doc_length",
    oracle=f"""
    WITH d AS (
        SELECT doc_id % 2 AS grp, n_chars AS x FROM documents
    ),
    sizes AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM d
    ),
    byval AS (
        SELECT x,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS cb
        FROM d GROUP BY x
    ),
    cum AS (
        SELECT x,
               SUM(ca) OVER (ORDER BY x) AS cuma,
               SUM(cb) OVER (ORDER BY x) AS cumb
        FROM byval
    ),
    k AS (
        SELECT MAX(ABS(cuma * 1.0 / sizes.n_a - cumb * 1.0 / sizes.n_b)) AS ks
        FROM cum CROSS JOIN sizes
    )
    SELECT ROUND(k.ks, 6) AS ks_stat,
           sizes.n_a, sizes.n_b,
           ROUND({KS_COEF_05} * sqrt((sizes.n_a + sizes.n_b) * 1.0
                                     / (sizes.n_a * sizes.n_b)), 6) AS crit_05,
           k.ks > {KS_COEF_05} * sqrt((sizes.n_a + sizes.n_b) * 1.0
                                      / (sizes.n_a * sizes.n_b)) AS drift_detected
    FROM k CROSS JOIN sizes
    """,
)
def drift_ks_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test on the document-length distribution between
    the even- and odd-doc_id halves: KS = sup |ECDF_a − ECDF_b|,
    compared against the α=0.05 critical value 1.358·√((n+m)/(nm)).
    On the synthetic corpus the halves are exchangeable, so this is
    the null-calibration row (drift_detected = false unless the
    generator changes); pointing group at an ingest-batch column
    instead of parity is a one-line swap."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"), F.col("n_chars").alias("x")
    )
    sizes = d.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    byval = d.groupBy("x").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    wv = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = byval.select(
        F.sum("ca").over(wv).alias("cuma"), F.sum("cb").over(wv).alias("cumb")
    )
    k = cum.crossJoin(F.broadcast(sizes)).agg(
        F.max(
            F.abs(
                F.col("cuma") * F.lit(1.0) / F.col("n_a")
                - F.col("cumb") * F.lit(1.0) / F.col("n_b")
            )
        ).alias("ks")
    )
    crit = F.lit(KS_COEF_05) * F.sqrt(
        (F.col("n_a") + F.col("n_b")) * F.lit(1.0) / (F.col("n_a") * F.col("n_b"))
    )
    return k.crossJoin(F.broadcast(sizes)).select(
        F.round("ks", 6).alias("ks_stat"),
        "n_a",
        "n_b",
        F.round(crit, 6).alias("crit_05"),
        (F.col("ks") > crit).alias("drift_detected"),
    )


@query(
    "drift_psi_doc_length",
    oracle=f"""
    WITH d AS (
        SELECT doc_id % 2 AS grp, CAST(n_chars AS DOUBLE) AS x FROM documents
    ),
    cuts AS (
        SELECT quantile_cont(x, [{", ".join(str(i / PSI_BINS) for i in range(1, PSI_BINS))}])
                   AS cuts
        FROM d WHERE grp = 0
    ),
    binned AS (
        SELECT grp,
               1 + len(list_filter(cuts.cuts, c -> x > c)) AS bin
        FROM d CROSS JOIN cuts
    ),
    per_bin AS (
        SELECT bin,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_cur
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
               CAST(SUM(n_cur) AS BIGINT) AS t_cur,
               COUNT(*) AS n_bins_used
        FROM per_bin
    ),
    terms AS (
        SELECT GREATEST(n_ref * 1.0 / tot.t_ref, {PSI_EPS}) AS p,
               GREATEST(n_cur * 1.0 / tot.t_cur, {PSI_EPS}) AS q
        FROM per_bin CROSS JOIN tot
    )
    SELECT ROUND(CAST(SUM(CAST((p - q) * ln(p / q) AS DECIMAL(27,12)))
                 AS DOUBLE), 6) AS psi,
           tot.n_bins_used, tot.t_ref, tot.t_cur,
           CAST(SUM(CAST((p - q) * ln(p / q) AS DECIMAL(27,12)))
                AS DOUBLE) > {PSI_ACT} AS drift_detected
    FROM terms CROSS JOIN tot
    GROUP BY tot.n_bins_used, tot.t_ref, tot.t_cur
    """,
)
def drift_psi_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index on document length: decile cutpoints
    from the REFERENCE half (even doc_ids), both halves binned against
    them, PSI = Σ (p−q)·ln(p/q) with shares floored at {PSI_EPS};
    actionable drift at PSI > {PSI_ACT}. Heavy value ties collapse
    duplicate cutpoints into fewer occupied bins — n_bins_used reports
    it instead of hiding it."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("grp"),
        F.col("n_chars").cast("double").alias("x"),
    )
    probs = [i / PSI_BINS for i in range(1, PSI_BINS)]
    cuts = (
        d.filter(F.col("grp") == 0)
        .agg(*[
            F.percentile("x", F.lit(p)).alias(f"c{i}")
            for i, p in enumerate(probs)
        ])
        .select(F.array(*[F.col(f"c{i}") for i in range(len(probs))]).alias("cuts"))
    )
    binned = d.crossJoin(F.broadcast(cuts)).select(
        "grp",
        (
            F.lit(1)
            + F.size(F.filter(F.col("cuts"), lambda c: F.col("x") > c))
        ).alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = per_bin.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
    terms = per_bin.crossJoin(F.broadcast(tot)).select(
        F.greatest(
            F.col("n_ref") * F.lit(1.0) / F.col("t_ref"), F.lit(PSI_EPS)
        ).alias("p"),
        F.greatest(
            F.col("n_cur") * F.lit(1.0) / F.col("t_cur"), F.lit(PSI_EPS)
        ).alias("q"),
        "n_bins_used",
        "t_ref",
        "t_cur",
    )
    psi_sum = (
        F.sum(
            ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).cast(
                "decimal(27,12)"
            )
        ).cast("double")
    )
    return (
        terms.groupBy("n_bins_used", "t_ref", "t_cur")
        .agg(
            F.round(psi_sum, 6).alias("psi"),
            (psi_sum > PSI_ACT).alias("drift_detected"),
        )
        .select("psi", "n_bins_used", "t_ref", "t_cur", "drift_detected")
    )


CENTROID_COS_WARN = 0.98  # centroid-cosine floor before flagging drift


@query(
    "drift_embedding_centroid",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id % 2 AS grp,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT grp, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM vecs
    ),
    cent AS (
        SELECT grp, i,
               CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat GROUP BY grp, i
    ),
    paired AS (
        SELECT a.i, a.cx AS c0, b.cx AS c1
        FROM (SELECT i, cx FROM cent WHERE grp = 0) a
        JOIN (SELECT i, cx FROM cent WHERE grp = 1) b USING (i)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS dim,
           ROUND(sqrt(CAST(SUM(CAST((c0 - c1) * (c0 - c1)
                                    AS DECIMAL(27,12))) AS DOUBLE)), 6)
             AS l2_shift,
           ROUND(CAST(SUM(CAST(c0 * c1 AS DECIMAL(27,12))) AS DOUBLE)
                 / (sqrt(CAST(SUM(CAST(c0 * c0 AS DECIMAL(27,12))) AS DOUBLE))
                    * sqrt(CAST(SUM(CAST(c1 * c1 AS DECIMAL(27,12))) AS DOUBLE))),
                 6) AS centroid_cos,
           CAST(SUM(CAST(c0 * c1 AS DECIMAL(27,12))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(c0 * c0 AS DECIMAL(27,12))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(c1 * c1 AS DECIMAL(27,12))) AS DOUBLE)))
             < {CENTROID_COS_WARN} AS drift_detected
    FROM paired
    """,
)
def drift_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: centroid L2 shift and centroid
    cosine between the reference and ingest halves (even vs odd
    vec_id — the same deterministic split the KS/PSI monitors use).
    The first-moment check an embedding pipeline runs when the
    upstream encoder, preprocessing, or corpus mix may have changed —
    cheap enough for every batch, and a centroid that moves (cosine
    below the warn floor) is an unambiguous "re-validate the index /
    re-calibrate thresholds" signal.

    Scale shape: one pass flattens vectors to (half, dim) partial
    sums — map-side combinable, constant-width keys, |dims|·2 rows
    out — and every subsequent join/aggregate runs on that
    dims-sized table. No pairwise anything.

    Determinism: per-dim means and all three quadratic sums
    decimal-accumulate (rule 1); the shift/cosine arithmetic is one
    IEEE tree over identical doubles on both engines."""
    from gresearch_parquet_benchmarking_spark.operators.registry import dsum

    vec = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).alias("grp"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    flat = vec.select("grp", F.posexplode("v").alias("i0", "x")).select(
        "grp", (F.col("i0") + 1).alias("i"), "x"
    )
    cent = flat.groupBy("grp", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cx")
    )
    a = cent.filter(F.col("grp") == 0).select("i", F.col("cx").alias("c0"))
    b = cent.filter(F.col("grp") == 1).select(
        F.col("i").alias("i_b"), F.col("cx").alias("c1")
    )
    paired = a.join(b, F.col("i") == F.col("i_b"))
    cos = (
        dsum(F.col("c0") * F.col("c1"), scale=12)
        / (
            F.sqrt(dsum(F.col("c0") * F.col("c0"), scale=12))
            * F.sqrt(dsum(F.col("c1") * F.col("c1"), scale=12))
        )
    )
    return paired.agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(
            F.sqrt(dsum((F.col("c0") - F.col("c1")) * (F.col("c0") - F.col("c1")), scale=12)),
            6,
        ).alias("l2_shift"),
        F.round(cos, 6).alias("centroid_cos"),
        (cos < CENTROID_COS_WARN).alias("drift_detected"),
    )


JSD_WARN_BITS = 0.05  # token-distribution divergence warn threshold


@query(
    "drift_token_jsd",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id % 2 AS grp,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    bytok AS (
        SELECT token,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
        FROM toks WHERE token <> '' GROUP BY token
    ),
    tot AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS t0, CAST(SUM(c1) AS BIGINT) AS t1
        FROM bytok
    ),
    terms AS (
        SELECT bytok.token,
               bytok.c0 * 1.0 / tot.t0 AS p,
               bytok.c1 * 1.0 / tot.t1 AS q
        FROM bytok CROSS JOIN tot
    ),
    j AS (
        SELECT CAST(SUM(CAST(
                 0.5 * (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
                        ELSE 0.0 END)
                 + 0.5 * (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2))
                          ELSE 0.0 END)
               AS DECIMAL(27,12))) AS DOUBLE) AS jsd_nats,
               CAST(COUNT(*) AS BIGINT) AS n_tokens_union
        FROM terms
    )
    SELECT j.n_tokens_union, tot.t0, tot.t1,
           ROUND(j.jsd_nats, 9) AS jsd_nats,
           ROUND(j.jsd_nats / ln(2.0), 9) AS jsd_bits,
           j.jsd_nats / ln(2.0) > {JSD_WARN_BITS} AS drift_detected
    FROM j CROSS JOIN tot
    """,
)
def drift_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the TOKEN DISTRIBUTIONS of
    the reference and ingest halves (even vs odd doc_id) — the
    content-level drift monitor that completes the family: KS/PSI
    watch scalar features, the centroid monitor watches embedding
    space, JSD watches what the text actually says (vocabulary mix).
    Symmetric, bounded (≤1 bit), defined even on disjoint vocabularies
    — exactly why monitoring uses it over raw KL.

    Scale shape: ONE aggregation folds the corpus to per-token counts
    for both halves simultaneously (map-side partials, conditional
    sums — no join between halves); the 2-value totals row broadcasts
    back onto the vocabulary-sized table, and the JSD reduction is a
    single decimal-accumulated sum. Vocabulary grows Heaps-sublinear.

    Determinism: integer counts; p/q/m and each ln term are one IEEE
    tree over identical doubles; the sum over vocabulary terms
    decimal-accumulates (rule 1); zero-count branches contribute an
    exact 0.0 on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("grp"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token") != "")
    bytok = toks.groupBy("token").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    tot = bytok.agg(
        F.sum("c0").cast("long").alias("t0"),
        F.sum("c1").cast("long").alias("t1"),
    )
    terms = bytok.crossJoin(F.broadcast(tot)).select(
        (F.col("c0") * F.lit(1.0) / F.col("t0")).alias("p"),
        (F.col("c1") * F.lit(1.0) / F.col("t1")).alias("q"),
        "t0",
        "t1",
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.lit(0.5) * F.when(
        F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
    ).otherwise(0.0) + F.lit(0.5) * F.when(
        F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0)
    j = terms.agg(
        F.sum(term.cast("decimal(27,12)")).cast("double").alias("jsd_nats"),
        F.count(F.lit(1)).alias("n_tokens_union"),
        F.min("t0").alias("t0"),
        F.min("t1").alias("t1"),
    )
    bits = F.col("jsd_nats") / F.log(F.lit(2.0))
    return j.select(
        "n_tokens_union",
        "t0",
        "t1",
        F.round("jsd_nats", 9).alias("jsd_nats"),
        F.round(bits, 9).alias("jsd_bits"),
        (bits > JSD_WARN_BITS).alias("drift_detected"),
    )
