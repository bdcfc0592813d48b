"""Filter / labeler agreement audits: confusion counts and Cohen's
kappa, exact-integer cross-engine.

A curation pipeline stacks filters (quality score, repetition gate,
language ID) and the operational question before tuning any of them
is HOW CORRELATED they are: two gates that agree almost everywhere
are one gate's cost paid twice, and a labeler that disagrees with
the recorded label on a whole language is a bug, not noise. The
reference's pipeline applies its gates blindly (JobScraper
pracuj_scraper.py:373-386 keeps/retries on a count threshold with no
agreement accounting); this module makes agreement a first-class
audited number.

Determinism: every statistic here is pure integer arithmetic over
confusion counts — kappa's (po-pe)/(1-pe) is computed as a ratio of
BIGINT polynomials and reported in truncated permille (Spark ``div``
== DuckDB ``//``, probe-pinned by ``int_div_neg``), so there is no
float anywhere past the gate comparisons themselves. The underlying
gates reuse the oracle-shared definitions (textanalysis.quality_cte
and lang_pred_cte, common.repetition_cte) so the gate formulas
cannot drift from their source operators.

Scale shape: one documents scan per gate (each embarrassingly
parallel per-doc work), one doc_id equi-join, and aggregations whose
outputs are 1 row (binary kappa) or |langs|² rows (confusion
matrix). Integer-overflow bound: the kappa polynomials use n² — safe
to n ≈ 3e9 docs in BIGINT; past that, compute on a stratified sample
or move the two products to DECIMAL(38,0) (the limit is stated here,
not discovered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import DUP_FRAC_MAX, TOP_FRAC_MAX, repetition_cte
from jobminer_spark.operators.docquality import doc_repetition_stats
from jobminer_spark.operators.textanalysis import (
    lang_id_heuristic,
    lang_pred_cte,
    quality_cte,
    quality_scores,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

QUAL_CUT = 0.65  # keeps ~56% of the fixture corpus — a non-trivial gate

# shared permille-kappa SQL over a 1-row cm(n, a, b, c, d) relation
_KAPPA_SQL = (
    "CASE WHEN n*n - ((a+b)*(a+c) + (c+d)*(b+d)) = 0 THEN NULL "
    "ELSE (1000 * (n*(a+d) - ((a+b)*(a+c) + (c+d)*(b+d)))) "
    "{div} (n*n - ((a+b)*(a+c) + (c+d)*(b+d))) END"
)


@query(
    "filter_agreement_kappa",
    oracle=f"""
    WITH {quality_cte()},
    {repetition_cte()},
    gates AS (
      SELECT q.doc_id,
             CASE WHEN q.quality_score >= {QUAL_CUT} THEN 1 ELSE 0 END AS ka,
             CASE WHEN COALESCE(
                    CASE WHEN r.dup_gram_frac > {DUP_FRAC_MAX}
                           OR r.top_gram_frac > {TOP_FRAC_MAX}
                         THEN 1 ELSE 0 END, 0) = 0
                  THEN 1 ELSE 0 END AS kb
      FROM qual q LEFT JOIN rep r ON r.doc_id = q.doc_id
    ),
    cm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ka * kb) AS BIGINT) AS a,
             CAST(SUM(ka * (1 - kb)) AS BIGINT) AS b,
             CAST(SUM((1 - ka) * kb) AS BIGINT) AS c,
             CAST(SUM((1 - ka) * (1 - kb)) AS BIGINT) AS d
      FROM gates
    )
    SELECT n AS n_docs, a AS n_both_keep, b AS n_quality_only,
           c AS n_rep_only, d AS n_both_drop,
           CAST({_KAPPA_SQL.format(div="//")} AS BIGINT) AS kappa_permille,
           CAST(CASE WHEN a + b + c = 0 THEN NULL
                ELSE (1000 * a) // (a + b + c) END AS BIGINT)
             AS keep_jaccard_permille
    FROM cm
    """,
)
def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement between the quality gate (score ≥ QUAL_CUT) and the
    repetition gate (NOT Gopher-flagged; docs too short to produce
    grams count as unflagged — the LEFT JOIN COALESCE states it):
    2×2 confusion counts, Cohen's kappa, and the Jaccard of the two
    kept sets, all exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    ka = quality_scores(docs).select(
        "doc_id",
        F.when(F.col("quality_score") >= QUAL_CUT, 1)
        .otherwise(0)
        .cast("long")
        .alias("ka"),
    )
    kb = doc_repetition_stats(spark, sf_dir).select(
        "doc_id", (1 - F.col("flagged")).cast("long").alias("kb")
    )
    gates = ka.join(kb, "doc_id", "left").select(
        "ka", F.coalesce("kb", F.lit(1)).alias("kb")
    )
    cm = gates.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ka") * F.col("kb")).cast("long").alias("a"),
        F.sum(F.col("ka") * (1 - F.col("kb"))).cast("long").alias("b"),
        F.sum((1 - F.col("ka")) * F.col("kb")).cast("long").alias("c"),
        F.sum((1 - F.col("ka")) * (1 - F.col("kb"))).cast("long").alias("d"),
    )
    return cm.selectExpr(
        "n AS n_docs",
        "a AS n_both_keep",
        "b AS n_quality_only",
        "c AS n_rep_only",
        "d AS n_both_drop",
        f"CAST({_KAPPA_SQL.format(div='div')} AS BIGINT) AS kappa_permille",
        "CAST(CASE WHEN a + b + c = 0 THEN NULL"
        " ELSE (1000 * a) div (a + b + c) END AS BIGINT)"
        " AS keep_jaccard_permille",
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH {lang_pred_cte()}
    SELECT labeled_lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY labeled_lang, lang_pred
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled-vs-predicted language confusion matrix — the
    per-cell view behind the scalar kappa, |langs|·(|langs|+1) rows
    at most regardless of corpus size."""
    return (
        lang_id_heuristic(spark, sf_dir)
        .groupBy("labeled_lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@query(
    "lang_agreement_kappa",
    oracle=f"""
    WITH {lang_pred_cte()},
    cm AS (
      SELECT labeled_lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS c
      FROM pred GROUP BY labeled_lang, lang_pred
    ),
    marg AS (
      SELECT
        (SELECT CAST(SUM(c) AS BIGINT) FROM cm) AS n,
        (SELECT CAST(SUM(c) AS BIGINT) FROM cm
          WHERE labeled_lang = lang_pred) AS diag,
        (SELECT CAST(SUM(r.rc * p.pc) AS BIGINT) FROM
          (SELECT labeled_lang AS l, SUM(c) AS rc FROM cm GROUP BY 1) r
          JOIN
          (SELECT lang_pred AS l, SUM(c) AS pc FROM cm GROUP BY 1) p
          ON p.l = r.l) AS pe_num
    )
    SELECT n AS n_docs, diag AS n_agree,
           CAST(CASE WHEN n = 0 THEN NULL ELSE (1000 * diag) // n END
             AS BIGINT) AS agree_permille,
           CAST(CASE WHEN n*n - pe_num = 0 THEN NULL
                ELSE (1000 * (n*diag - pe_num)) // (n*n - pe_num) END
             AS BIGINT) AS kappa_permille
    FROM marg
    """,
)
def lang_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class Cohen's kappa between the recorded language label
    and the heuristic labeler: po from the confusion diagonal, pe
    from the row×column marginal products — a join over the
    dimension-sized matrix, never the corpus. Languages missing from
    one side contribute zero to pe exactly as the inner marginal
    join states."""
    cm = (
        lang_id_heuristic(spark, sf_dir)
        .groupBy("labeled_lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    totals = cm.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("labeled_lang") == F.col("lang_pred"), F.col("c")))
        .cast("long")
        .alias("diag"),
    )
    rows = cm.groupBy(F.col("labeled_lang").alias("l")).agg(
        F.sum("c").cast("long").alias("rc")
    )
    cols = cm.groupBy(F.col("lang_pred").alias("l")).agg(
        F.sum("c").cast("long").alias("pc")
    )
    pe = (
        rows.join(cols, "l")
        .agg(F.sum(F.col("rc") * F.col("pc")).cast("long").alias("pe_num"))
    )
    return (
        totals.crossJoin(F.broadcast(pe))
        .selectExpr(
            "n AS n_docs",
            "diag AS n_agree",
            "CAST(CASE WHEN n = 0 THEN NULL ELSE (1000 * diag) div n END"
            " AS BIGINT) AS agree_permille",
            "CAST(CASE WHEN n*n - pe_num = 0 THEN NULL"
            " ELSE (1000 * (n*diag - pe_num)) div (n*n - pe_num) END"
            " AS BIGINT) AS kappa_permille",
        )
    )
