"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003 — public algorithm; the MOSS plagiarism-detection core).

Where the flat chunk fingerprinting of curation.repeated_chunk_dedup
keeps EVERY k-gram hash, winnowing keeps only each sliding window's
MINIMUM hash — compressing the fingerprint set by ~2/(w+1) while
keeping the paper's guarantee: any match of at least w + k - 1
consecutive tokens is caught by at least one shared fingerprint
(every window fully inside the match selects the same minimum in both
documents; pinned executable by
test_winnowing_guarantee_on_shared_run). Fingerprints here are the
distinct selected hash VALUES (the set used for document-level
matching; recording positions would only change the tie rule, not the
selected values).

Determinism: gram hashes are md5-derived 60-bit longs (the engine-free
common.hash_bucket recipe — a true rolling hash saves constant work
per gram but is not cross-engine reproducible), window minima are
integer comparisons, and the pair counts are exact — both queries
hash-pin against the oracle.

Scale shape: tokens explode to (doc, pos) rows, gram hashes are one
row-local md5 over lead()-assembled tokens, and the window minimum is
a single ordered window frame per document — ONE (doc_id) shuffle for
the whole selection, embarrassingly parallel across documents (the
same shape as the as-of join's carry-forward window). The selected
(fingerprint, doc) rows then take the same inverted-index shuffle +
df cap + in-row pair generation as the shingle dedup — candidate
volume bounded by C(df, 2) per surviving fingerprint, never
all-pairs. An in-row array-fold formulation was measured and
REJECTED: nested lambda transforms defeat Catalyst's common
subexpression elimination, re-inlining the gram array per window for
O(n³)-per-document work — the relational formulation is the fast one
here, not just the portable one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.dedupe import (
    SHINGLE_MAX_DF,
    pair_counts_from_doclists,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

WIN_K = 4   # tokens per gram
WIN_W = 5   # windows of consecutive gram hashes
# guarantee threshold: token runs >= WIN_K + WIN_W - 1 = 8 always match


def _gram_hashes(docs: DataFrame, k: int = WIN_K) -> DataFrame:
    """(doc_id, pos, h, n_grams): md5-derived 60-bit hash of the
    k-gram starting at 0-based token position pos."""
    from pyspark.sql import Window as W

    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.posexplode(toks).alias("pos", "tok"),
    )
    wl = W.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", j).over(wl) for j in range(1, k)]
    )
    return (
        t.withColumn("gram", gram)
        .filter(F.col("pos") <= F.col("n_toks") - k)
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
            (F.col("n_toks") - k + 1).alias("n_grams"),
        )
    )


def winnow_fingerprints(docs: DataFrame, k: int = WIN_K, w: int = WIN_W) -> DataFrame:
    """(doc_id, fp) — the document's DISTINCT winnowing fingerprints:
    per-window minima over the gram-hash sequence, windows fully
    inside the document. One (doc_id) window pass."""
    from pyspark.sql import Window as W

    g = _gram_hashes(docs, k)
    frame = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, w - 1)
    )
    return (
        g.withColumn("fp", F.min("h").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    min_shared: int = 1,
    max_df: int = SHINGLE_MAX_DF,
    k: int = WIN_K,
    w: int = WIN_W,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) for pairs sharing >= min_shared
    surviving fingerprints — the shingle-dedup inverted-index shape
    over the winnowed (i.e. ~2/(w+1)-compressed) index."""
    idx = (
        winnow_fingerprints(docs, k, w)
        .groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") <= max_df)
    )
    return (
        pair_counts_from_doclists(idx)
        .filter(F.col("n_inter") >= min_shared)
        .select("doc_a", "doc_b", F.col("n_inter").alias("n_shared"))
    )


_FP_CTE = f"""
    tokd AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= {WIN_K + WIN_W - 1}
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, i AS pos,
             CAST(concat('0x', substring(md5(
               array_to_string(toks[i : i + {WIN_K} - 1], ' ')
             ), 1, 15)) AS BIGINT) AS h
      FROM tokd, LATERAL unnest(generate_series(1, len(toks) - {WIN_K} + 1)) t(i)
    ),
    gcounts AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
    winmins AS MATERIALIZED (
      SELECT g.doc_id, g.pos, c.n_grams,
             MIN(h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                          ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING)
               AS fp
      FROM grams g JOIN gcounts c USING (doc_id)
    ),
    fps AS MATERIALIZED (
      SELECT DISTINCT doc_id, fp
      FROM winmins WHERE pos <= n_grams - {WIN_W} + 1
    )"""


@query(
    "winnowing_fingerprint_stats",
    oracle=f"""
    WITH {_FP_CTE},
    fpc AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(c.n_grams AS BIGINT) AS n_grams,
           CAST(c.n_grams - {WIN_W} + 1 AS BIGINT) AS n_windows,
           CAST(f.n_fp AS BIGINT) AS n_fingerprints,
           CAST(f.n_fp AS DOUBLE) / (c.n_grams - {WIN_W} + 1) AS density
    FROM gcounts c JOIN fpc f USING (doc_id)
    """,
)
def winnowing_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprint profile: gram count, window count,
    selected-set size, and density (the paper's expected density is
    2/(w+1) ≈ 0.33 at w=5 — visible in the fixture numbers). Documents
    shorter than k + w - 1 tokens produce no row (same contract as the
    oracle's length filter)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", (F.size(toks) - WIN_K + 1).cast("long").alias("n_grams")
    ).filter(F.size(toks) >= WIN_K + WIN_W - 1)
    fpc = (
        winnow_fingerprints(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fingerprints"))
    )
    return base.join(fpc, "doc_id").select(
        "doc_id",
        "n_grams",
        (F.col("n_grams") - WIN_W + 1).cast("long").alias("n_windows"),
        F.col("n_fingerprints").cast("long").alias("n_fingerprints"),
        (
            F.col("n_fingerprints").cast("double")
            / (F.col("n_grams") - WIN_W + 1)
        ).alias("density"),
    )


@query(
    "winnowing_candidate_pairs",
    oracle=f"""
    WITH {_FP_CTE},
    hot AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > {SHINGLE_MAX_DF}),
    live AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM live x JOIN live y ON x.fp = y.fp AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= 2 winnowing fingerprints — the
    compressed-index analogue of the shingle candidate pairs; the
    oracle recomputes the identical selection and counts."""
    docs = load_table(spark, sf_dir, "documents")
    return winnow_candidate_pairs(docs, min_shared=2)
