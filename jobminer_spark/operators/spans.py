"""Exact shared-span detection across documents (the ExactSubstr
dedup direction of Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" — public paper; their implementation is
a suffix array, this is the relational formulation of the same
contract).

A shared token run of length >= L between two documents contains a
shared L-gram at every offset, and an L-gram match IS a shared run of
length >= L — so maximal shared runs are exactly the maximal chains
of consecutive L-gram matches. The relational shape:

1. (doc, pos, gram-hash) rows — winnow._gram_hashes reused at k = L;
2. cross-document matches: self-join on the hash, df-capped like the
   shingle index (a boilerplate gram shared by everything would
   otherwise fan out quadratically — the cap bounds it and is applied
   identically in the oracle);
3. diagonal islands: for a pair (a, b), matches at (pa, pb) and
   (pa+1, pb+1) continue one run, so grouping by the DIAGONAL
   (pa - pb) and chaining consecutive pa values (the classic
   pos - row_number() islands trick) yields maximal runs; a run of c
   consecutive matches is a shared span of c + L - 1 tokens.

Matching is on 60-bit md5-derived hashes (the same stance as the md5
exact-text dedup: collision probability ~2^-60 per pair is the
accepted trade at corpus scale; the oracle computes the identical
hashes so the differential is exact either way).

Scale shape: one (doc_id) window pass for grams, one inverted-index
style self-join bounded by the df cap, one (doc_a, doc_b, diag)
window for the islands — no all-pairs stage anywhere; span volume is
bounded by the match volume, which the cap bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.dedupe import SHINGLE_MAX_DF
from jobminer_spark.operators.winnow import _gram_hashes
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

SPAN_L = 8  # minimum shared token run

# Shared oracle CTE chain (tokens -> grams -> df cap -> matches ->
# diagonal islands) used by BOTH queries below so the span definition
# and the coverage decision built on it cannot drift (same discipline
# as embedlsh._bands_cte).
_SPAN_CTES = f"""    tokd AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_L}
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, i - 1 AS pos,
             CAST(concat('0x', substring(md5(
               array_to_string(toks[i : i + {SPAN_L} - 1], ' ')
             ), 1, 15)) AS BIGINT) AS h
      FROM tokd, LATERAL unnest(generate_series(1, len(toks) - {SPAN_L} + 1)) t(i)
    ),
    hot AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) > {SHINGLE_MAX_DF}),
    live AS MATERIALIZED (
      SELECT * FROM grams WHERE h NOT IN (SELECT h FROM hot)
    ),
    m AS MATERIALIZED (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
      FROM live x JOIN live y ON x.h = y.h AND x.doc_id < y.doc_id
    ),
    islands AS (
      SELECT doc_a, doc_b, pa, pb,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS isl
      FROM m
    )"""


def shared_spans(
    docs: DataFrame, min_len: int = SPAN_L, max_df: int = SHINGLE_MAX_DF
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_tokens) maximal shared
    token runs of length >= min_len (== L here: every chained match
    only lengthens the span)."""
    g = _gram_hashes(docs, k=min_len).select("doc_id", "pos", "h")
    # df cap on the gram hash — the hot-boilerplate guard
    hot = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    live = g.join(F.broadcast(hot), "h", "left_anti")
    a = live.select(
        "h", F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa")
    )
    b = live.select(
        "h", F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    m = a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b"))
    wl = W.partitionBy("doc_a", "doc_b", F.col("pa") - F.col("pb")).orderBy("pa")
    islands = m.withColumn(
        "isl", F.col("pa") - F.row_number().over(wl)
    )
    return (
        islands.groupBy("doc_a", "doc_b", F.col("pa") - F.col("pb"), "isl")
        .agg(
            F.min("pa").cast("long").alias("start_a"),
            F.min("pb").cast("long").alias("start_b"),
            (F.count(F.lit(1)) + min_len - 1).cast("long").alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


@query(
    "exact_shared_spans",
    oracle=f"""
    WITH {_SPAN_CTES}
    SELECT doc_a, doc_b,
           CAST(MIN(pa) AS BIGINT) AS start_a,
           CAST(MIN(pb) AS BIGINT) AS start_b,
           CAST(COUNT(*) + {SPAN_L} - 1 AS BIGINT) AS span_tokens
    FROM islands
    GROUP BY doc_a, doc_b, pa - pb, isl
    """,
)
def exact_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document shared token runs >= {SPAN_L} tokens —
    the oracle recomputes the identical grams, cap, matches, and
    diagonal islands, so a positional off-by-one, a broken island
    chain, or a cap drift turns this driver row red."""
    docs = load_table(spark, sf_dir, "documents")
    return shared_spans(docs)


SPAN_COVER_T = 0.5  # drop a doc when half its tokens are shared


def span_coverage(docs: DataFrame, min_len: int = SPAN_L) -> DataFrame:
    """(doc_id, n_tokens, covered_tokens, coverage) per document:
    covered = size of the UNION of this doc's shared-span intervals
    against LOWER-id partners only (the keep-first priority rule, same
    stance as semdedup) — overlapping spans must not double count, so
    intervals are merged with the classic running-max-end island pass
    (one more (doc_id) window, no new join class)."""
    from pyspark.sql import Window as W

    sp = shared_spans(docs, min_len)
    # shared_spans emits doc_a < doc_b, so doc_b is ALWAYS the
    # higher-id side — its intervals vs the (lower-id) partner are
    # exactly the ones the keep-first rule counts
    mine = sp.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_tokens") - 1).alias("e"),
    )
    wl = W.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(wl.rowsBetween(W.unboundedPreceding, -1))
    isl = (
        mine.withColumn(
            "new_isl",
            F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0),
        )
        .withColumn(
            "isl",
            F.sum("new_isl").over(wl.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "isl")
        .agg((F.max("e") - F.min("s") + 1).alias("cov"))
        .groupBy("doc_id")
        .agg(F.sum("cov").cast("long").alias("covered_tokens"))
    )
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return toks.join(isl, "doc_id").select(
        "doc_id",
        "n_tokens",
        "covered_tokens",
        (F.col("covered_tokens").cast("double") / F.col("n_tokens")).alias(
            "coverage"
        ),
    )


@query(
    "span_coverage_dedup",
    oracle=f"""
    WITH {_SPAN_CTES},
    spans AS MATERIALIZED (
      SELECT doc_a, doc_b,
             MIN(pa) AS start_a, MIN(pb) AS start_b,
             COUNT(*) + {SPAN_L} - 1 AS span_tokens
      FROM islands GROUP BY doc_a, doc_b, pa - pb, isl
    ),
    mine AS MATERIALIZED (
      -- spans always have doc_a < doc_b: doc_b is the higher-id side
      SELECT doc_b AS doc_id, start_b AS s,
             start_b + span_tokens - 1 AS e
      FROM spans
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM mine
    ),
    numbered AS (
      SELECT doc_id, s, e,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS isl
      FROM flagged
    ),
    per_isl AS (
      SELECT doc_id, isl, MAX(e) - MIN(s) + 1 AS cov
      FROM numbered GROUP BY doc_id, isl
    ),
    covered AS (
      SELECT doc_id, CAST(SUM(cov) AS BIGINT) AS covered_tokens
      FROM per_isl GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           c.covered_tokens,
           CAST(c.covered_tokens AS DOUBLE)
             / len(string_split(d.text, ' ')) AS coverage
    FROM documents d JOIN covered c ON c.doc_id = d.doc_id
    WHERE CAST(c.covered_tokens AS DOUBLE)
            / len(string_split(d.text, ' ')) >= {SPAN_COVER_T}
    """,
)
def span_coverage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents to DROP because >= half their tokens sit inside spans
    shared with lower-id documents — the document-level decision of
    ExactSubstr dedup (Lee et al. remove the repeated substrings
    themselves; at pretraining scale the common policy is doc-level
    removal above a coverage threshold — divergence documented). The
    oracle replays grams → matches → maximal spans → interval union →
    threshold, so a double-counted overlap or a priority-direction
    mistake turns this driver row red."""
    docs = load_table(spark, sf_dir, "documents")
    return span_coverage(docs).filter(F.col("coverage") >= SPAN_COVER_T)
