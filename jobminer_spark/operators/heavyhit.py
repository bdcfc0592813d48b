"""Two-pass heavy hitters (Misra-Gries candidates + exact recount) —
the frequent-items primitive a training-data pipeline runs over token
streams (vocabulary pruning, boilerplate-token discovery, skew
probes) when a full token groupBy is the thing to avoid.

Scale shape (the point of the operator): pass 1 never shuffles the
token stream — each partition folds its Arrow batches into a bounded
Misra-Gries summary (capacity K, merged per batch by the mergeable-
summaries rule: subtract the (K+1)-th largest count and drop
non-positives), and only the per-partition CANDIDATE sets (<=
partitions x K rows) leave the executors. The pigeonhole/mergeability
guarantee makes the union a SUPERSET of every token with global count
> n/K, so pass 2 — an exact count restricted by a broadcast semi-join
on the candidates — cannot miss a true heavy hitter; it only discards
false positives. Total shuffle: candidate names + their partial
counts, never the corpus.

Reference anchor: the reference engine (JobScraper/scraper.py) keeps
global tag-frequency counters; this is that counter at a scale where
the exact groupBy would be the bottleneck. Misra-Gries (1982) and the
mergeable-summaries merge (Agarwal et al., PODS'12) are public
algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# sketch capacity K: the threshold is n/K; candidates per partition
# are bounded by K regardless of vocabulary size
_MG_K = 200

_TOKS_CTE = """
    toks AS (
      SELECT lower(tok) AS token FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      )
    )"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .select(F.lower(F.col("tok")).alias("token"))
    )


def mg_candidates(tokens: DataFrame, k: int = _MG_K) -> DataFrame:
    """Pass 1: per-partition Misra-Gries(k) candidate tokens PLUS the
    partition row count (a NULL-token row per partition) — one
    Arrow-batched fold per partition, vectorized per batch via
    value_counts, capacity enforced by the mergeable-summaries
    subtract-and-prune. Carrying the count here saves the extra
    corpus scan a separate COUNT(*) would cost."""

    def _fold(iterator):
        import heapq

        import pandas as pd

        counters: dict[str, int] = {}
        n_rows = 0
        for pdf in iterator:
            n_rows += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                kth = heapq.nlargest(k + 1, counters.values())[-1]
                counters = {
                    t: c - kth for t, c in counters.items() if c > kth
                }
        yield pd.DataFrame(
            {
                "token": pd.Series(
                    list(counters) + [None], dtype="object"
                ),
                "n_part": pd.Series(
                    [0] * len(counters) + [n_rows], dtype="int64"
                ),
            }
        )

    return tokens.mapInPandas(_fold, "token string, n_part long")


def heavy_hitters(
    tokens: DataFrame, k: int = _MG_K
) -> DataFrame:
    """Tokens with exact global count > floor(n/k): MG candidates
    collected (BOUNDED by partitions x (k+1) rows — a dimension-sized
    collect, never corpus-sized), then an exact recount restricted by
    an In-predicate on the candidate names (pushes into the scan),
    filtered by the threshold the sketch pass already totaled — TWO
    corpus scans, zero full-vocabulary shuffles."""
    rows = mg_candidates(tokens, k).collect()
    total = sum(r.n_part for r in rows)
    cand_list = sorted(
        {r.token for r in rows if r.token is not None}
    )
    if not cand_list or total == 0:
        return tokens.select(
            "token", F.lit(0).cast("long").alias("cnt")
        ).limit(0)
    threshold = total // k
    return (
        tokens.filter(F.col("token").isin(cand_list))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") > threshold)
    )


@query(
    "heavy_hitters_two_pass",
    oracle=f"""
    WITH {_TOKS_CTE},
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY token
    HAVING COUNT(*) > (SELECT FLOOR(n / {_MG_K}) FROM tot)
    """,
)
def heavy_hitters_two_pass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every token with global count > n/200 over the documents
    corpus, found WITHOUT a full-vocabulary shuffle: per-partition
    Misra-Gries candidate sketches (bounded, mapInPandas) union into
    a provable superset, and a candidate-restricted exact recount
    discards the false positives. The oracle is the exact HAVING
    query, so a sketch that dropped a true heavy hitter (violating
    the MG guarantee) or a recount that kept a light token both go
    red."""
    return heavy_hitters(_tokens(spark, sf_dir))
