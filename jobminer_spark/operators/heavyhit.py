"""Two-pass heavy hitters (Misra-Gries candidates + exact recount) —
the frequent-items primitive a training-data pipeline runs over token
streams (vocabulary pruning, boilerplate-token discovery, skew
probes) when a full token groupBy is the thing to avoid.

Scale shape (the point of the operator): pass 1 never shuffles the
token stream — each partition folds its Arrow batches into a bounded
Misra-Gries summary (capacity K, merged per batch by the mergeable-
summaries rule: subtract the (K+1)-th largest count and drop
non-positives) and emits its <=K (token, residual) rows plus one
NULL-token row carrying the exact partition count. The per-partition
summaries are then merged DISTRIBUTED: one narrow
``groupBy(token).sum`` over <= partitions x (K+1) rows (the
mergeable-summaries merge of Agarwal et al., PODS'12 — summed
residuals undercount truth by at most n/(K+1) total), and a top-K
prune of the merged residuals. Because every token with global count
> n/K has merged residual > 0 and strictly exceeds the (K+1)-th
largest merged residual, the <=K-row pruned frame is a provable
SUPERSET of the true heavy hitters. Pass 2 — an exact recount gated
by a BROADCAST LEFT-SEMI join on that <=K-row candidate frame —
cannot miss a true heavy hitter; it only discards false positives.
Nothing is ever collected to the driver and no IN-list literal enters
the plan, so the shape survives 10^5-10^6 input splits: total shuffle
is the bounded sketch rows plus the candidate-restricted partial
counts, never the corpus and never a driver-sized candidate list.
(The r17 shape collected the candidate union and planned an INSET
literal — partitions x K strings of driver memory and plan size at
the 100 TB target; this merge replaces it, VERDICT r17 item 2.)

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
    """Pass 1: per-partition Misra-Gries(k) summaries as
    (token, weight) rows — each candidate token with its RESIDUAL
    count (what the distributed merge sums), plus one NULL-token row
    per partition carrying the exact partition row count (so the
    global total needs no extra corpus scan). One Arrow-batched fold
    per partition, vectorized per batch via value_counts, capacity
    enforced by the mergeable-summaries subtract-and-prune."""

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
        # the sentinel's weight is NEGATED: downstream, the candidate
        # and total branches split on the SIGN of the aggregated sum
        # (candidate residuals are strictly positive) rather than on
        # token IS NULL — a predicate on the grouping key would be
        # pushed below the merge aggregate and break exchange reuse,
        # costing a third corpus scan (see heavy_hitters)
        yield pd.DataFrame(
            {
                "token": pd.Series(
                    list(counters) + [None], dtype="object"
                ),
                "weight": pd.Series(
                    list(counters.values()) + [-n_rows], dtype="int64"
                ),
            }
        )

    return tokens.mapInPandas(_fold, "token string, weight long")


def heavy_hitters(
    tokens: DataFrame, k: int = _MG_K
) -> DataFrame:
    """Tokens with exact global count > floor(n/k), as ONE lazy plan:
    per-partition MG sketches -> distributed residual merge
    (groupBy.sum over <= partitions x (k+1) rows) -> top-k prune ->
    broadcast left-semi gate on the <=k-row candidate frame -> exact
    recount -> threshold via a 1-row broadcast of the exact total.
    TWO corpus scans (the merged-sketch exchange is reused between
    the candidate and total branches), zero full-vocabulary shuffles,
    zero driver-side candidate materialization."""
    merged = (
        mg_candidates(tokens, k)
        .groupBy("token")
        .agg(F.sum("weight").alias("w"))
    )
    # both branches below consume `merged` filtered on the AGGREGATED
    # sum's sign (candidate residuals are positive, the per-partition
    # count sentinels negative): a sign predicate cannot be pushed
    # below the aggregate, so the two branches share ONE identical
    # partial-agg + exchange subtree and the sketch's corpus scan
    # runs once (ReusedExchange — pinned in tests/test_plans.py)
    #
    # top-k prune of the merged summary (deterministic tie-break):
    # every global > n/k token strictly beats the (k+1)-th largest
    # merged residual (its residual >= true - n/(k+1) > n/k - n/(k+1)
    # > 0 while at most k tokens can exceed that bar), so the limit
    # keeps a superset of the true heavy hitters
    cand = (
        merged.where(F.col("w") > 0)
        .orderBy(F.col("w").desc(), F.col("token"))
        .limit(k)
        .select("token")
    )
    # the sentinel rows carry exact (negated) per-partition counts;
    # their negated sum is the exact corpus size (coalesce covers the
    # empty corpus)
    total = merged.where(F.col("w") <= 0).agg(
        F.coalesce(-F.sum("w"), F.lit(0)).cast("long").alias("n_total")
    )
    return (
        tokens.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.expr(f"n_total DIV {int(k)}"))
        .select("token", "cnt")
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
    corpus, found WITHOUT a full-vocabulary shuffle and WITHOUT a
    driver-side candidate list: per-partition Misra-Gries residual
    sketches merge through one bounded groupBy.sum + top-K prune
    into a provable superset, and a broadcast-semi-join-gated exact
    recount discards the false positives. The oracle is the exact
    HAVING query, so a sketch that dropped a true heavy hitter
    (violating the MG merge guarantee) or a recount that kept a
    light token both go red."""
    return heavy_hitters(_tokens(spark, sf_dir))
