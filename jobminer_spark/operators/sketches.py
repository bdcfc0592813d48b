"""Count-min sketch (Cormode/Muthukrishnan, "An Improved Data Stream
Summary: The Count-Min Sketch and its Applications", J. Algorithms
2005 — public paper): bounded-memory frequency estimation, audited
against exact counts the same way the HLL and quantile sketch audits
pin Spark's native sketches.

A CMS is a d×w counter grid; each item increments one counter per
row (row j uses hash_j), and a point estimate is the MIN over the d
counters — never an underestimate, overestimate bounded by
eps·N = (e/w)·N with probability 1 − (1/2)^d. Spark has no built-in
mergeable CMS column type readable cross-engine, so the grid is built
openly as (j, bucket, cnt) rows with the repo's md5 bucket recipe —
every counter is oracle-reproducible, which a binary sketch blob
would not be.

``cms_frequency_audit`` builds the grid over the token stream of the
documents corpus, probes EVERY distinct token (the fixture vocabulary
is 31 tokens; at scale you probe the candidate heavy hitters from a
per-partition pre-pass), and emits exact vs estimated counts with the
overcount — the never-negative guarantee is also pinned by a pytest
invariant, and the whole row set is oracle-hashed.

Scale shape: the grid build is one partial-aggregating shuffle whose
OUTPUT is ≤ d×w rows (a design constant, 4×512 here) no matter the
corpus size — the map side combines per partition, exactly how a
distributed CMS merges (counter-wise addition). Probes join the
broadcast grid. The exact counts exist only because this is an AUDIT;
the production path is grid + probes, corpus-size-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import bucket_sql, hash_bucket
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

CMS_D = 4     # hash rows
CMS_W = 512   # buckets per row


def _bucket(j: int, token) -> F.Column:
    """Row-j bucket for a token: the shared md5 recipe, salted by j."""
    return hash_bucket(F.concat(F.lit(f"cms{j}_"), token), CMS_W)


def _bucket_sql(j: int, token_sql: str) -> str:
    return bucket_sql(f"'cms{j}_' || {token_sql}", CMS_W)


def cms_grid(tokens: DataFrame, col: str = "token") -> DataFrame:
    """(j, bucket, cnt): the count-min grid over a token stream —
    one shuffle, ≤ CMS_D × CMS_W output rows by construction."""
    return (
        tokens.select(
            F.posexplode(
                F.array(*[_bucket(j, F.col(col)) for j in range(CMS_D)])
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(probes: DataFrame, grid: DataFrame, col: str = "token") -> DataFrame:
    """(token, est_n): min-over-rows point estimate for each probe
    key, against a broadcast grid. Buckets never seen stay absent
    from the grid; coalesce to 0 keeps the estimator total."""
    probe_rows = probes.select(
        col,
        F.posexplode(
            F.array(*[_bucket(j, F.col(col)) for j in range(CMS_D)])
        ).alias("j", "bucket"),
    )
    return (
        probe_rows.join(F.broadcast(grid), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_n"))
    )


@query(
    "cms_frequency_audit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    buckets AS (
      {" UNION ALL ".join(
          f"SELECT token, {j} AS j, {_bucket_sql(j, 'token')} AS bucket FROM tok"
          for j in range(CMS_D)
      )}
    ),
    grid AS (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM buckets GROUP BY j, bucket
    ),
    exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n FROM tok GROUP BY token
    ),
    pbuckets AS (
      {" UNION ALL ".join(
          f"SELECT token, {j} AS j, {_bucket_sql(j, 'token')} AS bucket FROM exact"
          for j in range(CMS_D)
      )}
    ),
    probe AS (
      SELECT p.token, CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) AS est_n
      FROM pbuckets p LEFT JOIN grid g ON g.j = p.j AND g.bucket = p.bucket
      GROUP BY p.token
    )
    SELECT e.token, e.exact_n, p.est_n, p.est_n - e.exact_n AS overcount
    FROM exact e JOIN probe p ON p.token = e.token
    """,
)
def cms_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs count-min token frequencies over the documents corpus,
    one row per distinct token — the oracle rebuilds the identical
    salted-md5 grid and re-probes it, so a drift in hashing, grid
    aggregation, or the min-estimator turns this red. ``overcount``
    is CMS's signed error; the >= 0 guarantee is pinned in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    )
    grid = cms_grid(tokens)
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = cms_estimate(exact.select("token"), grid)
    return exact.join(est, "token").select(
        "token",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )
