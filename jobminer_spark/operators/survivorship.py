"""Golden-record survivorship: field-level merge rules over duplicate
clusters — the step AFTER entity resolution that every master-data /
training-data consolidation pipeline runs (entityres.py finds which
records are the same entity; this decides which VALUES survive).

The reference's probe-before-insert lifecycle keeps the FIRST row per
key (first-write-wins, database.py:106-158). Real consolidation is
field-wise: each attribute has its own survivorship rule. Three
canonical rules, each exercised on its natural column and each with a
stated total-order tie-break so the survivor is unique and
replay-stable:

* **longest-string** (name): max on (length, value) — ties break to
  the lexicographically LAST value (the struct max's natural order).
* **latest-wins** (balance): value carried by the member with the
  highest recency key (c_custkey stands in for an updated_at — the
  fixture has no timestamps on customers).
* **majority-vote** (market segment): most frequent value; ties break
  to the lexicographically SMALLEST via min on (-count, value).

Clusters are c_custkey div 3 — synthetic "duplicate groups" of ~3
records each, deterministic and non-vacuous (every cluster has real
disagreement on every field, so each rule does real work at every SF).

Scale shape: two keyed aggregations on the cluster id (the struct-max
rules fold in ONE groupBy with map-side partial aggregation; majority
needs its own (cluster, value) count first) + one broadcast-eligible
join of two cluster-sized frames. No windows, no collected member
lists — per-cluster cost is O(members) inside the combiner regardless
of cluster size, so a pathological million-record entity cannot skew
a task the way a collect_list-based survivorship would.

Cross-engine recipe (the r10-proven argmax): Spark
``max(struct(k, v)).v`` ≡ DuckDB ``(MAX({'k': k, 'v': v})).v`` —
lexicographic struct ordering; DuckDB's arg_max rejects struct keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_MEMBERS_CTE = """
    members AS (
      SELECT c_custkey // 3 AS cluster,
             c_custkey,
             c_name,
             CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_q,
             c_mktsegment AS seg
      FROM customer
    )"""


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.expr("c_custkey div 3").alias("cluster"),
        "c_custkey",
        "c_name",
        F.floor(F.col("c_acctbal") * 100.0).cast("long").alias("bal_q"),
        F.col("c_mktsegment").alias("seg"),
    )


@query(
    "golden_record_survivorship",
    oracle=f"""
    WITH {_MEMBERS_CTE},
    base AS (
      SELECT cluster,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             (MAX({{'l': length(c_name), 'v': c_name}})).v AS name_surv,
             (MAX({{'k': c_custkey, 'v': bal_q}})).v AS bal_q_surv
      FROM members GROUP BY cluster
    ),
    seg_counts AS (
      SELECT cluster, seg, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM members GROUP BY cluster, seg
    ),
    seg_pick AS (
      SELECT cluster,
             (MIN({{'negcnt': -cnt, 'v': seg}})).v AS seg_surv
      FROM seg_counts GROUP BY cluster
    )
    SELECT b.cluster, b.n_members, b.name_surv, b.bal_q_surv, s.seg_surv
    FROM base b JOIN seg_pick s ON s.cluster = b.cluster
    """,
)
def golden_record_survivorship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One golden record per duplicate cluster, each field by its own
    survivorship rule (module docstring): longest-string name,
    latest-wins balance, majority-vote segment — all tie-broken
    totally, all recomputed independently by the oracle. Row-exact:
    every cluster's full golden record is in the result."""
    m = _members(spark, sf_dir)
    base = m.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(F.struct(F.length("c_name").alias("l"), F.col("c_name").alias("v")))["v"].alias(
            "name_surv"
        ),
        F.max(F.struct(F.col("c_custkey").alias("k"), F.col("bal_q").alias("v")))["v"].alias(
            "bal_q_surv"
        ),
    )
    seg_counts = m.groupBy("cluster", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    seg_pick = seg_counts.groupBy("cluster").agg(
        F.min(F.struct((-F.col("cnt")).alias("negcnt"), F.col("seg").alias("v")))["v"].alias(
            "seg_surv"
        )
    )
    return base.join(seg_pick, "cluster").select(
        "cluster", "n_members", "name_surv", "bal_q_surv", "seg_surv"
    )
