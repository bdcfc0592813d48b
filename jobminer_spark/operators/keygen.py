"""Surrogate-key generation at fact scale, driver-attested (VERDICT
r8 item 6).

``relational.surrogate_key_assignment`` is the dimension-sized demo
of the reference's IDENTITY(1,1) (database.py:55,81; SURVEY §2 row
24) — a global row_number over a single-partition sort. The
documented 100-TB answer is ``relational.zip_with_index_keys``:
``monotonically_increasing_id()`` encodes (partition_id << 33) +
per-partition counter with ZERO shuffle, trading contiguity for full
parallelism. That scale path had no driver row; this audit gives it
one by pinning every SQL-expressible invariant of the encoding:

* uniqueness: distinct ids == rows (the IDENTITY guarantee);
* per-partition density: within each id>>33 block, offsets are
  exactly 0..blockcount-1 (what "per-partition counter" means) —
  violations pinned to 0 without ever exposing the environment-
  dependent partition count or raw id values;
* propagation: joining the keyed frame back on the natural key
  preserves cardinality 1:1 — the reference's parent-id-to-child
  propagation (database.py:137-158) in miniature.

The oracle states each invariant as a recomputed constant over
lineitem, so it holds under ANY partitioning the driver's
environment produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# monotonically_increasing_id: low 33 bits are the per-partition
# record counter, upper bits the partition id.
_OFFSET_MASK = (1 << 33) - 1


def zip_with_index_block_stats(keyed: DataFrame, key: str = "surrogate_id") -> DataFrame:
    """Per-partition-block (min offset, max offset, count) of a
    monotonically_increasing_id column — the density evidence."""
    return (
        keyed.select(
            F.shiftrightunsigned(F.col(key), 33).alias("block"),
            (F.col(key).bitwiseAND(F.lit(_OFFSET_MASK))).alias("off"),
        )
        .groupBy("block")
        .agg(
            F.min("off").alias("min_off"),
            F.max("off").alias("max_off"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "zip_with_index_audit",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS n_rows,
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS n_distinct_ids,
      CAST(0 AS BIGINT) AS n_block_violations,
      (SELECT COUNT(*) FROM lineitem) AS n_child_rows
    """,
)
def zip_with_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant audit of the shuffle-free surrogate-key scale path:
    the distinct (l_orderkey, l_linenumber) parents get keyed (the
    synthetic fixture repeats the pair, so distinct-first is the
    parent-entity set), then every lineitem child row joins back to
    exactly one surrogate — cardinality must be preserved."""
    from jobminer_spark.operators.relational import zip_with_index_keys

    child_rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    base = child_rows.distinct()
    keyed = zip_with_index_keys(base)
    # one pass: uniqueness needs a distinct over ids; density needs a
    # per-block agg; both are narrow aggregations over the keyed frame
    keyed = keyed.localCheckpoint(eager=True)  # pin ids for the 3 probes
    counts = keyed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("surrogate_id").alias("n_distinct_ids"),
    )
    blocks = zip_with_index_block_stats(keyed)
    violations = blocks.agg(
        F.count(
            F.when(
                (F.col("min_off") != 0) | (F.col("max_off") != F.col("n") - 1),
                1,
            )
        ).alias("n_block_violations")
    )
    child = (
        child_rows.join(
            keyed, ["l_orderkey", "l_linenumber"], "inner"
        ).agg(F.count(F.lit(1)).alias("n_child_rows"))
    )
    return (
        counts.crossJoin(violations).crossJoin(child)  # three 1-row aggs
    )
