"""Data-layout engineering: Z-order (Morton curve) clustering and its
min-max pruning payoff, measured rather than claimed.

At 100 TB the scan you avoid is the cheapest scan: parquet row groups
carry min/max stats per column, and a reader skips a row group when
the predicate range is disjoint from the stats range. A single-column
sort gives perfect pruning on that column and NONE on any other; a
Z-ORDER sort (interleave the bits of both columns' rank spaces —
Morton 1966, the technique behind Delta/Iceberg `OPTIMIZE ZORDER`)
spreads locality across BOTH columns, so two-dimensional and
secondary-column predicates prune too.

``zorder_pruning_stats`` quantifies it: rows are rank-normalized on
(user_id, value), laid out once sorted by the x-rank and once by the
Morton code, split into equal row buckets (stand-ins for row groups),
and two probes are evaluated against each layout's per-bucket min/max
stats — a 2-D box probe and a y-only range probe. The output counts
the buckets a stats-pruning reader would still have to touch. The
expected shape (visible in the fixture numbers): the linear layout
touches ~1/8 of buckets for the box but ALL buckets for the y-only
probe; Z-order touches few buckets for both.

Determinism: ranks come from row_number with unique tiebreaks,
quantized to 12-bit levels with integer arithmetic; the Morton code
is exact bit interleaving; bucket assignment is integer division —
every number is identical cross-engine, so the pruning counts
hash-pin against the oracle.

Scale shape: two rank windows (global sorts — exactly what a layout
rewrite pays in production), one bucket aggregation per layout, and
O(n_buckets) probe arithmetic. This is an OFFLINE layout job by
construction; the payoff table is what it buys every subsequent scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

Z_BITS = 12       # rank quantization: 4096 levels per dimension
N_BUCKETS = 64    # row-group stand-ins
# probe box: the [1024, 1535] x [1024, 1535] cell (1/8 of each dim)
BOX_LO, BOX_HI = 1024, 1535


def _morton(x, y, bits: int = Z_BITS):
    """Interleave the low ``bits`` of x (even positions) and y (odd)."""
    terms = []
    for b in range(bits):
        xb = F.shiftright(x, b).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, b).bitwiseAND(F.lit(1))
        terms.append(
            F.shiftleft(xb, 2 * b) + F.shiftleft(yb, 2 * b + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _morton_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    return " + ".join(
        f"((({x} >> {b}) & 1) << {2 * b}) + ((({y} >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )


@query(
    "zorder_pruning_stats",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT event_id, user_id, value,
             ((ROW_NUMBER() OVER (ORDER BY user_id, event_id) - 1)
                   * {1 << Z_BITS}) // COUNT(*) OVER () AS xq,
             ((ROW_NUMBER() OVER (ORDER BY value, event_id) - 1)
                   * {1 << Z_BITS}) // COUNT(*) OVER () AS yq
      FROM events
    ),
    coded AS MATERIALIZED (
      SELECT xq, yq, {_morton_sql("xq", "yq")} AS zval,
             event_id
      FROM base
    ),
    lin AS (
      SELECT xq, yq,
             ((ROW_NUMBER() OVER (ORDER BY xq, event_id) - 1)
                   * {N_BUCKETS}) // COUNT(*) OVER () AS b
      FROM coded
    ),
    zrd AS (
      SELECT xq, yq,
             ((ROW_NUMBER() OVER (ORDER BY zval, event_id) - 1)
                   * {N_BUCKETS}) // COUNT(*) OVER () AS b
      FROM coded
    ),
    lin_stats AS (
      SELECT b, MIN(xq) AS xlo, MAX(xq) AS xhi, MIN(yq) AS ylo, MAX(yq) AS yhi
      FROM lin GROUP BY b
    ),
    z_stats AS (
      SELECT b, MIN(xq) AS xlo, MAX(xq) AS xhi, MIN(yq) AS ylo, MAX(yq) AS yhi
      FROM zrd GROUP BY b
    )
    SELECT
      CAST({N_BUCKETS} AS BIGINT) AS n_buckets,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lin_stats
       WHERE xhi >= {BOX_LO} AND xlo <= {BOX_HI}
         AND yhi >= {BOX_LO} AND ylo <= {BOX_HI}) AS box_linear,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM z_stats
       WHERE xhi >= {BOX_LO} AND xlo <= {BOX_HI}
         AND yhi >= {BOX_LO} AND ylo <= {BOX_HI}) AS box_zorder,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lin_stats
       WHERE yhi >= {BOX_LO} AND ylo <= {BOX_HI}) AS yonly_linear,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM z_stats
       WHERE yhi >= {BOX_LO} AND ylo <= {BOX_HI}) AS yonly_zorder
    """,
)
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buckets a min-max-pruning reader must touch under the linear
    vs Z-order layout, for a 2-D box probe and a secondary-column
    range probe — the oracle recomputes the identical ranks, Morton
    codes, bucket stats, and intersection tests."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n = F.count(F.lit(1)).over(W.partitionBy())
    base = ev.select(
        "event_id",
        # Two portability rules: (a) `div`, not `/` — double division
        # then cast truncates in Spark but CAST(double) ROUNDS in
        # DuckDB; (b) cast row_number to LONG BEFORE multiplying —
        # Spark's row_number is int, and int * 4096 overflows above
        # 2^31/4096 = 524k rows (ANSI: ArithmeticException; non-ANSI:
        # silent wrap), while DuckDB's ROW_NUMBER is already BIGINT.
        (
            (F.row_number().over(W.orderBy("user_id", "event_id")) - 1)
            .cast("long") * (1 << Z_BITS)
        ).alias("xr"),
        (
            (F.row_number().over(W.orderBy("value", "event_id")) - 1)
            .cast("long") * (1 << Z_BITS)
        ).alias("yr"),
        n.cast("long").alias("n_rows"),
    )
    base = base.select(
        "event_id",
        F.expr("xr div n_rows").alias("xq"),
        F.expr("yr div n_rows").alias("yq"),
    )
    coded = base.select(
        "event_id", "xq", "yq", _morton(F.col("xq"), F.col("yq")).alias("zval")
    )

    def bucket_stats(order_col: str) -> DataFrame:
        b = F.expr(
            f"(cast(row_number() over (order by {order_col}, event_id) - 1"
            f" as bigint) * {N_BUCKETS}) div count(*) over ()"
        )
        return (
            coded.select("xq", "yq", b.alias("b"))
            .groupBy("b")
            .agg(
                F.min("xq").alias("xlo"),
                F.max("xq").alias("xhi"),
                F.min("yq").alias("ylo"),
                F.max("yq").alias("yhi"),
            )
        )

    def probe_counts(stats: DataFrame, suffix: str) -> DataFrame:
        # both probes in ONE aggregation pass per layout — no reliance
        # on exchange reuse deduplicating the global-sort subtree
        y_cond = (F.col("yhi") >= BOX_LO) & (F.col("ylo") <= BOX_HI)
        box_cond = (
            y_cond & (F.col("xhi") >= BOX_LO) & (F.col("xlo") <= BOX_HI)
        )
        return stats.agg(
            F.count(F.when(box_cond, 1)).cast("long").alias(f"box_{suffix}"),
            F.count(F.when(y_cond, 1)).cast("long").alias(f"yonly_{suffix}"),
        )

    row = probe_counts(bucket_stats("xq"), "linear").crossJoin(
        probe_counts(bucket_stats("zval"), "zorder")
    )
    return row.select(
        F.lit(N_BUCKETS).cast("long").alias("n_buckets"),
        "box_linear",
        "box_zorder",
        "yonly_linear",
        "yonly_zorder",
    )
