"""Shared column helpers used across operator modules.

Lives in its own module (NO @query registrations) so that importing it
never triggers another module's query registration: the driver's
CORRECTNESS artifact attests the first 50 registered queries in
registration order, and registration order must follow
``registry._OPERATOR_MODULES`` exactly — a helper import from a
query-bearing module would silently pull that module's queries to the
front of the window.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: Column) -> Column:
    """Order-independent sum of a double expression: exact decimal
    accumulation, double result."""
    return F.sum(expr.cast("decimal(38,6)")).cast("double")


def davg(expr: Column) -> Column:
    return dsum(expr) / F.count(F.lit(1))


def ts_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# ---------------------------------------------------------------------------
# Exact cross-engine cosine recipe: element products are quantized to
# 1e-15 longs (floor(x*y*1e15) — identical IEEE ops in both engines),
# summed exactly as integers (order-independent), and only then divided
# back in double. The Spark side is an in-row zip_with/aggregate fold
# (no explode, no shuffle); the DuckDB oracle reproduces it
# bit-for-bit via unnest+SUM.
# ---------------------------------------------------------------------------

QUANT = 1_000_000_000_000_000  # 1e15; 64 dims of unit-ish floats fits long

VEC_NORMS_CTE = f"""
    elems AS (
      SELECT vec_id, CAST(v AS DOUBLE) AS val, ord FROM (
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS ord
        FROM embeddings
      )
    ),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(floor(val * val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
                  / {QUANT}.0) AS nrm
      FROM elems GROUP BY vec_id
    )
"""


def qdot(a, b):
    """Quantized dot product accumulator: long-exact, order-free."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(float(QUANT))
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def norm_col(vec):
    return F.sqrt(qdot(vec, vec).cast("double") / F.lit(float(QUANT)))


def dot_col(a, b):
    return qdot(a, b).cast("double") / F.lit(float(QUANT))
