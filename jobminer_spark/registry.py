"""Query registry: the single source of truth for the driver contract.

Every operator module registers its named queries (Spark side) and the
matching DuckDB oracle SQL here via the ``@query`` decorator.
``__spark_entry__.py`` simply re-exports these dicts.

Contract (BASELINE.md §B): each queries() callable takes
``(spark, sf_dir)`` and returns a DataFrame whose column names match the
oracle SQL's output column names exactly (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Registration order matters: the driver's CORRECTNESS artifact attests the
# first 50 registered queries only, in registration order.
#
# ROTATION PLAN (keeps the driver's hard signal fresh — every query
# re-attests within a bounded number of rounds, and any module modified
# in round N goes to the front of round N+1's window at the latest):
#
#   round 5 window (this order): audits(2, new r5) + trainprep(7, never
#     attested) + skills(6, changed since its r2 attestation) + tpch(21,
#     changed since r2; q21 never attested) + relational(first 14 of 17,
#     changed since r2) = 50.  Spilled: relational's last 3
#     (except_lapsed_customers, distinct_counts_per_status,
#     variance_stats_by_event_type — r1/r2-attested, unchanged
#     semantics) and everything r4-attested.
#   round 6 window: relational tail(3) first, then the modules modified
#     in r5 (scrapeshape, similarity, dedupe, skew, curation,
#     textanalysis) by last-attested age, then temporal/events/
#     multimodal; whatever exceeds 50 rolls to r7 along with
#     re-attesting audits/trainprep/skills/tpch.
#   invariant: local parity (tests/test_oracle_parity.py) and
#     scripts/driver_sim.py cover ALL queries every round regardless of
#     window position; the committed DRIVERSIM_r{N}.txt is the evidence
#     for queries outside the window.
#
# Helper modules (common, skills_core, data.skill_dictionary) are
# registration-free by contract so cross-module imports never reorder
# the window (see operators/common.py docstring).
_OPERATOR_MODULES = [
    "jobminer_spark.operators.audits",
    "jobminer_spark.operators.trainprep",
    "jobminer_spark.operators.skills",
    "jobminer_spark.operators.tpch",
    "jobminer_spark.operators.relational",
    "jobminer_spark.operators.temporal",
    "jobminer_spark.operators.events",
    "jobminer_spark.operators.multimodal",
    "jobminer_spark.operators.scrapeshape",
    "jobminer_spark.operators.skew",
    "jobminer_spark.operators.textanalysis",
    "jobminer_spark.operators.similarity",
    "jobminer_spark.operators.dedupe",
    "jobminer_spark.operators.curation",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator — the
    driver then records a weaker rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so their @query decorators run."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
