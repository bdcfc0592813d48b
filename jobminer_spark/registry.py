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
#   round 5 window: audits(2) + trainprep(7) + skills(6) + tpch(21) +
#     relational(first 14 of 17) = 50 — executed as planned, 50/50
#     green (CORRECTNESS_r05.json).
#   round 6 window (THIS round, the order below): _WINDOW_FRONT —
#     relational's r5-spilled tail (except_lapsed_customers,
#     distinct_counts_per_status, variance_stats_by_event_type) plus
#     the new stream_sink_parity audit — then the modules modified in
#     r5: scrapeshape(7, incl. the changed html_badge_parse_udf
#     company column), similarity(9, incl. never-attested
#     ann_ivf_kmeans_topk + kmeans_lloyd_clusters and the new
#     ann_ivf_trained_topk / ann_ivf_trained_recall), dedupe(15,
#     incl. the 6 never-attested r5 queries), skew(2, incl.
#     salted_join_equivalence), curation(4, incl.
#     repeated_chunk_dedup), textanalysis(9) = exactly 50.
#     Spilled to r7: temporal/events/multimodal (r4-attested,
#     unchanged) and re-attesting audits/trainprep/skills/tpch/
#     relational-head.
#   round 7 window (plan): the modules modified or created in r6 that
#     sit OUTSIDE r6's window go first — audits(5: stream_batch_parity
#     re-shaped, new stream_sink_parity + stream_stateful_parity +
#     stream_session_parity, kmeans_lloyd_audit gained obj_round2),
#     embedlsh(1), docquality(2), increment(2: admission +
#     contained_document_pairs), trainprep(8: gained
#     pretraining_prep_funnel) — then temporal/events/multimodal
#     (r4-attested), then re-attesting skills/tpch/relational-head by
#     age; the remainder rolls to r8. (The r6-modified scrapeshape/
#     similarity/dedupe/skew/curation/textanalysis attest IN r6's
#     window — the driver runs on round-end HEAD — so they carry no
#     r7 debt.)
#   invariant: local parity (tests/test_oracle_parity.py) and
#     scripts/driver_sim.py cover ALL queries every round regardless of
#     window position; the committed DRIVERSIM_r{N}.txt is the evidence
#     for queries outside the window.
#
# Helper modules (common, skills_core, data.skill_dictionary) are
# registration-free by contract so cross-module imports never reorder
# the window (see operators/common.py docstring). The final order is
# nevertheless made EXPLICIT below (_WINDOW_FRONT + per-module
# registration order in _OPERATOR_MODULES order, applied in
# load_all_operators) so an incidental import cascade can never
# silently rotate the window.
_OPERATOR_MODULES = [
    "jobminer_spark.operators.scrapeshape",
    "jobminer_spark.operators.similarity",
    "jobminer_spark.operators.dedupe",
    "jobminer_spark.operators.skew",
    "jobminer_spark.operators.curation",
    "jobminer_spark.operators.textanalysis",
    "jobminer_spark.operators.temporal",
    "jobminer_spark.operators.events",
    "jobminer_spark.operators.multimodal",
    "jobminer_spark.operators.audits",
    "jobminer_spark.operators.trainprep",
    "jobminer_spark.operators.skills",
    "jobminer_spark.operators.tpch",
    "jobminer_spark.operators.relational",
    # new in r6 — registered past the window by design; the rotation
    # invariant pulls r6-modified modules to the front of r7's window
    "jobminer_spark.operators.embedlsh",
    "jobminer_spark.operators.docquality",
    "jobminer_spark.operators.increment",
]

# Queries pulled to the very front of the window, ahead of their own
# module's position (r6: relational's r5-spilled tail, plus the new
# stream_sink_parity audit so the exactly-once sink path gets a hard
# driver row THIS round — temporal's last entry spills to r7 to make
# room; it is r4-attested and unchanged). The rest of each module
# follows at its module position, i.e. rolls past slot 50.
_WINDOW_FRONT = [
    "except_lapsed_customers",
    "distinct_counts_per_status",
    "variance_stats_by_event_type",
    "stream_sink_parity",
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
        _QUERY_MODULE[name] = fn.__module__
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_QUERY_MODULE: dict[str, str] = {}


def _apply_window_order() -> None:
    """Rebuild QUERIES/ORACLES in the explicit window order:
    _WINDOW_FRONT first, then per-module registration order following
    _OPERATOR_MODULES. Mutates the dicts IN PLACE (other modules hold
    references to them). Registration order from raw decorator
    execution can be perturbed by an import cascade; this makes the
    driver's first-50 window deterministic regardless."""
    front = [n for n in _WINDOW_FRONT if n in QUERIES]
    rank = {m: i for i, m in enumerate(_OPERATOR_MODULES)}
    rest = [n for n in QUERIES if n not in set(front)]
    # stable sort: per-module registration order preserved within a module
    rest.sort(key=lambda n: rank.get(_QUERY_MODULE.get(n, ""), len(rank)))
    order = front + rest
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


def load_all_operators() -> None:
    """Import every operator module so their @query decorators run,
    then apply the explicit attestation-window order."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _apply_window_order()
