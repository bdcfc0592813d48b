"""Registry-wide oracle result-type guard (VERDICT r10 item 1b).

The r10 escape: DuckDB's ``SUM(BIGINT)`` returns HUGEINT (int128), the
driver's value hash is sensitive to the oracle-side type, and the local
sim compared Python-fetched ints — which erase the int128/int64
distinction — so exactly the three uncast-final-SUM oracles in the
attested window went red at the driver while green locally (3/3
correlation, zero false positives across the 47 greens; judged root
cause, VERDICT r10 preamble).

This test turns the whole class into a build-time red: every registered
oracle's DuckDB result types must stay inside the pinned vocabulary of
types proven driver-hash-compatible by green attested rows. Typing uses
DuckDB's relation binder only (no execution), so the sweep is cheap
enough to run on every pytest invocation.

Keep ALLOWED in sync with scripts/driver_sim.py's runtime twin.
"""

from __future__ import annotations

import pytest

from jobminer_spark import ORACLES, load_all_operators

# Proven driver-hash-compatible (each member appears in at least one
# hash-green attested driver row: VARCHAR/BIGINT/DOUBLE everywhere,
# INTEGER via tpch q7/q8/q9 + multimodal + bm25, BOOLEAN via dq).
# HUGEINT is proven INCOMPATIBLE — r10's entire red surface.
ALLOWED = {"VARCHAR", "BIGINT", "INTEGER", "DOUBLE", "BOOLEAN"}


def test_every_oracle_types_within_pinned_vocabulary(ddb):
    load_all_operators()
    assert ORACLES, "operator registry is empty"
    violations = []
    for name, sql in ORACLES.items():
        rel = ddb.sql(sql)
        for col, ty in zip(rel.columns, rel.types):
            if str(ty) not in ALLOWED:
                violations.append((name, col, str(ty)))
    assert not violations, (
        "oracle output types outside the pinned vocabulary (HUGEINT et "
        "al. break the driver's type-sensitive value hash even when "
        "Python-fetched values compare equal — cast the final aggregate, "
        f"e.g. CAST(SUM(x) AS BIGINT)): {violations}"
    )


def test_hugeint_guard_actually_fires(ddb):
    """Self-test: an uncast SUM(BIGINT) — the exact r10 escape shape —
    must be caught by the same typer the guard uses."""
    rel = ddb.sql("SELECT SUM(o_orderkey) AS s FROM orders")
    assert [str(t) for t in rel.types] == ["HUGEINT"]
    with pytest.raises(AssertionError):
        assert all(str(t) in ALLOWED for t in rel.types), "guard fired"
