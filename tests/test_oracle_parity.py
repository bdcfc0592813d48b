"""Local mirror of the driver's DuckDB differential harness: every
oracle-backed query must match row count, column names, and values
(order-insensitive) between the Spark implementation and the oracle
SQL. Floats must match to 1e-9 relative — the implementations are
designed for bitwise-identical results (decimal accumulation, shared
IEEE op order), so any drift here is a bug, not noise.
"""

from __future__ import annotations

import math

import pytest

from jobminer_spark import ORACLES, QUERIES, load_all_operators
from tests.conftest import SF_DIR

load_all_operators()


def _canon(rows, columns):
    """Sort columns by name, then rows; stringify with float care."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                out.append(f"f:{v!r}")
            elif v is None:
                out.append("null")
            else:
                out.append(f"{type(v).__name__}:{v}")
        return tuple(out)

    return sorted(key(r) for r in rows)


def _values_match(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if va.startswith("f:") and vb.startswith("f:"):
                fa, fb = float(va[2:]), float(vb[2:])
                if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
                    continue
            return False
    return True


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ca = _canon(spark_rows, spark_cols)
    cb = _canon(duck_rows, duck_cols)
    assert _values_match(ca, cb), (
        f"{name}: value mismatch\nspark sample: {ca[:3]}\nduck sample: {cb[:3]}"
    )
