"""Plan inspection helpers — the engine's `.explain` discipline.

Correctness is gated by the DuckDB oracle; THESE checks gate the plan
shape: filters must reach the parquet scan (PushedFilters), scans must
prune columns (ReadSchema), dimension joins must broadcast, and
aggregates must have a map-side partial phase. tests/test_plans.py
asserts these properties for the headline queries so a regression in
plan quality fails CI just like a wrong answer would.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Return the explain output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()
