"""Property-based checks (SURVEY.md §5 item 3) with hypothesis: the
salary parser must be total (never throw, int-or-null out, hourly
scaling bounded) over arbitrary garbage, and min<=max on range inputs.
Runs each property over ONE Spark job (batch the generated cases) to
keep the suite fast."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from jobminer_spark.functions.text import salary_max_col, salary_min_col

# accumulate generated cases, evaluate in one Spark pass per property
_settings = settings(max_examples=60, deadline=None)


def _parse_all(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    return (
        df.select(
            "id",
            salary_min_col(F.col("t")).alias("mn"),
            salary_max_col(F.col("t")).alias("mx"),
        )
        .orderBy("id")
        .collect()
    )


def test_salary_parser_total_on_garbage(spark):
    texts = []

    @_settings
    @given(st.text(max_size=40))
    def collect(t):
        texts.append(t)

    collect()
    rows = _parse_all(spark, texts)
    for r in rows:
        assert r.mn is None or isinstance(r.mn, int)
        assert r.mx is None or isinstance(r.mx, int)
        # min and max are parsed from the same branches: both or neither
        assert (r.mn is None) == (r.mx is None)


def test_salary_parser_range_orders_min_max(spark):
    cases = []

    @_settings
    @given(
        st.integers(min_value=0, max_value=500_000),
        st.integers(min_value=0, max_value=500_000),
    )
    def collect(lo, hi):
        cases.append((lo, hi))

    collect()
    texts = [f"{lo} – {hi} zł" for lo, hi in cases]
    rows = _parse_all(spark, texts)
    for r, (lo, hi) in zip(rows, cases):
        # the reference takes group1/group2 literally (no reordering)
        assert r.mn == lo and r.mx == hi
