"""Edge semantics of the generic as-of join: ts-equality inclusion,
no-match NULL padding, per-key isolation. (Fixture-scale parity is
covered by test_oracle_parity for the registered temporal queries.)"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jobminer_spark.operators.temporal import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 200),
        ],
        "user_id long, ts timestamp, rv long",
    )
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 7),   # between right rows -> 100
            (1, _ts("2024-01-01T12:00:00"), 8),   # ts-equal -> inclusive, 101
            (2, _ts("2024-01-01T08:00:00"), 9),   # before any right row -> NULL
            (3, _ts("2024-01-01T09:30:00"), 10),  # key with no right rows -> NULL
        ],
        "user_id long, ts timestamp, lv long",
    )
    out = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out == {7: 100, 8: 101, 9: None, 10: None}


def test_asof_join_null_field_does_not_mix_right_rows(spark):
    """A NULL in one carried column of the matched right row must NOT
    fall through to an older right row's value: the output is exactly
    the latest right row, NULL fields included."""
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, "old"),
            (1, _ts("2024-01-01T12:00:00"), None, "new"),
        ],
        "user_id long, ts timestamp, rv long, tag string",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T13:00:00"), 7)],
        "user_id long, ts timestamp, lv long",
    )
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1
    # rv must be NULL (from the 12:00 row), not 100 from the 10:00 row
    assert rows[0]["asof_rv"] is None
    assert rows[0]["asof_tag"] == "new"


def test_asof_join_does_not_leak_across_keys(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1)], "user_id long, ts timestamp, rv long"
    )
    left = spark.createDataFrame(
        [(2, _ts("2024-01-02T00:00:00"), 5)], "user_id long, ts timestamp, lv long"
    )
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1 and rows[0]["asof_rv"] is None
