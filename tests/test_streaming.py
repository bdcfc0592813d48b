"""Structured Streaming ≡ batch: the watermarked streaming windows
must produce exactly the batch window aggregation (fixture data is
bounded and in-order, so the watermark drops nothing)."""

from __future__ import annotations

from jobminer_spark import QUERIES, load_all_operators
from jobminer_spark.streaming import (
    run_streaming_session_windows,
    run_streaming_tumbling_counts,
)
from tests.conftest import SF_DIR

load_all_operators()


def _as_dict(rows, keycols):
    return {tuple(getattr(r, c) for c in keycols): r for r in rows}


def test_streaming_tumbling_matches_batch(spark):
    stream_rows = run_streaming_tumbling_counts(spark, SF_DIR).collect()
    batch_rows = QUERIES["tumbling_window_hourly"](spark, SF_DIR).collect()
    s = _as_dict(stream_rows, ("window_start", "event_type"))
    b = _as_dict(batch_rows, ("window_start", "event_type"))
    assert set(s) == set(b)
    for k in s:
        assert s[k].n_events == b[k].n_events
        assert abs(s[k].total_value - b[k].total_value) < 1e-9


def test_streaming_sliding_matches_batch(spark):
    from jobminer_spark.streaming import run_streaming_sliding_counts

    stream_rows = run_streaming_sliding_counts(spark, SF_DIR).collect()
    batch_rows = QUERIES["sliding_window_1h_30m"](spark, SF_DIR).collect()
    s = _as_dict(stream_rows, ("window_start",))
    b = _as_dict(batch_rows, ("window_start",))
    assert set(s) == set(b)
    for k in s:
        assert s[k].n_events == b[k].n_events
        assert abs(s[k].total_value - b[k].total_value) < 1e-9


def test_streaming_session_windows_run(spark):
    rows = run_streaming_session_windows(spark, SF_DIR).collect()
    assert len(rows) > 0


def test_streaming_dedup_within_watermark_one_row_per_key(spark):
    """State-bounded streaming dedup: at most one row per
    (user_id, event_type); every key from the batch table appears."""
    from jobminer_spark.sources import load_table
    from jobminer_spark.streaming.windows import (
        run_streaming_dedup_within_watermark,
    )
    from tests.conftest import SF_DIR

    got = run_streaming_dedup_within_watermark(spark, SF_DIR)
    per_key = got.groupBy("user_id", "event_type").count().collect()
    assert per_key and all(r["count"] == 1 for r in per_key)
    batch_keys = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert len(per_key) == batch_keys


def test_streaming_interval_join_matches_batch(spark):
    """Stream-stream interval join under watermarks produces exactly
    the batch join's result on the bounded fixture."""
    from jobminer_spark.operators.temporal import (
        interval_join_clicks_before_purchase,
    )
    from jobminer_spark.streaming.windows import run_streaming_interval_join
    from tests.conftest import SF_DIR

    batch = {
        tuple(r) for r in interval_join_clicks_before_purchase(spark, SF_DIR).collect()
    }
    stream = {tuple(r) for r in run_streaming_interval_join(spark, SF_DIR).collect()}
    assert stream == batch and len(batch) > 0


def test_streaming_source_nanos_fixture_compat(spark, tmp_path):
    """The TIMESTAMP(NANOS) compat branch of streaming_events_source
    (older fixture generations) must land event-time in the right
    epoch and agree with the batch loader on the same file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobminer_spark.sources import load_table
    from jobminer_spark.streaming.windows import streaming_events_source

    base_ns = 1_700_000_000_000_000_000  # 2023-11-14 UTC
    n = 6
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base_ns + i * 600_000_000_000 for i in range(n)],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([i % 2 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(['{"k": 1}'] * n),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"), store_schema=False)

    batch = load_table(spark, str(tmp_path), "events").select("event_id", "ts")
    src = streaming_events_source(spark, str(tmp_path)).select("event_id", "ts")
    from jobminer_spark.streaming.windows import _run_to_memory

    stream = _run_to_memory(src, spark, output_mode="append")
    b = {r.event_id: r.ts for r in batch.collect()}
    s = {r.event_id: r.ts for r in stream.collect()}
    assert s == b and len(s) == n
    assert all(t.year == 2023 for t in s.values())


def test_streaming_source_conf_hygiene_and_probe_cache(spark):
    """A micros-generation fixture must leave session state untouched:
    the nanos probe is a pyarrow footer read (no legacy conf set, no
    Spark job) and is cached per path so repeated source constructions
    don't re-probe."""
    import os
    from unittest import mock

    from jobminer_spark.sources import parquet as pq_src
    from jobminer_spark.streaming.windows import streaming_events_source
    from tests.conftest import SF_DIR

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    path = os.path.join(SF_DIR, "events.parquet")
    pq_src._TS_NANOS_CACHE.pop(path, None)

    with mock.patch.object(
        pq_src.pq, "read_schema", wraps=pq_src.pq.read_schema
    ) as probe:
        streaming_events_source(spark, SF_DIR)
        streaming_events_source(spark, SF_DIR)
        assert probe.call_count == 1  # second call served from cache

    # the sf fixtures are timestamp[us]: the legacy conf must not be set
    assert spark.conf.get(key, None) is None
