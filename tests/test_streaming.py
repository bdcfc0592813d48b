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
    """The production 10-minute-watermark session stream (the
    state-bounding claim): drains and matches the batch session count
    on this bounded in-order fixture, where the watermark drops
    nothing."""
    rows = run_streaming_session_windows(spark, SF_DIR).collect()
    assert len(rows) > 0
    batch_n = QUERIES["session_window_5m_gap"](spark, SF_DIR).count()
    assert len(rows) == batch_n


def test_streaming_session_parity_sides_agree(spark):
    """The parity replay (infinite watermark, epoch-long keys) must
    agree with the batch session kernel row-exactly — the pytest twin
    of the registered stream_session_parity driver row."""
    from jobminer_spark.operators.audits import session_parity_sides

    bs, ss, n_batches = session_parity_sides(spark, SF_DIR)
    b = {(r.user_id, r.session_start_us): r.b_sn for r in bs.collect()}
    s = {(r.user_id, r.session_start_us): r.s_sn for r in ss.collect()}
    assert b == s
    assert n_batches >= 1


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

    stream, n_batches = _run_to_memory(src, spark, output_mode="append")
    assert n_batches == 1
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


def test_streaming_admission_sequential_not_oneshot(spark, tmp_path):
    """The defining case of the sequential contract: B is a near-dup
    of A, A is a near-dup of existing E, but B is NOT a near-dup of E.
    Batch-by-batch: A is rejected (tainted by E) and never joins the
    corpus, so B — judged against {E} only — is admitted. A one-shot
    union dedup chains E-A-B into one tainted component and admits
    NOTHING. Both behaviors asserted so the divergence is pinned, not
    accidental."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from jobminer_spark.operators.increment import (
        admit_incoming,
        build_corpus_shingle_index,
    )
    from jobminer_spark.operators.streamadmit import run_streaming_admission

    s = " ".join(f"S{i}" for i in range(1, 11))           # S1..S10
    e_text = f"{s} x"
    a_text = f"{s} y"                                      # J(A,E)=8/10
    b_text = " ".join(f"S{i}" for i in range(2, 11)) + " y w"  # J(B,A)=8/10, J(B,E)=7/11
    existing = spark.createDataFrame([(1000, e_text)], "doc_id long, text string")
    a = spark.createDataFrame([(1, a_text)], "doc_id long, text string")
    b = spark.createDataFrame([(2, b_text)], "doc_id long, text string")

    work = str(tmp_path / "work")
    stream_dir = os.path.join(work, "incoming")
    os.makedirs(stream_dir)
    for i, batch in ((0, a), (1, b)):
        tmp = os.path.join(work, f"w{i}")
        batch.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stream_dir, f"{i:02d}_batch.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    index_v0 = os.path.join(work, "index_v0")
    build_corpus_shingle_index(existing, index_v0)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    admitted = run_streaming_admission(spark, stream, index_v0, work)
    rows = {(r.doc_id, r.batch_id) for r in admitted.collect()}
    assert rows == {(2, 1)}  # only B, in batch 1

    oneshot = admit_incoming(
        existing.unionByName(a).unionByName(b), F.col("doc_id") >= 1000
    )
    assert oneshot.count() == 0


def test_funnel_state_machine_survives_micro_batches():
    """The per-user funnel state machine must chain across
    micro-batches: a view+click in batch 1 and the purchase in batch
    2 complete the funnel, and a pre-view click in a later batch can
    never rewrite an anchored stage."""
    import pandas as pd

    from jobminer_spark.streaming.stateful import _update_funnel_state

    class _State:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    s = _State()
    b1 = pd.DataFrame(
        {"tus": [10, 20], "event_id": [1, 2], "event_type": ["view", "click"]}
    )
    list(_update_funnel_state((7,), iter([b1]), s))
    assert s.get == (10, 20, -1)
    b2 = pd.DataFrame(
        {"tus": [25, 30], "event_id": [3, 4], "event_type": ["click", "purchase"]}
    )
    out = list(_update_funnel_state((7,), iter([b2]), s))[0]
    assert (out.t1[0], out.t2[0], out.t3[0]) == (10, 20, 30)
    assert s.get == (10, 20, 30)


def test_transform_with_state_parity_when_protobuf_available(spark):
    """transformWithStateInPandas (Spark 4's newest stateful API —
    streaming/tws.py) pinned exactly against the batch aggregation.
    The state-server protocol needs protobuf, which this container
    lacks (pip unavailable offline; the worker crashes at bootstrap,
    diagnosed r10) — the test activates automatically on any
    environment that has it."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from jobminer_spark.sources import load_table
    from jobminer_spark.streaming.tws import VQ, running_totals_tws
    from jobminer_spark.streaming.windows import (
        _drained_once,
        streaming_events_source,
    )
    from tests.conftest import SF_DIR

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    drained = _drained_once(
        "tws_totals",
        spark,
        SF_DIR,
        lambda: running_totals_tws(streaming_events_source(spark, SF_DIR)),
        output_mode="update",
    )
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "vq_sum")
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("b_n"),
            F.sum(F.floor(F.col("value") * VQ).cast("long")).alias("b_vq"),
        )
    )
    j = batch.join(final, "user_id", "full_outer")
    bad = j.filter(
        ~F.col("b_n").eqNullSafe(F.col("n_events"))
        | ~F.col("b_vq").eqNullSafe(F.col("vq_sum"))
    ).count()
    assert bad == 0
