"""Stateful streaming + idempotent sink behavior tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jobminer_spark.operators.relational import dsum
from jobminer_spark.sources import load_table
from jobminer_spark.streaming.stateful import (
    _read_sink_or_empty,
    foreach_batch_merge,
    foreach_batch_upsert,
    running_user_totals,
)
from jobminer_spark.streaming.windows import streaming_events_source
from tests.conftest import SF_DIR


def test_stateful_running_totals_match_batch(spark):
    """applyInPandasWithState totals over the bounded stream must equal
    the plain batch aggregation."""
    import uuid

    name = f"state_{uuid.uuid4().hex[:8]}"
    stream = running_user_totals(streaming_events_source(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per micro-batch; keep the final state
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table(name).orderBy("n_events").collect()
    }
    batch = {
        r.user_id: (r.n, r.tv)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, tv) in batch.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 1e-6


def test_foreach_batch_upsert_idempotent_across_restarts(spark):
    """Running the same availableNow stream twice (fresh checkpoint the
    second time, same sink) must not duplicate rows — the anti-join
    makes re-delivery harmless, which IS the reference's re-run
    semantics (README 'checkpoint system' = dedup-on-insert)."""
    tmp = tempfile.mkdtemp(prefix="sink_")
    sink, ckpt1, ckpt2 = f"{tmp}/sink", f"{tmp}/ckpt1", f"{tmp}/ckpt2"
    try:
        src = streaming_events_source(spark, SF_DIR)
        q1 = foreach_batch_upsert(src, spark, sink, ckpt1, ["event_id"])
        q1.awaitTermination()
        n1 = spark.read.parquet(sink).count()
        # second run: NEW checkpoint → full re-delivery of every file
        q2 = foreach_batch_upsert(src, spark, sink, ckpt2, ["event_id"])
        q2.awaitTermination()
        n2 = spark.read.parquet(sink).count()
        assert n1 > 0
        assert n2 == n1  # nothing inserted twice
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_corrupt_sink_read_raises_instead_of_duplicating(spark):
    """A sink that EXISTS but cannot be read must fail the micro-batch
    (so the checkpoint retries), not be treated as empty — treating it
    as empty would re-append the whole batch."""
    tmp = tempfile.mkdtemp(prefix="sink_")
    try:
        sink = f"{tmp}/sink"
        template = spark.range(1).select(F.col("id").alias("event_id"))
        # absent sink → empty frame, no error
        empty = _read_sink_or_empty(spark, sink, template)
        assert empty.count() == 0
        # corrupt sink (exists, bad parquet footer) → must raise
        import os

        os.makedirs(sink)
        with open(f"{sink}/part-00000.parquet", "wb") as f:
            f.write(b"this is not a parquet file")
        with pytest.raises(Exception):
            _read_sink_or_empty(spark, sink, template).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_foreach_batch_merge_idempotent_and_expires(spark):
    """MERGE twin: re-running the same bounded stream with a fresh
    checkpoint must leave the sink unchanged (idempotent re-delivery);
    a second stream carrying only half the keys must expire the rest."""
    tmp = tempfile.mkdtemp(prefix="merge_")
    sink = f"{tmp}/sink"
    try:
        events = load_table(spark, SF_DIR, "events").select(
            "event_id",
            F.lit("Active").alias("listing_status"),
            "value",
        )
        full_dir, half_dir = f"{tmp}/full", f"{tmp}/half"
        events.write.parquet(full_dir)
        events.filter(F.col("event_id") % 2 == 0).write.parquet(half_dir)
        schema = spark.read.parquet(full_dir).schema

        def run(src_dir: str, ckpt: str):
            src = spark.readStream.schema(schema).parquet(src_dir)
            q = foreach_batch_merge(
                src,
                spark,
                sink,
                f"{tmp}/{ckpt}",
                keys=["event_id"],
                update_cols=["listing_status"],
                expire_col="listing_status",
                expire_value="Expired",
            )
            q.awaitTermination()

        run(full_dir, "c1")
        first = {
            r.event_id: r.listing_status for r in spark.read.parquet(sink).collect()
        }
        assert first and set(first.values()) == {"Active"}
        run(full_dir, "c2")  # replay: same data, fresh checkpoint
        second = {
            r.event_id: r.listing_status for r in spark.read.parquet(sink).collect()
        }
        assert second == first
        run(half_dir, "c3")  # partial re-scrape: odd keys expire
        third = {
            r.event_id: r.listing_status for r in spark.read.parquet(sink).collect()
        }
        assert set(third) == set(first)  # no rows lost
        assert all(
            (s == "Active") == (k % 2 == 0) for k, s in third.items()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
