"""Stateful streaming + idempotent sink behavior tests."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from jobminer_spark.operators.relational import dsum
from jobminer_spark.sources import load_table
from jobminer_spark.streaming.stateful import foreach_batch_upsert, running_user_totals
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
