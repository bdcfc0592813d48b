"""Custom stateful streaming + idempotent streaming sink.

Two upgrades over the reference's daily batch (SURVEY.md §2.7):

* ``running_user_totals`` — a custom stateful operator via
  applyInPandasWithState: per-user running aggregates that survive
  across micro-batches (the reference has no cross-run state at all;
  its "checkpoint system" is dedup-on-insert).
* ``foreach_batch_upsert`` — exactly-once-EFFECT sink: each
  micro-batch is anti-joined against the sink before append, which is
  the reference's probe-before-insert (database.py:116-123) made
  idempotent under replays; paired with checkpointLocation, a crashed
  and restarted stream re-delivers a batch and inserts nothing twice.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, total_value double"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals with explicit
    state — the applyInPandasWithState path for semantics Spark's
    built-in windows can't express (state is arbitrary Python, per
    key, Arrow-batched)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _read_sink_or_empty(
    spark: SparkSession, sink_path: str, template: DataFrame
) -> DataFrame:
    """Read the sink, treating ONLY sink-absent (AnalysisException:
    path does not exist) as empty. Any other read failure — corrupt
    footer, permission error, transient FS fault — must raise so the
    micro-batch fails and the checkpoint retries it; swallowing it
    would re-append the whole batch and silently break the
    exactly-once-effect guarantee."""
    try:
        return spark.read.parquet(sink_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "does not exist" in str(exc):
            return spark.createDataFrame([], template.schema)
        raise


def foreach_batch_upsert(
    stream_df: DataFrame,
    spark: SparkSession,
    sink_path: str,
    checkpoint_path: str,
    keys: list[str],
):
    """Idempotent streaming append: per micro-batch, drop in-batch dup
    keys, anti-join against the current sink, append only misses."""
    from jobminer_spark.operators.dedupe import upsert_new_keys

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_spark = batch_df.sparkSession
        existing = _read_sink_or_empty(batch_spark, sink_path, batch_df.select(*keys))
        fresh = upsert_new_keys(batch_df, existing.select(*keys), keys)
        fresh.write.mode("append").parquet(sink_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_merge(
    stream_df: DataFrame,
    spark: SparkSession,
    sink_path: str,
    checkpoint_path: str,
    keys: list[str],
    update_cols: list[str],
    expire_col: str | None = None,
    expire_value: str | None = None,
):
    """Streaming twin of ``operators.dedupe.merge_upsert``: each
    micro-batch MERGEs into the parquet sink (matched keys update
    `update_cols`, misses insert, optionally unseen keys expire).
    Idempotent under replay: re-merging an already-applied batch is a
    no-op, so checkpoint-driven re-delivery cannot double-apply.

    Plain parquet has no transactional MERGE, so the merged result is
    materialized (cache+count) before overwriting the sink — correct
    single-writer semantics at test scale; on a lakehouse table the
    same batch function body becomes ``MERGE INTO`` (Delta/Iceberg)
    with no rewrite."""
    from jobminer_spark.operators.dedupe import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_spark = batch_df.sparkSession
        existing = _read_sink_or_empty(batch_spark, sink_path, batch_df)
        merged = merge_upsert(
            existing,
            batch_df.dropDuplicates(keys),
            keys,
            update_cols,
            expire_col=expire_col,
            expire_value=expire_value,
        ).localCheckpoint(eager=True)  # truncate lineage: the plan must
        # never re-read sink_path after the overwrite below starts
        merged.write.mode("overwrite").parquet(sink_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"
FUNNEL_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("t1", T.LongType()),
    T.StructField("t2", T.LongType()),
    T.StructField("t3", T.LongType()),
])


def _update_funnel_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user strict-order funnel state machine (view -> later
    click -> later purchase), advanced per micro-batch. Events inside
    a batch are processed in (tus, event_id) order, so on an
    in-order stream the machine lands on exactly the batch kernel's
    earliest-qualifying anchors; -1 encodes "stage not reached" (the
    wrapper converts to NULL)."""
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    frames = list(batches)
    if frames:
        pdf = pd.concat(frames, ignore_index=True).sort_values(
            ["tus", "event_id"]
        )
        for tus, et in zip(pdf["tus"], pdf["event_type"]):
            tus = int(tus)
            if et == "view":
                if t1 < 0:
                    t1 = tus
            elif et == "click":
                if t1 >= 0 and t2 < 0 and tus > t1:
                    t2 = tus
            elif et == "purchase":
                if t2 >= 0 and t3 < 0 and tus > t2:
                    t3 = tus
    state.update((t1, t2, t3))
    yield pd.DataFrame(
        {"user_id": [key[0]], "t1": [t1], "t2": [t2], "t3": [t3]}
    )


def streaming_funnel_states(events: DataFrame) -> DataFrame:
    """Custom stateful sequence matching over a stream: per-user
    funnel anchors that survive across micro-batches — the
    MATCH_RECOGNIZE-shaped semantics Spark's built-in streaming
    aggregates can't express. ``events`` carries (user_id, event_id,
    tus, event_type).

    Contract notes:
    * The OUTPUT carries raw ``-1`` sentinels for "stage not
      reached"; callers wanting NULL semantics project them away
      (the registered ``stream_funnel_parity`` does exactly that).
    * Events are ordered (tus, event_id) only WITHIN a micro-batch;
      state never rewinds, so a late event arriving in a later batch
      with an earlier tus can anchor differently than the batch
      kernel. Replays that claim batch parity must therefore drain
      in-order input in a single micro-batch (the parity query pins
      this); an unbounded production stream would add an event-time
      guard/watermark upstream."""
    raw = events.groupBy("user_id").applyInPandasWithState(
        _update_funnel_state,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return raw
