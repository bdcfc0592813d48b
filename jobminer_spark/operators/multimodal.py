"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside. The Spark-side plumbing — schema,
partitioning, Arrow batch shape, mapInPandas signature — is real and
tested; the actual codec decode is STUBBED deterministically (the
image/audio libraries are not in this container), clearly marked below.

Binary payloads here are synthesized from documents.text (encode →
bytes) so the metadata operators are oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type) — the canonical
    multimodal frame shape: opaque bytes + typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        "n_chars",
    )


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN doc_id % 3 = 0 THEN 'image/png'
             WHEN doc_id % 3 = 1 THEN 'audio/wav'
             ELSE 'video/mp4'
           END AS media_type,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary — byte length + content hash.
    All JVM built-ins; the binary column never leaves the executor."""
    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return b.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract via mapInPandas (Arrow-batched)
# ---------------------------------------------------------------------------

_DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("payload_bytes", T.LongType()),
])


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER — deterministic fake in place of a real codec.

    A production build would call PIL / torchaudio / pyav here on
    ``payload`` bytes, per Arrow batch. The container ships no media
    libraries, so dimensions derive deterministically from payload
    size; the Spark-side contract (Arrow batch in/out, schema,
    per-partition execution) is the real thing being exercised.
    """
    for pdf in batches:
        size = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": (size % 64 + 1).astype("int32"),
                "height": (size * 7 % 64 + 1).astype("int32"),
                "n_frames": (pdf["doc_id"] % 5 + 1).astype("int32"),
                "payload_bytes": size.astype("int64"),
            }
        )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH sized AS (SELECT doc_id, octet_length(encode(text)) AS size FROM documents)
    SELECT doc_id,
           CAST(size % 64 + 1 AS INTEGER) AS width,
           CAST(size * 7 % 64 + 1 AS INTEGER) AS height,
           CAST(doc_id % 5 + 1 AS INTEGER) AS n_frames,
           size AS payload_bytes
    FROM sized
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract through mapInPandas: Arrow batches of
    binary payloads in, typed feature rows out. The stub decoder is
    deterministic arithmetic, so the DuckDB oracle can verify that the
    distributed UDF plumbing (batching, schema, partitioning) is
    value-preserving."""
    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs).repartition(8, "doc_id")
    decoded = b.mapInPandas(_decode_batches, schema=_DECODED_SCHEMA)
    return decoded.select("doc_id", "width", "height", "n_frames", "payload_bytes")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 240 + 16 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, n_frames,
           CAST(unnest(range(0, n_frames, 8)) AS INTEGER) AS frame_no
    FROM vids
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: every 8th frame index per
    video becomes its own row (the unit a decode UDF would then
    process). The 1→N expansion is `explode(sequence(...))` — pure
    JVM, no Python — and the per-frame decode itself would slot in as
    the same mapInPandas stub as `multimodal_decode_features`. Frame
    counts derive deterministically from payload size (stub: no codec
    in this container) so the fan-out is oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    vids = with_binary_payload(docs).filter(F.col("media_type") == "video/mp4")
    n_frames = (F.octet_length("payload") % 240 + 16).cast("int")
    return (
        vids.select("doc_id", n_frames.alias("n_frames"))
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(8))
            ).alias("frame_no"),
        )
    )


_RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("src_width", T.IntegerType()),
    T.StructField("src_height", T.IntegerType()),
    T.StructField("dst_width", T.IntegerType()),
    T.StructField("dst_height", T.IntegerType()),
    T.StructField("scale_num", T.LongType()),
])


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB RESIZER — a production build calls PIL.Image.resize per
    Arrow batch; the container has no PIL, so the geometry (aspect-
    preserving fit into 64×64, integer arithmetic) is computed
    deterministically from the stub source dimensions. The Spark-side
    contract — Arrow batch in/out, typed schema, per-partition
    execution — is what's actually exercised."""
    for pdf in batches:
        size = pdf["payload"].map(len)
        sw = (size % 640 + 1).astype("int64")
        sh = (size * 3 % 480 + 1).astype("int64")
        # aspect-preserving: scale = min(64/sw, 64/sh), in integer
        # arithmetic: dst = dim * 64 // max(sw, sh)
        m = pd.concat([sw, sh], axis=1).max(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_width": sw.astype("int32"),
                "src_height": sh.astype("int32"),
                "dst_width": (sw * 64 // m).astype("int32"),
                "dst_height": (sh * 64 // m).astype("int32"),
                "scale_num": m,
            }
        )


@query(
    "multimodal_resize_stub",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             octet_length(encode(text)) % 640 + 1 AS sw,
             octet_length(encode(text)) * 3 % 480 + 1 AS sh
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           CAST(sw AS INTEGER) AS src_width,
           CAST(sh AS INTEGER) AS src_height,
           CAST(sw * 64 // GREATEST(sw, sh) AS INTEGER) AS dst_width,
           CAST(sh * 64 // GREATEST(sw, sh) AS INTEGER) AS dst_height,
           GREATEST(sw, sh) AS scale_num
    FROM sized
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize through mapInPandas (aspect-preserving fit into
    64×64): integer-exact geometry on both engines so the distributed
    UDF plumbing is value-checkable; the pixel work is stubbed (no
    PIL in this container), clearly marked in `_resize_batches`."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = (
        with_binary_payload(docs)
        .filter(F.col("media_type") == "image/png")
        .repartition(8, "doc_id")
    )
    return imgs.mapInPandas(_resize_batches, schema=_RESIZED_SCHEMA)
