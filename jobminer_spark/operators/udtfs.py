"""Python UDTF surface (Spark 4 user-defined table functions).

The engine's standing rule is built-ins first — every production
operator in this repo is DataFrame/SQL expressions (SURVEY §2 row 37's
UDF surface is Arrow mapInPandas only). But the API surface a user
migrating custom logic needs includes the TABLE-function path: one row
in, many rows out, arbitrary Python per row, invoked via LATERAL join.
This module exercises it end to end — an Arrow-optimized UDTF that
re-implements the overlapping-chunk fan-out of
trainprep.document_chunking — and PINS it to the built-in twin: the
audit full-outer-joins the two outputs (md5 of chunk CONTENT included,
so byte drift counts) and the oracle recomputes the expected chunk
population independently, expecting zero mismatches.

Scale note (why the built-in stays the production path): the UDTF
pays Python workers + Arrow transfer per batch; the built-in
explode(sequence)+slice stays in whole-stage codegen. The UDTF here is
the API-surface pin, not a recommendation — same stance as the
multimodal decode stubs.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_CHUNK, _STRIDE = 64, 48      # must match trainprep.document_chunking
_SAMPLE_MOD = 20


def _make_chunk_udtf():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id: bigint, chunk_no: bigint, n_tokens: bigint, "
            "chunk_md5: string"
        ),
        useArrow=True,
    )
    class ChunkDocs:
        def eval(self, doc_id: int, text: str):
            import hashlib

            toks = text.split(" ")
            for chunk_no, s in enumerate(range(0, len(toks), _STRIDE)):
                chunk = toks[s : s + _CHUNK]
                yield (
                    doc_id,
                    chunk_no,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return ChunkDocs


def chunk_documents_udtf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_no, n_tokens, chunk_md5) via the Python UDTF +
    LATERAL join path."""
    name = f"chunk_docs_{uuid.uuid4().hex[:10]}"
    view = f"docs_{uuid.uuid4().hex[:10]}"
    spark.udtf.register(name, _make_chunk_udtf())
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.* FROM {view}, LATERAL {name}(doc_id, text) AS c"
    )


@query(
    "udtf_chunking_parity",
    oracle=f"""
    WITH tokd AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % {_SAMPLE_MOD} = 0
    )
    SELECT CAST(SUM((len(toks) - 1) // {_STRIDE} + 1) AS BIGINT) AS n_chunks,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM tokd
    """,
)
def udtf_chunking_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF path diffed row-exactly (chunk counts, token counts,
    content md5) against the whole-stage-codegen built-in twin; the
    oracle independently counts the expected chunk population and
    expects zero mismatches — a UDTF registration, lateral-join,
    Arrow-batching, or content regression turns this driver row red."""
    from jobminer_spark.operators.trainprep import document_chunking

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _SAMPLE_MOD == 0
    )
    u = chunk_documents_udtf(spark, docs).select(
        "doc_id",
        "chunk_no",
        F.col("n_tokens").alias("u_n"),
        F.col("chunk_md5").alias("u_md5"),
    )
    b = document_chunking(spark, sf_dir).select(
        "doc_id",
        "chunk_no",
        F.col("n_tokens").alias("b_n"),
        F.col("chunk_md5").alias("b_md5"),
    )
    j = u.join(b, ["doc_id", "chunk_no"], "full_outer")
    mismatch = (~F.col("u_n").eqNullSafe(F.col("b_n"))) | (
        ~F.col("u_md5").eqNullSafe(F.col("b_md5"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(mismatch, 1)).alias("n_mismatch"),
    )
