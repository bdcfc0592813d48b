"""Unigram surprisal scoring — an information-theoretic document
quality signal (high-surprisal docs carry rare vocabulary; low ones
are boilerplate), the log-scaled sibling of textanalysis's
word_rarity_score (which uses reciprocal df precisely because the
repo bans ln/log for cross-engine ulp safety).

The log ban is honored with an EXACT INTEGER log2 surrogate:

    floor(log2(x)) = length(bin(x)) - 1        for x >= 1

— the binary-string length is pure integer structure, identical in
Spark (``F.bin``) and DuckDB (``bin``), so per-token surprisal
``floor(log2(N div df))`` bits and its per-document sum hash-pin
with zero quantization machinery. (A true idf would divide before
the log; the div-then-floor-log2 surrogate is deliberately coarser —
1-bit granularity — in exchange for exactness, and ORDERS documents
the same way any idf-family score does.)

Scale shape: identical to word_rarity_score — one (doc_id, token)
distinct shuffle builds the exact df table, occurrences join it on
token (AQE picks broadcast when the vocabulary is small), the
per-doc sum is a combiner-friendly narrow agg, N is a broadcast
scalar. No UDFs, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "doc_surprisal_bits",
    oracle="""
    WITH occurrences AS (
      SELECT doc_id, lower(tok) AS token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM occurrences
      GROUP BY token
    ),
    n_total AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT o.doc_id,
             length(bin(t.n_docs // d.df)) - 1 AS bits
      FROM occurrences o
      JOIN df d ON o.token = d.token
      CROSS JOIN n_total t
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS surprisal_bits
    FROM scored GROUP BY doc_id
    """,
)
def doc_surprisal_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram surprisal: every token occurrence scores
    floor(log2(N/df)) bits against the corpus-exact document
    frequency; the doc's total and its occurrence count come back as
    integers (the mean is the consumer's one division)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.repartition("doc_id")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.lower(F.col("tok")).alias("token"))
    )
    df = occ.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        occ.join(df, "token")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("n_docs div df"))) - 1).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("bits").alias("surprisal_bits"),
    )
