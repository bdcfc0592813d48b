"""Training-data curation operators: deterministic train/val/test
splits, context-window sequence packing, and the staged quality funnel
with per-source quotas — the operations that turn a raw 100 TB crawl
into a training set, all pure built-in columns (no UDFs).

The reference has no equivalent (it is a single-site scraper); these
extend the engine along SURVEY.md §6's training-pipeline axis. Every
randomness-like decision is a deterministic content/key hash (md5-based
so the DuckDB oracle reproduces it bit-for-bit): re-running curation on
a grown corpus keeps every previously-assigned split/bucket stable —
the property that makes incremental dataset builds reproducible, which
seeded `rand()` cannot give across differently-partitioned runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import bucket_sql as _bucket_sql, hash_bucket
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


_TRAIN_PCT, _VAL_PCT = 80, 10  # remaining 10% = test


def split_assignment(key: Column) -> Column:
    """'train' / 'val' / 'test' from the deterministic hash bucket."""
    b = hash_bucket(key)
    return (
        F.when(b < _TRAIN_PCT, "train")
        .when(b < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
    )


@query(
    "train_val_test_split",
    oracle=f"""
    WITH assigned AS (
      SELECT source, n_chars,
             CASE WHEN {_bucket_sql('doc_id')} < {_TRAIN_PCT} THEN 'train'
                  WHEN {_bucket_sql('doc_id')} < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY source, split
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the key hash, reported
    per (source, split) — the stratification report a dataset build
    publishes. Assignment is per-row with no shuffle; only the tiny
    report aggregates. Any doc keeps its split forever, on any cluster
    layout, at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "n_chars", split_assignment(F.col("doc_id")).alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: fill fixed token-budget bins in key order.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512


@query(
    "sequence_packing_bins",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_PACK_BUDGET} AS BIGINT) AS bin_id
      FROM toks)
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin_id
    """,
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents fill ~512-token bins in
    doc_id order within each source (bin = exclusive-prefix-sum of
    token counts div budget — streaming first-fit; a bin may overflow
    by at most one document, which training-side truncation absorbs).

    One window pass partitioned by source: sources pack in parallel
    and no global order is imposed — the 100 TB shape (a global
    ORDER BY would serialize the corpus through one task; per-source,
    or per-(source, shard) for jumbo sources, keeps every partition
    independent)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    prefix = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(prefix), F.lit(0)) / _PACK_BUDGET
        ).alias("bin_id"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


# ---------------------------------------------------------------------------
# Curation funnel: staged filters + per-source quota, with survival
# counts per stage (the report every dataset build publishes).
# ---------------------------------------------------------------------------

_MIN_CHARS = 50
_MIN_TOKENS, _MAX_TOKENS = 10, 1000
_KEEP_LANG = "en"
_SOURCE_QUOTA = 10


@query(
    "curation_funnel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    flags AS (
      SELECT *,
             (n_chars >= {_MIN_CHARS}) AS p1,
             (n_chars >= {_MIN_CHARS}
              AND n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}) AS p2,
             (n_chars >= {_MIN_CHARS}
              AND n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
              AND lang = '{_KEEP_LANG}') AS p3
      FROM toks),
    quota AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM flags WHERE p3)
      WHERE rk <= {_SOURCE_QUOTA})
    SELECT * FROM (
      SELECT 0 AS stage_no, 'total' AS stage, COUNT(*) AS n_docs FROM flags
      UNION ALL
      SELECT 1, 'min_length', COUNT(*) FROM flags WHERE p1
      UNION ALL
      SELECT 2, 'token_range', COUNT(*) FROM flags WHERE p2
      UNION ALL
      SELECT 3, 'language', COUNT(*) FROM flags WHERE p3
      UNION ALL
      SELECT 4, 'source_quota', COUNT(*) FROM quota)
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival counts through the curation cascade: length floor →
    token-count band → language keep-list → per-source quota (top
    docs by length, deterministic tiebreak). Stages 1-3 are one scan
    with conditional aggregation (no per-stage passes); the quota
    stage is one window over the stage-3 survivors only — at 100 TB
    the row_number partitions by source, so no global sort and the
    heavily-filtered input keeps the window cheap."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    p1 = F.col("n_chars") >= _MIN_CHARS
    p2 = p1 & F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
    p3 = p2 & (F.col("lang") == _KEEP_LANG)
    flags = toks.select("doc_id", "source", "n_chars", p1.alias("p1"), p2.alias("p2"), p3.alias("p3"))
    stage_counts = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count(F.when(F.col("p1"), 1)).alias("n1"),
        F.count(F.when(F.col("p2"), 1)).alias("n2"),
        F.count(F.when(F.col("p3"), 1)).alias("n3"),
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    )
    n4 = (
        flags.filter(F.col("p3"))
        .select("doc_id", "source", "n_chars")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= _SOURCE_QUOTA)
        .agg(F.count(F.lit(1)).alias("n4"))
    )
    names = ["total", "min_length", "token_range", "language", "source_quota"]
    wide = stage_counts.crossJoin(F.broadcast(n4))  # 1x1 scalar join
    rows = [
        wide.select(
            F.lit(i).alias("stage_no"),
            F.lit(names[i]).alias("stage"),
            F.col(f"n{i}").alias("n_docs"),
        )
        for i in range(5)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_CHUNK_W = 16  # tokens per dedup chunk


@query(
    "repeated_chunk_dedup",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idxs AS (
      SELECT doc_id, w,
             unnest(range(0, CAST(ceil(len(w) / {_CHUNK_W}.0) AS BIGINT))) AS i
      FROM words WHERE len(w) >= 1
    ),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               w[(i * {_CHUNK_W} + 1):(i * {_CHUNK_W} + {_CHUNK_W})], ' '
             )) AS chunk_hash
      FROM idxs
    )
    SELECT chunk_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM chunks GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, chunk_hash LIMIT 50
    """,
)
def repeated_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup — the boilerplate/template detector a
    crawl-curation pipeline runs before document-level dedup: split
    each doc into fixed 16-token chunks, md5-fingerprint each chunk,
    and surface chunks repeated across >= 2 distinct documents (top 50
    by spread, hash tiebreak for a deterministic cut).

    Scale shape: chunking is in-row (sequence + slice, no explode of
    words), then ONE shuffle on the 16-byte chunk hash; the distinct-
    doc count uses the same exchange. Repeated-chunk output is
    corpus-bounded by the spread threshold, never |docs|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.ceil(F.size("w") / F.lit(float(_CHUNK_W))).cast("long")
    chunks = (
        docs.repartition("doc_id")
        .select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("w"), i * _CHUNK_W + 1, _CHUNK_W)
                    ),
                )
            ).alias("chunk"),
        )
    )
    rep = (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return rep.orderBy(F.col("n_docs").desc(), "chunk_hash").limit(50)


# Spread threshold for chunk REMOVAL: a chunk appearing in >= this
# many distinct documents is treated as boilerplate (C4/Gopher keep
# the analogous "line appears in multiple documents" rule; with the
# fixture's 16-token chunks, 2 is the only spread that exists).
_BOILER_MIN_DOCS = 2


@query(
    "boilerplate_chunk_removal",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idxs AS (
      SELECT doc_id, w,
             unnest(range(0, CAST(ceil(len(w) / {_CHUNK_W}.0) AS BIGINT))) AS i
      FROM words WHERE len(w) >= 1
    ),
    chunks AS (
      SELECT doc_id, i,
             array_to_string(
               w[(i * {_CHUNK_W} + 1):(i * {_CHUNK_W} + {_CHUNK_W})], ' '
             ) AS chunk
      FROM idxs
    ),
    spread AS (
      SELECT md5(chunk) AS chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
      FROM chunks GROUP BY md5(chunk)
    ),
    kept AS (
      SELECT c.doc_id, c.i, c.chunk
      FROM chunks c JOIN spread s ON s.chunk_hash = md5(c.chunk)
      WHERE s.n_docs < {_BOILER_MIN_DOCS}
    ),
    rebuilt AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY i) AS cleaned
      FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(ceil(len(w.w) / {_CHUNK_W}.0) AS BIGINT) AS n_chunks,
           COALESCE(r.n_kept, 0) AS n_kept,
           CAST(length(COALESCE(r.cleaned, '')) AS BIGINT) AS clean_chars,
           md5(COALESCE(r.cleaned, '')) AS clean_hash
    FROM words w LEFT JOIN rebuilt r ON r.doc_id = w.doc_id
    WHERE len(w.w) >= 1
    """,
)
def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL stage on top of repeated_chunk_dedup's detection —
    the C4-style "drop content shared across documents" rule: chunks
    whose hash appears in >= _BOILER_MIN_DOCS distinct documents are
    dropped, and each document's text is REBUILT from its surviving
    chunks in original order. Output per document: chunk counts before
    and after, plus the rebuilt text's length and md5 (the hash stands
    in for shipping the full text through the parity harness — any
    reconstruction drift, including chunk order, flips it).

    Scale shape: chunking is in-row; spread counting is ONE shuffle on
    the 16-byte chunk hash; the anti-join back to chunks reuses the
    same key (AQE picks broadcast when the boilerplate set is small —
    it is spread-threshold-bounded, never corpus-sized); the rebuild
    is one shuffle on doc_id. No step is pairwise or corpus²."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.ceil(F.size("w") / F.lit(float(_CHUNK_W))).cast("long")
    base = (
        docs.repartition("doc_id")
        .select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 1)
        .select("doc_id", "w", n_chunks.alias("n_chunks"))
    )
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_chunks") - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), i * _CHUNK_W + 1, _CHUNK_W)
                ),
            )
        ).alias("i", "chunk"),
    )
    boiler = (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .select("chunk_hash")
    )
    kept = chunks.join(
        boiler, F.md5(chunks.chunk) == boiler.chunk_hash, "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "chunk"))),
                lambda p: p["chunk"],
            ),
        ).alias("cleaned"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.length(F.coalesce("cleaned", F.lit(""))).cast("long").alias("clean_chars"),
        F.md5(F.coalesce("cleaned", F.lit(""))).alias("clean_hash"),
    )
