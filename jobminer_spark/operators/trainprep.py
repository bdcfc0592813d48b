"""Training-data preparation operators beyond curation.py's
split/pack/funnel: benchmark decontamination, context-window chunking,
per-source mixture sampling, quality-weighted upsampling, PII
redaction, and sketch-accuracy audits (HLL distinct, approx
quantiles).

The reference is a single-site scraper with none of these
(SURVEY.md §6's training-pipeline axis); each operator here is the
Spark-first shape a 100 TB dataset build needs:

- **decontamination** is the inverted-index join from dedupe.py
  specialized to an asymmetric pair (huge train corpus × small
  benchmark set): shingle both sides, equi-join on the shingle, never
  an all-pairs compare. The benchmark side is the small one by
  construction, so AQE broadcasts it when it fits.
- **chunking** / **upsampling** are per-row explode(sequence) fan-outs
  — embarrassingly parallel, no shuffle before the (tiny) report agg.
- **mixture sampling** reuses curation.py's deterministic md5 bucket
  so a doc's keep/drop decision is stable across runs, partitionings,
  and corpus growth — seeded rand() cannot give that.
- **sketch audits** pin the engine's approximate aggregates
  (approx_count_distinct, percentile_approx) against exact
  computations, the same bounded-error pattern as
  similarity.py's ann_ivf_recall_vs_bruteforce.

All randomness-free, all pure built-in columns (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.data.skill_dictionary import values_df
# helpers come from the query-free common module so importing this
# module does not register curation/dedupe queries ahead of its own
# (driver attests the first 50 registrations in order)
from jobminer_spark.operators.common import (
    DUP_FRAC_MAX,
    TOP_FRAC_MAX,
    bucket_sql as _bucket_sql,
    hash_bucket,
    repetition_cte,
    word_shingles,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram collision between the training
# corpus and a held-out benchmark set.
# ---------------------------------------------------------------------------

_BENCH_MOD = 13  # docs with doc_id % 13 == 0 stand in for the benchmark
_DECON_N = 8  # 8-gram collisions; production decontamination uses 8-13


@query(
    "benchmark_decontamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - {_DECON_N - 1}),
                      i -> array_to_string(t[i:i+{_DECON_N - 1}], ' '))) AS shingle
        FROM toks WHERE len(t) >= {_DECON_N})),
    bench AS (SELECT * FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT t.doc_id AS train_doc_id,
           COUNT(DISTINCT b.doc_id) AS n_bench_docs,
           COUNT(DISTINCT t.shingle) AS n_shingles_hit
    FROM train t JOIN bench b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    ORDER BY n_shingles_hit DESC, train_doc_id
    LIMIT 50
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing an 8-gram with the benchmark set — the
    eval-leak scan every dataset build runs before training. The plan
    is an equi-join on the shingle (inverted index), so cost scales
    with collisions, not |train| × |bench|; the benchmark side is tiny
    relative to the corpus (here ~8% of docs; in production a fixed
    eval suite), so no df cap is applied — decontamination cannot
    afford false negatives on hot shingles — and AQE broadcasts the
    bench side when it fits."""
    sh = word_shingles(load_table(spark, sf_dir, "documents"), _DECON_N)
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "shingle"
    )
    train = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(bench, "shingle")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(
            F.countDistinct("bench_doc_id").alias("n_bench_docs"),
            F.countDistinct("shingle").alias("n_shingles_hit"),
        )
        .orderBy(F.col("n_shingles_hit").desc(), "train_doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Context-window chunking: overlapping token windows per document.
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48
_CHUNK_SAMPLE_MOD = 20  # sampled docs keep the differential compact


@query(
    "document_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id % {_CHUNK_SAMPLE_MOD} = 0)
    SELECT doc_id,
           s // {_STRIDE} AS chunk_no,
           len(toks[s+1:s+{_CHUNK}]) AS n_tokens,
           md5(array_to_string(toks[s+1:s+{_CHUNK}], ' ')) AS chunk_md5
    FROM t, unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS u(s)
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping 64-token windows with a
    48-token stride (the standard context-window prep for training).
    Chunk starts come from explode(sequence(0, n-1, stride)) and the
    chunk itself is an in-row array slice — per-row fan-out with zero
    shuffle, so the operator scales with corpus size, not document
    count × document length². The md5 per chunk makes the differential
    prove byte-identical chunk content, not just counts."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _CHUNK_SAMPLE_MOD == 0
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    exploded = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice(F.col("toks"), F.col("s") + 1, _CHUNK)
    return exploded.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("long").alias("chunk_no"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Source-mixture sampling: per-source keep rates via the stable hash.
# ---------------------------------------------------------------------------

_MIX_RATES_BP = [10000, 5000, 2500, 1000]  # basis points, cycled over sources
_MIX = [(f"src{i}", _MIX_RATES_BP[i % 4]) for i in range(20)]


@query(
    "source_mixture_sampling",
    oracle=f"""
    WITH rates(source, rate_bp) AS (VALUES
      {", ".join(f"('{s}', {r})" for s, r in _MIX)}),
    keep AS (
      SELECT d.source, rate_bp, n_chars,
             ({_bucket_sql("doc_id", 10000)}) < rate_bp AS kept
      FROM documents d JOIN rates USING (source))
    SELECT source, rate_bp,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (kept) AS n_kept,
           CAST(COALESCE(SUM(n_chars) FILTER (kept), 0) AS BIGINT) AS kept_chars
    FROM keep GROUP BY source, rate_bp
    """,
)
def source_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample each source to its mixture weight (the web/wiki/code
    re-weighting step of a dataset build). Keep/drop is the
    deterministic md5 bucket vs the source's rate in basis points —
    per-row, shuffle-free, stable across runs and corpus growth, and
    exactly reproducible by the oracle (sampleBy/rand() is none of
    those). The rate table is a VALUES LocalRelation broadcast to the
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    rates = values_df(spark, _MIX, ["source", "rate_bp"])
    kept = F.col("_bucket") < F.col("rate_bp")
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("_bucket", hash_bucket(F.col("doc_id"), 10000))
        .groupBy("source", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0)).alias(
                "kept_chars"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Quality-weighted upsampling: repeat high-quality docs N times.
# ---------------------------------------------------------------------------


@query(
    "quality_weighted_upsample",
    oracle="""
    WITH weighted AS (
      SELECT source, doc_id,
             1 + 2 * CAST(n_chars >= 400 AS INT)
               + CAST(lang = 'en' AS INT) AS weight
      FROM documents),
    emitted AS (
      SELECT source, doc_id, weight
      FROM weighted, unnest(generate_series(1, weight)) AS u(copy_no))
    SELECT source, weight,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_rows
    FROM emitted GROUP BY source, weight
    """,
)
def quality_weighted_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch construction by quality tier: long docs count double, and
    English adds one more repeat (weights 1-4). The repeat is
    explode(sequence(1, weight)) — a per-row fan-out bounded by the
    max weight, no shuffle until the report aggregate. At 100 TB the
    emitted stream feeds the packer directly; weights bound output
    inflation to a known factor."""
    docs = load_table(spark, sf_dir, "documents")
    weight = (
        F.lit(1)
        + 2 * (F.col("n_chars") >= 400).cast("int")
        + (F.col("lang") == "en").cast("int")
    )
    emitted = docs.select(
        "source", "doc_id", weight.alias("weight")
    ).withColumn("copy_no", F.explode(F.sequence(F.lit(1), F.col("weight"))))
    return emitted.groupBy("source", "weight").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# PII redaction: regex scrub with per-row proof of identical output.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@query(
    "pii_redaction",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
      FROM documents WHERE doc_id % 20 = 0),
    red AS (
      SELECT doc_id, s,
             regexp_replace(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
      FROM synth)
    SELECT doc_id,
           len(regexp_extract_all(s, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(s, '{_PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(redacted, '{_EMAIL_RE}'))
             + len(regexp_extract_all(redacted, '{_PHONE_RE}')) AS n_residual,
           md5(redacted) AS redacted_md5
    FROM red
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails and phone numbers from document text. The fixture
    corpus contains no PII, so each sampled doc gets one synthetic
    email + phone appended (identically in both engines) before
    redaction — guaranteeing every row actually exercises the
    replacement. Counts come from regexp_count, the scrub from nested
    regexp_replace (both JVM-side, codegen'd; the patterns avoid
    constructs where Java regex and RE2 diverge), and the md5 of the
    redacted text proves byte-identical output, with n_residual == 0
    as the no-PII-left audit."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("s"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("s"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    red = synth.select("doc_id", "s", redacted.alias("redacted"))
    return red.select(
        "doc_id",
        F.regexp_count(F.col("s"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("s"), F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        (
            F.regexp_count(F.col("redacted"), F.lit(_EMAIL_RE))
            + F.regexp_count(F.col("redacted"), F.lit(_PHONE_RE))
        )
        .cast("long")
        .alias("n_residual"),
        F.md5("redacted").alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy audits: approximate aggregates vs exact.
# ---------------------------------------------------------------------------


@query(
    "hll_distinct_audit",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           COUNT(DISTINCT event_id) AS exact_events,
           TRUE AS users_within_bound,
           TRUE AS events_within_bound
    FROM events
    """,
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, default rsd=0.05) vs the
    exact distinct count, asserted within 3x the configured relative
    error — the monitoring query that lets 100 TB pipelines use the
    one-pass, mergeable, fixed-memory sketch for cardinality dashboards
    while pinning its accuracy in CI. The oracle states the exact
    counts and expects both bound flags TRUE (the sketch value itself
    is engine-internal, same protocol as the MinHash audit)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("event_id").alias("exact_events"),
        F.approx_count_distinct("event_id").alias("approx_events"),
    )
    def within(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.15
        )
    return agg.select(
        "exact_users",
        "exact_events",
        within("approx_users", "exact_users").alias("users_within_bound"),
        within("approx_events", "exact_events").alias("events_within_bound"),
    )


_QUANTILES = [0.5, 0.95, 0.99]


@query(
    "quantile_sketch_audit",
    oracle="""
    SELECT CAST(q AS DOUBLE) AS q, within_bound
    FROM (VALUES (0.5, TRUE), (0.95, TRUE), (0.99, TRUE))
      AS t(q, within_bound)
    """,
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch, accuracy=10000) vs
    the exact interpolated percentile over event values, each quantile
    asserted within 2% relative — the audit that justifies replacing
    the exact percentile (full sort per group) with the mergeable
    one-pass sketch in production rollups. Both aggregates run in the
    same single scan."""
    e = load_table(spark, sf_dir, "events")
    qs = F.array(*[F.lit(q) for q in _QUANTILES])
    agg = e.agg(
        F.percentile_approx("value", qs, F.lit(10000)).alias("approx"),
        F.percentile("value", qs).alias("exact"),
    )
    pairs = agg.select(
        F.explode(F.arrays_zip(F.array(*[F.lit(q) for q in _QUANTILES]).alias("q"),
                               F.col("approx").alias("a"),
                               F.col("exact").alias("x"))).alias("z")
    )
    return pairs.select(
        F.col("z.q").alias("q"),
        (
            F.abs(F.col("z.a") - F.col("z.x")) <= 0.02 * F.abs(F.col("z.x"))
        ).alias("within_bound"),
    )


@query(
    "pretraining_prep_funnel",
    oracle=f"""
    WITH {repetition_cte()},
    s1 AS (
      SELECT d.doc_id, d.source, d.lang, d.text
      FROM documents d LEFT JOIN rep r ON r.doc_id = d.doc_id
      WHERE r.doc_id IS NULL
         OR (r.dup_gram_frac <= {DUP_FRAC_MAX}
             AND r.top_gram_frac <= {TOP_FRAC_MAX})
    ),
    s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
    s3 AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM s2) WHERE rn = 1
    )
    SELECT i.source,
           i.n_input,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_after_repetition,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n_after_lang,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_after_dedup
    FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_input
          FROM documents GROUP BY source) i
    LEFT JOIN (SELECT source, COUNT(*) AS n FROM s1 GROUP BY source) a
      ON a.source = i.source
    LEFT JOIN (SELECT source, COUNT(*) AS n FROM s2 GROUP BY source) b
      ON b.source = i.source
    LEFT JOIN (SELECT source, COUNT(*) AS n FROM s3 GROUP BY source) c
      ON c.source = i.source
    """,
)
def pretraining_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end per-source survival report for the curation gates a
    pretraining prep run chains in practice: Gopher-style repetition
    filter (docquality.doc_repetition_stats; documents with no 2-grams
    pass — no evidence of repetition) → language keep-list →
    first-write-wins exact dedup on the content hash. Composes the
    individually-oracled operators into ONE funnel whose stage counts
    the oracle recomputes independently, so an integration regression
    (join key drift, gate order, null handling between stages) turns
    this row red even while each stage's own query stays green.

    Scale shape: ONE pass — stage membership is computed as boolean
    flags on a single frame (curation_funnel's one-scan pattern), so
    the expensive repetition aggregation runs once, not once per
    stage branch; the only additions are the md5 dedup window and the
    final per-source conditional counts."""
    from jobminer_spark.operators.docquality import doc_repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    rep = doc_repetition_stats(spark, sf_dir).select(
        "doc_id", "dup_gram_frac", "top_gram_frac"
    )
    p_rep = F.col("dup_gram_frac").isNull() | (
        (F.col("dup_gram_frac") <= DUP_FRAC_MAX)
        & (F.col("top_gram_frac") <= TOP_FRAC_MAX)
    )
    flags = (
        docs.join(rep, "doc_id", "left")
        .select("doc_id", "source", "lang", "text", p_rep.alias("p_rep"))
        .withColumn("p_lang", F.col("p_rep") & (F.col("lang") == "en"))
    )
    # rank each md5(text) group with survivors first: rn==1 is the
    # group's min-doc SURVIVOR iff the group has one, so the dedup
    # flag needs no separate filtered frame
    w = W.partitionBy(F.md5("text")).orderBy(F.col("p_lang").desc(), "doc_id")
    flags = flags.withColumn(
        "p_dedup", F.col("p_lang") & (F.row_number().over(w) == 1)
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("p_rep"), 1)).alias("n_after_repetition"),
        F.count(F.when(F.col("p_lang"), 1)).alias("n_after_lang"),
        F.count(F.when(F.col("p_dedup"), 1)).alias("n_after_dedup"),
    )


_TEMP_Q = 1_000_000  # sqrt quantization for exact cross-engine sums


@query(
    "temperature_mixture_rebalance",
    oracle=f"""
    WITH per AS MATERIALIZED (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(floor(sqrt(CAST(SUM(n_chars) AS DOUBLE)) * {_TEMP_Q})
                  AS BIGINT) AS wq
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(wq) AS BIGINT) AS wq_sum,
             CAST(SUM(n_docs) AS BIGINT) AS n_total
      FROM per
    ),
    rated AS MATERIALIZED (
      SELECT p.source, p.n_docs, p.total_chars,
             CAST(p.wq AS DOUBLE) / t.wq_sum AS share,
             CAST(least(10000, floor(
               10000.0 * (CAST(p.wq AS DOUBLE) / t.wq_sum)
                 * t.n_total / p.n_docs)) AS BIGINT) AS rate_bp
      FROM per p CROSS JOIN tot t
    )
    SELECT r.source, r.n_docs, r.total_chars, r.share, r.rate_bp,
           CAST(COUNT(CASE WHEN {_bucket_sql("d.doc_id", 10000)} < r.rate_bp
                           THEN 1 END) AS BIGINT) AS n_kept
    FROM rated r JOIN documents d ON d.source = r.source
    GROUP BY r.source, r.n_docs, r.total_chars, r.share, r.rate_bp
    """,
)
def temperature_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weights COMPUTED from corpus statistics instead of a
    hand-written rate table (the complement of source_mixture_sampling):
    temperature sampling at tau = 0.5 — source weight ∝ sqrt(source
    chars), the standard flattening that keeps big sources dominant but
    lifts the tail (multilingual/data-mixture practice, e.g. the
    sampling-temperature scheme of the mBERT/XLM-R line — public).

    Determinism: sqrt is IEEE-correctly-rounded (identical in both
    engines), then floor-quantized to a long; the weight SUM is exact
    integer arithmetic, so shares and basis-point rates are identical
    doubles cross-engine, and the keep decision reuses the stable md5
    bucket. rate_bp makes expected kept counts proportional to the
    temperature share (capped at 100%).

    Plan: one (source) aggregate (narrow — one row per source), a
    1-row total broadcast-cross-joined back, and one pass over the
    corpus for the kept counts — no corpus-sized shuffle beyond the
    per-source aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.floor(
            F.sqrt(F.sum("n_chars").cast("double")) * F.lit(_TEMP_Q)
        ).cast("long").alias("wq"),
    )
    tot = per.agg(
        F.sum("wq").alias("wq_sum"), F.sum("n_docs").alias("n_total")
    )
    rated = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.col("total_chars").cast("long").alias("total_chars"),
        (F.col("wq").cast("double") / F.col("wq_sum")).alias("share"),
        F.least(
            F.lit(10000),
            F.floor(
                F.lit(10000.0)
                * (F.col("wq").cast("double") / F.col("wq_sum"))
                * F.col("n_total")
                / F.col("n_docs")
            ),
        ).cast("long").alias("rate_bp"),
    )
    kept = (
        docs.select("source", hash_bucket(F.col("doc_id"), 10000).alias("_b"))
        .join(F.broadcast(rated.select("source", "rate_bp")), "source")
        .groupBy("source")
        .agg(F.count(F.when(F.col("_b") < F.col("rate_bp"), 1)).alias("n_kept"))
    )
    return rated.join(kept, "source").select(
        "source", "n_docs", "total_chars", "share", "rate_bp", "n_kept"
    )
