"""Shared column helpers used across operator modules.

Lives in its own module (NO @query registrations) so that importing it
never triggers another module's query registration: the driver's
CORRECTNESS artifact attests the first 50 registered queries in
registration order, and registration order must follow
``registry._OPERATOR_MODULES`` exactly — a helper import from a
query-bearing module would silently pull that module's queries to the
front of the window.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: Column) -> Column:
    """Order-independent sum of a double expression: exact decimal
    accumulation, double result."""
    return F.sum(expr.cast("decimal(38,6)")).cast("double")


def davg(expr: Column) -> Column:
    return dsum(expr) / F.count(F.lit(1))


def ts_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def spread_scan(df):
    """Round-robin repartition a DEGENERATE input (fewer splits than
    the session's cores — the fixture's single-row-group parquet) so
    heavy downstream per-row work (e.g. wide decimal aggregation)
    parallelizes. A no-op whenever the input already yields at least
    one split per core — any real at-scale table — so the exchange
    exists only where the file LAYOUT, not the data size, bounds
    parallelism (guide §2.2: partitioning derived from the input, not
    a constant). Call AFTER scan-level filters so predicate pushdown
    stays on the scan. Only order-insensitive consumers (exact
    decimal/integer aggregation) may use this — round-robin changes
    row order."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# ---------------------------------------------------------------------------
# Exact cross-engine cosine recipe: element products are quantized to
# 1e-15 longs (floor(x*y*1e15) — identical IEEE ops in both engines),
# summed exactly as integers (order-independent), and only then divided
# back in double. The Spark side is an in-row zip_with/aggregate fold
# (no explode, no shuffle); the DuckDB oracle reproduces it
# bit-for-bit via unnest+SUM.
# ---------------------------------------------------------------------------

QUANT = 1_000_000_000_000_000  # 1e15; 64 dims of unit-ish floats fits long

# Fixture embedding dimensionality. Any oracle that hardcodes a
# subspace slicing (PQ) derives it from THIS constant, and the Spark
# side asserts the probed width equals it — so a fixture dim change
# fails loudly instead of surfacing as a silent parity red
# (r7 ADVICE item 3).
EMB_DIMS = 64

# The probe itself is cached per (session, source): parquet schemas
# carry no array length, so the width needs one 1-row job — but ONE
# per session, not one serialized ahead of every PQ/LSH query's real
# plan (VERDICT r9 item 4).
_DIM_PROBE_CACHE: dict[tuple[str, str], int | None] = {}


def probed_embedding_dims(emb) -> int | None:
    """Embedding width from the data (None for an empty corpus),
    cached per (SparkSession, analyzed-plan semantic hash) so repeated
    queries in a driver window pay a single probe job. The semantic
    hash distinguishes PROJECTIONS of the same source — a sliced
    embedding column must re-probe, not inherit the full width (a
    file-path key broke the divisibility guard, caught by
    test_pq_encoding_shape_and_guard)."""
    key = (
        emb.sparkSession.sparkContext.applicationId,
        emb._jdf.queryExecution().analyzed().semanticHash(),
    )
    if key not in _DIM_PROBE_CACHE:
        first = emb.select(F.size(F.col("embedding")).alias("d")).first()
        _DIM_PROBE_CACHE[key] = None if first is None else first["d"]
    return _DIM_PROBE_CACHE[key]

VEC_NORMS_CTE = f"""
    elems AS (
      SELECT vec_id, CAST(v AS DOUBLE) AS val, ord FROM (
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS ord
        FROM embeddings
      )
    ),
    norms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(floor(val * val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
                  / {QUANT}.0) AS nrm
      FROM elems GROUP BY vec_id
    )
"""


# ---------------------------------------------------------------------------
# Deterministic hash bucket: md5 hex -> first 8 nibbles -> int -> % n.
# Identical recipe on both engines (Spark conv(hex,16,10); DuckDB
# CAST('0x'||hex AS BIGINT)), uniform enough for split assignment, and
# embarrassingly parallel — no shuffle, no state, stable under retry.
# ---------------------------------------------------------------------------


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from any key column."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def bucket_sql(key_sql: str, n_buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket` for oracle strings."""
    return (
        f"CAST(concat('0x', substring(md5(CAST({key_sql} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {n_buckets}"
    )


def word_shingles(
    docs,
    n: int = 3,
    max_df: int | None = None,
    broadcast_hot: bool = True,
):
    """(doc_id, shingle) distinct word n-grams via array slicing —
    pure built-ins, stays in whole-stage codegen.

    With ``max_df`` set, shingles with document frequency above the cap
    are removed via an anti-join against the hot set. The hot set is
    bounded by |shingle occurrences| / max_df — with production caps
    (max_df >= 100) that is <=1% of distinct shingles, small enough to
    broadcast, and broadcasting matters: the groupBy already shuffles
    the shingle set once, and a non-broadcast anti-join would shuffle
    it a second time (measured ~15% slower end-to-end at sf0.1). An
    over-limit hot set fails loudly (Spark's broadcast size error), not
    silently wrong; for adversarial corpora where that bound is real,
    pass ``broadcast_hot=False`` to take the shuffle anti-join
    instead."""
    sh = ngram_rows_arrow(
        # spread_scan (r20): a single-row-group input would serialize
        # shingle generation, and a keyed repartition here is
        # AQE-coalescible by BYTES — a bad proxy for the Python-side
        # tokenize cost. Explicit round-robin only when splits <
        # cores; no-op at scale. A null text splits to a null array
        # the old size(w) >= n filter dropped — the explicit filter
        # keeps that contract.
        spread_scan(docs.filter(F.col("text").isNotNull())),
        n,
    ).distinct()
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(
            F.broadcast(hot) if broadcast_hot else hot, "shingle", "left_anti"
        )
    return sh


# ---------------------------------------------------------------------------
# K-means distance kernel (shared by similarity.py and audits.py):
# quantized squared L2 so assignment and objective are cross-engine
# deterministic integers.
# ---------------------------------------------------------------------------

KM_K = 8
KM_QUANT = 1_000_000_000_000.0  # 1e12 per-element quantization


# Gopher-style repetition-filter thresholds (~p90 of the fixture
# distribution). Live here (query-free module) so docquality's filter
# and trainprep's composite funnel share them in oracle strings
# without cross-importing query-bearing modules at decoration time.
DUP_FRAC_MAX = 0.12
TOP_FRAC_MAX = 0.06


def repetition_cte() -> str:
    """DuckDB CTEs computing per-document word-2-gram repetition
    stats, ending in ``rep`` (doc_id, n_grams, dup_gram_frac,
    top_gram_frac). Shared by docquality's filter oracle and
    trainprep's funnel oracle so the gram definition cannot silently
    drift between the operator and the pipeline that composes it."""
    return """
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM documents
    ),
    grams AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS g
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    ),
    gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
    rep AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
               / SUM(c) AS dup_gram_frac,
             CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_gram_frac
      FROM gc GROUP BY doc_id
    )
    """


def trained_cells_cte() -> str:
    """DuckDB CTEs recomputing similarity.lloyd_centroids(n_updates=1):
    ``seed`` (first K vectors), ``d0`` (round-1 quantized distances),
    ``a0`` (round-1 assignment), ``trained`` (exact decimal-mean
    centroids, double result cast through REAL to mirror the Spark
    side's float centroid storage). Requires the ``elems`` CTE from
    VEC_NORMS_CTE in scope. Lives in this query-free module so
    audits.py can embed it in an oracle string at decoration time
    without importing the query-bearing similarity module early."""
    return f"""
    seed AS (SELECT vec_id AS cid, ord, val AS cx FROM elems WHERE vec_id < {KM_K}),
    d0 AS (
      SELECT e.vec_id, s.cid,
             CAST(SUM(CAST(floor((e.val - s.cx) * (e.val - s.cx) * {KM_QUANT})
                           AS BIGINT)) AS BIGINT) AS qdist
      FROM elems e JOIN seed s ON s.ord = e.ord
      GROUP BY e.vec_id, s.cid
    ),
    a0 AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY qdist, cid) AS rn
        FROM d0) WHERE rn = 1
    ),
    trained AS (
      -- the inner decimal→double goes through VARCHAR: DuckDB's
      -- direct DECIMAL→DOUBLE cast misrounds by 1 ulp on ~25% of
      -- values (r11 finding), and a pre-REAL 1-ulp skew can flip the
      -- float32 rounding on a boundary; the string bounce is
      -- correctly rounded in both engines, matching Spark's cast
      SELECT a0.cluster AS cid, e.ord,
             CAST(CAST(CAST(CAST(SUM(CAST(e.val AS DECIMAL(38,12)))
                                 AS VARCHAR) AS DOUBLE)
                       / COUNT(*) AS REAL) AS DOUBLE) AS cx
      FROM a0 JOIN elems e ON e.vec_id = a0.vec_id
      GROUP BY a0.cluster, e.ord
    )
    """


def qdist_col(a, b) -> Column:
    """Quantized squared L2 distance between two float arrays: each
    element difference is computed in double (identical IEEE op on
    both engines), squared, floor-quantized to a long, then summed
    exactly — order-independent and cross-engine deterministic."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(KM_QUANT)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def qdot(a, b):
    """Quantized dot product accumulator: long-exact, order-free."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(float(QUANT))
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def norm_col(vec):
    return F.sqrt(qdot(vec, vec).cast("double") / F.lit(float(QUANT)))


def dot_col(a, b):
    return qdot(a, b).cast("double") / F.lit(float(QUANT))


def ngram_rows_arrow(
    docs, n: int, id_col: str = "doc_id", text_col: str = "text", out: str = "shingle"
):
    """(id, word-n-gram) rows — one per POSITION, duplicates kept —
    via one vectorized Arrow pass instead of the interpreted
    transform-lambda + JVM explode (higher-order functions get no
    codegen and dominated the shingle pipelines' wall clock).

    Exactness contract vs the expression path it replaces
    (``explode(transform(sequence(0, size(w)-n), i -> concat_ws(' ',
    w[i..i+n-1])))`` over ``w = split(text, ' ')``):
    ``pa.compute.split_pattern(text, ' ')`` == Spark ``split(text,
    ' ')`` (literal single-space pattern, trailing/consecutive empties
    kept in both, Java Pattern.split(limit=-1) semantics), and the
    n-gram is a plain space-join of n adjacent non-null tokens ==
    concat_ws. Docs with fewer than n tokens emit nothing (the
    ``size(w) >= n`` filter upstream becomes max(L-n+1, 0) here).
    NULL ids/texts must be filtered upstream (checked loudly)."""
    from pyspark.sql.types import StructField, StructType

    src = docs.select(id_col, text_col)
    id_field = src.schema.fields[0]
    out_schema = StructType(
        [id_field, StructField(out, src.schema.fields[1].dataType, True)]
    )

    def _gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0)
            texts = batch.column(1)
            if ids.null_count or texts.null_count:
                raise ValueError(
                    "ngram_rows_arrow: null ids/texts must be filtered upstream"
                )
            toks = pa.compute.split_pattern(texts, pattern=" ")
            lens = pa.compute.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = toks.flatten()
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            counts = np.maximum(lens - n + 1, 0)
            total = int(counts.sum())
            if total == 0:
                continue
            rep_starts = np.repeat(starts, counts)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            base = rep_starts + within
            parts = [flat.take(pa.array(base + j)) for j in range(n)]
            if n == 1:
                grams = parts[0]
            else:
                grams = pa.compute.binary_join_element_wise(*parts, " ")
            out_ids = ids.take(
                pa.array(np.repeat(np.arange(len(lens), dtype=np.int64), counts))
            )
            yield pa.RecordBatch.from_arrays([out_ids, grams], names=[id_field.name, out])

    return src.mapInArrow(_gen, out_schema)


def posting_pairs_arrow(idx, list_col: str = "ds", with_sizes: bool = True):
    """(doc_a, doc_b) candidate-pair rows + per-posting size markers
    (doc_a, NULL) from an inverted index of per-shingle doc-id arrays —
    the vectorized Arrow twin of the in-row C(df,2) struct transform
    (interpreted lambdas, no codegen). Pair multiset and marker
    multiset are identical: for each list, every (ds[i], ds[j]) with
    i < j plus one (ds[i], NULL) per element, exactly what
    ``flatten(transform(...slice...))`` + the size-marker transform
    emit. Requires a bigint element type (callers with non-integer doc
    ids keep the expression path)."""

    def _gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ds = batch.column(0)
            vals = ds.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            lens = pa.compute.list_value_length(ds).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            if with_sizes:
                out_a = [vals]
                out_b = [np.zeros(len(vals), dtype=np.int64)]
                null_mask = [np.ones(len(vals), dtype=bool)]
            else:
                out_a, out_b, null_mask = [], [], []
            for L in np.unique(lens):
                if L < 2:
                    continue
                rows = np.nonzero(lens == L)[0]
                mat = vals[starts[rows][:, None] + np.arange(L)[None, :]]
                iu, ju = np.triu_indices(int(L), k=1)
                out_a.append(mat[:, iu].ravel())
                out_b.append(mat[:, ju].ravel())
                null_mask.append(np.zeros(rows.size * iu.size, dtype=bool))
            if not out_a:
                continue
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            mk = np.concatenate(null_mask)
            yield pa.RecordBatch.from_arrays(
                [pa.array(a), pa.array(b, mask=mk)], names=["doc_a", "doc_b"]
            )

    return idx.select(list_col).mapInArrow(_gen, "doc_a bigint, doc_b bigint")


def shingle_pair_counts_arrow(docs, n: int, max_df: int | None = None):
    """Partial-counted (doc_a, doc_b, cnt) rows from word n-gram
    shingles — the fused twin of ``shingle_doc_lists`` +
    ``posting_pairs_arrow``: doc_b-non-NULL rows sum (per pair) to the
    shared-surviving-shingle count, doc_b-NULL marker rows sum (per
    doc) to the surviving-shingle total. ONE hash exchange on the
    shingle string, then a single Arrow pass per task does the
    (shingle, doc) dedup, per-shingle grouping, df cap, upper-triangle
    pair generation (sorted doc ids, i < j) and per-task run-length
    pre-counting — removing the collect_set ObjectHashAggregate, the
    sorted-array materialization, and the second Python boundary of
    the two-step shape (guide §4.2, §2.3). Callers MUST sum ``cnt``,
    not count rows.

    Equivalence: hash partitioning on shingle colocates every posting
    of a shingle in one task, so per-task groups ARE the global
    groups; the pair/marker multisets (weighted by cnt) are identical
    to the two-step path's. Memory: a task holds its partition's
    postings plus per-shingle segments — the same order as the
    ObjectHashAggregate hash map it replaces; partition count scales
    with the corpus via spark.sql.shuffle.partitions/AQE. Requires
    bigint doc ids (same contract as posting_pairs_arrow)."""
    raw = ngram_rows_arrow(
        spread_scan(docs.filter(F.col("text").isNotNull())), n
    )
    # hash partitioning on shingle is CORRECTNESS here (per-task
    # groups must be the global groups); the explicit width pins it
    # against AQE's byte-based coalescing, which under-parallelizes
    # the Python-side pair kernel (bytes are a bad proxy for its CPU).
    rep = raw.repartition(
        raw.sparkSession.sparkContext.defaultParallelism, "shingle"
    )

    def _gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        ids_l, sh_l = [], []
        for b in batches:
            if b.num_rows:
                ids_l.append(b.column(0))
                sh_l.append(b.column(1))
        if not ids_l:
            return
        ids = pa.chunked_array(ids_l).combine_chunks()
        sh = pa.chunked_array(sh_l).combine_chunks()
        codes = (
            pc.dictionary_encode(sh)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, codes))
        c, d = codes[order], doc[order]
        keep = np.concatenate(([True], (c[1:] != c[:-1]) | (d[1:] != d[:-1])))
        c, d = c[keep], d[keep]
        bnd = np.concatenate(
            ([0], np.nonzero(c[1:] != c[:-1])[0] + 1, [len(c)])
        )
        lens = np.diff(bnd)
        ok = lens <= max_df if max_df is not None else np.ones(len(lens), bool)
        surv = np.repeat(ok, lens)
        md, mc = np.unique(d[surv], return_counts=True)
        out_a = [md]
        out_b = [np.zeros(len(md), np.int64)]
        msk = [np.ones(len(md), bool)]
        cnts = [mc]
        starts = bnd[:-1]
        for L in np.unique(lens[ok & (lens >= 2)]):
            rows = np.nonzero(ok & (lens == L))[0]
            mat = d[starts[rows][:, None] + np.arange(L)[None, :]]
            iu, ju = np.triu_indices(int(L), k=1)
            pa_, pb_ = mat[:, iu].ravel(), mat[:, ju].ravel()
            o2 = np.lexsort((pb_, pa_))
            pa_, pb_ = pa_[o2], pb_[o2]
            new = np.concatenate(
                ([True], (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1]))
            )
            idxs = np.nonzero(new)[0]
            cnt = np.diff(np.concatenate((idxs, [len(pa_)])))
            out_a.append(pa_[idxs])
            out_b.append(pb_[idxs])
            msk.append(np.zeros(len(idxs), bool))
            cnts.append(cnt)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate(out_a)),
                pa.array(np.concatenate(out_b), mask=np.concatenate(msk)),
                pa.array(np.concatenate(cnts)),
            ],
            names=["doc_a", "doc_b", "cnt"],
        )

    return rep.mapInArrow(_gen, "doc_a bigint, doc_b bigint, cnt bigint")


def pair_cosine_arrow(
    df, a_col: str, b_col: str, nn_col: str, out: str = "cosine"
):
    """Exact Arrow/numpy twin of ``dot_col(a, b) / nn`` for pair-sized
    frames: every batch's quantized dot products are computed with one
    vectorized numpy pass instead of the interpreted per-element
    zip_with/aggregate fold (which gets no codegen), replaying the
    engine recipe bit-for-bit — float32→float64 widening and (x*y)*1e15
    are exact/IEEE-identical, np.floor == java.lang.Math.floor on
    doubles, the int64 segment sums wrap identically to the JVM long
    fold, and the final long→double cast and two divisions are the same
    IEEE ops in the same order.

    Contract (checked loudly, not silently diverged from): no null
    elements inside embeddings; a null array or length-mismatched pair
    yields a NULL cosine exactly like zip_with's null padding. All
    columns except ``a_col``/``b_col``/``nn_col`` pass through
    untouched; select only what you need upstream (the boundary ships
    every column it sees)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    keep = [f for f in df.schema.fields if f.name not in (a_col, b_col, nn_col)]
    out_schema = StructType(keep + [StructField(out, DoubleType(), True)])
    quant = float(QUANT)

    def _gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            idx = {name: i for i, name in enumerate(batch.schema.names)}
            ea = batch.column(idx[a_col])
            eb = batch.column(idx[b_col])
            nn = batch.column(idx[nn_col]).to_numpy(zero_copy_only=False)
            va = ea.flatten()
            vb = eb.flatten()
            if va.null_count or vb.null_count:
                raise ValueError(
                    "pair_cosine_arrow: null embedding elements are not "
                    "supported (zip_with parity would need per-element "
                    "null folding)"
                )
            la = pa.compute.list_value_length(ea).to_numpy(zero_copy_only=False)
            lb = pa.compute.list_value_length(eb).to_numpy(zero_copy_only=False)
            la = np.nan_to_num(la.astype(np.float64), nan=-1.0).astype(np.int64)
            lb = np.nan_to_num(lb.astype(np.float64), nan=-2.0).astype(np.int64)
            ok = la == lb  # null arrays get distinct sentinels => not ok
            xa = va.to_numpy(zero_copy_only=False).astype(np.float64)
            xb = vb.to_numpy(zero_copy_only=False).astype(np.float64)
            if ok.all():
                prods = np.floor(xa * xb * quant).astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(prods, dtype=np.int64)))
                ends = np.cumsum(la, dtype=np.int64)
                starts = np.concatenate(([0], ends[:-1]))
                dots = csum[ends] - csum[starts]
            else:
                # Mismatched / null rows desynchronize the two flat
                # value streams; per-row fallback for this
                # (never-in-fixture) batch. ok=False rows yield NULL.
                dots = np.zeros(n, dtype=np.int64)
                pos_a = np.concatenate(([0], np.cumsum(np.maximum(la, 0)))).astype(np.int64)
                pos_b = np.concatenate(([0], np.cumsum(np.maximum(lb, 0)))).astype(np.int64)
                for i in range(n):
                    if not ok[i]:
                        continue
                    sa = xa[pos_a[i] : pos_a[i + 1]]
                    sb = xb[pos_b[i] : pos_b[i + 1]]
                    dots[i] = (
                        np.floor(sa * sb * quant).astype(np.int64).sum()
                    )
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (dots.astype(np.float64) / quant) / nn
            cos_arr = pa.array(cos, type=pa.float64(), from_pandas=False)
            if not ok.all() or batch.column(idx[nn_col]).null_count:
                nn_valid = pa.compute.is_valid(batch.column(idx[nn_col]))
                valid = pa.compute.and_(
                    pa.array(ok), nn_valid
                )
                cos_arr = pa.compute.if_else(valid, cos_arr, pa.scalar(None, pa.float64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(idx[f.name]) for f in keep] + [cos_arr],
                names=[f.name for f in keep] + [out],
            )

    return df.mapInArrow(_gen, out_schema)


def sweep_stale_dirs(
    root: str, prefix: str, keep_token: str, min_age_s: float = 6 * 3600
) -> None:
    """Remove another session's leftover scratch directories under
    ``root`` matching ``prefix`` — but only ones untouched for
    ``min_age_s``. The unconditional sweep this replaces yanked LIVE
    concurrent sessions' lakehouse tables and streaming checkpoints
    mid-run (their manifest-committed state is not overwrite-tolerant);
    an mtime age gate keeps the cleanup while making a live victim
    implausible — any active drain/merge touches its directory far
    more often than the threshold."""
    import os
    import shutil
    import time

    now = time.time()
    for d in os.listdir(root):
        if not d.startswith(prefix) or keep_token in d:
            continue
        p = os.path.join(root, d)
        try:
            # A directory's own mtime does NOT change when files are
            # created deeper inside it, so the age must be the max
            # mtime over the dir and its first two levels — merges
            # touch <table>/_manifests and <table>/data/<sub>, and
            # checkpoints touch <work>/ck_*/..., all within two
            # levels, so any live activity refreshes this probe.
            # no sampling cap: an earlier [:64] slice could miss a
            # live session whose recent writes land only in LATER
            # listdir entries (e.g. >64 partition dirs under one data
            # subdir) — exactly the failure class this gate closes.
            # The walk is two levels deep and bounded in practice
            # (manifests + bucket dirs), so a full listing is cheap.
            ages = [os.path.getmtime(p)]
            for child in os.listdir(p):
                cp = os.path.join(p, child)
                ages.append(os.path.getmtime(cp))
                if os.path.isdir(cp):
                    for gc in os.listdir(cp):
                        ages.append(os.path.getmtime(os.path.join(cp, gc)))
            if now - max(ages) < min_age_s:
                continue
        except OSError:
            continue
        shutil.rmtree(p, ignore_errors=True)


# ---------------------------------------------------------------------------
# Exact decimal → double conversion (identical in both engines)
# ---------------------------------------------------------------------------
# DuckDB's CAST(DECIMAL(38,s) AS DOUBLE) MISROUNDS by 1 ulp on ~25% of
# random values (r11 measurement: 76/300 at scale 18 vs Python's
# Decimal→float reference; first observed as the strict comparator's
# catch on SUM(value²) at sf0.01). Spark's decimal→double cast is
# correctly rounded (0/3000 misrounds across scales 6/12/18). The
# CANONICAL oracle-side fix is the VARCHAR bounce —
#   CAST(CAST(<decimal expr> AS VARCHAR) AS DOUBLE)
# — because decimal→string is exact and string→double parsing is
# correctly rounded in BOTH engines (0/300 mismatches measured);
# applied to every decimal-sum oracle in r11 and pinned by
# tests/test_properties.py::test_decimal_double_string_route_parity.
# The split chain below predates that finding and remains as a second
# validated primitive (used by variance_stats_by_event_type): it
# splits the decimal into integer quotient q and fraction numerator r
# (both exact int64), then rebuilds with int64→double conversions
# (correctly rounded in both engines at any magnitude), one
# correctly-rounded division, and one addition — token-for-token the
# same IEEE op order on both sides.


def dec12_to_double(c: Column) -> Column:
    """Spark half: ``c`` must be a DECIMAL(38,12) expression. The
    fraction is extracted with ``c % 1`` — which Spark types as
    DECIMAL(13,12), below the precision cap — NOT ``c - floor(c)``,
    whose result type for a full-width input is DECIMAL(38,10):
    Spark's add/subtract type rule would silently ROUND away the low
    two fraction digits while the DuckDB twin keeps all twelve
    (caught by the r12 `dec12_split` probe; invisible on fixtures
    whose values carry ≤10 fraction digits). The modulo follows the
    dividend's sign, so a negative input's remainder is shifted into
    [0, 1) to match FLOOR semantics. The fraction is cast to
    DECIMAL(14,12) BEFORE the 1e12 multiply — the product-type rule
    would otherwise cap precision by shrinking the scale and
    truncating low digits."""
    q = F.floor(c).cast("long").cast("double")
    m = c % F.lit(1).cast("decimal(1,0)")
    frac = F.when(m < 0, m + 1).otherwise(m).cast("decimal(14,12)")
    r = (frac * F.lit(1_000_000_000_000).cast("decimal(13,0)")).cast(
        "long"
    ).cast("double")
    return q + r / F.lit(1_000_000_000_000.0)


def dec12_to_double_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec12_to_double` for oracle strings."""
    return (
        f"(CAST(CAST(FLOOR({expr}) AS BIGINT) AS DOUBLE)"
        f" + CAST(CAST(({expr} - FLOOR({expr})) * 1000000000000 AS BIGINT)"
        f" AS DOUBLE) / 1000000000000.0)"
    )


def source_fingerprint(sf_dir: str, table: str = "events") -> str:
    """Cheap change-detection for one fixture table under ``sf_dir``:
    (name, size, mtime_ns) of its parquet file — or of every entry
    when it is a directory — digested. Folded into scenario/profile
    cache keys (ADVICE r14, generalized in r15): if a test rewrites
    the data under the same path within one Spark session, a stale
    cached scenario must not be silently reused. Pure os.stat — no
    Spark job, no file reads."""
    import hashlib
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    parts: list[str] = []
    try:
        if os.path.isdir(path):
            for name in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, name))
                parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(path)
            parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        parts.append("missing")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def scenario_workdir(spark, sf_dir: str, prefix: str, fingerprint: str) -> str:
    """Fresh scratch root for a one-build-per-(session, sf_dir, data)
    audit scenario — the shared dance every format/maintenance audit
    module used to copy (review r16 folded seven copies): sweep other
    sessions' stale roots (age-gated), digest the FULL sf_dir path +
    data fingerprint into the dir name (two alike-named fixture dirs,
    or a rewritten dataset under the same path, can never collide on
    one root — ADVICE r14's stale-cache rule), then clear any previous
    build of this exact root. Callers own their memo dict; the memo
    key is (applicationId, sf_dir, fingerprint) so a data rewrite gets
    a fresh entry AND a fresh root."""
    import hashlib
    import os
    import shutil
    import tempfile

    app = spark.sparkContext.applicationId
    tmp = tempfile.gettempdir()
    sweep_stale_dirs(tmp, prefix, keep_token=f"{prefix}{app}_")
    digest = hashlib.md5(
        (os.path.abspath(sf_dir) + "#" + fingerprint).encode()
    ).hexdigest()[:10]
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = os.path.join(tmp, f"{prefix}{app}_{sf_tag}_{digest}")
    shutil.rmtree(work, ignore_errors=True)
    return work
