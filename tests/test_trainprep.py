"""Property tests for the training-prep operators (trainprep.py):
decontamination catches planted leaks, chunking covers every token
with the documented overlap, PII redaction leaves no residual match,
and q21's one-aggregate plan reproduces the EXISTS/NOT-EXISTS pair on
a handcrafted order."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobminer_spark import load_all_operators
from jobminer_spark.operators.dedupe import word_shingles
from jobminer_spark.operators.trainprep import (
    _CHUNK,
    _EMAIL_RE,
    _PHONE_RE,
    _STRIDE,
)
from tests.conftest import SF_DIR

load_all_operators()


def test_decontamination_catches_planted_leak(spark):
    """A train doc that verbatim-contains a benchmark doc's text must
    surface with every benchmark shingle hit."""
    bench_text = " ".join(f"b{i}" for i in range(12))  # 12 tokens -> 5 8-grams
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # benchmark side (0 % mod == 0)
            (1, "prefix " + bench_text + " suffix"),  # leaked train doc
            (2, " ".join(f"c{i}" for i in range(12))),  # clean train doc
        ],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, 8)
    bench = sh.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "shingle"
    )
    train = sh.filter(F.col("doc_id") != 0)
    hits = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
        .collect()
    )
    got = {r.doc_id: r.n_hits for r in hits}
    assert got == {1: 5}  # all 5 benchmark 8-grams leak; doc 2 clean


def test_chunking_covers_all_tokens_with_overlap(spark):
    """Chunk starts stride by 48: consecutive chunks overlap by 16
    tokens and every token index lands in at least one chunk."""
    n = 150
    doc = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n)))], "doc_id long, text string"
    )
    chunks = (
        doc.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))).alias(
                "s"
            ),
        )
        .select("s", F.slice(F.col("toks"), F.col("s") + 1, _CHUNK).alias("chunk"))
        .collect()
    )
    starts = sorted(r.s for r in chunks)
    assert starts == list(range(0, n, _STRIDE))
    covered = set()
    for r in chunks:
        covered.update(int(t) for t in r.chunk)
    assert covered == set(range(n))
    by_start = {r.s: r.chunk for r in chunks}
    overlap = set(by_start[0]) & set(by_start[_STRIDE])
    assert len(overlap) == _CHUNK - _STRIDE  # 16-token overlap


def test_pii_redaction_leaves_no_residual(spark):
    """After the scrub, neither pattern matches anywhere — including
    text that had PII mid-string, repeated, or at the boundaries."""
    rows = [
        (1, "mail a.b-c_d@sub.example.co.uk twice x@y.io done"),
        (2, "555-123-4567 starts and ends 999-888-7777"),
        (3, "mixed u@v.com 123-456-7890 tail"),
        (4, "clean text no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted")
    )
    residual = red.select(
        (
            F.regexp_count(F.col("redacted"), F.lit(_EMAIL_RE))
            + F.regexp_count(F.col("redacted"), F.lit(_PHONE_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0].total
    assert residual == 0


def test_q21_exists_not_exists_semantics(spark, monkeypatch):
    """Handcrafted orders pin the two correlated predicates:
    order 1: two suppliers, only supplier 10 late  -> counted for 10
    order 2: two suppliers, both late              -> nobody counted
    order 3: one supplier, late                    -> not counted (no EXISTS)
    order 4: two suppliers, none late              -> not counted
    """
    import jobminer_spark.operators.tpch as tpch

    orders = spark.createDataFrame(
        [(i, "F", "2024-01-01 00:00:00") for i in (1, 2, 3, 4)],
        "o_orderkey long, o_orderstatus string, o_orderdate_s string",
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    )
    late, ontime = "2024-06-01 00:00:00", "2024-01-15 00:00:00"
    li = spark.createDataFrame(
        [
            (1, 10, late),
            (1, 20, ontime),
            (2, 10, late),
            (2, 20, late),
            (3, 10, late),
            (4, 10, ontime),
            (4, 20, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate_s string",
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
    )
    supplier = spark.createDataFrame(
        [(10, "Supp#10"), (20, "Supp#20")], "s_suppkey long, s_name string"
    )
    tables = {"orders": orders, "lineitem": li, "supplier": supplier}
    monkeypatch.setattr(tpch, "load_table", lambda s, d, t: tables[t])
    got = {r.s_name: r.numwait for r in tpch.q21_waiting_suppliers(spark, SF_DIR).collect()}
    assert got == {"Supp#10": 1}
