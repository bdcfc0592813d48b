"""Declared-schema file sources: clean rows parse, malformed rows land
in quarantine instead of failing the job, JSON props extract typed."""

from __future__ import annotations

from pyspark.sql import types as T

from jobminer_spark.sources.files import (
    bad_rows,
    good_rows,
    parse_json_column,
    read_csv,
    read_jsonl,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_declared_schema_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\nnot_a_number,gamma,x\n")
    df = read_csv(spark, str(p), _SCHEMA)
    good = good_rows(df).collect()
    bad = bad_rows(df).collect()
    assert {(r["id"], r["name"], r["score"]) for r in good} == {
        (1, "alpha", 1.5),
        (2, "beta", 2.5),
    }
    assert len(bad) == 1 and "gamma" in bad[0]["raw"]


def test_jsonl_declared_schema_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha", "score": 1.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "beta", "score": 2.5}\n'
    )
    df = read_jsonl(spark, str(p), _SCHEMA)
    assert good_rows(df).count() == 2
    assert bad_rows(df).count() == 1


def test_parse_json_column_typed(spark):
    props_schema = T.StructType(
        [T.StructField("device", T.StringType()), T.StructField("n", T.LongType())]
    )
    df = spark.range(1).selectExpr(
        "id", """'{"device": "mobile", "n": 3}' AS props"""
    )
    out = parse_json_column(df, "props", props_schema).select(
        "props.device", "props.n"
    ).collect()[0]
    assert (out["device"], out["n"]) == ("mobile", 3)


def test_xml_feed_parse_and_quarantine(spark):
    """Native from_xml surface: well-formed feed items extract typed
    fields (attributes via the _ prefix, repeated elements as
    arrays), malformed payloads land raw in the quarantine stream,
    entity escapes decode, and a missing optional section yields an
    empty array rather than NULL."""
    from pyspark.sql import functions as F

    from jobminer_spark.sources.xml import (
        bad_xml_rows,
        good_xml_rows,
        parse_xml_column,
    )

    rows = [
        (1, "<job id=\"11\"><title>Data Engineer</title>"
            "<company>Acme &amp; Co</company>"
            "<salary min=\"100\" max=\"200\"/>"
            "<skills><skill>python</skill><skill>spark</skill></skills></job>"),
        (2, "<job id=\"12\"><title>Analyst</title><company>Beta</company>"
            "<salary min=\"50\" max=\"90\"/></job>"),  # no skills section
        (3, "<job id=\"13\"><title>Broken"),            # truncated
        (4, "not xml at all"),
    ]
    df = parse_xml_column(
        spark.createDataFrame(rows, "row_id long, xml string"), "xml"
    ).cache()
    good = {r["job_id"]: r for r in good_xml_rows(df).collect()}
    bad = [r["raw"] for r in bad_xml_rows(df).collect()]
    df.unpersist()
    assert set(good) == {11, 12}
    assert good[11]["company"] == "Acme & Co"          # entity decoded
    assert good[11]["salary_min"] == 100 and good[11]["salary_max"] == 200
    assert good[11]["skills"] == ["python", "spark"]
    assert good[12]["skills"] == []                    # missing section
    assert len(bad) == 2 and "not xml at all" in bad


def test_pyds_stream_reader_offset_partitioning():
    """Pure-Python contract of the streaming reader: any offset-range
    split into micro-batches covers every item exactly once with
    page-aligned partitions, and rows equal the closed-form feed."""
    from jobminer_spark.sources.pyds import (
        PaginatedFeedStreamReader,
        feed_row,
    )

    r = PaginatedFeedStreamReader({"n_items": "250", "page_size": "100"})
    assert r.initialOffset() == {"i": 0}
    assert r.latestOffset() == {"i": 250}
    # a multi-batch drain: 0..120, 120..250 (arbitrary split points)
    seen = []
    for s, e in [(0, 120), (120, 250)]:
        for p in r.partitions({"i": s}, {"i": e}):
            rows = list(r.read(p))
            assert len(rows) == p.end - p.start
            seen.extend(rows)
    ids = [row[0] for row in seen]
    assert ids == sorted(ids) and len(ids) == 250 == len(set(ids))
    assert all(row == feed_row(row[0], 100) for row in seen)
