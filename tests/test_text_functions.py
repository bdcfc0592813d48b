"""Branch-by-branch unit tests for the scalar text functions,
mirroring the reference semantics (pracuj_scraper.py:44-84 salary,
:231-243 years, :297-298 job_id; database.py:11-15 truncation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobminer_spark.functions.text import (
    extract_job_id,
    extract_years_of_experience,
    salary_max_col,
    salary_min_col,
    truncate_to_widths,
)

SALARY_CASES = [
    # (input, expected_min, expected_max)
    ("12 000 – 20 000 zł", 12000, 20000),          # en-dash range, spaces
    ("12\xa0000-20\xa0000 zł", 12000, 20000),      # nbsp noise, hyphen
    ("150,00-180,00 zł/h", 24000, 28800),           # hourly, decimal comma
    # "godz." keeps its trailing dot through the char strip -> "95,50."
    # -> float() fails -> (None, None); the reference does the same
    # (pracuj_scraper.py:52 keeps '.' then :75 float fails -> :84 None)
    ("95,50 zł/godz.", None, None),
    ("95,50 zł/godz", 15280, 15280),                # hourly single, clean
    ("5000", 5000, 5000),                           # bare single
    ("do 18 000 zł miesięcznie", 18000, 18000),     # single in prose
    ("brutto 7 500,50 zł", 7500, 7500),             # decimal comma truncates
    ("salary not disclosed", None, None),           # no digits
    ("", None, None),                               # empty
    (None, None, None),                             # null
]


def test_salary_parser_branches(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(SALARY_CASES)], "id int, salary_text string"
    )
    rows = (
        df.select(
            "id",
            salary_min_col(F.col("salary_text")).alias("mn"),
            salary_max_col(F.col("salary_text")).alias("mx"),
        )
        .orderBy("id")
        .collect()
    )
    for row, (text, emin, emax) in zip(rows, SALARY_CASES):
        assert row.mn == emin, f"{text!r}: min {row.mn} != {emin}"
        assert row.mx == emax, f"{text!r}: max {row.mx} != {emax}"


def test_job_id_extraction_and_fallback(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.pracuj.pl/praca/x,oferta,123456"),
            (2, "https://example.com/job/no-numeric-id"),
        ],
        "id int, url string",
    )
    rows = df.select("id", extract_job_id(F.col("url")).alias("jid")).orderBy("id").collect()
    assert rows[0].jid == "123456"
    # fallback: deterministic 8-char hash prefix (xxhash64, NOT python
    # hash() — the reference's fallback is process-salted; divergence
    # documented in functions/text.py)
    assert rows[1].jid is not None and len(rows[1].jid) == 8
    rows2 = df.select("id", extract_job_id(F.col("url")).alias("jid")).orderBy("id").collect()
    assert rows[1].jid == rows2[1].jid  # deterministic across runs


def test_years_of_experience(spark):
    cases = [
        ("minimum 3 years experience", 3),
        ("requires 10 years", None),      # 10 is not word-bounded 1-5... but contains '1'? '\b10\b' no; '\b1\b' doesn't match inside 10
        ("juniors welcome", None),
        ("2+ lat doświadczenia", 2),
        ("6 years", None),                # out of 1-5 domain
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "id int, t string"
    )
    rows = (
        df.select("id", extract_years_of_experience(F.col("t")).alias("y"))
        .orderBy("id")
        .collect()
    )
    for row, (text, exp) in zip(rows, cases):
        assert row.y == exp, f"{text!r}: {row.y} != {exp}"


def test_truncate_to_widths(spark):
    df = spark.createDataFrame([("x" * 300, "short")], "title string, source string")
    out = truncate_to_widths(df, {"title": 255, "source": 50}).collect()[0]
    assert len(out.title) == 255
    assert out.source == "short"


def test_company_direct_text_branches():
    """Reference pracuj_scraper.py:328-332: direct text children only,
    'Unknown Company' when the h2 is absent."""
    from jobminer_spark.operators.scrapeshape import _company_direct_text

    h2 = '<h2 data-test="text-employerName">'
    cases = [
        ("<html><h1>t</h1></html>", "Unknown Company"),          # no h2
        (f"{h2}Acme Corp</h2>", "Acme Corp"),                    # plain
        (f"{h2}  Acme Corp \n</h2>", "Acme Corp"),               # strip
        (f"{h2}<span>verified</span> Acme </h2>", "Acme"),       # nested excluded
        (f"{h2}Acme<span> sp. z o.o.</span> Corp</h2>", "Acme Corp"),  # split direct text
        (f"{h2}Acme<br/>Corp</h2>", "AcmeCorp"),                 # self-closing
        (f"{h2}<span>only nested</span></h2>", ""),              # h2 present, no direct text
        # multi-level nesting: a non-greedy <tag>.*?</tag> regex pairs
        # <span> with the FIRST closing tag and leaves '</span>'
        # dangling in the output — the depth tokenizer must not
        (f"{h2}<span>a<b>x</b></span>Acme</h2>", "Acme"),
        (f"{h2}<span><span>x</span>y</span>Acme</h2>", "Acme"),  # y is depth-1, excluded
        (f"{h2}A<div><span>v</span><br/>w</div>B</h2>", "AB"),   # mixed nested + self-closing
        # plain-HTML void tags (no XHTML slash) must not open depth —
        # an opening-tag treatment would swallow everything after <br>
        (f"{h2}Acme<br>Corp</h2>", "AcmeCorp"),
        (f"{h2}Acme <img src=x> Corp</h2>", "Acme  Corp"),
        (f"{h2}Acme<!-- verified badge -->Corp</h2>", "AcmeCorp"),
        (f"{h2}A<div>x<br>y</div>B</h2>", "AB"),                 # void inside nested stays excluded
    ]
    for html, expected in cases:
        assert _company_direct_text(html) == expected, html


def test_direct_text_comment_and_quoted_gt():
    """Tokenizer hardening: a comment body containing '>' and a quoted
    attribute value containing '>' must be consumed as ONE token — a
    naive <[^>]+> splits mid-token and leaks the remainder into the
    extracted direct text (diverging from bs4)."""
    from jobminer_spark.operators.scrapeshape import _company_direct_text

    h2 = '<h2 data-test="text-employerName">'
    cases = [
        (f"{h2}Acme<!-- a > b -->Corp</h2>", "AcmeCorp"),
        (f"{h2}Acme<!-- -> --> Corp</h2>", "Acme Corp"),
        (f'{h2}Acme<span title="a>b">x</span>Corp</h2>', "AcmeCorp"),
        (f"{h2}Acme<img alt='>'>Corp</h2>", "AcmeCorp"),
        (f"{h2}<![CDATA[ x > y ]]>Acme</h2>", "Acme"),
        (f"{h2}<!DOCTYPE html>Acme</h2>", "Acme"),
    ]
    for html, expected in cases:
        assert _company_direct_text(html) == expected, html
