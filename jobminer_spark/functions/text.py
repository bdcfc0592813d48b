"""Scalar string/regex/numeric functions — SURVEY.md §2.2.

Every function here is a pure built-in Column composition (JVM-side,
whole-stage-codegen'd): no Python UDFs in the hot path. Branch
semantics mirror the reference implementations cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Salary range parser (reference: pracuj_scraper.py:44-84)
# ---------------------------------------------------------------------------
# Semantics, branch for branch:
#   1. null/empty text -> (null, null)
#   2. strip '\xa0', '&nbsp;', spaces
#   3. hourly iff cleaned text contains 'zł/h' or 'zł/godz'
#   4. keep only [0-9 , . - –]
#   5. range "A–B" / "A-B": decimal comma -> dot, parse float,
#      hourly ×160 (160 h/month), truncate toward zero to int
#   6. else single number, same normalization, min == max
#   7. unparseable numbers -> (null, null)

_RANGE_RE = r"([\d\.,]+)[–\-]([\d\.,]+)"
_SINGLE_RE = r"([\d\.,]+)"


def _clean_salary_text(col: Column) -> Column:
    c = F.regexp_replace(col, " |&nbsp;| ", "")
    return c


def _strip_non_numeric(col: Column) -> Column:
    return F.regexp_replace(col, r"[^\d,\.\-–]", "")


def _to_number(raw: Column) -> Column:
    # decimal comma -> dot; unparseable ('' or '1.2.3') -> null.
    # try_cast, not cast: Spark 4 runs ANSI mode by default, where a
    # failed string->double cast is an ERROR, not null — the reference
    # semantics (float() + except -> fall through) need the null.
    return F.replace(raw, F.lit(","), F.lit(".")).try_cast("double")


def _salary_value(num: Column, is_hourly: Column) -> Column:
    # int() in the reference truncates toward zero; Spark's double->int
    # cast does the same (the DuckDB oracle needs an explicit trunc()).
    monthly = F.when(is_hourly, num * 160).otherwise(num)
    return monthly.cast("int")


def salary_min_col(text: Column) -> Column:
    cleaned = _clean_salary_text(text)
    is_hourly = cleaned.contains("zł/h") | cleaned.contains("zł/godz")
    digits = _strip_non_numeric(cleaned)
    lo = _to_number(F.regexp_extract(digits, _RANGE_RE, 1))
    hi = _to_number(F.regexp_extract(digits, _RANGE_RE, 2))
    single = _to_number(F.regexp_extract(digits, _SINGLE_RE, 1))
    return (
        F.when(lo.isNotNull() & hi.isNotNull(), _salary_value(lo, is_hourly))
        .when(single.isNotNull(), _salary_value(single, is_hourly))
        .otherwise(F.lit(None).cast("int"))
    )


def salary_max_col(text: Column) -> Column:
    cleaned = _clean_salary_text(text)
    is_hourly = cleaned.contains("zł/h") | cleaned.contains("zł/godz")
    digits = _strip_non_numeric(cleaned)
    lo = _to_number(F.regexp_extract(digits, _RANGE_RE, 1))
    hi = _to_number(F.regexp_extract(digits, _RANGE_RE, 2))
    single = _to_number(F.regexp_extract(digits, _SINGLE_RE, 1))
    return (
        F.when(lo.isNotNull() & hi.isNotNull(), _salary_value(hi, is_hourly))
        .when(single.isNotNull(), _salary_value(single, is_hourly))
        .otherwise(F.lit(None).cast("int"))
    )


def with_salary_range(
    df: DataFrame,
    text_col: str = "salary_text",
    out_min: str = "salary_min",
    out_max: str = "salary_max",
) -> DataFrame:
    text = F.col(text_col)
    return df.withColumn(out_min, salary_min_col(text)).withColumn(
        out_max, salary_max_col(text)
    )


# ---------------------------------------------------------------------------
# job_id from URL (reference: pracuj_scraper.py:297-298, 320-321)
# ---------------------------------------------------------------------------
# Reference falls back to str(hash(url))[:8]; Python hash() is
# process-salted/non-deterministic, so the engine substitutes a
# deterministic 64-bit hash (xxhash64) — documented divergence
# (SURVEY.md §7 risk register).


def extract_job_id(url: Column) -> Column:
    direct = F.regexp_extract(url, r",oferta,(\d+)", 1)
    fallback = F.substring(F.xxhash64(url).cast("string"), 1, 8)
    return F.when(direct != "", direct).otherwise(fallback)


# ---------------------------------------------------------------------------
# Years-of-experience extractor (reference: pracuj_scraper.py:231-243)
# ---------------------------------------------------------------------------
# First word-bounded integer 1-5 in the requirements text; null if none.


def extract_years_of_experience(text: Column) -> Column:
    # try_cast: ANSI mode would throw on the '' non-match sentinel
    return F.regexp_extract(text, r"\b([1-5])\b", 1).try_cast("int")


# ---------------------------------------------------------------------------
# Width truncation (reference: database.py:11-15, widths 54-88)
# ---------------------------------------------------------------------------


def truncate_to_widths(df: DataFrame, widths: dict[str, int]) -> DataFrame:
    """Cap string columns at their declared DDL widths before the sink —
    the Spark projection equivalent of the reference's _truncate."""
    cols = []
    for field in df.columns:
        if field in widths:
            cols.append(F.substring(F.col(field), 1, widths[field]).alias(field))
        else:
            cols.append(F.col(field))
    return df.select(*cols)
