"""Invariant tests for the r11 analytics additions (cohort retention,
RFM segmentation, VARIANT extraction) — semantic checks beside the
registered queries' cross-engine value pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobminer_spark.operators.cohort import cohort_daily_retention
from jobminer_spark.operators.rfm import rfm_segment_census
from jobminer_spark.operators.variantops import variant_extraction_stats
from jobminer_spark.sources import load_table
from tests.conftest import SF_DIR


def test_cohort_offset_zero_is_full_cohort(spark):
    """Every user is active on their signup day by definition, so the
    offset-0 cell of every cohort equals the cohort size and carries
    retention 1000 per-mille."""
    rows = cohort_daily_retention(spark, SF_DIR).collect()
    assert rows
    zero = [r for r in rows if r["day_offset"] == 0]
    assert zero, "no offset-0 cells"
    for r in zero:
        assert r["n_active"] == r["n_cohort"]
        assert r["retention_permille"] == 1000
    # and no cell can exceed its cohort
    assert all(r["n_active"] <= r["n_cohort"] for r in rows)


def test_rfm_buckets_are_balanced_quintiles(spark):
    cells = rfm_segment_census(spark, SF_DIR).collect()
    assert cells
    n_users = sum(c["n_users"] for c in cells)
    ev_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert n_users == ev_users  # cells partition the user population
    for dim in ("r_bucket", "f_bucket", "m_bucket"):
        per_bucket = {}
        for c in cells:
            per_bucket[c[dim]] = per_bucket.get(c[dim], 0) + c["n_users"]
        assert set(per_bucket) == {1, 2, 3, 4, 5}
        # ntile balance: bucket sizes differ by at most 1
        assert max(per_bucket.values()) - min(per_bucket.values()) <= 1


def test_variant_sums_match_raw_columns(spark):
    """The variant path extractions must agree with computing the same
    quantities directly from the raw columns — the parse/extract round
    trip adds no drift."""
    got = {
        r["event_type"]: r for r in variant_extraction_stats(spark, SF_DIR).collect()
    }
    raw = {
        r["event_type"]: r
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("su"),
            F.sum(F.floor(F.col("value") * 100.0).cast("long")).alias("smv"),
            F.sum(F.col("event_id") % 7).alias("st0"),
        )
        .collect()
    }
    assert set(got) == set(raw)
    for et, g in got.items():
        r = raw[et]
        assert g["n_events"] == r["n"]
        assert g["sum_u"] == r["su"]
        assert g["sum_mv"] == r["smv"]
        assert g["sum_tag0"] == r["st0"]
        assert g["variant_schema"].startswith("OBJECT<")


def test_removal_effects_are_nonnegative_and_bounded(spark):
    """Removing a channel zeroes a non-negative contribution stream,
    so the 64-step conversion probability can only fall:
    0 <= p_without <= p_all, and the per-mille effect is in [0, 1000].
    Channels cover every non-purchase event type."""
    from jobminer_spark.operators.markovattr import (
        attribution_removal_effects,
    )

    rows = attribution_removal_effects(spark, SF_DIR).collect()
    assert rows
    types = {
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r["channel"] for r in rows} == types - {"purchase"}
    for r in rows:
        assert 0 <= r["p_without_q"] <= r["p_all_q"]
        assert 0 <= r["removal_effect_permille"] <= 1000
