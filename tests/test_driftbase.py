"""Persisted-baseline drift monitor (driftbase.py): the profile path
must reproduce the direct two-sample KS bit-for-bit, reuse its cached
profile, and never rescan the baseline's raw rows on the comparison."""

from __future__ import annotations

import os

from jobminer_spark.operators import driftbase
from jobminer_spark.operators.drift import ks_drift_event_values
from jobminer_spark.operators.driftbase import ks_drift_vs_baseline
from tests.conftest import SF_DIR


def test_baseline_path_equals_direct_two_sample(spark):
    """Same grid union, same integer cross-multiplied KS: the
    persisted-profile computation and the direct in-plan two-sample
    computation must agree on every output cell."""
    (a,) = ks_drift_vs_baseline(spark, SF_DIR).collect()
    (b,) = ks_drift_event_values(spark, SF_DIR).collect()
    assert a.asDict() == b.asDict()
    assert a["n_value_buckets"] > 0 and a["ks_permille"] is not None


def test_profile_is_built_once_and_reused(spark):
    """The second call must hit the session cache — the grid parquet's
    mtime is untouched and the cache key resolves to the same root."""
    ks_drift_vs_baseline(spark, SF_DIR).collect()
    key = (spark.sparkContext.applicationId, SF_DIR)
    root = driftbase._PROFILE_CACHE[key]
    grid_dir = os.path.join(root, "grid")
    mtime = os.path.getmtime(grid_dir)
    ks_drift_vs_baseline(spark, SF_DIR).collect()
    assert driftbase._PROFILE_CACHE[key] == root
    assert os.path.getmtime(grid_dir) == mtime


def test_profile_totals_match_grid(spark):
    """meta.n1 is definitionally the grid's count sum, and mid splits
    the corpus so n1 + n2 covers every non-null-value event."""
    from pyspark.sql import functions as F

    from jobminer_spark.sources import load_table

    ks_drift_vs_baseline(spark, SF_DIR).collect()  # ensure built
    root = driftbase._PROFILE_CACHE[(spark.sparkContext.applicationId, SF_DIR)]
    (meta,) = spark.read.parquet(os.path.join(root, "meta")).collect()
    gsum = (
        spark.read.parquet(os.path.join(root, "grid"))
        .agg(F.sum("c1").alias("s"))
        .first()["s"]
    )
    assert meta["n1"] == gsum
    (row,) = ks_drift_vs_baseline(spark, SF_DIR).collect()
    n_valued = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .count()
    )
    assert row["n1"] + row["n2"] == n_valued


def test_tvd_baseline_path_equals_direct_two_sample(spark):
    """The categorical twin: the persisted type-count-profile TVD must
    equal the direct two-sample TVD on every output cell."""
    from jobminer_spark.operators.drift import tvd_drift_event_types
    from jobminer_spark.operators.driftbase import tvd_drift_vs_baseline

    (a,) = tvd_drift_vs_baseline(spark, SF_DIR).collect()
    (b,) = tvd_drift_event_types(spark, SF_DIR).collect()
    assert a.asDict() == b.asDict()
    assert a["n_types"] > 0 and a["tvd_permille"] is not None


def test_profile_serves_both_monitors_from_one_build(spark):
    """ks_drift_vs_baseline and tvd_drift_vs_baseline share one
    profile root: running either first builds it; the other reuses it
    (grid mtimes untouched by the second call)."""
    from jobminer_spark.operators.driftbase import (
        ks_drift_vs_baseline,
        tvd_drift_vs_baseline,
    )

    ks_drift_vs_baseline(spark, SF_DIR).collect()
    root = driftbase._PROFILE_CACHE[(spark.sparkContext.applicationId, SF_DIR)]
    mtimes = {
        d: os.path.getmtime(os.path.join(root, d))
        for d in ("grid", "types", "meta")
    }
    tvd_drift_vs_baseline(spark, SF_DIR).collect()
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(root, d)) == m


def test_baseline_monitors_on_adversarial_nulls_and_one_sided_types(
    spark, tmp_path
):
    """The standard fixture carries no null-valued events, so the
    profile path's has_v branch (KS counts non-null values only, TVD
    counts EVERY event) and the full-outer grid union's one-sided
    cases are exercised here instead: nulls in both halves, a value
    bucket that exists only in the baseline, one only in the batch,
    an event type that vanishes after the split and one born after
    it. Both persisted-profile monitors must still equal their
    direct two-sample twins cell-for-cell."""
    from tests.test_analytics import _write_events_adversarial

    from jobminer_spark.operators.drift import (
        ks_drift_event_values,
        tvd_drift_event_types,
    )
    from jobminer_spark.operators.driftbase import (
        ks_drift_vs_baseline,
        tvd_drift_vs_baseline,
    )

    h = 3_600_000_000  # one hour in epoch µs; span 0..10h, mid = 5h
    rows = [
        # first half: values 1.00/2.00, types A (dies at mid), B
        (1, 0 * h, 1, "A", 1.00),
        (2, 1 * h, 1, "A", None),  # null value, counted by TVD only
        (3, 2 * h, 2, "B", 2.00),  # bucket 200 exists ONLY here
        (4, 3 * h, 2, "B", 1.00),
        (5, 4 * h, 3, "A", None),
        # second half: type C born after mid, bucket 300 only here
        (6, 6 * h, 1, "B", 1.00),
        (7, 7 * h, 2, "C", 3.00),
        (8, 8 * h, 3, "C", None),
        (9, 9 * h, 1, "B", 3.00),
        (10, 10 * h, 2, "C", 1.00),
    ]
    _write_events_adversarial(tmp_path, rows)
    sf = str(tmp_path)

    (ka,) = ks_drift_vs_baseline(spark, sf).collect()
    (kb,) = ks_drift_event_values(spark, sf).collect()
    assert ka.asDict() == kb.asDict()
    # non-null halves: 3 vs 4 values; union grid {100, 200, 300}
    assert (ka["n1"], ka["n2"], ka["n_value_buckets"]) == (3, 4, 3)

    (ta,) = tvd_drift_vs_baseline(spark, sf).collect()
    (tb,) = tvd_drift_event_types(spark, sf).collect()
    assert ta.asDict() == tb.asDict()
    # TVD counts nulls too: 5 vs 5 events; union types {A, B, C}
    assert (ta["n1"], ta["n2"], ta["n_types"]) == (5, 5, 3)
    # A: 3/5 vs 0/5, B: 2/5 vs 2/5, C: 0/5 vs 3/5 -> TVD = 3/5
    assert ta["tvd_permille"] == 600


def test_profile_roots_distinct_for_same_basename_dirs(spark, tmp_path):
    """Two sf_dirs sharing a basename must get DISTINCT profile roots
    — a basename-keyed root would let the second build overwrite the
    first's profile while both cache entries still pointed at it."""
    from tests.test_analytics import _write_events_adversarial

    from jobminer_spark.operators.driftbase import ks_drift_vs_baseline

    h = 3_600_000_000
    rows_a = [(i, i * h, 1, "A", 1.0 * i) for i in range(1, 7)]
    rows_b = [(i, i * h, 1, "B", 2.0 * i) for i in range(1, 11)]
    da = tmp_path / "one" / "sfX"
    db = tmp_path / "two" / "sfX"
    da.mkdir(parents=True)
    db.mkdir(parents=True)
    _write_events_adversarial(da, rows_a)
    _write_events_adversarial(db, rows_b)
    (ra,) = ks_drift_vs_baseline(spark, str(da)).collect()
    (rb,) = ks_drift_vs_baseline(spark, str(db)).collect()
    key = spark.sparkContext.applicationId
    roots = {
        driftbase._PROFILE_CACHE[(key, str(da))],
        driftbase._PROFILE_CACHE[(key, str(db))],
    }
    assert len(roots) == 2
    # and the first dir's cached result is still ITS data, not b's
    (ra2,) = ks_drift_vs_baseline(spark, str(da)).collect()
    assert ra2.asDict() == ra.asDict()
    assert ra["n1"] + ra["n2"] == len(rows_a)
    assert rb["n1"] + rb["n2"] == len(rows_b)
