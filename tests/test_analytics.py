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


def test_scaled_rfm_census_equals_ntile_census(spark):
    """VERDICT r12 item 5: the distributed-rank twin must reproduce
    the ntile census cell-for-cell — same buckets, same populations,
    same integer mass — with no unbounded global window in its plan
    (the plan half is pinned in test_plans.py's whitelist)."""
    from jobminer_spark.operators.rfm import rfm_segment_census_scaled

    a = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): (
            r["n_users"],
            r["segment_cents"],
            r["segment_events"],
        )
        for r in rfm_segment_census(spark, SF_DIR).collect()
    }
    b = {
        (r["r_bucket"], r["f_bucket"], r["m_bucket"]): (
            r["n_users"],
            r["segment_cents"],
            r["segment_events"],
        )
        for r in rfm_segment_census_scaled(spark, SF_DIR).collect()
    }
    assert a == b


def test_distributed_ranks_equal_global_row_number(spark):
    """_distributed_ranks is exact: equal to a plain global
    row_number under the same (unique) ordering, including on a
    frame with heavy ties in the leading key and nulls ordered
    last."""
    from pyspark.sql import Window as W

    from jobminer_spark.operators.rfm import _distributed_ranks, _ntile_from_rank

    df = spark.range(1000).select(
        F.col("id").alias("uid"),
        F.when(F.col("id") % 97 == 0, None)
        .otherwise(F.col("id") % 7)
        .alias("k"),  # 7 heavy tie groups + a null stripe
    )
    order = [F.col("k").desc_nulls_last(), F.col("uid").asc()]
    got = _distributed_ranks(df, order, "rn")
    want = df.withColumn("rn", F.row_number().over(W.orderBy(*order)))
    assert (
        got.join(want.withColumnRenamed("rn", "rn2"), "uid")
        .filter(F.col("rn") != F.col("rn2"))
        .count()
        == 0
    )
    # ntile arithmetic edges: n < k gives each row its own bucket 1..n
    small = spark.range(3).select((F.col("id") + 1).alias("rn"))
    buckets = [
        r["b"]
        for r in small.select(
            _ntile_from_rank(F.col("rn"), F.lit(3).cast("long"), 5).alias("b")
        )
        .orderBy("b")
        .collect()
    ]
    assert buckets == [1, 2, 3]


def test_filter_agreement_cells_partition_corpus(spark):
    from jobminer_spark.operators.agreement import filter_agreement_kappa

    (row,) = filter_agreement_kappa(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    cells = (
        row["n_both_keep"]
        + row["n_quality_only"]
        + row["n_rep_only"]
        + row["n_both_drop"]
    )
    assert row["n_docs"] == n_docs and cells == n_docs
    assert -1000 <= row["kappa_permille"] <= 1000
    assert 0 <= row["keep_jaccard_permille"] <= 1000
    # both gates are non-trivial on the fixture (each keeps and drops)
    assert row["n_both_keep"] > 0 and row["n_both_drop"] > 0


def test_kappa_permille_matches_python_reference(spark):
    """The exact-integer kappa equals the RATIONAL textbook formula
    truncated to permille, on the fixture's own confusion counts.
    Fraction, not float: a float reference double-rounds, and when the
    true permille sits exactly on an integer boundary the float can
    land one off — the test must be exact, not fixture-lucky
    (ADVICE r13)."""
    from fractions import Fraction

    from jobminer_spark.operators.agreement import (
        filter_agreement_kappa,
        lang_agreement_kappa,
        lang_confusion_matrix,
    )

    (row,) = filter_agreement_kappa(spark, SF_DIR).collect()
    a, b, c, d = (
        row["n_both_keep"],
        row["n_quality_only"],
        row["n_rep_only"],
        row["n_both_drop"],
    )
    n = a + b + c + d
    po = Fraction(a + d, n)
    pe = Fraction((a + b) * (a + c) + (c + d) * (b + d), n * n)
    kappa = (po - pe) / (1 - pe)
    assert row["kappa_permille"] == int(kappa * 1000)  # trunc toward 0

    (lrow,) = lang_agreement_kappa(spark, SF_DIR).collect()
    cells = lang_confusion_matrix(spark, SF_DIR).collect()
    n2 = sum(r["n_docs"] for r in cells)
    diag = sum(r["n_docs"] for r in cells if r["labeled_lang"] == r["lang_pred"])
    rows: dict = {}
    cols: dict = {}
    for r in cells:
        rows[r["labeled_lang"]] = rows.get(r["labeled_lang"], 0) + r["n_docs"]
        cols[r["lang_pred"]] = cols.get(r["lang_pred"], 0) + r["n_docs"]
    pe2 = Fraction(sum(rows[l] * cols.get(l, 0) for l in rows), n2 * n2)
    kappa2 = (Fraction(diag, n2) - pe2) / (1 - pe2)
    assert lrow["n_docs"] == n2 and lrow["n_agree"] == diag
    assert lrow["kappa_permille"] == int(kappa2 * 1000)


def test_ks_and_tvd_match_python_reference(spark):
    """The exact-integer KS and TVD equal the RATIONAL textbook values
    (truncated to permille) recomputed in Python from the same split —
    Fraction, not float, so truncation is exact even when the true
    permille lies on an integer boundary (ADVICE r13)."""
    from jobminer_spark.operators.drift import (
        ks_drift_event_values,
        tvd_drift_event_types,
    )

    ev = [
        (r["us"], r["vq"], r["et"])
        for r in load_table(spark, SF_DIR, "events")
        .select(
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
            F.floor(F.col("value") * 100.0).cast("long").alias("vq"),
            F.col("event_type").alias("et"),
        )
        .collect()
    ]
    # split point over ALL events; KS grid over non-null values only
    mid = (min(e[0] for e in ev) + max(e[0] for e in ev)) // 2
    s1 = sorted(e[1] for e in ev if e[0] < mid and e[1] is not None)
    s2 = sorted(e[1] for e in ev if e[0] >= mid and e[1] is not None)
    n1, n2 = len(s1), len(s2)
    grid = sorted(set(s1) | set(s2))
    import bisect
    from fractions import Fraction

    d = max(
        abs(
            Fraction(bisect.bisect_right(s1, v), n1)
            - Fraction(bisect.bisect_right(s2, v), n2)
        )
        for v in grid
    )
    (row,) = ks_drift_event_values(spark, SF_DIR).collect()
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["n_value_buckets"] == len(grid)
    assert row["ks_permille"] == int(d * 1000)

    from collections import Counter

    # TVD counts EVERY event (null-valued rows included), so its
    # totals are the all-event half sizes, not the KS grid's
    c1 = Counter(e[2] for e in ev if e[0] < mid)
    c2 = Counter(e[2] for e in ev if e[0] >= mid)
    m1, m2 = sum(c1.values()), sum(c2.values())
    types = set(c1) | set(c2)
    from fractions import Fraction

    tvd = Fraction(1, 2) * sum(
        abs(Fraction(c1[t], m1) - Fraction(c2[t], m2)) for t in types
    )
    (trow,) = tvd_drift_event_types(spark, SF_DIR).collect()
    assert trow["n_types"] == len(types)
    assert trow["tvd_permille"] == int(tvd * 1000)


def _write_events_adversarial(d, rows):
    """rows: (event_id, ts_us, user_id, event_type, value|None). Write
    a fixture-shaped events.parquet via pyarrow with timestamp[us]
    (the Spark-write INT96/nanos footer trap — see
    test_properties._write_events)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(list(cols[1]), pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    papq.write_table(table, str(d / "events.parquet"))


def _drift_both_engines(spark, name, sf_dir):
    """Run a drift query AND its DuckDB oracle over the same tmp
    fixture; return (spark_rows, oracle_rows) sorted-by-column dicts."""
    import duckdb

    from jobminer_spark.registry import ORACLES, QUERIES, load_all_operators

    load_all_operators()
    sdf = QUERIES[name](spark, sf_dir)
    srow = [tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    res = con.execute(ORACLES[name])
    cols = [c[0] for c in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    drow = [tuple(r[i] for i in order) for r in res.fetchall()]
    return srow, drow


def test_tvd_sees_null_valued_type_disappearing(spark, tmp_path):
    """Review r13: an event type that NEVER carries a value (click)
    vanishing from the second half must register as categorical drift
    — and both engines must agree on the exact permille."""
    rows = (
        # first half: 4 clicks (value NULL) + 4 purchases
        [(i, 1_000_000 * i, 1, "click", None) for i in range(4)]
        + [(10 + i, 1_000_000 * i, 2, "purchase", 5.0) for i in range(4)]
        # second half: purchases only — the clicks are GONE
        + [(20 + i, 100_000_000 + 1_000_000 * i, 3, "purchase", 5.0) for i in range(8)]
    )
    _write_events_adversarial(tmp_path, rows)
    srow, drow = _drift_both_engines(
        spark, "tvd_drift_event_types", str(tmp_path)
    )
    assert srow == drow
    (row,) = [dict(zip(sorted(["n1", "n2", "n_types", "sum_scaled_gap", "tvd_permille"]), r)) for r in srow]
    assert row["n1"] == 8 and row["n2"] == 8  # ALL events counted
    # half 1 is 50/50 click/purchase, half 2 is 100% purchase: TVD = 0.5
    assert row["tvd_permille"] == 500


def test_ks_degenerate_half_yields_null_not_crash(spark, tmp_path):
    """Review r13: all events at ONE timestamp puts every row in the
    second half (us < mid is empty) — the permilles must be NULL in
    BOTH engines under pinned ANSI, never a divide-by-zero."""
    rows = [(i, 42_000_000, 1, "click", float(i)) for i in range(6)]
    _write_events_adversarial(tmp_path, rows)
    for name in ("ks_drift_event_values", "tvd_drift_event_types"):
        srow, drow = _drift_both_engines(spark, name, str(tmp_path))
        assert srow == drow, name
        # the permille column (sorted order) is NULL on both sides
        assert any(v is None for v in srow[0]), name


def test_chain_doubling_survives_key_gaps(spark, tmp_path):
    """Review r13: a hole in the customer key domain must not dangle
    a pointer — predecessor-key edges keep the chain closed, both
    engines agree, and the round count still pins to the (shorter)
    chain's bit length."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as papq

    import duckdb

    from jobminer_spark.registry import ORACLES, QUERIES, load_all_operators

    load_all_operators()
    # keys 0..99 with 37 and 61..63 missing: 96 chain nodes, depth 95
    keys = [k for k in range(100) if k != 37 and not 61 <= k <= 63]
    papq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.array([f"c{k}" for k in keys], pa.string()),
                "c_nationkey": pa.array([0] * len(keys), pa.int64()),
                "c_acctbal": pa.array([1.0] * len(keys), pa.float64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    name = "hierarchy_chain_depths_doubling"
    sdf = QUERIES[name](spark, str(tmp_path))
    (row,) = sdf.collect()
    d_max = len(keys) - 1  # chain over all keys >= 1, root 0
    assert row["max_depth"] == d_max
    assert row["n_nodes"] == d_max + 1
    assert row["n_rounds"] == math.ceil(math.log2(d_max))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet')"
    )
    res = con.execute(ORACLES[name])
    cols = [c[0] for c in res.description]
    (orow,) = res.fetchall()
    assert dict(zip(cols, orow)) == {c: row[c] for c in cols}


def test_chain_doubling_driver_hop_edges(spark, tmp_path):
    """r20 continuation: the per-round hop side is now fed from the
    bounded per-round collect as a JVM VALUES relation. Pin the two
    edges of that loop against the oracle: a single-node chain (the
    loop never runs — zero VALUES relations built, n_rounds 0) and a
    depth-2 chain (exactly one VALUES round), both bit-identical to
    the DuckDB recursion."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    import duckdb

    from jobminer_spark.registry import ORACLES, QUERIES, load_all_operators

    load_all_operators()
    name = "hierarchy_chain_depths_doubling"
    for keys, want_rounds, want_depth in [([1], 0, 1), ([1, 5], 1, 2)]:
        d = tmp_path / f"chain{len(keys)}"
        d.mkdir()
        papq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(keys, pa.int64()),
                    "c_name": pa.array([f"c{k}" for k in keys], pa.string()),
                    "c_nationkey": pa.array([0] * len(keys), pa.int64()),
                    "c_acctbal": pa.array([1.0] * len(keys), pa.float64()),
                }
            ),
            str(d / "customer.parquet"),
        )
        (row,) = QUERIES[name](spark, str(d)).collect()
        assert row["n_rounds"] == want_rounds
        assert row["max_depth"] == want_depth
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{d}/customer.parquet')"
        )
        res = con.execute(ORACLES[name])
        cols = [c[0] for c in res.description]
        (orow,) = res.fetchall()
        assert dict(zip(cols, orow)) == {c: row[c] for c in cols}
        con.close()


def test_heavy_hitters_mg_guarantee_adversarial(spark):
    """The two-pass heavy-hitters path can never MISS a true heavy
    hitter (the Misra-Gries superset guarantee), even when the heavy
    token is spread thin across partitions among many distinct light
    tokens designed to evict it from the per-partition sketches."""
    from pyspark.sql import functions as F

    from jobminer_spark.operators.heavyhit import heavy_hitters

    # 32 partitions x (6 'hot' + 494 unique noise) tokens: 'hot' is
    # only ~1.2% of each partition but globally > n/100
    rows = []
    for p in range(32):
        rows.extend(f"noise_{p}_{i}" for i in range(494))
        rows.extend(["hot"] * 6)
    tokens = (
        spark.createDataFrame([(t,) for t in rows], "token string")
        .repartition(32)
    )
    got = heavy_hitters(tokens, k=100)
    res = {r.token: r.cnt for r in got.collect()}
    n = len(rows)
    assert res == {"hot": 192}  # 32*6, the only token > n/100
    assert 192 > n // 100
