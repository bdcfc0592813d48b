"""Python-reference differentials and invariants for the r9
association/linkage modules (regress, cooccur, entityres,
graphstats): each Spark result is re-derived with plain Python over
the same fixture, so a Spark-side expression bug cannot hide behind
an oracle that shares the same SQL shape."""

from __future__ import annotations

import collections
import hashlib
import itertools

import duckdb
import pytest

from tests.conftest import SF_DIR


def _pdf(table: str):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def test_revenue_trend_slope_matches_python(spark):
    """Exact-integer OLS moments recomputed in pure Python (cents
    quantization, month indexing, the 5 moments) must equal the Spark
    result row-for-row."""
    import math

    from jobminer_spark.operators.regress import (
        _MONTH_EPOCH,
        revenue_trend_slope_per_segment,
    )

    cust = _pdf("customer").set_index("c_custkey")["c_mktsegment"]
    orders = _pdf("orders")
    monthly: dict[tuple[str, int], int] = collections.defaultdict(int)
    for _, o in orders.iterrows():
        seg = cust[o["o_custkey"]]
        d = o["o_orderdate"]
        x = d.year * 12 + d.month - _MONTH_EPOCH
        monthly[(seg, x)] += int(math.floor(o["o_totalprice"] * 100))
    expect = {}
    for seg in {s for s, _ in monthly}:
        pts = [(x, y) for (s, x), y in monthly.items() if s == seg]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        expect[seg] = (n, n * sxy - sx * sy, n * sxx - sx * sx, sy)
    got = {
        r["segment"]: (
            r["n_months"],
            r["slope_num"],
            r["slope_den"],
            r["total_cents"],
        )
        for r in revenue_trend_slope_per_segment(spark, SF_DIR).collect()
    }
    assert got == expect


def test_cooccurrence_pairs_match_python(spark):
    """Pair supports, marginals, and the integer-scaled lift
    recomputed from scratch: tokenize, resolve the dictionary
    first-match-wins, count co-containing docs."""
    from jobminer_spark.data.skill_dictionary import dictionary_rows
    from jobminer_spark.operators.cooccur import (
        LIFT_SCALE,
        MIN_SUPPORT,
        skill_cooccurrence_pairs,
    )

    terms = {t for t, _c, _r in dictionary_rows()}
    docs = _pdf("documents")
    n_docs = len(docs)
    doc_skills = {
        r["doc_id"]: {
            t for t in {w.lower() for w in r["text"].split(" ") if w} if t in terms
        }
        for _, r in docs.iterrows()
    }
    df_count: collections.Counter = collections.Counter()
    pair_count: collections.Counter = collections.Counter()
    for sk in doc_skills.values():
        for s in sk:
            df_count[s] += 1
        for a, b in itertools.combinations(sorted(sk), 2):
            pair_count[(a, b)] += 1
    expect = {}
    for (a, b), n_ab in pair_count.items():
        if n_ab >= MIN_SUPPORT:
            ca, cb = df_count[a], df_count[b]
            expect[(a, b)] = (
                n_ab,
                ca,
                cb,
                n_docs,
                (n_ab * n_docs * LIFT_SCALE) // (ca * cb),
            )
    got = {
        (r["s1"], r["s2"]): (
            r["n_ab"],
            r["c_a"],
            r["c_b"],
            r["n_docs"],
            r["lift_q"],
        )
        for r in skill_cooccurrence_pairs(spark, SF_DIR).collect()
    }
    assert got == expect
    for (a, b), (n_ab, ca, cb, _n, _l) in got.items():
        assert a < b and n_ab <= min(ca, cb)


def _python_dirty(name: str) -> str:
    """Pure-Python twin of entityres._derive_dirty."""
    h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 1_000_000_000
    pos = (h // 3) % (len(name) - 1) + 2  # 1-indexed
    i = pos - 1
    if h % 3 == 0:
        return name[:i] + name[i + 1 :]
    if h % 3 == 1:
        return name[:i] + "x" + name[i + 1 :]
    return name[:i] + "q" + name[i:]


def test_entityres_dirty_derivation_matches_python(spark):
    """The md5-chosen perturbation must agree char-for-char with the
    Python twin, and every dirty name is exactly one edit from its
    source (the ground-truth property the funnel audit scores
    against)."""
    from jobminer_spark.operators.entityres import _derive_dirty
    from jobminer_spark.sources import load_table

    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    names = {r["c_custkey"]: r["c_name"] for r in cust.collect()}
    got = {
        r["true_key"]: r["dirty_name"]
        for r in _derive_dirty(cust).collect()
    }
    assert set(got) == set(names)
    for k, clean in names.items():
        assert got[k] == _python_dirty(clean), (k, clean, got[k])
        assert got[k] != clean


def test_entityres_resolution_invariants(spark):
    """Resolution output: one row per resolved dirty id, dist within
    threshold, and — because the true source is always 1 edit away —
    any resolved match has dist 1 whenever the true entity survived
    blocking with a better (dist, key) rank than impostors."""
    from jobminer_spark.operators.entityres import (
        MAX_DIST,
        er_blocked_match_resolution,
    )

    rows = er_blocked_match_resolution(spark, SF_DIR).collect()
    seen = [r["dirty_id"] for r in rows]
    assert len(seen) == len(set(seen))
    assert rows and all(0 <= r["dist"] <= MAX_DIST for r in rows)
    # correct matches must dominate on this fixture: the perturbation
    # is a single edit and blocking retains most suffix grams
    n_correct = sum(1 for r in rows if r["matched_key"] == r["dirty_id"])
    assert n_correct >= len(rows) * 2 // 3


def test_triangle_count_matches_python(spark):
    """Triangle census recomputed from the collected edge list (small
    at test SF) with a set-intersection counter."""
    from jobminer_spark.operators.dedupe import _neardup_edges
    from jobminer_spark.operators.graphstats import triangle_count_neardup
    from jobminer_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    edges = {
        (r["doc_a"], r["doc_b"]) for r in _neardup_edges(docs).collect()
    }
    nbrs: dict[int, set[int]] = collections.defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    n_tri = sum(
        1
        for a, b in edges
        for c in nbrs[a] & nbrs[b]
        if c > b  # a < b < c exactly once
    )
    row = triangle_count_neardup(spark, SF_DIR).collect()[0]
    assert row["n_triangles"] == n_tri
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(nbrs)


def test_degree_histogram_matches_python(spark):
    from jobminer_spark.operators.dedupe import _neardup_edges
    from jobminer_spark.operators.graphstats import degree_histogram_neardup
    from jobminer_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    deg: collections.Counter = collections.Counter()
    for r in _neardup_edges(docs).collect():
        deg[r["doc_a"]] += 1
        deg[r["doc_b"]] += 1
    hist = collections.Counter(deg.values())
    got = {
        r["degree"]: r["n_nodes"]
        for r in degree_histogram_neardup(spark, SF_DIR).collect()
    }
    assert got == dict(hist)
