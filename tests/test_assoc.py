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


def _python_baskets():
    """Pure-Python twin of cooccur.doc_baskets: each doc's K rarest
    distinct tokens (df asc, token asc)."""
    from jobminer_spark.operators.cooccur import K_BASKET

    docs = _pdf("documents")
    doc_toks = {
        r["doc_id"]: {w.lower() for w in r["text"].split(" ") if w}
        for _, r in docs.iterrows()
    }
    df_count: collections.Counter = collections.Counter()
    for toks in doc_toks.values():
        for t in toks:
            df_count[t] += 1
    return (
        {
            d: set(
                sorted(toks, key=lambda t: (df_count[t], t))[:K_BASKET]
            )
            for d, toks in doc_toks.items()
        },
        len(docs),
    )


def test_cooccurrence_pairs_match_python(spark):
    """Pair supports, basket marginals, and the integer-scaled lift
    recomputed from scratch: tokenize, pick each doc's K rarest
    tokens, count co-containing baskets."""
    from jobminer_spark.operators.cooccur import (
        LIFT_SCALE,
        MIN_SUPPORT,
        token_cooccurrence_pairs,
    )

    baskets, n_docs = _python_baskets()
    bdf: collections.Counter = collections.Counter()
    pair_count: collections.Counter = collections.Counter()
    for sk in baskets.values():
        for s in sk:
            bdf[s] += 1
        for a, b in itertools.combinations(sorted(sk), 2):
            pair_count[(a, b)] += 1
    expect = {}
    for (a, b), n_ab in pair_count.items():
        if n_ab >= MIN_SUPPORT:
            ca, cb = bdf[a], bdf[b]
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
        for r in token_cooccurrence_pairs(spark, SF_DIR).collect()
    }
    assert got == expect and got  # non-vacuous on every fixture SF
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


def test_trailing_zscore_outliers_match_python(spark):
    """The integer cross-multiplied z-test recomputed with a plain
    Python rolling window over (tus, event_id)-sorted events."""
    import math

    from jobminer_spark.operators.anomaly import (
        BASELINE_ROWS,
        MIN_BASELINE,
        VAL_QUANT,
        Z_THRESHOLD,
        trailing_zscore_outliers,
    )

    ev = duckdb.sql(
        f"SELECT event_id, event_type, epoch_us(ts) AS tus, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet') ORDER BY event_type, tus, event_id"
    ).fetchall()
    expect = set()
    hist: dict[str, list[int]] = collections.defaultdict(list)
    for event_id, et, _tus, value in ev:
        xq = int(math.floor(value * VAL_QUANT))
        h = hist[et][-BASELINE_ROWS:]
        n, s, ss = len(h), sum(h), sum(v * v for v in h)
        if n >= MIN_BASELINE and (n * xq - s) ** 2 > Z_THRESHOLD**2 * (
            n * ss - s * s
        ):
            expect.add((event_id, et, xq, n))
        hist[et].append(xq)
    got = {
        (r["event_id"], r["event_type"], r["xq"], r["n_baseline"])
        for r in trailing_zscore_outliers(spark, SF_DIR).collect()
    }
    assert got == expect


def test_doc_surprisal_matches_python(spark):
    from jobminer_spark.operators.surprisal import doc_surprisal_bits

    docs = _pdf("documents")
    n_docs = len(docs)
    occs = {
        r["doc_id"]: [w.lower() for w in r["text"].split(" ") if w]
        for _, r in docs.iterrows()
    }
    df: collections.Counter = collections.Counter()
    for toks in occs.values():
        for t in set(toks):
            df[t] += 1
    expect = {
        d: (
            len(toks),
            sum((n_docs // df[t]).bit_length() - 1 for t in toks),
        )
        for d, toks in occs.items()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_bits"])
        for r in doc_surprisal_bits(spark, SF_DIR).collect()
    }
    assert got == expect


def test_association_link_prediction_matches_python(spark):
    """Common-neighbor prediction on the positive-lift association
    graph recomputed in Python end-to-end (baskets -> lift -> edges
    -> wedges -> anti-join), and non-vacuous on the fixture."""
    from jobminer_spark.operators.cooccur import (
        LIFT_SCALE,
        MIN_SUPPORT,
        association_link_prediction,
    )

    baskets, n_docs = _python_baskets()
    bdf: collections.Counter = collections.Counter()
    pair_count: collections.Counter = collections.Counter()
    for sk in baskets.values():
        for s in sk:
            bdf[s] += 1
        for a, b in itertools.combinations(sorted(sk), 2):
            pair_count[(a, b)] += 1
    edges = {
        (a, b)
        for (a, b), n_ab in pair_count.items()
        if n_ab >= MIN_SUPPORT
        and (n_ab * n_docs * LIFT_SCALE) // (bdf[a] * bdf[b]) > LIFT_SCALE
    }
    nbrs: dict[str, set[str]] = collections.defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for c in nodes[i + 1 :]:
            if (a, c) in edges:
                continue
            cn = len(nbrs[a] & nbrs[c])
            if cn >= 2:
                expect[(a, c)] = cn
    got = {
        (r["s1"], r["s2"]): r["n_common"]
        for r in association_link_prediction(spark, SF_DIR).collect()
    }
    assert got == expect and got


def test_dq_constraint_audit_zero_on_healthy_fixture(spark):
    """Every constraint holds on the generator's output — and the
    checked-row count equals the table size for each check."""
    from jobminer_spark.operators.dq import dq_constraint_audit
    from jobminer_spark.sources import load_table

    n_orders = load_table(spark, SF_DIR, "orders").count()
    rows = {r["check_name"]: r for r in dq_constraint_audit(spark, SF_DIR).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r["n_checked"] == n_orders
        assert r["n_violations"] == 0


def test_dq_injection_fires_every_predicate(spark):
    """Each injected fault class is detected with the exact count the
    residue arithmetic predicts (the detector is alive, not
    vacuously zero)."""
    from jobminer_spark.operators.dq import dq_violation_injection_audit

    keys = [r[0] for r in duckdb.sql(
        f"SELECT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()]
    n7 = sum(1 for k in keys if k % 100 == 7)
    n13 = sum(1 for k in keys if k % 100 == 13)
    n21 = sum(1 for k in keys if k % 100 == 21)
    row = dq_violation_injection_audit(spark, SF_DIR).collect()[0]
    assert row["n_null_fk"] == n7 > 0
    assert row["n_fk_violations"] == n7  # nulled FKs are the only orphans
    assert row["n_negative"] == n13 > 0
    assert row["n_bad_status"] == n21 > 0


def test_pca_power_iteration_matches_python_and_improves(spark):
    """The integer fixed-point rounds recomputed exactly in Python
    (floor quantization, truncating renormalization), PLUS the
    semantic claims hash parity can't state: the Rayleigh quotient of
    the iterates over the PSD Gram matrix is non-decreasing, and v2
    is at least as aligned with numpy's dominant eigenvector as v1."""
    import numpy as np

    from jobminer_spark.operators.pca import CQ, XQ, pca_power_iteration_audit

    X = np.array(
        [e for e in _pdf("embeddings")["embedding"]], dtype=np.float64
    )
    xq = np.floor(X * XQ).astype(object)  # object -> exact python ints
    d = X.shape[1]
    C = [[int(sum(xq[v][i] * xq[v][j] for v in range(len(xq))))
          for j in range(d)] for i in range(d)]

    def tdiv(a: int, b: int) -> int:  # truncation toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    maxc = max(abs(C[i][j]) for i in range(d) for j in range(d))
    den = max(maxc // CQ, 1)
    Cn = [[tdiv(C[i][j], den) for j in range(d)] for i in range(d)]
    raw1 = [sum(Cn[i][j] * CQ for j in range(d)) for i in range(d)]
    m1 = max(max(abs(r) for r in raw1) // CQ, 1)
    v1 = [tdiv(r, m1) for r in raw1]
    raw2 = [sum(Cn[i][j] * v1[j] for j in range(d)) for i in range(d)]
    m2 = max(max(abs(r) for r in raw2) // CQ, 1)
    v2 = [tdiv(r, m2) for r in raw2]

    got = {r["i"]: (r["v1"], r["v2"])
           for r in pca_power_iteration_audit(spark, SF_DIR).collect()}
    assert got == {i: (v1[i], v2[i]) for i in range(d)}

    # semantic: Rayleigh non-decreasing and alignment improving
    Cf = np.array([[float(Cn[i][j]) for j in range(d)] for i in range(d)])
    w, vecs = np.linalg.eigh(Cf)
    top = vecs[:, -1]

    def rq(v):
        v = np.array(v, dtype=np.float64)
        return (v @ Cf @ v) / (v @ v)

    ones = np.ones(d)
    assert rq(v1) >= rq(ones) * (1 - 1e-9)
    assert rq(v2) >= rq(v1) * (1 - 1e-9)

    def cos(a, b):
        a = np.array(a, dtype=np.float64)
        return abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    assert cos(v2, top) >= cos(ones, top) - 1e-9
