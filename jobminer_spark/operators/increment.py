"""Incremental ingestion dedup: admit a new batch against a kept corpus.

A recurring training-data pipeline rarely re-dedups the whole corpus;
each ingest round asks "which INCOMING documents survive against what
we already kept?" — the asymmetric version of the near-dup pipeline
(the reference's probe-before-insert, database.py:116-123, lifted from
key equality to content similarity). Semantics here:

* build trigram-Jaccard >= 0.8 near-dup components over the union
  (dedupe._neardup_edges + star contraction with a hard convergence
  check — the same oracle-pinned primitives);
* a component containing ANY existing document admits NO incoming
  members (they are all transitive near-dups of kept content);
* an incoming-only component admits exactly its minimum doc_id
  (first-write-wins within the batch);
* isolated incoming documents admit themselves.

The existing/incoming split is simulated on the fixture as
doc_id % 3 == 0 (existing), everything else incoming — the operator
itself takes any boolean split.

Scale shape: identical to the batch near-dup pipeline (one inverted-
index shuffle for edges, O(diameter) narrow label rounds, one rollup
per component) — the asymmetry is a column predicate, not a new join,
so incremental admission costs no more than the full dedup whose
components it reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Safe at module level: registry._apply_window_order makes the window
# order explicit after load, so this import cannot perturb attestation
# slots even if this module is imported first.
from jobminer_spark.operators.dedupe import (
    _CC_EDGES_CTE,
    _SHINGLES_CTE,
    _neardup_edges,
    connected_components_propagation,
    connected_components_star,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


def admit_incoming(
    docs: DataFrame, is_existing: F.Column
) -> DataFrame:
    """(doc_id, n_members) for every ADMITTED incoming document under
    the component rules in the module docstring. ``docs`` needs
    (doc_id, text); ``is_existing`` is any boolean column over it.

    Components come from the star-contraction variant with a HARD
    convergence requirement: admission is a keep/drop decision, and
    acting on an unconverged label set would admit transitive
    near-dups of existing content (a near-dup chain longer than the
    round cap would split). Star converges in O(log² n) rounds
    regardless of chain length, so the cap is never the binding
    constraint in practice — and if it ever is, this raises instead
    of silently over-admitting."""
    edges = _neardup_edges(docs)
    comps = connected_components_star(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        max_rounds=60,
        require_converged=True,
    )
    labeled = (
        docs.select("doc_id", is_existing.alias("is_existing"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            "is_existing",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    per = labeled.groupBy("component").agg(
        F.max(F.when(F.col("is_existing"), 1).otherwise(0)).alias("has_existing"),
        F.min(F.when(~F.col("is_existing"), F.col("doc_id"))).alias("min_incoming"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return per.filter(
        (F.col("has_existing") == 0) & F.col("min_incoming").isNotNull()
    ).select(F.col("min_incoming").alias("doc_id"), "n_members")


@query(
    "incremental_neardup_admission",
    oracle=f"""
    WITH RECURSIVE {_CC_EDGES_CTE},
    reach(src, dst) AS (
      SELECT src, dst FROM bidir
      UNION
      SELECT r.src, e.dst FROM reach r JOIN bidir e ON r.dst = e.src
    ),
    comp AS (
      SELECT doc_id, MIN(m) AS component
      FROM (
        SELECT src AS doc_id, dst AS m FROM reach
        UNION ALL
        SELECT DISTINCT src, src FROM bidir
      )
      GROUP BY doc_id
    ),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             (d.doc_id % 3 = 0) AS is_existing
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    per AS (
      SELECT component,
             MAX(CASE WHEN is_existing THEN 1 ELSE 0 END) AS has_existing,
             MIN(CASE WHEN NOT is_existing THEN doc_id END) AS min_incoming,
             CAST(COUNT(*) AS BIGINT) AS n_members
      FROM labeled GROUP BY component
    )
    SELECT min_incoming AS doc_id, n_members
    FROM per
    WHERE has_existing = 0 AND min_incoming IS NOT NULL
    """,
)
def incremental_neardup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission decision for the simulated ingest batch: the oracle
    recomputes the same components via the recursive-CTE transitive
    closure and applies the same component rules, so any drift in the
    edge set, the propagation fixpoint, or the admission filter turns
    the row red."""
    docs = load_table(spark, sf_dir, "documents")
    return admit_incoming(docs, F.col("doc_id") % 3 == 0)


_CONTAIN_T = 0.9


@query(
    "contained_document_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    both_dirs AS (
      SELECT doc_a AS contained_doc, doc_b AS container_doc,
             CAST(n_inter AS DOUBLE) / sa.n_sh AS containment
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      UNION ALL
      SELECT doc_b, doc_a,
             CAST(n_inter AS DOUBLE) / sb.n_sh AS containment
      FROM inter
      JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT contained_doc, container_doc, containment
    FROM both_dirs
    WHERE containment >= {_CONTAIN_T}
    """,
)
def contained_document_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (the case symmetric Jaccard
    misses): a small document quoted or reposted inside a much larger
    one has |A∩B|/|A| ≈ 1 while J(A,B) = |A∩B|/|A∪B| stays low, so a
    Jaccard threshold never fires. Containment = shared trigrams over
    the CONTAINED side's trigram count, both directions emitted, at
    the 0.9 threshold (Lee et al. 2022 treat containment separately
    from symmetric near-dup for exactly this reason — public paper)."""
    return containment_pairs(load_table(spark, sf_dir, "documents"), _CONTAIN_T)


def containment_pairs(docs: DataFrame, t: float = _CONTAIN_T) -> DataFrame:
    """(contained_doc, container_doc, containment) for every ordered
    pair with trigram containment >= t.

    Plan: pure reuse of the inverted-index pair counts — the inter/
    sizes frames are the same one-shuffle machinery as
    ngram_jaccard_top_pairs; containment adds only the per-direction
    ratio projection, no new shuffle."""
    from jobminer_spark.operators.dedupe import (
        SHINGLE_MAX_DF,
        _jaccard_pair_counts,
    )

    pc = _jaccard_pair_counts(docs, 3, max_df=SHINGLE_MAX_DF)
    a_in_b = pc.select(
        F.col("doc_a").alias("contained_doc"),
        F.col("doc_b").alias("container_doc"),
        (F.col("n_inter").cast("double") / F.col("n_sh_a")).alias("containment"),
    )
    b_in_a = pc.select(
        F.col("doc_b").alias("contained_doc"),
        F.col("doc_a").alias("container_doc"),
        (F.col("n_inter").cast("double") / F.col("n_sh_b")).alias("containment"),
    )
    return a_in_b.unionByName(b_in_a).filter(F.col("containment") >= t)


# ---------------------------------------------------------------------------
# Containment-aware survivor selection: the containment edges finally
# CONSUMED, not just emitted — a doc quoted inside a larger one joins
# the container's component and the keep-the-longest canonical pick
# drops it (the container wins by n_chars construction: a container
# has strictly more trigrams than what it contains).
# ---------------------------------------------------------------------------

_CC_CONTAIN_EDGES_CTE = f"""
    {_SHINGLES_CTE},
    jedges AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
    ),
    cedges AS (
      SELECT doc_a, doc_b FROM inter JOIN sizes sa ON sa.doc_id = doc_a
      WHERE CAST(n_inter AS DOUBLE) / sa.n_sh >= {_CONTAIN_T}
      UNION
      SELECT doc_a, doc_b FROM inter JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / sb.n_sh >= {_CONTAIN_T}
    ),
    alledges AS (SELECT * FROM jedges UNION SELECT * FROM cedges),
    bidir AS (
      SELECT doc_a AS src, doc_b AS dst FROM alledges
      UNION
      SELECT doc_b, doc_a FROM alledges
    )
"""


def survivors_with_containment(docs: DataFrame, t: float = _CONTAIN_T) -> DataFrame:
    """(component, survivor_doc_id, n_members) with the component
    graph = (Jaccard >= 0.8 near-dup edges) ∪ (containment >= t
    edges). Survivor = keep-the-longest (n_chars desc, doc_id asc) —
    the standard near-dup pick, which for a containment edge is
    exactly the container.

    Plan: containment edges are a projection over the SAME
    inverted-index pair counts the Jaccard edges come from (one
    full-data shuffle total — Spark recomputes the branch, see
    _jaccard_pair_counts' buffer note), then one CC propagation and
    one max_by rollup per component. No new shuffle class vs the
    plain survivor pipeline."""
    jac = _neardup_edges(docs)
    cont = containment_pairs(docs, t).select(
        F.col("contained_doc").alias("doc_a"),
        F.col("container_doc").alias("doc_b"),
    )
    edges = jac.unionByName(cont)
    comps = connected_components_propagation(edges)
    j = comps.join(docs.select("doc_id", "n_chars"), "doc_id")
    return j.groupBy("component").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("n_chars").alias("q"), (-F.col("doc_id")).alias("nd")),
        ).alias("survivor_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


@query(
    "neardup_survivors_with_containment",
    oracle=f"""
    WITH RECURSIVE {_CC_CONTAIN_EDGES_CTE},
    reach(src, dst) AS (
      SELECT src, dst FROM bidir
      UNION
      SELECT r.src, e.dst FROM reach r JOIN bidir e ON r.dst = e.src
    ),
    comp AS (
      SELECT doc_id, MIN(m) AS component
      FROM (
        SELECT src AS doc_id, dst AS m FROM reach
        UNION ALL
        SELECT DISTINCT src, src FROM bidir
      )
      GROUP BY doc_id
    ),
    ranked AS (
      SELECT c.component, c.doc_id,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY c.component) AS n_members
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT component, doc_id AS survivor_doc_id, n_members
    FROM ranked WHERE rk = 1
    """,
)
def neardup_survivors_with_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor pipeline extended with containment edges: the
    oracle's recursive-CTE fixpoint runs over the UNION edge set
    (Jaccard ∪ containment, both recomputed independently from the
    shingle index), so a drift in either edge family, the union, the
    propagation, or the survivor pick turns this row red."""
    docs = load_table(spark, sf_dir, "documents")
    return survivors_with_containment(docs)
