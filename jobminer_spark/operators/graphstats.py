"""Structural statistics of the near-dup candidate graph — triangle
counting and the degree distribution. Dedup clusters that are cliques
(triangle-dense) are true duplicate families; sparse star shapes are
template/boilerplate artifacts — the triangle census is the standard
diagnostic (graph analog of the curation family's quality audits;
extends graphrank.py's PageRank surface over the SAME shared edge
builder, dedupe._neardup_edges).

Scale shape: triangle enumeration joins the canonically-oriented edge
list (doc_a < doc_b) to itself twice ON edge endpoints — with
ordered edges this is the standard "forward" algorithm: every
triangle is generated exactly once as a < b < c, the join fan-out is
bounded by the out-degree in the DAG orientation (low-id-first
orientation bounds it by O(sqrt(|E|)) per node on skew-free graphs —
Schank/Wagner's argument), and nothing is ever all-pairs. Degree
histogram is two narrow aggregations. Both reuse the df-capped
shingle-index edge set, so the corpus-sized work is shared with the
whole CC/PageRank family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.dedupe import _CC_EDGES_CTE, _neardup_edges
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "triangle_count_neardup",
    oracle=f"""
    WITH {_CC_EDGES_CTE},
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM edges e1
      JOIN edges e2 ON e2.doc_a = e1.doc_b
      JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT
      (SELECT COUNT(*) FROM tri) AS n_triangles,
      (SELECT COUNT(*) FROM edges) AS n_edges,
      (SELECT COUNT(*) FROM (SELECT src FROM bidir GROUP BY src)) AS n_nodes
    """,
)
def triangle_count_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the near-dup graph (plus edge and
    non-isolated-node counts) as one hash-pinned row. Each triangle
    a < b < c is enumerated once via the ordered-edge double join."""
    docs = load_table(spark, sf_dir, "documents")
    edges = _neardup_edges(docs).localCheckpoint(eager=False)
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        edges.select(F.col("doc_a").alias("n"))
        .union(edges.select("doc_b"))
        .distinct()
    )
    n = F.count(F.lit(1))
    return (
        tri.agg(n.alias("n_triangles"))
        .crossJoin(F.broadcast(edges.agg(n.alias("n_edges"))))
        .crossJoin(F.broadcast(nodes.agg(n.alias("n_nodes"))))
    )


@query(
    "degree_histogram_neardup",
    oracle=f"""
    WITH {_CC_EDGES_CTE},
    deg AS (
      SELECT src, COUNT(*) AS degree FROM bidir GROUP BY src
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def degree_histogram_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many documents have how many near-dup neighbors — the
    degree distribution over the undirected candidate graph (isolated
    documents excluded, as in the CC family). Two combiner-friendly
    aggregations; the histogram key space is bounded by the df cap's
    fan-out bound, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    edges = _neardup_edges(docs)
    bidir = edges.select(F.col("doc_a").alias("src")).union(
        edges.select("doc_b")
    )
    deg = bidir.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
