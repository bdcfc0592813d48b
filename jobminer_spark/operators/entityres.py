"""Entity resolution: q-gram blocking + edit-distance verification +
deterministic argmin match resolution — the record-linkage workload a
scraper pipeline needs when the same employer/customer arrives with
typo'd names across sources (reference analog: the dup-key skip on
insert, database.py:106-158, generalized from exact keys to fuzzy
names; SURVEY.md §2 rows 8/25 taken to approximate identity).

The fixture has no naturally dirty names, so the dirty side is
DERIVED in-query: each customer name gets exactly one deterministic
single-character perturbation (delete / substitute / insert, chosen
by the md5-derived integer both engines compute identically), which
gives the resolver a ground truth to be scored against — the oracle
re-derives the same dirty registry, so every count hash-pins.

Scale shape: the classic ER funnel. Blocking is an inverted 3-gram
index with a document-frequency cap (high-df grams — shared prefixes,
zero runs — never generate candidates), so candidate generation is
index-bounded, NEVER all-pairs; verification (levenshtein, exact
integer in both engines) runs per candidate row; resolution is one
per-dirty-key window. At 100 TB the gram index is the only corpus
shuffle, identical to the n-gram dedup family's shape
(dedupe.py), and the df cap bounds every bucket's fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import spread_scan as _spread_scan
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# grams with document frequency above this never block (they are
# non-discriminative: "Cus", "000"); the cap bounds per-gram fan-out
GRAM_MAX_DF = 50
# verification threshold: true perturbation distance is 1, but 2
# keeps the verifier honest about near-collisions between entities
MAX_DIST = 2
_BIG = 1_000_000_000


def _dirty_sql() -> str:
    """DuckDB CTE deriving the deterministic dirty registry."""
    return f"""
    base AS (
      SELECT c_custkey AS true_key, c_name AS name,
             CAST(concat('0x', substring(md5(c_name), 1, 8)) AS BIGINT)
               % {_BIG} AS h
      FROM customer
    ),
    dirty AS (
      SELECT true_key, name,
             h % 3 AS op,
             (h // 3) % (length(name) - 1) + 2 AS pos,
             CASE h % 3
               WHEN 0 THEN substring(name, 1, (h // 3) % (length(name) - 1) + 1)
                        || substring(name, (h // 3) % (length(name) - 1) + 3)
               WHEN 1 THEN substring(name, 1, (h // 3) % (length(name) - 1) + 1)
                        || 'x'
                        || substring(name, (h // 3) % (length(name) - 1) + 3)
               ELSE substring(name, 1, (h // 3) % (length(name) - 1) + 1)
                        || 'q'
                        || substring(name, (h // 3) % (length(name) - 1) + 2)
             END AS dirty_name
      FROM base
    )
    """


_GRAMS_SQL = f"""
    clean_grams AS (
      SELECT DISTINCT key, name, substring(name, i, 3) AS gram FROM (
        SELECT c_custkey AS key, c_name AS name,
               unnest(generate_series(1, length(c_name) - 2)) AS i
        FROM customer
      )
    ),
    kept_grams AS (
      SELECT gram FROM (
        SELECT gram, COUNT(DISTINCT key) AS df FROM clean_grams GROUP BY gram
      ) WHERE df <= {GRAM_MAX_DF}
    ),
    dirty_grams AS (
      SELECT DISTINCT dirty_id, dirty_name,
             substring(dirty_name, i, 3) AS gram
      FROM (
        SELECT true_key AS dirty_id, dirty_name,
               unnest(generate_series(1, length(dirty_name) - 2)) AS i
        FROM dirty
      )
    ),
    cands AS (
      SELECT DISTINCT dg.dirty_id, dg.dirty_name, cg.key, cg.name
      FROM dirty_grams dg
      JOIN (SELECT cg0.* FROM clean_grams cg0 JOIN kept_grams k USING (gram))
        cg USING (gram)
    ),
    verified AS (
      SELECT dirty_id, key, levenshtein(dirty_name, name) AS dist
      FROM cands
      WHERE levenshtein(dirty_name, name) <= {MAX_DIST}
    ),
    resolved AS (
      SELECT dirty_id, key AS matched_key, dist,
             ROW_NUMBER() OVER (
               PARTITION BY dirty_id ORDER BY dist, key
             ) AS rk
      FROM verified
    )
"""


def _derive_dirty(cust: DataFrame) -> DataFrame:
    """(true_key, dirty_name): one md5-chosen single-char edit per
    clean name — same integers, same substrings as the oracle CTE."""
    h = (
        F.conv(F.substring(F.md5(F.col("c_name")), 1, 8), 16, 10).cast("long")
        % _BIG
    )
    base = cust.select(
        F.col("c_custkey").alias("true_key"),
        F.col("c_name").alias("name"),
        h.alias("h"),
    )
    pos = F.expr("h div 3") % (F.length("name") - 1) + 2
    head = F.expr("substring(name, 1, pos - 1)")
    tail_skip = F.expr("substring(name, pos + 1)")
    tail_keep = F.expr("substring(name, pos)")
    return (
        base.withColumn("pos", pos)
        .withColumn(
            "dirty_name",
            F.when(F.col("h") % 3 == 0, F.concat(head, tail_skip))
            .when(F.col("h") % 3 == 1, F.concat(head, F.lit("x"), tail_skip))
            .otherwise(F.concat(head, F.lit("q"), tail_keep)),
        )
        .select("true_key", "dirty_name")
    )


def _resolution(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> tuple[DataFrame, ...]:
    """Shared ER funnel: returns (dirty, cands, verified, resolved).

    ``checkpoint=False`` keeps the full lineage visible — the plan
    tests assert on the un-truncated build (a localCheckpoint hides
    the joins it cuts from the physical plan)."""
    # spread_scan: the gram distinct used to repartition the index as
    # a side effect; with the per-row dedup below there is no exchange
    # left before the explode + index join, so a degenerate (fewer
    # splits than cores) customer scan would serialize the whole
    # funnel. Safe here: every consumer is order-insensitive (cands is
    # distinct'd, row_number orders by the per-group-unique
    # (dist, key)). No-op on any real at-scale table.
    cust = _spread_scan(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    )
    dirty = _derive_dirty(cust)

    # Names ride the candidate distinct deliberately: an r20 A/B of
    # the "shuffle ids only, re-attach names after" variant (guide
    # §2.3) measured ~0.3 s SLOWER at sf0.1 — the two extra broadcast
    # builds + join stages cost more than the ~54 B/row the narrower
    # distinct saves on ~600k candidate rows. At payload widths where
    # that trade flips (long names, added columns), split the distinct
    # to (dirty_id, cand_key) and rejoin the entity tables.
    def grams(df: DataFrame, key: str, name: str) -> DataFrame:
        # Global DISTINCT(key, name, gram) ≡ per-row array_distinct:
        # both inputs carry each key on exactly ONE row (c_custkey is
        # the PK; dirty derives one row per customer), so duplicate
        # grams can only come from repeats WITHIN a single name. The
        # per-row dedup needs no exchange at all — this removes both
        # gram-index shuffles (~240 k wide rows each at sf0.1) from
        # the funnel (guide §2.4: a distinct on data that is already
        # unique across rows).
        g = F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(name) - 2),
                    lambda i: F.col(name).substr(i, F.lit(3)),
                )
            )
        ).alias("gram")
        return df.select(
            F.col(key).alias("key"), F.col(name).alias("name"), g
        )

    cg = grams(cust, "c_custkey", "c_name")
    dg = grams(dirty, "true_key", "dirty_name")
    # NOTE: cands/resolved are localCheckpointed below — er_funnel_audit
    # aggregates the funnel five independent times, and without a
    # lineage cut each branch would replay the gram-index join +
    # levenshtein verification from scratch.
    # (gram, key) is already distinct after the per-row dedup above,
    # so COUNT == COUNT(DISTINCT key) — the plain count skips the
    # distinct-aggregate's extra dedup exchange.
    kept = (
        cg.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= GRAM_MAX_DF)
        .select("gram")
    )
    # the kept-gram set is |grams|/df-capped-small: broadcast it, the
    # same one-shuffle-saved argument as common.word_shingles
    cg_kept = cg.join(F.broadcast(kept), "gram")
    cands = (
        dg.alias("d")
        .join(cg_kept.alias("c"), "gram")
        .select(
            F.col("d.key").alias("dirty_id"),
            F.col("d.name").alias("dirty_name"),
            F.col("c.key").alias("cand_key"),
            F.col("c.name").alias("cand_name"),
        )
        .distinct()
    )
    if checkpoint:
        cands = cands.localCheckpoint(eager=False)
    # Bounded edit distance (guide §1.2 per-row work): the 3-arg
    # levenshtein bails out once the distance exceeds MAX_DIST
    # (O(len·k) band instead of the full O(len²) matrix) and returns
    # -1 for the >-threshold pairs the old filter dropped anyway; for
    # every surviving row the banded value IS the exact distance, so
    # the verified frame is row-identical (A/B: 2.96 → 2.46 s at
    # sf0.1 on the full funnel).
    verified = cands.select(
        "dirty_id",
        F.col("cand_key").alias("key"),
        F.levenshtein("dirty_name", "cand_name", MAX_DIST).alias("dist"),
    ).filter(F.col("dist") >= 0)
    w = W.partitionBy("dirty_id").orderBy("dist", "key")
    resolved = verified.select(
        "dirty_id",
        F.col("key").alias("matched_key"),
        "dist",
        F.row_number().over(w).alias("rk"),
    )
    if checkpoint:
        resolved = resolved.localCheckpoint(eager=False)
    return dirty, cands, verified, resolved


@query(
    "er_blocked_match_resolution",
    oracle=f"""
    WITH {_dirty_sql()},
    {_GRAMS_SQL}
    SELECT dirty_id, matched_key, CAST(dist AS BIGINT) AS dist
    FROM resolved WHERE rk = 1
    """,
)
def er_blocked_match_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One best match per dirty record: min edit distance, ties broken
    by lowest candidate key (a dirty name one edit from several
    entities — e.g. a perturbed trailing digit — resolves
    deterministically).

    checkpoint=False: this query consumes the funnel exactly once, so
    the lineage cuts that er_funnel_audit's five branches need would
    only cost here — and the cut between the row_number window and the
    rk=1 filter blocks InferWindowGroupLimit (the rank-filter → top-1
    per-group rewrite), forcing a full window materialization. The
    un-cut plan lets Catalyst optimize across the whole funnel."""
    _, _, _, resolved = _resolution(spark, sf_dir, checkpoint=False)
    return resolved.filter(F.col("rk") == 1).select(
        "dirty_id", "matched_key", "dist"
    )


@query(
    "er_funnel_audit",
    oracle=f"""
    WITH {_dirty_sql()},
    {_GRAMS_SQL}
    SELECT
      (SELECT COUNT(*) FROM dirty) AS n_dirty,
      (SELECT COUNT(*) FROM cands) AS n_candidate_pairs,
      (SELECT COUNT(*) FROM verified) AS n_verified_pairs,
      (SELECT COUNT(*) FROM resolved WHERE rk = 1) AS n_resolved,
      (SELECT COUNT(*) FROM resolved WHERE rk = 1 AND matched_key = dirty_id)
        AS n_correct
    """,
)
def er_funnel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ER quality funnel as one hash-pinned row: how many dirty
    records, how many blocking candidates they generated, how many
    survived edit-distance verification, how many resolved, and how
    many resolved to their TRUE source entity (the derived ground
    truth makes precision directly measurable)."""
    dirty, cands, verified, resolved = _resolution(spark, sf_dir)
    top = resolved.filter(F.col("rk") == 1)
    n = F.count(F.lit(1))
    return (
        dirty.agg(n.alias("n_dirty"))
        .crossJoin(F.broadcast(cands.agg(n.alias("n_candidate_pairs"))))
        .crossJoin(F.broadcast(verified.agg(n.alias("n_verified_pairs"))))
        .crossJoin(F.broadcast(top.agg(n.alias("n_resolved"))))
        .crossJoin(
            F.broadcast(
                top.filter(F.col("matched_key") == F.col("dirty_id")).agg(
                    n.alias("n_correct")
                )
            )
        )
    )
