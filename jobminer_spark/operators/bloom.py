"""Bloom-filter membership pre-filter (Bloom, CACM 1970 — public
algorithm): the probe-before-insert key check at corpus scale.

The reference probes every incoming key against the sink before
inserting (database.py:116-123). At 100 TB the sink's key set no
longer broadcasts — but a Bloom filter of it does: m bits summarize
any number of keys at a fixed false-positive rate, definite-new keys
(the overwhelming majority of a growing corpus) skip the exact
anti-join entirely, and only bloom-positive keys pay it. No false
negatives by construction, so the pre-filter never loses an upsert.

DataFrame-native representation: the filter is the DISTINCT SET OF SET
BIT POSITIONS, one narrow row per set bit — at most m rows, broadcast
by construction (m is a design constant, independent of key count).
Membership: a key is bloom-positive iff ALL of its k hash positions
are present — tested with one broadcast join + count-match, no
driver-side bitmap and no UDF. Bit positions come from the md5 recipe
of common.hash_bucket (conv of the first 8 hex nibbles, mod m), so
the oracle recomputes the identical filter and the identical
false-positive decisions — the fp COUNT is deterministic, not
statistical, and hash-pinned cross-engine.

Scale shape: build = one distinct-aggregation over (key, j) rows
(k×|keys| narrow rows in, <= m out with map-side combine); probe =
k in-row hashes per key + one broadcast semi-count against the bit
set. Nothing corpus-sized ever broadcasts or shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# Fixture sizing runs the filter deliberately SATURATED (~95% of bits
# set at sf0.01's ~750 keys x 4 hashes over 1024 bits) so the
# false-positive branch actually fires and its exact count is pinned —
# production m scales with the key count (both are parameters).
BLOOM_M = 1024  # bits
BLOOM_K = 4     # hash functions


def _bit_pos(key: Column, j: int, m: int = BLOOM_M) -> Column:
    """Bit position j for a key — md5 parity recipe, engine-free."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{j}_"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m
    )


def _bit_pos_sql(key_sql: str, j: int, m: int = BLOOM_M) -> str:
    return (
        f"CAST(concat('0x', substring(md5('b{j}_' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {m}"
    )


def bloom_build(keys: DataFrame, k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """(bitpos) — the distinct set bit positions for a frame with a
    single ``key`` column. <= m rows regardless of key count."""
    pos = keys.select(
        F.explode(
            F.array(*[_bit_pos(F.col("key"), j, m) for j in range(k)])
        ).alias("bitpos")
    )
    return pos.distinct()


def bloom_probe(
    probes: DataFrame, bits: DataFrame, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """(key, bloom_pass) for a frame with a single ``key`` column:
    bloom_pass = 1 iff all k positions are set. One broadcast join of
    the <= m-row bit set; keys never shuffle."""
    ppos = probes.select(
        "key",
        F.posexplode(
            F.array(*[_bit_pos(F.col("key"), j, m) for j in range(k)])
        ).alias("j", "bitpos"),
    )
    hit = ppos.join(
        F.broadcast(bits.withColumn("set", F.lit(1))), "bitpos", "left"
    )
    return hit.groupBy("key").agg(
        F.when(F.count(F.col("set")) == k, 1).otherwise(0).alias("bloom_pass")
    )


@query(
    "bloom_prefilter_counts",
    oracle=f"""
    WITH existing AS MATERIALIZED (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type AS key
      FROM events WHERE event_id % 3 = 0
    ),
    incoming AS MATERIALIZED (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type AS key
      FROM events WHERE event_id % 3 <> 0
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT bitpos FROM (
        {" UNION ALL ".join(f"SELECT {_bit_pos_sql('key', j)} AS bitpos FROM existing" for j in range(BLOOM_K))}
      )
    ),
    probe AS (
      SELECT i.key,
             CASE WHEN {" AND ".join(f"({_bit_pos_sql('i.key', j)}) IN (SELECT bitpos FROM bits)" for j in range(BLOOM_K))}
                  THEN 1 ELSE 0 END AS bloom_pass,
             CASE WHEN EXISTS (SELECT 1 FROM existing e WHERE e.key = i.key)
                  THEN 1 ELSE 0 END AS member
      FROM incoming i
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(member) AS BIGINT) AS n_member,
           CAST(SUM(CASE WHEN bloom_pass = 1 AND member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN member = 1 AND bloom_pass = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
    FROM probe
    """,
)
def bloom_prefilter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter over the simulated existing/incoming EVENT split
    of the events table (split on event_id so the same (user, type)
    key genuinely recurs across both sides — the membership path is
    exercised, not vacuous): the oracle recomputes the identical bit set
    and the identical pass/member decisions, so the false-positive
    count matches exactly and the false-negative count is pinned to
    ZERO — the Bloom guarantee as a hard driver row, not prose.

    Note the true membership is computed on the DISTINCT key sets, so
    n_member is what the exact anti-join (the second stage the bloom
    gates) would find."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(
            F.col("user_id").cast("string"), F.lit("|"), F.col("event_type")
        ).alias("key"),
        (F.col("event_id") % 3 == 0).alias("is_existing"),
    )
    existing = keyed.filter("is_existing").select("key").distinct()
    incoming = keyed.filter(~F.col("is_existing")).select("key").distinct()
    bits = bloom_build(existing)
    probed = bloom_probe(incoming, bits)
    member = existing.withColumn("member", F.lit(1)).select("key", "member")
    j = probed.join(member, "key", "left").select(
        "bloom_pass", F.coalesce("member", F.lit(0)).alias("member")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("bloom_pass").alias("n_bloom_pass"),
        F.sum("member").alias("n_member"),
        F.sum(
            F.when((F.col("bloom_pass") == 1) & (F.col("member") == 0), 1).otherwise(0)
        ).alias("n_false_positive"),
        F.sum(
            F.when((F.col("member") == 1) & (F.col("bloom_pass") == 0), 1).otherwise(0)
        ).alias("n_false_negative"),
    )
