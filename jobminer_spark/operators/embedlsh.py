"""Random-hyperplane LSH (sign random projection, Charikar STOC'02 —
public algorithm) over the embedding column.

This is the production blocking shape for embedding near-dup:
``dedupe.embedding_sign_pairs`` buckets by the signs of the LEADING
dimensions (cheap, but sensitive to how variance is distributed across
dims); here each signature bit is the sign of the dot product with a
pseudo-random ±1 hyperplane, so every dimension contributes to every
bit and P[bit collision] = 1 - angle/π for any vector pair. Bits are
banded LSH-style: pairs agreeing on ANY band become candidates, then
an exact cosine re-rank orders them.

Cross-engine determinism, the part that makes this oracle-checkable:

* hyperplane components are ±1 derived from md5(f"{{j}}_{{d}}") parity —
  the same recipe as common.hash_bucket, reproducible in Python
  (hashlib, baked into the Spark plan as literals), and in DuckDB SQL
  (md5 + substring);
* the projection sign is computed on 1e-15-quantized longs
  (floor(v*1e15), the common.QUANT recipe), so the sign decision is
  exact integer arithmetic — no float-summation-order divergence
  between Spark's in-row fold and DuckDB's unordered SUM.

Scale shape: signature bits are computed IN-ROW from broadcast literal
planes (zero shuffles for the signature), the band self-join carries
narrow (band_no, band_value, vec_id) rows exactly like the SimHash /
MinHash band joins, and candidate volume is bounded by band collisions
— never all-pairs. Raise n_planes/band_bits with corpus volume the way
LSH adds bands (collision probability per band = p^band_bits).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import (
    QUANT,
    VEC_NORMS_CTE,
    dot_col as _dot_col,
    norm_col as _norm_col,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# 32 planes in 4 bands of 8 bits: for random vectors a band collides
# at ~(1/2)^8 so candidates are ~1.5% of all-pairs (measured 1.0% at
# sf0.1 for 2 bands of 8; 4 bands ≈ 2×), while a true near-dup at
# cosine 0.97 (bit-agreement p = 1 - θ/π ≈ 0.92) is caught by
# >= 1 of 4 bands with probability 1-(1-0.92^8)^4 ≈ 0.95. The earlier
# 4-bit-band default blocked only ~23% — fine at fixture scale, far
# too permissive at corpus scale.
N_PLANES = 32
BAND_BITS = 8  # 32 bits -> 4 bands of 8


def _plane_sign(j: int, d: int) -> int:
    """±1 from md5 parity — deterministic, engine-free (hashlib)."""
    return 1 if int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1


def plane_matrix(n_planes: int = N_PLANES, dims: int = 64) -> list[list[int]]:
    return [[_plane_sign(j, d) for d in range(dims)] for j in range(n_planes)]


def hyperplane_band_pairs(
    emb: DataFrame,
    n_planes: int = N_PLANES,
    band_bits: int = BAND_BITS,
    dims: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b) candidate pairs colliding on >= 1 signature band.

    The ±1 planes enter the plan as literal arrays (they are pure
    constants — nothing to broadcast or join), each bit is an in-row
    zip_with/aggregate fold over the quantized vector, and the only
    shuffle is the narrow band self-join.

    ``dims`` defaults to the corpus's actual embedding length (one
    bounded first() probe). A vector whose length differs from dims
    produces a NULL projection; the bit expression deliberately lets
    that null PROPAGATE to the band value (`.when(<0, 0)` with no
    otherwise), so mismatched vectors match no band and are excluded
    from candidates. Defaulting nulls to bit 0 instead would give
    every mismatched vector the all-zero signature and degrade the
    band self-join toward |table|² — the blowup LSH exists to
    prevent."""
    if dims is None:
        first = emb.select(F.size("embedding").alias("d")).first()
        if first is None:
            return emb.select(
                F.col("vec_id").alias("vec_a"), F.col("vec_id").alias("vec_b")
            ).limit(0)
        dims = first["d"]
    planes = plane_matrix(n_planes, dims)
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long"),
    )
    df = emb.select("vec_id", qv.alias("qv"))
    bits = []
    for pl in planes:
        w = F.array(*[F.lit(s) for s in pl])
        proj = F.aggregate(
            F.zip_with(F.col("qv"), w, lambda x, s: x * s.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        # no .otherwise: a null projection (length-mismatched vector)
        # stays null through the band sum and joins nothing
        bits.append(F.when(proj >= 0, F.lit(1)).when(proj < 0, F.lit(0)))
    n_bands = n_planes // band_bits
    band_vals = F.array(
        *[
            sum(
                (bits[b * band_bits + i] * F.lit(1 << i) for i in range(band_bits)),
                start=F.lit(0),
            ).cast("long")
            for b in range(n_bands)
        ]
    )
    banded = df.select("vec_id", F.posexplode(band_vals).alias("band_no", "band_value"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


@query(
    "embedding_hyperplane_lsh_topk",
    oracle=f"""
    WITH {VEC_NORMS_CTE},
    -- dims guard mirroring the Spark side's null-propagation contract:
    -- a vector whose length differs from the corpus dims (taken from
    -- one probe row there, the min vec_id here — identical whenever
    -- dims are uniform) gets NO signature; without this, SUM over
    -- whichever ords exist would happily sign a mismatched vector and
    -- the two engines would diverge exactly on the case the Spark
    -- docstring highlights.
    ref_dims AS (
      SELECT COUNT(*) AS d FROM elems
      WHERE vec_id = (SELECT MIN(vec_id) FROM elems)
    ),
    qv AS (
      SELECT vec_id, ord, CAST(floor(val * {QUANT}.0) AS BIGINT) AS q
      FROM elems
      WHERE vec_id IN (SELECT vec_id FROM elems GROUP BY vec_id
                       HAVING COUNT(*) = (SELECT d FROM ref_dims))
    ),
    planes AS (
      SELECT j, ord,
             CASE WHEN CAST(concat('0x', substring(
                      md5(CAST(j AS VARCHAR) || '_' || CAST(ord - 1 AS VARCHAR)),
                      1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT DISTINCT ord FROM elems)
      CROSS JOIN generate_series(0, {N_PLANES - 1}) t(j)
    ),
    bits AS (
      SELECT qv.vec_id, p.j,
             CASE WHEN SUM(qv.q * p.s) >= 0 THEN 1 ELSE 0 END AS bit
      FROM qv JOIN planes p ON p.ord = qv.ord
      GROUP BY qv.vec_id, p.j
    ),
    bands AS (
      SELECT vec_id, j // {BAND_BITS} AS band_no,
             CAST(SUM(bit * (1 << (j % {BAND_BITS}))) AS BIGINT) AS band_value
      FROM bits GROUP BY vec_id, j // {BAND_BITS}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_value = b.band_value
       AND a.vec_id < b.vec_id
    ),
    pair_dots AS (
      SELECT c.vec_a, c.vec_b,
             CAST(SUM(CAST(floor(ea.val * eb.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0 AS dot
      FROM cand c
      JOIN elems ea ON ea.vec_id = c.vec_a
      JOIN elems eb ON eb.vec_id = c.vec_b AND eb.ord = ea.ord
      GROUP BY c.vec_a, c.vec_b
    )
    SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
    FROM pair_dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    ORDER BY dot / (na.nrm * nb.nrm) DESC, vec_a, vec_b
    LIMIT 50
    """,
)
def embedding_hyperplane_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 near-dup pairs under random-hyperplane LSH blocking with
    exact cosine re-rank — the oracle recomputes the identical planes
    (md5 parity), quantized projection signs, band collisions, and
    re-rank, so any divergence in the signature or banding turns the
    driver row red."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cand = hyperplane_band_pairs(emb)
    e = emb.select(
        "vec_id", "embedding", _norm_col(F.col("embedding")).alias("nrm")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    scored = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot_col(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), "vec_a", "vec_b").limit(50)
