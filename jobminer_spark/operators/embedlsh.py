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
        from jobminer_spark.operators.common import probed_embedding_dims

        dims = probed_embedding_dims(emb)  # per-session cached probe
        if dims is None:
            return emb.select(
                F.col("vec_id").alias("vec_a"), F.col("vec_id").alias("vec_b")
            ).limit(0)
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


# -- shared DuckDB CTE builders: one definition of the plane matrix,
#    bit fold, and banding used by BOTH oracles below, so the gram
#    definitions cannot drift between the top-k query and the recall
#    audit (same discipline as common.repetition_cte).

_PLANES_CTE = f"""
    planes AS (
      SELECT j, ord,
             CASE WHEN CAST(concat('0x', substring(
                      md5(CAST(j AS VARCHAR) || '_' || CAST(ord - 1 AS VARCHAR)),
                      1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT DISTINCT ord FROM elems)
      CROSS JOIN generate_series(0, {N_PLANES - 1}) t(j)
    )"""


def _bands_cte(qv_rel: str, out: str) -> str:
    """bits + ``out`` band CTEs over a quantized relation
    ``qv_rel(vec_id, ord, q)`` — signature recipe identical to the
    Spark side's in-row fold."""
    return f"""
    {out}_bits AS (
      SELECT q.vec_id, p.j,
             CASE WHEN SUM(q.q * p.s) >= 0 THEN 1 ELSE 0 END AS bit
      FROM {qv_rel} q JOIN planes p ON p.ord = q.ord
      GROUP BY q.vec_id, p.j
    ),
    {out} AS (
      SELECT vec_id, j // {BAND_BITS} AS band_no,
             CAST(SUM(bit * (1 << (j % {BAND_BITS}))) AS BIGINT) AS band_value
      FROM {out}_bits GROUP BY vec_id, j // {BAND_BITS}
    )"""


def _cand_cte(bands_rel: str) -> str:
    return f"""
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM {bands_rel} a JOIN {bands_rel} b
        ON a.band_no = b.band_no AND a.band_value = b.band_value
       AND a.vec_id < b.vec_id
    )"""


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
    {_PLANES_CTE},
    {_bands_cte("qv", "bands")},
    {_cand_cte("bands")},
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


# ---------------------------------------------------------------------------
# Recall audit: the module docstring's 32-plane/8-bit-band sizing claim
# ("a cosine-0.97 near-dup pair is caught by >= 1 of 4 bands with
# probability ~0.95") as an executable, oracle-pinned check. The fixture
# embeddings carry NO high-cosine pairs (measured max ~0.51), so the
# audit PLANTS them: for every subset vector a deterministic twin with
# each element scaled by (1 ± EPS), the sign from md5 parity — the same
# engine-free recipe as the planes — which lands the planted pair at
# cosine ≈ 1/sqrt(1+EPS²) ≈ 0.98. Everything (twins, signatures, band
# collisions, exact cosine) is exact quantized arithmetic, so recall is
# a deterministic number both engines must agree on bit-for-bit.
# ---------------------------------------------------------------------------

RECALL_EPS = 0.2          # twin element scale ±20% -> planted cos ~0.98
RECALL_SUBSET_MOD = 10    # audit probes every 10th vector (bounded)
RECALL_MIN_COS = 0.97     # "true pair" threshold the claim speaks to
_TWIN_OFFSET = 10_000_000


def _perturb_factor(base_id, i):
    """(1 ± EPS) multiplier for element i of base vector ``base_id`` —
    md5-parity sign, reproducible in DuckDB (see the oracle's pert
    CTE) and plain Python."""
    parity = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("p_"),
                        base_id.cast("string"),
                        F.lit("_"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    return F.when(parity == 0, F.lit(1.0 + RECALL_EPS)).otherwise(
        F.lit(1.0 - RECALL_EPS)
    )


def planted_twins(emb: DataFrame) -> DataFrame:
    """(base_id, vec_id, embedding) — one deterministic perturbed twin
    per subset vector. In-row transform only: zero shuffles."""
    base = emb.filter(F.col("vec_id") % RECALL_SUBSET_MOD == 0)
    # Two projections on purpose: Spark 4's lateral column alias
    # resolution would bind a `vec_id` reference inside the transform
    # lambda to the SHADOWING `vec_id + offset` alias of the same
    # select list — silently hashing the twin's id instead of the
    # base's. Renaming to base_id first removes the shadow.
    return base.select(F.col("vec_id").alias("base_id"), "embedding").select(
        "base_id",
        (F.col("base_id") + _TWIN_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double") * _perturb_factor(F.col("base_id"), i),
        ).alias("embedding"),
    )


def planted_twins_cte() -> str:
    """``sub`` + ``pert`` CTEs over ``elems`` (VEC_NORMS_CTE must be in
    scope) — the SQL twin of :func:`planted_twins`, shared by this
    module's recall audit and semdedup's cluster-dedup oracle so the
    planting recipe cannot drift between them."""
    return f"""
    sub AS (SELECT vec_id, ord, val FROM elems
            WHERE vec_id % {RECALL_SUBSET_MOD} = 0),
    pert AS MATERIALIZED (
      SELECT s.vec_id + {_TWIN_OFFSET} AS vec_id, s.ord,
             s.val * (CASE WHEN CAST(concat('0x', substring(
                        md5('p_' || CAST(s.vec_id AS VARCHAR) || '_'
                            || CAST(s.ord - 1 AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 2 = 0
                      THEN 1.0 + {RECALL_EPS} ELSE 1.0 - {RECALL_EPS} END)
               AS val
      FROM sub s
    )"""


TWIN_OFFSET = _TWIN_OFFSET  # public alias for cross-module consumers


@query(
    "hyperplane_lsh_recall_audit",
    oracle=f"""
    WITH {VEC_NORMS_CTE},
    {planted_twins_cte()},
    allel AS (SELECT * FROM sub UNION ALL SELECT * FROM pert),
    qv AS (SELECT vec_id, ord, CAST(floor(val * {QUANT}.0) AS BIGINT) AS q
           FROM allel),
    {_PLANES_CTE},
    {_bands_cte("qv", "bands")},
    {_cand_cte("bands")},
    pnorms AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(floor(val * val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
                  / {QUANT}.0) AS nrm
      FROM pert GROUP BY vec_id
    ),
    tp AS (
      SELECT s.vec_id AS vec_a, p.vec_id AS vec_b
      FROM sub s
      JOIN pert p ON p.vec_id = s.vec_id + {_TWIN_OFFSET} AND p.ord = s.ord
      GROUP BY s.vec_id, p.vec_id
      HAVING CAST(SUM(CAST(floor(s.val * p.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0
             / ((SELECT nrm FROM norms n WHERE n.vec_id = s.vec_id)
                * (SELECT nrm FROM pnorms q WHERE q.vec_id = p.vec_id))
             >= {RECALL_MIN_COS}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           CAST(COUNT(c.vec_a) AS BIGINT) AS n_detected,
           CAST(COUNT(*) - COUNT(c.vec_a) AS BIGINT) AS n_missed,
           CAST(COUNT(c.vec_a) AS DOUBLE) / COUNT(*) AS recall
    FROM tp LEFT JOIN cand c ON c.vec_a = tp.vec_a AND c.vec_b = tp.vec_b
    """,
)
def hyperplane_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the banded candidates against exact cosine >=
    {RECALL_MIN_COS} planted pairs (subset vector vs its perturbed
    twin). The oracle independently replants the twins, recomputes the
    signatures/bands/collisions and the exact quantized cosines, so a
    plane, banding, quantization, or candidate-join regression turns
    this driver row red; tests/test_operators.py additionally asserts
    a hard recall floor, making the sizing claim executable."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % RECALL_SUBSET_MOD == 0)
    twins = planted_twins(emb)
    union = base.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(twins.select("vec_id", "embedding"))
    cand = hyperplane_band_pairs(union).withColumn("hit", F.lit(1))
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        _norm_col(F.col("embedding")).alias("nrm_a"),
    )
    b = twins.select(
        F.col("base_id").alias("vec_a"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        _norm_col(F.col("embedding")).alias("nrm_b"),
    )
    tp = (
        a.join(b, "vec_a")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot_col(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= RECALL_MIN_COS)
    )
    j = tp.join(cand, ["vec_a", "vec_b"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.count("hit").alias("n_detected"),
        (F.count(F.lit(1)) - F.count("hit")).alias("n_missed"),
        (F.count("hit").cast("double") / F.count(F.lit(1))).alias("recall"),
    )
