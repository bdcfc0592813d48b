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

Two execution paths, pinned to the same oracle:

* ``admit_incoming`` — the full-recompute reference semantics (edges
  over the union; cost of one full dedup per call);
* ``admit_incoming_incremental`` — the 100 TB shape: the kept corpus
  pays one indexing pass (``build_corpus_shingle_index``), then each
  ingest batch probes the persisted index at O(batch + touched
  postings) cost — per-ingest cost proportional to the BATCH, not the
  corpus. Equality with the full recompute holds by construction
  (union-df cap semantics, see the section comment below) and is
  enforced by the shared oracle + the cap-transition test.
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
    SHINGLE_MAX_DF,
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


# Shared by incremental_neardup_admission AND the index-probe variant
# below: the two Spark paths must produce the identical answer, so
# they are pinned to the identical full-recompute oracle.
_ADMISSION_ORACLE = f"""
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
    """


@query("incremental_neardup_admission", oracle=_ADMISSION_ORACLE)
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
    # Star contraction with a HARD convergence requirement, not the
    # propagation default: survivor selection is a keep/drop decision,
    # and containment edges specifically build CHAIN-shaped components
    # (d1 ⊂ d2 ⊂ d3 — successive revisions), the diameter shape that
    # blows past propagation's round cap and would silently split one
    # component into several kept "survivors".
    comps = connected_components_star(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        max_rounds=60,
        require_converged=True,
    )
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


# ---------------------------------------------------------------------------
# ACTUALLY-incremental admission: a persisted corpus shingle index,
# probed per ingest batch. admit_incoming above re-runs
# _neardup_edges over existing ∪ incoming — cost of a full-corpus
# dedup per batch, the wrong shape at 100 TB (a 0.1% daily batch
# would pay 100% corpus cost daily). Here the corpus pays its
# indexing cost ONCE (build_corpus_shingle_index) and each ingest
# batch costs O(batch + touched postings):
#
#   edges(batch)   = in-row pair gen over the BATCH's posting lists
#   taint(batch)   = batch shingles ⋈ corpus postings -> J >= 0.8
#   admission      = CC over batch edges; components/isolates with any
#                    taint edge admit nothing, the rest admit min id
#
# The df cap is applied on the UNION document frequency
# (df_corpus + df_batch), reproducing the full recompute's shingle
# survivorship exactly — including "transition" shingles the batch
# pushes over the cap, whose corpus postings are subtracted from the
# stored per-doc sizes. Equality with the full recompute is therefore
# by construction, and the probe query below is pinned to the SAME
# oracle as the full-recompute query.
# ---------------------------------------------------------------------------


def build_corpus_shingle_index(
    docs: DataFrame, path: str, n: int = 3, max_df: int = SHINGLE_MAX_DF
) -> None:
    """Write the kept corpus's inverted shingle index under ``path``:

    * ``vocab``     — (shingle, df) for the FULL vocabulary (needed to
      compute union df for batch shingles, even over-cap ones);
    * ``postings``  — (shingle, doc_id) for df <= max_df only (an
      over-cap shingle is dead forever: df only grows);
    * ``doc_sizes`` — (doc_id, n_sh) per corpus doc over surviving
      shingles (the Jaccard denominator baseline).

    One full-corpus shuffle (the df aggregation) — the once-per-corpus
    cost the per-batch probe amortizes away. Vocabulary grows
    sublinearly in corpus size; postings are df-capped."""
    import os

    from jobminer_spark.operators.common import word_shingles

    # Materialize the shingle frame ONCE: it feeds both the vocab
    # aggregation and the postings write, and a lazy recompute would
    # re-shingle (and re-shuffle) the whole corpus a second time —
    # exactly the cost this once-per-corpus build exists to amortize.
    sh = word_shingles(docs, n).localCheckpoint(eager=True)
    vocab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    vocab.write.mode("overwrite").parquet(os.path.join(path, "vocab"))
    spark = docs.sparkSession
    vocab_r = spark.read.parquet(os.path.join(path, "vocab"))
    live = vocab_r.filter(F.col("df") <= max_df).select("shingle")
    postings = sh.join(live, "shingle")
    postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
    postings_r = spark.read.parquet(os.path.join(path, "postings"))
    (
        postings_r.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "doc_sizes"))
    )


def admit_incoming_incremental(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    n: int = 3,
    max_df: int = SHINGLE_MAX_DF,
    min_j: float = 0.8,
) -> DataFrame:
    """(doc_id, n_members) admitted from ``batch`` against the
    persisted corpus index — same contract and same answer as
    admit_incoming over the union, at per-batch cost.

    Scale shape: the corpus side enters ONLY through index scans
    (vocab join keyed on the batch's shingles — AQE broadcasts the
    batch side when small; postings join restricted to surviving
    batch shingles, each bounded by the df cap). No corpus text is
    re-shingled; no corpus-sized shuffle exists in the plan
    (tests/test_plans.py asserts the scan set)."""
    import os

    from jobminer_spark.operators.common import word_shingles
    from jobminer_spark.operators.dedupe import pair_counts_from_doclists

    vocab = spark.read.parquet(os.path.join(index_path, "vocab"))
    postings = spark.read.parquet(os.path.join(index_path, "postings"))
    doc_sizes = spark.read.parquet(os.path.join(index_path, "doc_sizes"))

    bsh = word_shingles(batch, n)  # distinct (doc_id, shingle)
    bdf = bsh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_batch"))
    udf = (
        bdf.join(vocab.withColumnRenamed("df", "df_corpus"), "shingle", "left")
        .select(
            "shingle",
            F.coalesce("df_corpus", F.lit(0)).alias("df_corpus"),
            (F.coalesce("df_corpus", F.lit(0)) + F.col("df_batch")).alias(
                "df_union"
            ),
        )
    )
    surviving = udf.filter(F.col("df_union") <= max_df).select("shingle")
    # shingles the BATCH pushes over the cap: their corpus postings no
    # longer count toward any corpus doc's surviving-shingle size
    transitions = udf.filter(
        (F.col("df_corpus") <= max_df) & (F.col("df_union") > max_df)
    ).select("shingle")

    bsh_live = bsh.join(surviving, "shingle")
    b_sizes = bsh_live.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    dead_counts = (
        postings.join(transitions, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dead"))
    )
    e_sizes = doc_sizes.join(dead_counts, "doc_id", "left").select(
        "doc_id",
        (F.col("n_sh") - F.coalesce("n_dead", F.lit(0))).alias("n_sh"),
    )

    # cross edges (taint): batch postings ⋈ corpus postings on the
    # surviving shingles — only the batch's shingles touch the index
    cross = (
        bsh_live.select(F.col("doc_id").alias("doc_i"), "shingle")
        .join(
            postings.select("shingle", F.col("doc_id").alias("doc_e")),
            "shingle",
        )
        .groupBy("doc_i", "doc_e")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    tainted_docs = (
        cross.join(
            b_sizes.select(
                F.col("doc_id").alias("doc_i"), F.col("n_sh").alias("n_sh_i")
            ),
            "doc_i",
        )
        .join(
            e_sizes.select(
                F.col("doc_id").alias("doc_e"), F.col("n_sh").alias("n_sh_e")
            ),
            "doc_e",
        )
        .filter(
            F.col("n_inter").cast("double")
            / (F.col("n_sh_i") + F.col("n_sh_e") - F.col("n_inter"))
            >= min_j
        )
        .select(F.col("doc_i").alias("doc_id"))
        .distinct()
    )

    # batch-internal edges: the same in-row pair generation as the
    # full path, over batch posting lists only
    bidx = bsh_live.groupBy("shingle").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ds")
    )
    bpairs = pair_counts_from_doclists(bidx)
    sa = b_sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = b_sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    bedges = (
        bpairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_inter").cast("double")
            / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter"))
            >= min_j
        )
        .select("doc_a", "doc_b")
    )

    comps = connected_components_star(
        bedges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        max_rounds=60,
        require_converged=True,
    )
    labeled = (
        batch.select("doc_id")
        .join(comps, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
        .join(tainted_docs.withColumn("tainted", F.lit(1)), "doc_id", "left")
    )
    per = labeled.groupBy("component").agg(
        F.max(F.coalesce("tainted", F.lit(0))).alias("has_taint"),
        F.min("doc_id").alias("min_incoming"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return per.filter(F.col("has_taint") == 0).select(
        F.col("min_incoming").alias("doc_id"), "n_members"
    )


_PROBE_INDEX_CACHE: dict[str, str] = {}


def _probe_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir per session) the corpus index for the
    simulated existing split. Lives in a temp dir for the session's
    lifetime — the read-back plans reference the files lazily, so
    eager deletion would break the driver's later collect."""
    if sf_dir not in _PROBE_INDEX_CACHE:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="corpus_shingle_index_")
        existing = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 3 == 0
        )
        build_corpus_shingle_index(existing, path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        _PROBE_INDEX_CACHE[sf_dir] = path
    return _PROBE_INDEX_CACHE[sf_dir]


@query("incremental_admission_probe", oracle=_ADMISSION_ORACLE)
def incremental_admission_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-probe admission path on the same fixture split as
    incremental_neardup_admission, pinned to the IDENTICAL
    full-recompute oracle: the per-batch path must reproduce the
    full-union answer bit-for-bit (union-df cap semantics included),
    so any drift between the incremental machinery and the batch
    pipeline turns this driver row red."""
    batch = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 != 0
    )
    return admit_incoming_incremental(
        spark, batch, _probe_index_for(spark, sf_dir)
    )


def update_corpus_shingle_index(
    spark: SparkSession,
    index_path: str,
    admitted: DataFrame,
    out_path: str,
    n: int = 3,
    max_df: int = SHINGLE_MAX_DF,
) -> None:
    """Functional index maintenance: write to ``out_path`` the index
    the corpus WOULD have if rebuilt over (indexed corpus ∪ admitted)
    — closing the incremental loop (probe, admit, then keep the index
    current without re-shingling the corpus).

    Per-table update shape:

    * ``vocab``     — full-outer df merge (vocab is sublinear in corpus
      size; the merge shuffles vocab-sized rows, not the corpus);
    * ``postings``  — old postings MINUS postings of shingles the
      batch pushes over the cap (broadcast anti-join against the tiny
      transition set — a scan+filter, no corpus shuffle; with a
      shingle-bucketed layout only buckets containing batch shingles
      need rewriting), PLUS the admitted docs' postings on shingles
      whose merged df survives the cap;
    * ``doc_sizes`` — old sizes minus per-doc dead-transition counts,
      plus admitted docs' sizes.

    Equality with a from-scratch rebuild is exact (same union-df cap
    semantics as the probe) and enforced by
    test_index_update_matches_rebuild, including the cap-transition
    case."""
    import os

    from jobminer_spark.operators.common import word_shingles

    vocab = spark.read.parquet(os.path.join(index_path, "vocab"))
    postings = spark.read.parquet(os.path.join(index_path, "postings"))
    doc_sizes = spark.read.parquet(os.path.join(index_path, "doc_sizes"))

    # materialized once: feeds the df merge, the postings add, AND the
    # admitted doc sizes — a lazy plan would re-shingle the batch 3×
    ash = word_shingles(admitted, n).localCheckpoint(eager=True)
    adf = ash.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_batch"))

    merged = (
        vocab.withColumnRenamed("df", "df_corpus")
        .join(adf, "shingle", "full_outer")
        .select(
            "shingle",
            F.coalesce("df_corpus", F.lit(0)).alias("df_corpus"),
            (
                F.coalesce("df_corpus", F.lit(0)) + F.coalesce("df_batch", F.lit(0))
            ).alias("df"),
        )
    )
    merged.select("shingle", "df").write.mode("overwrite").parquet(
        os.path.join(out_path, "vocab")
    )
    merged_r = spark.read.parquet(os.path.join(out_path, "vocab"))

    # transition set from the WRITTEN vocab (merged_r) joined back to
    # the old vocab — not from the lazy `merged` plan, which would
    # re-execute the full-outer df merge a second time
    transitions = (
        vocab.filter(F.col("df") <= max_df)
        .select("shingle")
        .join(merged_r.filter(F.col("df") > max_df).select("shingle"), "shingle")
    )
    surviving = merged_r.filter(F.col("df") <= max_df).select("shingle")
    new_postings = postings.join(
        F.broadcast(transitions), "shingle", "left_anti"
    ).unionByName(ash.join(surviving, "shingle").select("shingle", "doc_id"))
    new_postings.write.mode("overwrite").parquet(os.path.join(out_path, "postings"))

    dead_counts = (
        postings.join(F.broadcast(transitions), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dead"))
    )
    a_sizes = (
        ash.join(surviving, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    new_sizes = (
        doc_sizes.join(dead_counts, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("n_sh") - F.coalesce("n_dead", F.lit(0))).alias("n_sh"),
        )
        .filter(F.col("n_sh") > 0)
        .unionByName(a_sizes)
    )
    new_sizes.write.mode("overwrite").parquet(os.path.join(out_path, "doc_sizes"))


_INDEX_UPDATE_CACHE: dict[tuple[str, str], tuple[int, int, int, int]] = {}


def _index_update_scalars(spark: SparkSession, sf_dir: str) -> tuple[int, int, int, int]:
    """(n_vocab, n_postings, n_docs, n_mismatch) after probing the
    corpus index, admitting the fixture batch, updating the index,
    and diffing it table-by-table against a from-scratch rebuild.
    Cached per (session, fixture) — the pipeline is deterministic over
    the immutable fixture (same discipline as the streaming-audit
    drains)."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _INDEX_UPDATE_CACHE:
        return _INDEX_UPDATE_CACHE[cache_key]

    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") % 3 == 0)
    old_idx = _probe_index_for(spark, sf_dir)
    admitted_ids = admit_incoming_incremental(
        spark, docs.filter(F.col("doc_id") % 3 != 0), old_idx
    ).select("doc_id")
    admitted_docs = docs.join(admitted_ids, "doc_id")

    work = tempfile.mkdtemp(prefix="index_update_audit_")
    try:
        upd = os.path.join(work, "upd")
        ref = os.path.join(work, "ref")
        update_corpus_shingle_index(spark, old_idx, admitted_docs, upd)
        build_corpus_shingle_index(existing.unionByName(admitted_docs), ref)
        n_mismatch = 0
        counts = {}
        for table in ("vocab", "postings", "doc_sizes"):
            a = spark.read.parquet(os.path.join(upd, table))
            b = spark.read.parquet(os.path.join(ref, table))
            n_mismatch += a.exceptAll(b).count() + b.exceptAll(a).count()
            counts[table] = a.count()
        result = (
            counts["vocab"],
            counts["postings"],
            counts["doc_sizes"],
            n_mismatch,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    _INDEX_UPDATE_CACHE[cache_key] = result
    return result


@query(
    "incremental_index_update_audit",
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
             MIN(CASE WHEN NOT is_existing THEN doc_id END) AS min_incoming
      FROM labeled GROUP BY component
    ),
    admitted AS (
      SELECT min_incoming AS doc_id FROM per
      WHERE has_existing = 0 AND min_incoming IS NOT NULL
    ),
    kept AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT d.doc_id, d.text FROM documents d
      JOIN admitted a ON a.doc_id = d.doc_id
    ),
    ktok AS MATERIALIZED (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM kept
    ),
    ksh AS MATERIALIZED (
      SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM ktok a
      JOIN ktok b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
      JOIN ktok c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
    ),
    kvocab AS MATERIALIZED (SELECT shingle, COUNT(*) AS df FROM ksh GROUP BY shingle),
    kpost AS MATERIALIZED (
      SELECT s.shingle, s.doc_id FROM ksh s
      JOIN kvocab v USING (shingle) WHERE v.df <= {SHINGLE_MAX_DF}
    ),
    ksizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kpost GROUP BY doc_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM kvocab) AS n_vocab,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM kpost) AS n_postings,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ksizes) AS n_docs,
           CAST(0 AS BIGINT) AS n_mismatch
    """,
)
def incremental_index_update_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audit of the full incremental loop — probe the
    corpus index, admit the batch, UPDATE the index, diff against a
    from-scratch rebuild. The oracle independently recomputes the
    admission fixpoint and the post-ingest corpus's vocabulary /
    capped postings / doc-size counts, and expects zero update-vs-
    rebuild mismatches — so a drift in admission, the df merge, the
    transition pruning, or the size corrections turns this driver row
    red."""
    n_vocab, n_postings, n_docs, n_mismatch = _index_update_scalars(spark, sf_dir)
    return spark.range(1).select(
        F.lit(n_vocab).cast("long").alias("n_vocab"),
        F.lit(n_postings).cast("long").alias("n_postings"),
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.lit(n_mismatch).cast("long").alias("n_mismatch"),
    )
