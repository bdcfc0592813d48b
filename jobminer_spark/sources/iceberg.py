"""Minimal Apache Iceberg table reader (+ format-v2 append writer) on
the pure-Python Avro codec — the metadata chain the spec defines, no
jar.

VERDICT r14's format-compatibility gap has two halves; Delta closed in
r15 (sources/delta.py), and Iceberg was "blocked" only because its
manifests are Avro container files. sources/avro.py removes that
blocker, so this module walks the spec's metadata chain
(https://iceberg.apache.org/spec/):

    metadata/version-hint.text → metadata/vN.metadata.json
      → snapshots[] (current-snapshot-id, or any — TIME TRAVEL)
      → snapshot.manifest-list (Avro: one record per manifest)
      → manifest files (Avro: entries {status, data_file})
      → live data files (status ≠ DELETED) → distributed parquet scan

Reader scope, stated: format v1/v2 metadata JSON, unpartitioned or
identity-partitioned parquet data files, the core required fields of
manifest-list and manifest entries (extra fields — field-ids, column
stats, split offsets — pass through the Avro decoder untouched and
unused). Snapshot semantics: each snapshot's manifest list is the
COMPLETE file inventory at that snapshot (the spec's model), so time
travel is just "read a different snapshot's list". Schema comes from
the metadata JSON's schema (id/name/required/type fields).

The writer emits the same chain — parquet data files, one manifest
per commit, a per-snapshot manifest list carrying every live
manifest, metadata vN JSON + version hint — with format-v2 append
semantics (review r15 promoted it from fixture-grade): monotone
snapshot sequence numbers (`last-sequence-number` in metadata,
`sequence-number` per snapshot, null-inherited in manifest entries)
and the manifest-list stats counts (files/rows added/existing/
deleted) a planner prunes by. Append-only, identity/unpartitioned
layouts; delete files, non-identity partition specs, and sort orders
are absent — each would extend the same chain. No third-party engine
is installable offline, so interop remains spec-conformance +
foreign-shaped fixtures, stated.

Scale shape: the metadata chain is driver-side and
O(manifests + live files) like the Delta replay; manifest lists keep
per-snapshot inventories so no log replay is needed at all — the
read cost of ANY snapshot is one list + its manifests. Data reads
are ordinary distributed parquet scans with pushdown intact.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from jobminer_spark.sources.avro import read_avro_records, write_avro_file

_STATUS_DELETED = 2

# Manifest-list schema, format v2 shape: content + sequence numbers +
# the six stats counts (spec fields 504-506/512-514) so a planner can
# prune whole manifests without opening them
_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},  # 0=data, 1=deletes
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

# Manifest-entry schema, format v2 shape: null sequence numbers on
# ADDED entries inherit the snapshot's sequence number (the spec's
# inheritance rule); data_file carries content=0 (data)
_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "file_sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_ICEBERG_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
}


def _metadata_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _current_metadata_path(table: str) -> str:
    md = _metadata_dir(table)
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
        return os.path.join(md, f"v{v}.metadata.json")
    versions = [
        int(f[1:].split(".")[0])
        for f in os.listdir(md)
        if f.startswith("v") and f.endswith(".metadata.json")
    ]
    if not versions:
        raise FileNotFoundError(f"no Iceberg metadata under {md}")
    return os.path.join(md, f"v{max(versions)}.metadata.json")


def iceberg_metadata(table: str) -> dict:
    with open(_current_metadata_path(table)) as f:
        return json.load(f)


def iceberg_snapshots(table: str) -> list[dict]:
    return iceberg_metadata(table).get("snapshots", [])


def _resolve_path(table: str, p: str) -> str:
    """Manifest/data paths may be absolute or table-relative URIs."""
    if p.startswith("file://"):
        from urllib.parse import urlparse

        return urlparse(p).path
    if os.path.isabs(p):
        return p
    return os.path.join(table, p)


def iceberg_live_files(table: str, snapshot_id: int | None = None) -> list[str]:
    """The snapshot's live data-file paths via its manifest list."""
    meta = iceberg_metadata(table)
    snaps = meta.get("snapshots", [])
    if not snaps:
        return []
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snap = next(
        (s for s in snaps if s["snapshot-id"] == snapshot_id), None
    )
    if snap is None:
        raise ValueError(f"unknown snapshot-id {snapshot_id}")
    _, manifests = read_avro_records(
        _resolve_path(table, snap["manifest-list"])
    )
    files: list[str] = []
    for m in manifests:
        _, entries = read_avro_records(
            _resolve_path(table, m["manifest_path"])
        )
        for e in entries:
            if e["status"] != _STATUS_DELETED:
                files.append(_resolve_path(table, e["data_file"]["file_path"]))
    return sorted(files)


def _spark_ddl(meta: dict) -> str:
    schema = meta.get("schema")
    if schema is None:  # format v2 keeps a schemas list + current id
        sid = meta["current-schema-id"]
        schema = next(s for s in meta["schemas"] if s["schema-id"] == sid)
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str) or t not in _ICEBERG_TO_SPARK:
            raise ValueError(f"unsupported Iceberg column type: {t!r}")
        cols.append(f"{f['name']} {_ICEBERG_TO_SPARK[t]}")
    return ", ".join(cols)


def read_iceberg(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """The table at ``snapshot_id`` (current when None) — the same
    surface as `spark.read.format("iceberg").option("snapshot-id", …)`
    for the supported subset."""
    meta = iceberg_metadata(table)
    ddl = _spark_ddl(meta)
    files = iceberg_live_files(table, snapshot_id)
    if not files:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*files)


# ---------------------------------------------------------------------------
# format-v2 append writer
# ---------------------------------------------------------------------------


def write_iceberg(
    spark: SparkSession, table: str, df: DataFrame, mode: str = "append"
) -> int:
    """Append ``df`` as a new snapshot (create on first write);
    returns the new snapshot id. Each commit writes its parquet data
    files, ONE manifest for them, and a manifest LIST carrying every
    live manifest (prior ones re-referenced — the spec's per-snapshot
    complete-inventory model), then publishes vN metadata JSON +
    version hint.

    Format v2 semantics on the append path (promoted from
    fixture-grade per review r15): metadata carries
    `last-sequence-number` and each snapshot a monotone
    `sequence-number`; manifest-list records carry content/
    sequence_number/min_sequence_number plus the six stats counts
    (files/rows added/existing/deleted) so a planner can skip whole
    manifests; manifest entries write null sequence numbers on ADDED
    files (the spec's snapshot-inheritance rule). Still append-only,
    unpartitioned/identity layouts, no delete files or sort orders —
    each would extend the same chain."""
    if mode != "append":
        raise ValueError("iceberg writer supports append only")
    md = _metadata_dir(table)
    data_dir = os.path.join(table, "data")
    os.makedirs(md, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    try:
        meta = iceberg_metadata(table)
        version = max(
            int(f[1:].split(".")[0])
            for f in os.listdir(md)
            if f.startswith("v") and f.endswith(".metadata.json")
        )
    except FileNotFoundError:
        meta, version = None, 0

    # stage parquet via a scratch dir, then move under data/
    commit = uuid.uuid4().hex[:12]
    stage = os.path.join(table, f"_stage_{commit}")
    df.write.mode("overwrite").parquet(stage)
    data_files: list[dict] = []
    for root, _dirs, files in os.walk(stage):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            dest = os.path.join(data_dir, f"{commit}-{fname}")
            os.replace(os.path.join(root, fname), dest)
            import pyarrow.parquet as papq

            data_files.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": None,
                    # null → inherit the snapshot's sequence number
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,  # data
                        "file_path": os.path.abspath(dest),
                        "file_format": "PARQUET",
                        "record_count": papq.ParquetFile(dest).metadata.num_rows,
                        "file_size_in_bytes": os.path.getsize(dest),
                    },
                }
            )
    import shutil

    shutil.rmtree(stage, ignore_errors=True)

    snapshot_id = version + 1  # deterministic, monotone
    seq = snapshot_id  # v2 sequence number, assigned per commit
    manifest_path = os.path.join(md, f"manifest-{commit}.avro")
    write_avro_file(manifest_path, _MANIFEST_SCHEMA, data_files)

    prior_manifests: list[dict] = []
    if meta is not None and meta.get("snapshots"):
        current = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _, prior_manifests = read_avro_records(
            _resolve_path(table, current["manifest-list"])
        )
    # re-referenced manifests keep their own sequence numbers/stats;
    # records from a pre-v2 table (older writer) get conservative
    # defaults so the upgraded list stays self-consistent
    prior_records = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m.get("partition_spec_id", 0),
            "content": m.get("content", 0),
            # pre-upgrade (v1-written) manifests carry data sequence
            # number 0, the spec's assignment for pre-v2 history
            "sequence_number": m.get("sequence_number", 0),
            "min_sequence_number": m.get("min_sequence_number", 0),
            "added_snapshot_id": m.get("added_snapshot_id") or 0,
            "added_files_count": m.get("added_files_count", 0),
            "existing_files_count": m.get("existing_files_count", 0),
            "deleted_files_count": m.get("deleted_files_count", 0),
            "added_rows_count": m.get("added_rows_count", 0),
            "existing_rows_count": m.get("existing_rows_count", 0),
            "deleted_rows_count": m.get("deleted_rows_count", 0),
        }
        for m in prior_manifests
    ]
    list_records = prior_records + [
        {
            "manifest_path": os.path.abspath(manifest_path),
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(data_files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(
                e["data_file"]["record_count"] for e in data_files
            ),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    list_path = os.path.join(md, f"snap-{snapshot_id}-{commit}.avro")
    write_avro_file(list_path, _MANIFEST_LIST_SCHEMA, list_records)

    if meta is None:
        fields = []
        ddl_inv = {v: k for k, v in _ICEBERG_TO_SPARK.items()}
        for i, f in enumerate(df.schema.fields):
            t = f.dataType.simpleString()
            it = ddl_inv.get({"bigint": "long"}.get(t, t))
            if it is None:
                raise ValueError(f"unsupported column type for Iceberg: {t}")
            fields.append(
                {
                    "id": i + 1,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": it,
                }
            )
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": os.path.abspath(table),
            "last-updated-ms": 0,
            "last-column-id": len(fields),
            "schemas": [
                {"type": "struct", "schema-id": 0, "fields": fields}
            ],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {},
            "snapshots": [],
        }
    new_version = version + 1
    meta = dict(meta)
    meta["current-snapshot-id"] = snapshot_id
    # v2 sequence-number semantics; appending to a table created by
    # the earlier v1 writer upgrades its metadata in place (a legal
    # format-version bump). The upgrade must emit the FULL v2 required
    # set — schemas list, partition-specs/default-spec-id, sort-orders/
    # default-sort-order-id — and retire the v1-only partition-spec
    # key; pre-upgrade snapshots get sequence number 0, the spec's
    # assignment for pre-v2 history (review r16).
    meta["format-version"] = 2
    meta["last-sequence-number"] = seq
    if "schemas" not in meta and "schema" in meta:
        meta["schemas"] = [{**meta.pop("schema"), "schema-id": 0}]
        meta["current-schema-id"] = 0
    meta.pop("partition-spec", None)
    meta.setdefault("partition-specs", [{"spec-id": 0, "fields": []}])
    meta.setdefault("default-spec-id", 0)
    meta.setdefault("last-partition-id", 999)
    meta.setdefault("sort-orders", [{"order-id": 0, "fields": []}])
    meta.setdefault("default-sort-order-id", 0)
    meta["snapshots"] = [
        {**s, "sequence-number": s.get("sequence-number", 0)}
        for s in meta.get("snapshots", [])
    ] + [
        {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": 0,
            "manifest-list": os.path.abspath(list_path),
            "summary": {"operation": "append"},
        }
    ]
    # exclusive-create publish, like every other commit in this repo
    fd = os.open(
        os.path.join(md, f"v{new_version}.metadata.json"),
        os.O_CREAT | os.O_EXCL | os.O_WRONLY,
    )
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(new_version))
    return snapshot_id
