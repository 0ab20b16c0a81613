"""Minimal snapshot catalog over parquet — Iceberg-table emulation
(SURVEY.md §7.0: no Iceberg jar and no network in this sandbox; this
module is the single seam where a real Iceberg catalog drops in via
``--packages`` on a cluster).

Layout under ``table_dir``:
  data/<snapshot_id>-<n>.parquet ...   immutable data files
  snapshots/<seq>-<snapshot_id>.json   manifest: file list (+ parent)

Semantics mirrored from Iceberg:
  * append  -> new snapshot = parent files + new files
  * overwrite -> new snapshot = new files only
  * reads are snapshot-isolated: a reader pins one manifest's file list;
    concurrent appends never change what it sees
  * time travel: read any historical snapshot id
The commit point is the atomic rename of the manifest json (same
manifest-last discipline as engine.checkpoint).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _snapshots(table_dir: str) -> list[tuple[int, str, str]]:
    """Sorted (seq, snapshot_id, path)."""
    sdir = os.path.join(table_dir, "snapshots")
    if not os.path.isdir(sdir):
        return []
    out = []
    for name in os.listdir(sdir):
        if not name.endswith(".json"):
            continue
        seq_s, snap = name[:-5].split("-", 1)
        out.append((int(seq_s), snap, os.path.join(sdir, name)))
    return sorted(out)


def current_snapshot(table_dir: str) -> str | None:
    snaps = _snapshots(table_dir)
    return snaps[-1][1] if snaps else None


def _manifest(table_dir: str, snapshot_id: str) -> dict:
    for _, snap, path in _snapshots(table_dir):
        if snap == snapshot_id:
            with open(path) as f:
                return json.load(f)
    raise FileNotFoundError(
        f"snapshot {snapshot_id!r} not found in {table_dir}")


def _merge_schema(parent: dict, new: dict) -> dict:
    """Append-time schema evolution: parent columns keep their place and
    TYPE (a type change would make old data files unreadable under the
    pinned schema — refused loudly, like Iceberg without an explicit
    DDL); columns the append doesn't carry stay in the schema (its
    files just surface NULL for them on read); genuinely new columns
    are added at the end."""
    out = {**parent, "fields": list(parent["fields"])}
    by_name = {f["name"]: f for f in parent["fields"]}
    for f in new["fields"]:
        old = by_name.get(f["name"])
        if old is None:
            out["fields"].append(f)
        elif old["type"] != f["type"]:
            raise ValueError(
                f"schema evolution: column {f['name']!r} type change "
                f"{old['type']!r} -> {f['type']!r} would break reads of "
                f"existing data files; use overwrite for a retype")
    return out


def commit(df: DataFrame, table_dir: str, mode: str = "append") -> str:
    """Write df as a new snapshot; returns the new snapshot id."""
    assert mode in ("append", "overwrite")
    # schema compatibility is decidable from metadata alone — check it
    # BEFORE the staging write, or a refused append permanently orphans
    # a full copy of the dataset in data/ (no manifest ever points at
    # the renamed files, and there is no cleanup pass)
    schema = json.loads(df.schema.json())
    snaps_pre = _snapshots(table_dir)
    if mode == "append" and snaps_pre:
        parent_schema = _manifest(table_dir, snaps_pre[-1][1]).get("schema")
        if parent_schema is not None:
            schema = _merge_schema(parent_schema, schema)
    snap_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, "data")
    staging = os.path.join(table_dir, f"_staging_{snap_id}")
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    new_files = []
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            dst = f"{snap_id}-{name}"
            os.rename(os.path.join(staging, name),
                      os.path.join(data_dir, dst))
            new_files.append(dst)
    # clean staging remnants (_SUCCESS etc.)
    for name in os.listdir(staging):
        os.remove(os.path.join(staging, name))
    os.rmdir(staging)

    snaps = _snapshots(table_dir)
    seq = snaps[-1][0] + 1 if snaps else 1
    parent_files: list[str] = []
    parent_id = None
    if mode == "append" and snaps:
        parent_id = snaps[-1][1]
        parent_files = _manifest(table_dir, parent_id)["files"]

    sdir = os.path.join(table_dir, "snapshots")
    os.makedirs(sdir, exist_ok=True)
    manifest = {
        "snapshot_id": snap_id,
        "sequence": seq,
        "parent": parent_id,
        "operation": mode,
        "files": parent_files + new_files,
        # the snapshot's CURRENT schema (Iceberg: schema rides the
        # metadata, not the data files) — an append with new columns
        # evolves the table schema by UNION with the parent's (see
        # _merge_schema; silently narrowing or retyping is refused);
        # readers pin this and files surface NULL for columns they
        # predate
        "schema": schema,
    }
    tmp = os.path.join(sdir, f".tmp-{snap_id}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(sdir, f"{seq}-{snap_id}.json"))  # COMMIT
    return snap_id


def _read_files(spark: SparkSession, table_dir: str,
                manifest: dict, files: list[str]) -> DataFrame:
    """Read data files under the manifest's pinned schema (add-column
    schema evolution: files written before a column existed yield NULL
    for it; files carrying since-dropped columns just don't project
    them). Manifests from before schemas were recorded fall back to
    parquet self-description."""
    paths = [os.path.join(table_dir, "data", f) for f in files]
    schema_json = manifest.get("schema")
    reader = spark.read
    if schema_json is not None:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(schema_json))
    return reader.parquet(*paths)


def read_snapshot(spark: SparkSession, table_dir: str,
                  snapshot_id: str | None = None) -> DataFrame:
    """Snapshot-isolated read (defaults to the current snapshot) under
    the snapshot's OWN schema — time travel also travels the schema."""
    if snapshot_id is None:
        snapshot_id = current_snapshot(table_dir)
        if snapshot_id is None:
            raise FileNotFoundError(f"no snapshots in {table_dir}")
    m = _manifest(table_dir, snapshot_id)
    return _read_files(spark, table_dir, m, m["files"])


def read_appends(spark: SparkSession, table_dir: str,
                 from_snapshot: str,
                 to_snapshot: str | None = None) -> DataFrame:
    """Incremental append scan (Iceberg's incremental read): only the
    rows added AFTER ``from_snapshot`` up to ``to_snapshot`` (default
    current). This is how a training pipeline processes just the new
    crawl increment instead of rescanning the table. Raises if an
    overwrite intervenes (the delta is not expressible as added files
    then — same contract as Iceberg's incremental scan)."""
    if to_snapshot is None:
        to_snapshot = current_snapshot(table_dir)
    snaps = _snapshots(table_dir)
    ids = [s for _, s, _ in snaps]
    i_from, i_to = ids.index(from_snapshot), ids.index(to_snapshot)
    if i_to < i_from:
        raise ValueError("to_snapshot precedes from_snapshot")
    for _, snap, _ in snaps[i_from + 1 : i_to + 1]:
        if _manifest(table_dir, snap)["operation"] != "append":
            raise ValueError(
                f"snapshot {snap} is an overwrite — incremental append "
                "scan undefined across it")
    base = set(_manifest(table_dir, from_snapshot)["files"])
    to_manifest = _manifest(table_dir, to_snapshot)
    new = [f for f in to_manifest["files"] if f not in base]
    if not new:
        return read_snapshot(spark, table_dir, to_snapshot).limit(0)
    return _read_files(spark, table_dir, to_manifest, new)


def rollback(table_dir: str, snapshot_id: str) -> str:
    """Roll the table back to a historical snapshot by committing a NEW
    snapshot that points at the old file list (Iceberg rollback: history
    is preserved, data files are immutable, nothing is deleted)."""
    old = _manifest(table_dir, snapshot_id)
    snaps = _snapshots(table_dir)
    seq = snaps[-1][0] + 1
    new_id = uuid.uuid4().hex[:12]
    sdir = os.path.join(table_dir, "snapshots")
    manifest = {
        "snapshot_id": new_id,
        "sequence": seq,
        "parent": snaps[-1][1],
        "operation": "rollback",
        "rolled_back_to": snapshot_id,
        "files": old["files"],
        # rollback restores the old SCHEMA too (it points at old files)
        **({"schema": old["schema"]} if "schema" in old else {}),
    }
    tmp = os.path.join(sdir, f".tmp-{new_id}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(sdir, f"{seq}-{new_id}.json"))  # COMMIT
    return new_id


def history(table_dir: str) -> list[dict]:
    return [
        {"sequence": seq, "snapshot_id": snap,
         **{k: v for k, v in _manifest(table_dir, snap).items()
            if k in ("operation", "parent")},
         "n_files": len(_manifest(table_dir, snap)["files"])}
        for seq, snap, _ in _snapshots(table_dir)
    ]
