"""Snapshot-committed table format over parquet — Iceberg's commit/read
semantics without the runtime jar.

BASELINE.json names Iceberg tables as the production substrate. No Iceberg
runtime jar exists in this offline sandbox and none is fetchable (verified:
no network, no local maven/ivy cache), so ``sources/io.py`` keeps the real
``format("iceberg")`` path behind catalog detection while THIS module
provides the property the north_rule actually depends on — *resume from the
last committed snapshot* — with Iceberg's mechanism:

  table/
    data/v<N>/part-*.parquet          one immutable data dir per snapshot
    metadata/v<N>.manifest.json       explicit file list + rows/bytes + info
    metadata/VERSION                  pointer file: last committed version

Commit protocol (all IO via the Hadoop FS API — file://, hdfs://, s3a://):
data files -> manifest -> pointer swap (temp write + rename), mirroring
Iceberg's metadata-pointer swap. Readers resolve pointer -> manifest ->
explicit file list, and the manifest IS the scan's file source: a failed or
in-flight write is never visible, and stray files in the data dir are never
read (reference analog: the ad hoc per-id CSV checkpoints + job_num
sharding of extract_timing_features.py:179-190).

The manifest doubles as S2's file-list source (SURVEY §2: manifest-driven
scan) and carries per-snapshot lineage metrics for the engine.

SINGLE-WRITER assumption (like Hadoop output committers, unlike Iceberg's
catalog CAS): two concurrent committers to the same table can race the
pointer rename and the later rename silently wins — readers still only
ever see one complete snapshot, but the loser's commit is lost. Serialize
writers per table (the engine's checkpoint steps already do); a real
multi-writer deployment needs the Iceberg/catalog path in sources/io.py.
"""

from __future__ import annotations

import json
import posixpath
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from feature_extraction_spark.fsutil import (
    fs_exists as _fs_exists,
    fs_list_parquet as _fs_list_parquet,
    fs_read_text as _fs_read_text,
    fs_write_text as _fs_write_text,
    hadoop_fs as _hadoop_fs,
)

_obs_counter = [0]


@dataclass
class SnapshotInfo:
    version: int
    files: list[str]  # fully-qualified data file paths
    rows: int
    bytes: int
    wall_s: float
    parent: int | None


def _meta_dir(table: str) -> str:
    return posixpath.join(table, "metadata")


def _pointer_path(table: str) -> str:
    return posixpath.join(_meta_dir(table), "VERSION")


def _manifest_path(table: str, version: int) -> str:
    return posixpath.join(_meta_dir(table), f"v{version}.manifest.json")


def last_committed_version(spark: SparkSession, table: str) -> int | None:
    """The snapshot version the pointer file names, or None for an empty /
    never-committed table (a crashed job that wrote data but not the
    pointer leaves the table at its previous version)."""
    ptr = _pointer_path(table)
    if not _fs_exists(spark, ptr):
        return None
    return int(_fs_read_text(spark, ptr).strip())


def read_manifest(spark: SparkSession, table: str, version: int) -> dict:
    return json.loads(_fs_read_text(spark, _manifest_path(table, version)))


def commit_snapshot(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
) -> SnapshotInfo:
    """Write ``df`` as the table's next snapshot and commit it.

    mode='overwrite': the new snapshot's manifest lists only the new files.
    mode='append': it lists the parent snapshot's files plus the new ones
    (data dirs are immutable, so append never rewrites existing data).
    The pointer swap is the commit point — readers either see the previous
    snapshot or the complete new one, never a partial write.
    """
    spark = df.sparkSession
    t0 = time.monotonic()
    parent = last_committed_version(spark, table)
    version = (parent or 0) + 1
    data_dir = posixpath.join(table, "data", f"v{version}")

    _obs_counter[0] += 1
    obs = Observation(f"snap_rows_{version}_{_obs_counter[0]}")
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    out.write.mode("overwrite").parquet(data_dir)
    rows = int(obs.get["rows"])

    new_files = [
        (posixpath.join(data_dir, name), size)
        for name, size in _fs_list_parquet(spark, data_dir)
    ]
    files = list(new_files)
    prev_rows = 0
    if mode == "append" and parent is not None:
        prev = read_manifest(spark, table, parent)
        files = [(f["path"], f["bytes"]) for f in prev["files"]] + files
        prev_rows = int(prev["rows"])
    elif mode not in ("overwrite", "append"):
        raise ValueError(f"unknown snapshot mode: {mode}")

    wall = time.monotonic() - t0
    manifest = {
        "version": version,
        "parent": parent,
        "mode": mode,
        "rows": rows + prev_rows,
        "new_rows": rows,
        "bytes": sum(b for _, b in files),
        "files": [{"path": p, "bytes": b} for p, b in files],
        "wall_s": round(wall, 3),
    }
    _fs_write_text(spark, _manifest_path(table, version), json.dumps(manifest))

    # pointer swap: write temp, then rename over VERSION (Iceberg's
    # metadata-pointer swap; on HDFS/S3 committers rename is the atomic
    # primitive — raw local FS rename-over-existing needs the delete first)
    ptr = _pointer_path(table)
    tmp = ptr + f".tmp.v{version}"
    _fs_write_text(spark, tmp, str(version))
    fs, jptr = _hadoop_fs(spark, ptr)
    if fs.exists(jptr):
        fs.delete(jptr, False)
    _, jtmp = _hadoop_fs(spark, tmp)
    if not fs.rename(jtmp, jptr):
        raise IOError(f"snapshot commit failed: rename {tmp} -> {ptr}")

    return SnapshotInfo(
        version,
        [p for p, _ in files],
        manifest["rows"],
        manifest["bytes"],
        wall,
        parent,
    )


def read_snapshot(
    spark: SparkSession,
    table: str,
    version: int | None = None,
) -> DataFrame:
    """Manifest-driven scan of a committed snapshot (default: latest).
    The explicit file list is the source of truth — uncommitted or stray
    files under data/ are invisible. ``version`` gives time travel."""
    v = version if version is not None else last_committed_version(spark, table)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table}")
    manifest = read_manifest(spark, table, v)
    paths = [f["path"] for f in manifest["files"]]
    if not paths:
        raise FileNotFoundError(f"snapshot v{v} of {table} lists no files")
    return spark.read.parquet(*paths)


def snapshot_versions(spark: SparkSession, table: str) -> list[int]:
    """All committed versions (manifest files present), ascending."""
    meta = _meta_dir(table)
    if not _fs_exists(spark, meta):
        return []
    fs, jpath = _hadoop_fs(spark, meta)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".manifest.json"):
            out.append(int(name[1:].split(".")[0]))
    return sorted(out)
