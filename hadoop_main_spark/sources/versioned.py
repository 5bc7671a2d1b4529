"""Versioned table snapshots with time travel (lakehouse-lite).

The minimal transactional-table surface a curation pipeline needs on
plain parquet: every commit is an immutable ``v=N`` snapshot directory
plus a JSON manifest entry written LAST (the commit point — readers
resolve versions only through the manifest, so a torn write of the
data directory is invisible until its manifest line lands; the same
commit-protocol idea as Delta Lake's _delta_log, reduced to the
single-writer case).

Reference analog: none in Hadoop core — north-star scope. Public
framings: the Delta Lake / Iceberg snapshot-isolation papers
(Armbrust et al. VLDB'20; Iceberg spec) — re-expressed here as
rename-last manifest commits over Spark's native parquet writer.

Scale shape: snapshots are ordinary parquet directories (partitioned,
predicate-pushdown-friendly); the manifest is O(versions) tiny JSON
lines, read driver-side. ``merge_version`` composes
:func:`~hadoop_main_spark.operators.aggregate.merge_into` so the
upsert itself is the one co-partitioned full-outer join.

LOCAL-MODE CONTRACT: paths resolve on the driver and executors alike
(one shared filesystem here; pass a shared-FS path on a real cluster —
the write_avro caveat). Single writer by design: concurrent commits
need a real transaction log, stated honestly rather than faked.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _read_manifest(path: str) -> list[dict]:
    try:
        with open(_manifest_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return []


def write_version(df: DataFrame, path: str) -> int:
    """Commit ``df`` as the next snapshot version (1-based). The data
    directory is written fully BEFORE the manifest entry — the
    manifest append is the commit point."""
    versions = _read_manifest(path)
    v = (versions[-1]["version"] + 1) if versions else 1
    data_dir = os.path.join(path, f"v={v}")
    # overwrite: a crash after the data write but before the manifest
    # append leaves an uncommitted v=N directory; under the stated
    # single-writer contract the next commit recomputes the same N and
    # must reclaim it rather than wedge on errorIfExists.
    df.write.mode("overwrite").parquet(data_dir)
    versions.append({"version": v, "dir": f"v={v}"})
    os.makedirs(path, exist_ok=True)
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(versions, fh)
    os.replace(tmp, _manifest_path(path))  # atomic on POSIX
    return v


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Time-travel read: snapshot ``version`` (default: latest
    committed). Uncommitted / unknown versions raise — readers never
    see a torn write."""
    versions = _read_manifest(path)
    if not versions:
        raise ValueError(f"no committed versions at {path}")
    if version is None:
        entry = versions[-1]
    else:
        matches = [e for e in versions if e["version"] == version]
        if not matches:
            raise ValueError(
                f"version {version} not committed at {path} "
                f"(have {[e['version'] for e in versions]})"
            )
        entry = matches[0]
    return spark.read.parquet(os.path.join(path, entry["dir"]))


def vacuum_versions(path: str, keep_last: int = 1) -> list[int]:
    """Retention: drop all but the last ``keep_last`` committed
    versions — manifest entries removed FIRST (readers lose access at
    that instant), data directories deleted after, and any
    uncommitted (torn-write) ``v=*`` directories are swept too.
    Returns the dropped version numbers. Time travel only reaches
    what retention keeps — the Delta VACUUM contract, stated plainly."""
    import shutil

    versions = _read_manifest(path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    keep = versions[-keep_last:]
    drop = versions[: -keep_last] if keep_last < len(versions) else []
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(keep, fh)
    os.replace(tmp, _manifest_path(path))
    kept_dirs = {e["dir"] for e in keep}
    for name in os.listdir(path):
        if name.startswith("v=") and name not in kept_dirs:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    return [e["version"] for e in drop]


def merge_version(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols,
    value_cols,
    delete_col: str | None = None,
) -> int:
    """MERGE a change set into the latest snapshot and commit the
    result as a new version (read latest -> merge_into -> commit):
    the lakehouse upsert loop, with every historical version still
    time-travel readable."""
    from hadoop_main_spark.operators.aggregate import merge_into

    current = read_version(spark, path)
    merged = merge_into(current, source, key_cols, value_cols, delete_col)
    return write_version(merged, path)
