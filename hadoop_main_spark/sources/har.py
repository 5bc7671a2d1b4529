"""Hadoop Archive (HAR) creation (SURVEY.md §2.11).

Reference: hadoop-tools/hadoop-archives HadoopArchives.java:1 — an MR
job that concatenates small files into part files and writes the
``_index`` / ``_masterindex`` metadata HarFileSystem.java:57 (VERSION
3) reads. Here the part writers are a mapInPandas fleet over a
size-balanced listing (the same split policy as distcp) and the two
index files are written driver-side from the collected per-file
offsets — index entries are metadata, tiny by construction.

The READ side needs no engine code at all: Spark resolves ``har://``
paths through the bundled HarFileSystem (tested in
test_har_scheme_passthrough). Local-filesystem paths here, like
distcp: on a cluster the part-writer callable swaps to an
Hadoop-FS/fsspec stream.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import quote_plus

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hadoop_main_spark.sources.distcp import build_listing

ENTRY_SCHEMA = StructType(
    [
        StructField("rel", StringType()),
        StructField("part", StringType()),
        StructField("start", LongType()),
        StructField("length", LongType()),
    ]
)

#: HarStatus property string (modtime+perm+owner+group, urlencoded
#: with '+' separators exactly as the reference's URLEncoder output)
_PROPS = "0+420+root+root"


def create_har(
    spark: SparkSession, src_dir: str, har_path: str, parts: int | None = None
) -> DataFrame:
    """Archive ``src_dir`` into a VERSION-3 ``.har`` directory at
    ``har_path`` readable via ``har://{har_path}/...``. Files are
    size-balanced round-robin across ``parts`` part files (default:
    the session's parallelism), concatenated by a task fleet; the
    driver then writes ``_index`` (dir + file entries) and
    ``_masterindex`` (one hash store spanning the whole range — the
    reader binary-searches stores, and a single store is always
    correct, just unpartitioned metadata). Returns the per-file entry
    report (rel, part, start, length)."""
    src_dir = os.path.abspath(src_dir)
    # part files are opened in executor processes whose cwd can differ
    # from the driver's (which writes _index/_masterindex) — a
    # relative har_path would split the archive across two locations
    har_path = os.path.abspath(har_path)
    os.makedirs(har_path, exist_ok=True)
    listing = build_listing(spark, src_dir, src_dir).select(
        "src", "size", F.expr(f"substring(src, {len(src_dir) + 2})").alias("rel")
    )
    n = parts or spark.sparkContext.defaultParallelism
    from hadoop_main_spark.sources.distcp import size_balanced_buckets

    ranked = size_balanced_buckets(listing, n)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        part = f"part-{pid}"
        out, start, fh = [], 0, None
        try:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    if fh is None:  # lazy: empty partitions write no part
                        fh = open(os.path.join(har_path, part), "wb")
                    with open(r.src, "rb") as src_f:
                        data = src_f.read()
                    fh.write(data)
                    out.append((r.rel, part, start, len(data)))
                    start += len(data)
        finally:
            if fh is not None:
                fh.close()
        yield pd.DataFrame(out, columns=[f.name for f in ENTRY_SCHEMA.fields])

    entries = (
        ranked.repartitionByRange(n, "bucket")
        .drop("bucket")
        .mapInPandas(write_part, ENTRY_SCHEMA)
    )
    rows = entries.collect()

    # driver-side metadata: dir tree + file entries, reference line
    # formats (HarFileSystem.HarStatus, HarFileSystem.java:583)
    children: dict[str, set[str]] = {"/": set()}
    for r in rows:
        parts_ = r.rel.split("/")
        for i in range(len(parts_) - 1):
            d = "/" + "/".join(parts_[: i + 1])
            children.setdefault(d, set())
            parent = "/" + "/".join(parts_[:i]) if i else "/"
            children.setdefault(parent, set()).add(parts_[i])
        parent = "/" + "/".join(parts_[:-1]) if len(parts_) > 1 else "/"
        children.setdefault(parent, set()).add(parts_[-1])

    lines = []
    for d in sorted(children):
        # each child is URL-encoded like the reference's encodeName
        # (HadoopArchives.java:679) — HarFileSystem splits the children
        # field on spaces and decodeFileName()s each token, so a raw
        # name containing ' ', '+' or '%' would corrupt the listing
        kids = " ".join(quote_plus(c) for c in sorted(children[d]))
        enc = quote_plus(d)
        lines.append(f"{enc} dir {_PROPS} 0 0 {kids}".rstrip())
    for r in sorted(rows, key=lambda r: r.rel):
        enc = quote_plus("/" + r.rel)
        lines.append(f"{enc} file {r.part} {r.start} {r.length} {_PROPS}")
    index = "".join(ln + "\n" for ln in lines)
    with open(os.path.join(har_path, "_index"), "w") as fh:
        fh.write(index)
    with open(os.path.join(har_path, "_masterindex"), "w") as fh:
        fh.write("3 \n" + f"-2147483648 2147483647 0 {len(index.encode())}\n")
    # return the COLLECTED report (re-executing the lazy plan would
    # rewrite the part files)
    return spark.createDataFrame(rows, ENTRY_SCHEMA)
