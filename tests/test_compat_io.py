"""SequenceFile round-trip, XML records, DistCp, and the bucketed-join
shuffle-elimination property (the persisted CompositeInputFormat
precondition)."""

import os

import pytest

from pyspark.sql import functions as F

from hadoop_main_spark.sources.distcp import distcp
from hadoop_main_spark.sources.sequencefile import (
    read_sequencefile,
    sequencefile_to_parquet,
    write_sequencefile,
)
from hadoop_main_spark.sources.text import read_xml_records


def test_sequencefile_roundtrip(spark, tmp_path):
    path = str(tmp_path / "seq")
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], ["key", "value"]
    )
    write_sequencefile(df, path)
    back = read_sequencefile(spark, path)
    assert sorted((r.key, r.value) for r in back.collect()) == [
        ("k1", "v1"), ("k2", "v2"), ("k3", "v3"),
    ]
    pq = str(tmp_path / "pq")
    sequencefile_to_parquet(spark, path, pq)
    assert spark.read.parquet(pq).count() == 3


def _seq_header_flags(header: bytes) -> tuple[int, int]:
    """(compressed, blockCompressed) flag bytes from a SequenceFile
    header: SEQ magic + version byte, two vint-length-prefixed class
    names (short names → single-byte vint), then the two booleans
    (IO/SequenceFile.java header layout)."""
    assert header[:3] == b"SEQ"
    i = 4
    for _ in range(2):
        i += 1 + header[i]
    return header[i], header[i + 1]


def test_sequencefile_compressed_roundtrip(spark, tmp_path):
    """Codec/layout parity (reference IO/SequenceFile.java:222 NONE |
    RECORD | BLOCK): compressed writes must round-trip exactly, the
    header must name the codec, and the blockCompressed header FLAG
    must match the requested layout — saveAsSequenceFile hardcodes
    BLOCK whenever a codec is given, so an un-asserted flag hides a
    silent RECORD no-op (review-r4 finding)."""
    rows = [(f"k{i}", f"v{i}" * 20) for i in range(50)]
    df = spark.createDataFrame(rows, ["key", "value"])
    for name, layout, want_block in (
        ("gzip", True, 1),
        ("bzip2", False, 0),
        ("default", None, 0),  # Hadoop default layout is RECORD
    ):
        path = str(tmp_path / f"seq_{name}_{layout}")
        write_sequencefile(df, path, compression=name, block_compress=layout)
        back = read_sequencefile(spark, path)
        assert sorted((r.key, r.value) for r in back.collect()) == sorted(rows)
        part = next(
            p for p in os.listdir(path) if p.startswith("part-") and ".crc" not in p
        )
        header = open(os.path.join(path, part), "rb").read(300)
        codec_cls = {
            "gzip": b"GzipCodec", "bzip2": b"BZip2Codec", "default": b"DefaultCodec"
        }[name]
        assert codec_cls in header, (name, header)
        compressed, block = _seq_header_flags(header)
        assert compressed == 1, name
        assert block == want_block, (name, layout, block)
    # uncompressed path: both flags clear
    plain = str(tmp_path / "seq_plain")
    write_sequencefile(df, plain)
    part = next(
        p for p in os.listdir(plain) if p.startswith("part-") and ".crc" not in p
    )
    assert _seq_header_flags(open(os.path.join(plain, part), "rb").read(300)) == (0, 0)


def test_sequencefile_int_values(spark, tmp_path):
    path = str(tmp_path / "seqint")
    write_sequencefile(spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]), path)
    back = {r.key: r.value for r in read_sequencefile(spark, path).collect()}
    assert back == {"a": 1, "b": 2}


def test_xml_records(spark, tmp_path):
    p = tmp_path / "data.xml"
    p.write_text(
        "<root><doc id='1'>alpha</doc>\n<skip/>\n<doc id='2'>beta\ngamma</doc></root>"
    )
    recs = read_xml_records(spark, str(p), "doc").collect()
    assert len(recs) == 2
    assert "alpha" in recs[0].record and "beta\ngamma" in recs[1].record


def test_distcp_copies_and_validates(spark, tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("hello")
    (src / "sub" / "b.bin").write_bytes(b"\x00" * 1024)
    dst = tmp_path / "dst"
    report = distcp(spark, str(src), str(dst)).collect()
    assert len(report) == 2
    assert all(r.ok == 1 for r in report)
    assert (dst / "a.txt").read_text() == "hello"
    assert (dst / "sub" / "b.bin").stat().st_size == 1024


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join
    with NO shuffle exchange — the persisted form of the reference's
    co-partitioned CompositeInputFormat precondition."""
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")
    o = spark.range(0, 1000).select(
        F.col("id").alias("custkey"), (F.col("id") * 2).alias("total")
    )
    c = spark.range(0, 500).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    o.write.mode("overwrite").bucketBy(4, "custkey").sortBy("custkey").saveAsTable("t_orders_b")
    c.write.mode("overwrite").bucketBy(4, "custkey").sortBy("custkey").saveAsTable("t_cust_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_cust_b"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_bad_record_skipping(spark, tmp_path):
    """§2.11 bad-record skipping: corrupt files are skipped under
    ignoreCorruptFiles (the SkippingReduceValuesIterator analog at
    file granularity); malformed CSV rows drop under DROPMALFORMED."""
    d = tmp_path / "mixed"
    d.mkdir()
    spark.createDataFrame([(1, "ok"), (2, "fine")], "id long, s string").write.mode(
        "overwrite"
    ).parquet(str(d / "good.parquet"))
    (d / "good.parquet" / "corrupt.parquet").write_bytes(b"not a parquet file")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        back = spark.read.schema("id LONG, s STRING").parquet(str(d / "good.parquet"))
        assert back.count() == 2
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)

    csv = tmp_path / "rows.csv"
    csv.write_text("1,a\nnot_an_int,b\n3,c\n")
    ok = (
        spark.read.schema("id INT, s STRING")
        .option("mode", "DROPMALFORMED")
        .csv(str(csv))
    )
    assert sorted(r.id for r in ok.collect()) == [1, 3]


def test_parquet_bloom_filter_write(spark, tmp_path):
    """BloomMapFile analog (IO/BloomMapFile.java): parquet column bloom
    filters for keyed membership probes."""
    path = str(tmp_path / "bloomed")
    df = spark.range(0, 10000).selectExpr("id", "concat('k', id) AS key")
    (
        df.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#key", "true")
        .option("parquet.bloom.filter.expected.ndv#key", "10000")
        .parquet(path)
    )
    hit = spark.read.parquet(path).filter("key = 'k137'")
    assert hit.count() == 1
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(key), EqualTo(key,k137)]" in plan


def test_cli_list_and_sql():
    """CLI smoke (subprocess — the ToolRunner entry path)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "hadoop_main_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0 and "pricing_summary" in r.stdout

    r = subprocess.run(
        [sys.executable, "-m", "hadoop_main_spark", "sql",
         "SELECT COUNT(*) AS n FROM region", "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0 and "5" in r.stdout


def test_distcp_update_skips_current(spark, tmp_path):
    src, dst = tmp_path / "s", tmp_path / "d"
    src.mkdir()
    (src / "x.txt").write_text("abcde")
    distcp(spark, str(src), str(dst)).collect()
    mtime = (dst / "x.txt").stat().st_mtime_ns
    report = distcp(spark, str(src), str(dst), update=True).collect()
    assert report[0].ok == 1
    # unchanged file must not have been rewritten
    assert (dst / "x.txt").stat().st_mtime_ns == mtime


def test_distcp_sync_update_delete(spark, tmp_path):
    """distcp_sync = DistCp -update -delete: new and size-changed
    files copy, same-size files skip (not rewritten), destination-only
    files are removed — the dst tree converges to the src tree."""
    from hadoop_main_spark.sources.distcp import distcp_sync

    src, dst = tmp_path / "s", tmp_path / "d"
    src.mkdir()
    (src / "keep.txt").write_text("same")
    (src / "change.txt").write_text("v1")
    (src / "sub").mkdir()
    (src / "sub" / "nested.txt").write_text("n1")
    distcp(spark, str(src), str(dst)).collect()

    (src / "change.txt").write_text("v2 longer")   # size change → copy
    (src / "new.txt").write_text("brand new")      # src only → copy
    (src / "sub" / "nested.txt").unlink()          # dst only → delete
    keep_mtime = (dst / "keep.txt").stat().st_mtime_ns

    report = {r.path: (r.action, r.ok) for r in distcp_sync(spark, str(src), str(dst)).collect()}
    assert report[str(dst / "keep.txt")] == ("skip", 1)
    assert report[str(dst / "change.txt")] == ("copy", 1)
    assert report[str(dst / "new.txt")] == ("copy", 1)
    assert report[str(dst / "sub" / "nested.txt")] == ("delete", 1)
    assert (dst / "change.txt").read_text() == "v2 longer"
    assert (dst / "new.txt").read_text() == "brand new"
    assert not (dst / "sub" / "nested.txt").exists()
    # skipped file untouched
    assert (dst / "keep.txt").stat().st_mtime_ns == keep_mtime
    # idempotent: a second sync is all skips
    again = {r.action for r in distcp_sync(spark, str(src), str(dst)).collect()}
    assert again == {"skip"}


def test_compression_codecs_roundtrip(spark, tmp_path):
    """§2.1 codec row: gzip text and zstd/snappy parquet round-trips —
    codec handling is native to every Spark file source."""
    df = spark.createDataFrame([("line one",), ("line two",)], ["value"])
    gz = str(tmp_path / "gz")
    df.write.option("compression", "gzip").mode("overwrite").text(gz)
    assert sorted(r.value for r in spark.read.text(gz).collect()) == [
        "line one", "line two",
    ]
    import glob
    assert glob.glob(gz + "/*.gz")
    zs = str(tmp_path / "zstd")
    df.write.option("compression", "zstd").mode("overwrite").parquet(zs)
    assert spark.read.parquet(zs).count() == 2


def test_distch_chmod(spark, tmp_path):
    from hadoop_main_spark.sources.distcp import distch

    d = tmp_path / "t"
    d.mkdir()
    (d / "f.txt").write_text("x")
    report = distch(spark, str(d), mode=0o600).collect()
    assert report[0].ok == 1
    assert (d / "f.txt").stat().st_mode & 0o777 == 0o600


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Each z-ordered file must cover a small rectangle of the 2-D key
    space: the mean per-file extent in BOTH dimensions stays near the
    ideal sqrt(n_files) grid cell, where a 1-D sort leaves the second
    dimension's extent at ~full range per file."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.sources.layouts import write_zordered

    n, side = 65536, 256  # 256x256 uniform grid
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("bigint").alias("y")
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", n_files=16, bits=8)

    spans = (
        spark.read.parquet(zpath)
        .select("x", "y", F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    mean_sx = sum(r.sx for r in spans) / len(spans)
    mean_sy = sum(r.sy for r in spans) / len(spans)
    # 16 files over a 256x256 grid -> ideal cell 64x64; allow 2x slack.
    # A 1-D sort on x would give mean_sy ~= 255.
    assert mean_sx <= 128, f"x extent too wide: {mean_sx}"
    assert mean_sy <= 128, f"y extent too wide: {mean_sy}"


def test_permissive_csv_bad_records(spark, tmp_path):
    """Bad-record skipping (SURVEY §2.11, SkippingReduceValuesIterator
    analog): PERMISSIVE mode keeps malformed rows in a corrupt-record
    column instead of failing the job."""
    p = tmp_path / "rows.csv"
    p.write_text("1,alpha\n2,beta\nnot_an_int,gamma\n3,delta\n")
    df = (
        spark.read.schema("id INT, name STRING, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    df = df.cache()
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert good.count() == 3
    assert bad.count() == 1
    assert "not_an_int" in bad.collect()[0]._corrupt
    df.unpersist()


def test_ignore_corrupt_files(spark, tmp_path):
    """ignoreCorruptFiles: a garbage file in the directory is skipped,
    the healthy parquet still reads (the job-level bad-input remedy)."""
    d = tmp_path / "mixed"
    d.mkdir()
    spark.range(100).write.parquet(str(d / "good"))
    (d / "good" / "junk.parquet").write_bytes(b"this is not parquet at all")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        # explicit schema: corrupt-file skipping applies at scan time,
        # not to schema inference (which reads footers eagerly)
        assert spark.read.schema("id LONG").parquet(str(d / "good")).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_nested_type_roundtrip(spark, tmp_path):
    """SURVEY §1 type-system mapping: the reference's container
    Writables land on native Catalyst types — ArrayWritable/
    TwoDArrayWritable → array/array<array>, MapWritable → map,
    GenericWritable/ObjectWritable → tagged-union struct — and all
    survive a parquet round trip."""
    from pyspark.sql import Row

    rows = [
        Row(
            id=1,
            arr=[1, 2, 3],
            arr2d=[[1, 2], [3]],
            m={"a": 1, "b": 2},
            union=Row(tag="int", int_v=7, str_v=None),
        ),
        Row(
            id=2,
            arr=[],
            arr2d=[],
            m={},
            union=Row(tag="str", int_v=None, str_v="x"),
        ),
    ]
    df = spark.createDataFrame(rows)
    p = str(tmp_path / "nested")
    df.write.parquet(p)
    back = spark.read.parquet(p).orderBy("id").collect()
    assert back[0].arr2d == [[1, 2], [3]]
    assert back[0].m == {"a": 1, "b": 2}
    assert (back[0].union.tag, back[0].union.int_v) == ("int", 7)
    assert (back[1].union.tag, back[1].union.str_v) == ("str", "x")
    # tagged-union dispatch is an expression, not code
    got = (
        spark.read.parquet(p)
        .select(
            "id",
            F.when(F.col("union.tag") == "int", F.col("union.int_v").cast("string"))
            .otherwise(F.col("union.str_v"))
            .alias("value"),
        )
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.value) for r in got] == [(1, "7"), (2, "x")]


def test_zorder_auto_bits_wide_keys(spark, tmp_path):
    """Regression: keys wider than the old 16-bit default must still
    cluster (bits now derive from the actual key range)."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.sources.layouts import write_zordered

    n, side = 65536, 256
    df = spark.range(n).select(
        ((F.col("id") % side) * 1000).alias("x"),       # up to ~255k (18 bits)
        ((F.col("id") / side).cast("bigint") * 1000).alias("y"),
    )
    zpath = str(tmp_path / "zorder_wide")
    write_zordered(df, zpath, "x", "y", n_files=16)  # bits auto-derived
    spans = (
        spark.read.parquet(zpath)
        .select("x", "y", F.col("_metadata.file_path").alias("f"))
        .groupBy("f")
        .agg((F.max("x") - F.min("x")).alias("sx"), (F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    mean_sx = sum(r.sx for r in spans) / len(spans)
    mean_sy = sum(r.sy for r in spans) / len(spans)
    # ideal cell is 64k x 64k of the 255k range; allow 2x slack
    assert mean_sx <= 128_000 and mean_sy <= 128_000


def test_har_scheme_passthrough(spark, tmp_path):
    """Hadoop Archive passthrough (hadoop-tools/hadoop-archives;
    HarFileSystem.java:57 VERSION=3): Spark reads `har://` paths
    through the bundled HarFileSystem with no engine code (archive
    CREATION is sources/har.py, tested below). The fixture handcrafts
    a minimal v3 archive: _masterindex (version line + one hash-range
    store covering the whole int range), _index (dir + file entries,
    HarFileSystem.HarStatus format :583), and a part-0 payload."""
    har = tmp_path / "test.har"
    har.mkdir()
    data = b"hello har\nline two\n"
    (har / "part-0").write_bytes(data)
    props = "0+420+root+root"  # urlencoded "modtime perm owner group"
    index = "".join(
        l + "\n"
        for l in (
            f"%2F dir {props} 0 0 data.txt",
            f"%2Fdata.txt file part-0 0 {len(data)} {props}",
        )
    )
    (har / "_index").write_text(index)
    (har / "_masterindex").write_text(
        "3 \n" + f"-2147483648 2147483647 0 {len(index.encode())}\n"
    )
    got = [r.value for r in spark.read.text(f"har://{har}/data.txt").collect()]
    assert got == ["hello har", "line two"]


def test_har_create_and_read_back(spark, tmp_path):
    """HAR CREATION (hadoop-tools/hadoop-archives HadoopArchives.java:1)
    closes the archive round trip: a nested tree archived with
    create_har must read back byte-exact through the bundled
    HarFileSystem — including a file that is not first in its part
    (non-zero start offset) and a nested directory."""
    from hadoop_main_spark.sources.har import create_har

    src = tmp_path / "tree"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha one\nalpha two\n")
    (src / "b.txt").write_text("beta\n")
    (src / "sub" / "c.txt").write_text("gamma nested\n")
    har = str(tmp_path / "out.har")
    report = {r.rel: (r.part, r.start, r.length) for r in create_har(
        spark, str(src), har, parts=2
    ).collect()}
    assert set(report) == {"a.txt", "b.txt", "sub/c.txt"}
    import os
    parts = {p for p, _, _ in report.values()}
    assert parts  # at least one part written
    for p in parts:
        assert os.path.getsize(os.path.join(har, p)) > 0
    # some file must sit at a non-zero offset when parts < files
    assert any(start > 0 for _, start, _ in report.values())
    for rel, want in (
        ("a.txt", ["alpha one", "alpha two"]),
        ("b.txt", ["beta"]),
        ("sub/c.txt", ["gamma nested"]),
    ):
        got = [r.value for r in spark.read.text(f"har://{har}/{rel}").collect()]
        assert got == want, rel


def test_har_create_special_chars_in_names(spark, tmp_path):
    """Review-r4b: dir-entry children must be encodeName()d like the
    reference (HadoopArchives.java:679) — a file name containing a
    space or '+' must survive the archive listing AND read back
    byte-exact (HarFileSystem splits the children field on spaces and
    decodes each token)."""
    from hadoop_main_spark.sources.har import create_har

    src = tmp_path / "tree2"
    src.mkdir()
    (src / "my file.txt").write_text("has space\n")
    (src / "a+b.txt").write_text("has plus\n")
    har = str(tmp_path / "special.har")
    report = {r.rel for r in create_har(spark, str(src), har, parts=1).collect()}
    assert report == {"my file.txt", "a+b.txt"}
    # raw names in the har:// path (Hadoop Path takes them literally;
    # only the INDEX stores them encoded)
    for rel, want in (("my file.txt", ["has space"]), ("a+b.txt", ["has plus"])):
        got = [r.value for r in spark.read.text(f"har://{har}/{rel}").collect()]
        assert got == want, rel


def test_sketches_ignore_nulls(spark):
    """Review-r4b: NULL values must not occupy a KMV min slot or an
    HLL register row — COUNT(DISTINCT col) semantics ignore NULLs."""
    from hadoop_main_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
        kmv_distinct,
    )

    vals = [(f"v{i}",) for i in range(40)] + [(None,)] * 5
    df = spark.createDataFrame(vals, "u string")
    clean = spark.createDataFrame(vals[:40], "u string")
    r = kmv_distinct(df, "u", k=64).collect()[0]
    rc = kmv_distinct(clean, "u", k=64).collect()[0]
    assert (r.k_used, r.kth_min, r.est_distinct) == (rc.k_used, rc.kth_min, rc.est_distinct)
    assert r.est_distinct == 40.0  # exact below k, null NOT counted
    hr = sorted((x.bucket, x.reg) for x in hll_registers(df, "u").collect())
    hrc = sorted((x.bucket, x.reg) for x in hll_registers(clean, "u").collect())
    assert hr == hrc
    assert hll_estimate(hll_registers(df, "u")).collect()[0].est_distinct == (
        hll_estimate(hll_registers(clean, "u")).collect()[0].est_distinct
    )


def test_count_matching_empty_frame(spark):
    from pyspark.sql import functions as F

    from hadoop_main_spark.functions.counters import count_matching

    empty = spark.createDataFrame([], "x int")
    assert count_matching(empty, neg=F.col("x") < 0) == {"neg": 0}


def test_zorder_rejects_negative_keys(spark, tmp_path):
    from hadoop_main_spark.sources.layouts import write_zordered

    df = spark.createDataFrame([(-1, 5), (3, 4)], "a int, b int")
    with pytest.raises(ValueError, match="non-negative"):
        write_zordered(df, str(tmp_path / "z"), "a", "b")


def test_zorder_key_rejects_over_63_bit_layout(spark):
    """Advice-r5: JVM shiftleft masks shift counts mod 64, so
    dims*bits > 63 would silently fold high bits onto low positions —
    must raise instead."""
    from hadoop_main_spark.operators.partitioning import zorder_key, zorder_key_sql

    with pytest.raises(ValueError, match="> 63"):
        zorder_key(["a", "b", "c"], bits=22)  # 66 key bits
    with pytest.raises(ValueError, match="> 63"):
        zorder_key_sql(["a", "b"], bits=32)  # 64 key bits
    zorder_key(["a", "b"], bits=31)  # 62 bits: the widest legal 2-D key
    zorder_key_sql(["a", "b", "c"], bits=21)  # 63 bits exactly


def test_sequencefile_layout_pin_requires_codec(spark, tmp_path):
    from hadoop_main_spark.sources.sequencefile import write_sequencefile

    df = spark.createDataFrame([("k", "v")], "k string, v string")
    with pytest.raises(ValueError, match="codec"):
        write_sequencefile(df, str(tmp_path / "sf"), compression=None, block_compress=True)


def test_text_splits_degenerate_inputs():
    from hadoop_main_spark.sources.jdbc import text_splits

    # uppercase endpoints normalize instead of collapsing to slot 0
    got = text_splits("AAA", "ZZZ", 4)
    assert len(got) == 4 and got[0][0] == "a"
    # inverted/collapsed mapping returns ONE full range, never []
    assert text_splits("b", "B9", 4) == [("b", "b9")]


def test_balanced_buckets_fill_all_tasks(spark, tmp_path):
    """Review-r4b: hash repartition on the bucket id collided distinct
    buckets into one task (pmod(murmur3) is not a bijection);
    repartitionByRange must land every bucket in its own task."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.sources.distcp import size_balanced_buckets

    n = 8
    listing = spark.createDataFrame(
        [(f"/f{i:03d}", (i * 37) % 1000 + 1) for i in range(64)], "src string, size long"
    )
    ranked = size_balanced_buckets(listing, n)
    parts = (
        ranked.repartitionByRange(n, "bucket")
        .select(F.spark_partition_id().alias("p"), "bucket")
        .groupBy("p")
        .agg(F.countDistinct("bucket").alias("nb"), F.count("*").alias("rows"))
        .collect()
    )
    assert len(parts) == n, parts  # no empty tasks, no collided tasks
    assert all(r.nb == 1 for r in parts), parts


def test_har_index_escaping_adversarial_names(spark, tmp_path):
    """Verdict-r4 hardening: the _index encoding must survive names
    far nastier than space/'+' — literal '%', a '%2F' lookalike (an
    encoded-slash string that double-decoding would corrupt into a
    path separator), newline and tab (the index is LINE-based, so an
    unencoded newline would split an entry), and non-ASCII. Checked
    three ways: (1) the entry report round-trips every name, (2) each
    payload extracts byte-exact from its part file at the reported
    (start, length), (3) decoding the _index lines restores exactly
    the original names — file entries and the root dir's children."""
    from urllib.parse import unquote_plus

    from hadoop_main_spark.sources.har import create_har

    names = [
        "a b.txt", "100%.txt", "a+b=c&d.txt", "%2F.txt",
        "nl\nname.txt", "tab\tname.txt", "héllo wörld.txt",
    ]
    src = tmp_path / "advtree"
    src.mkdir()
    contents = {}
    for n in names:
        payload = f"payload of {n!r}\n".encode()
        (src / n).write_bytes(payload)
        contents[n] = payload
    har = str(tmp_path / "adv.har")
    report = {
        r.rel: (r.part, r.start, r.length)
        for r in create_har(spark, str(src), har, parts=2).collect()
    }
    assert set(report) == set(names)
    import os

    for n, (part, start, length) in report.items():
        with open(os.path.join(har, part), "rb") as fh:
            fh.seek(start)
            assert fh.read(length) == contents[n], n
    # parse the index the way HarFileSystem does: line-based, fields
    # space-separated, names decoded with URL semantics
    index_lines = open(os.path.join(har, "_index")).read().splitlines()
    file_names, root_children = set(), None
    for ln in index_lines:
        toks = ln.split(" ")
        if toks[1] == "file":
            file_names.add(unquote_plus(toks[0]))
        elif toks[1] == "dir" and unquote_plus(toks[0]) == "/":
            root_children = {unquote_plus(t) for t in toks[5:]}
    assert file_names == {"/" + n for n in names}
    assert root_children == set(names)
    # names the Hadoop Path/URI parser tolerates also read back
    # end-to-end through har:// (raw '%'/newline are Path-hostile at
    # the URI layer — the reference has the same limitation; the
    # index itself, checked above, is what the escaping protects)
    for n in ("a b.txt", "a+b=c&d.txt", "héllo wörld.txt"):
        got = [r.value for r in spark.read.text(f"har://{har}/{n}").collect()]
        assert got == [f"payload of {n!r}"], n


def test_distcp_dynamic_chunked_work_stealing(spark, tmp_path):
    """distcp_dynamic must over-split the listing into steal_factor x
    slots chunks (so Spark's task queue can rebalance stragglers),
    clamp to the file count, and still copy every byte correctly."""
    import os

    from hadoop_main_spark.sources.distcp import distcp_dynamic

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src + "/sub")
    sizes = [1, 100_000, 5, 50_000, 7, 3, 9000, 11, 2, 70_000, 4, 6]
    for i, n in enumerate(sizes):
        with open(f"{src}/sub/f{i}.bin", "wb") as fh:
            fh.write(bytes([i % 251]) * n)
    rep = distcp_dynamic(spark, src, dst, slots=2, steal_factor=4)
    # one partition per chunk: 4 x 2 = 8 chunks (12 files > 8)
    assert rep.rdd.getNumPartitions() == 8
    rows = rep.collect()
    assert len(rows) == len(sizes) and all(r.ok == 1 for r in rows)
    for i, n in enumerate(sizes):
        with open(f"{dst}/sub/f{i}.bin", "rb") as fh:
            b = fh.read()
        assert len(b) == n and (n == 0 or b[0] == i % 251)

    # fewer files than slots*factor: chunk count clamps to file count
    src2, dst2 = str(tmp_path / "s2"), str(tmp_path / "d2")
    os.makedirs(src2)
    for i in range(3):
        open(f"{src2}/g{i}", "w").write("x" * (i + 1))
    rep2 = distcp_dynamic(spark, src2, dst2, slots=2, steal_factor=4)
    assert rep2.rdd.getNumPartitions() == 3
    assert sorted(r.size for r in rep2.collect()) == [1, 2, 3]
