"""Source/sink round-trips (SURVEY §2.1–2.2) on temp dirs."""

import os

import pytest
from pyspark.sql import functions as F

from hadoop_main_spark.sources import sinks as SK
from hadoop_main_spark.sources import text as TX


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_text_roundtrip(spark, tdir):
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], ["k", "v"])
    out = f"{tdir}/kv"
    SK.write_kv_text(df, out)
    back = TX.read_kv_text(spark, out)
    assert {(r.key, r.value) for r in back.collect()} == {("k1", "v1"), ("k2", "v2")}


def test_read_kv_missing_sep(spark, tdir):
    p = f"{tdir}/in.txt"
    _write_lines(p, ["a\tb", "noseparator"])
    rows = {(r.key, r.value) for r in TX.read_kv_text(spark, p).collect()}
    assert rows == {("a", "b"), ("noseparator", "")}


def test_fixed_width(spark, tdir):
    p = f"{tdir}/fw.txt"
    _write_lines(p, ["AAABBCCCC", "XXXYYZZZZ"])
    df = TX.read_fixed_width(spark, p, [3, 2, 4], ["a", "b", "c"])
    rows = {tuple(r) for r in df.collect()}
    assert rows == {("AAA", "BB", "CCCC"), ("XXX", "YY", "ZZZZ")}


def test_nline_partitioning(spark, tdir):
    p = f"{tdir}/nl.txt"
    _write_lines(p, [f"line{i}" for i in range(10)])
    df = TX.read_nline(spark, p, lines_per_split=3)
    assert df.rdd.getNumPartitions() == 4  # ceil(10/3)
    assert df.count() == 10


def test_multiple_inputs_union(spark):
    a = spark.createDataFrame([(1, "a")], ["id", "x"])
    b = spark.createDataFrame([("b", 2)], ["x", "id"])
    out = TX.multiple_inputs([(a, None), (b, lambda d: d.select("id", "x"))])
    assert {(r.id, r.x) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_auto_input(spark, tdir):
    pq = f"{tdir}/t.parquet"
    spark.createDataFrame([(1,)], ["x"]).write.parquet(pq)
    assert TX.auto_input(spark, pq).count() == 1
    txt = f"{tdir}/t.log"
    _write_lines(txt, ["hello"])
    assert TX.auto_input(spark, txt).columns == ["line"]
    # ORC: full write -> auto-dispatch read roundtrip (Spark-native)
    orc = f"{tdir}/t.orc"
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "x"]).write.orc(orc)
    back = TX.auto_input(spark, orc)
    assert {(r.id, r.x) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_write_partitioned_prunes(spark, tdir):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["id", "grp"])
    out = f"{tdir}/part"
    SK.write_partitioned(df, out, ["grp"])
    assert os.path.isdir(f"{out}/grp=a")
    back = spark.read.parquet(out).filter(F.col("grp") == "a")
    assert back.count() == 2
    # partition pruning visible in the physical plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "grp=a" in plan or back.inputFiles()  # at minimum it reads


def test_multiple_outputs_routing(spark, tdir):
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], ["id", "tag"])
    paths = SK.multiple_outputs(
        df, {"xs": F.col("tag") == "x", "ys": F.col("tag") == "y"}, f"{tdir}/routes"
    )
    assert spark.read.parquet(paths["xs"]).count() == 2
    assert spark.read.parquet(paths["ys"]).count() == 1


def test_null_sink(spark):
    SK.null_sink(spark.range(100).toDF("id"))  # must simply not raise


def test_jdbc_split_computation():
    from hadoop_main_spark.sources.jdbc import integer_splits, text_splits

    splits = integer_splits(0, 99, 4)
    assert splits == [(0, 25), (25, 50), (50, 75), (75, 100)]
    assert integer_splits(0, 1, 5) == [(0, 1), (1, 2)]  # degenerate: 2 rows, 5 splits
    ts = text_splits("apple", "mango", 3)
    assert len(ts) == 3
    assert ts[0][0] == "apple"
    # boundaries are lexicographically ordered
    flat = [x for pair in ts for x in pair]
    assert flat == sorted(flat)


def test_compact_small_files(spark, tmp_path):
    from hadoop_main_spark.sources.sinks import compact_small_files

    src = str(tmp_path / "many")
    spark.range(0, 100_000).repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64
    report = compact_small_files(spark, src, target_file_bytes=10 * 1024 * 1024)
    assert report["files_before"] == 64
    assert report["files_after"] <= 2
    assert report["rows"] == 100_000
    back = spark.read.parquet(report["out_path"])
    assert back.count() == 100_000
    # content preserved (sum is partition-order independent)
    assert back.agg({"id": "sum"}).collect()[0][0] == 100_000 * 99_999 // 2


def test_schema_evolution_merge(spark, tmp_path):
    """Long-lived tables evolve: a later batch adds a column; reading
    with mergeSchema yields the union schema with nulls backfilled."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic: rewriting one day's partition
    must not clobber other partitions — the idempotent-daily-rerun
    contract for partitioned fact tables."""
    p = str(tmp_path / "by_day")
    base = spark.createDataFrame(
        [(1, "d1"), (2, "d2"), (3, "d2")], "id long, day string"
    )
    base.write.partitionBy("day").mode("overwrite").parquet(p)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        redo = spark.createDataFrame([(99, "d2")], "id long, day string")
        redo.write.partitionBy("day").mode("overwrite").parquet(p)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = {(r.id, r.day) for r in spark.read.parquet(p).collect()}
    assert back == {(1, "d1"), (99, "d2")}  # d1 untouched, d2 replaced


def test_kv_text_null_fields_keep_alignment(spark, tmp_path):
    """Review-r4b: a NULL column must write an EMPTY field, not vanish
    (concat_ws skips nulls and shifts every later field)."""
    from hadoop_main_spark.sources.sinks import write_kv_text

    df = spark.createDataFrame([("k", None, "v"), ("a", "m", "b")], "x string, y string, z string")
    out = str(tmp_path / "kv")
    write_kv_text(df, out)
    lines = sorted(r.value for r in spark.read.text(out).collect())
    assert lines == ["a\tm\tb", "k\t\tv"]


def test_fixed_width_rejects_mismatched_names():
    import pytest as _p

    from hadoop_main_spark.sources.text import read_fixed_width

    with _p.raises(ValueError, match="widths"):
        read_fixed_width(None, "/nope", widths=[3, 2, 4], names=["a", "b"])


def test_xml_records_regex_special_tag(spark, tmp_path):
    """Review-r4b: a tag containing '.' must not wildcard-match other
    element names."""
    from hadoop_main_spark.sources.text import read_xml_records

    p = tmp_path / "x.xml"
    p.write_text("<nsXrec>wrong</nsXrec><ns.rec>right</ns.rec>")
    rows = [r.record for r in read_xml_records(spark, str(p), "ns.rec").collect()]
    assert rows == ["<ns.rec>right</ns.rec>"]


def test_get_spark_honors_caller_confs(spark):
    """Review-r4b: tune() must not clobber an explicit
    shuffle_partitions / extra_conf choice."""
    from hadoop_main_spark.session import get_spark

    s = get_spark("conf-check", shuffle_partitions=7)
    assert s.conf.get("spark.sql.shuffle.partitions") == "7"
    # restore the shared session's tuned value for later tests
    from hadoop_main_spark.session import tune

    tune(s)


def test_tune_surfaces_conf_failures(spark, monkeypatch):
    """Advice-r5: tune() must warn (with the key name) on static-conf
    rejection and RAISE on any other conf-set failure — not swallow."""
    import warnings as W

    import pytest

    from hadoop_main_spark import session as S

    monkeypatch.setitem(
        S.RUNTIME_CONFS, "spark.sql.catalogImplementation", "in-memory"
    )  # static conf: settable only at builder time -> must warn
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        S.tune(spark)
    assert any("spark.sql.catalogImplementation" in str(w.message) for w in caught)

    real_set = spark.conf.set

    def boom(k, v):
        if k == "spark.sql.session.timeZone":
            raise RuntimeError("driver gone")
        return real_set(k, v)

    monkeypatch.delitem(S.RUNTIME_CONFS, "spark.sql.catalogImplementation")
    monkeypatch.setattr(spark.conf, "set", boom)
    with pytest.raises(RuntimeError, match="driver gone"):
        S.tune(spark)


def test_avro_container_roundtrip_pure_python():
    """Binary-encoding unit contract (no Spark): zigzag varints incl.
    negatives and 60-bit longs, nullable unions, both codecs, multiple
    blocks, sync verification."""
    from pyspark.sql import types as T

    from hadoop_main_spark.sources import avro as A

    sj = A.schema_to_avro_json(
        T.StructType(
            [
                T.StructField("k", T.LongType(), True),
                T.StructField("s", T.StringType(), True),
                T.StructField("d", T.DoubleType(), False),
                T.StructField("b", T.BooleanType(), False),
            ]
        )
    )
    rows = [
        (-(2**59), "nég", -0.5, True),
        (2**59 + 12345, "", 3.14, False),
        (None, None, 0.0, True),
        (0, "x" * 1000, float("inf"), False),
    ] * 1500  # > one 4096-row block
    for codec in ("null", "deflate"):
        blob = A.encode_container(rows, sj, codec=codec, block_rows=1000)
        sj2, got = A.decode_container(blob)
        assert got == rows
        assert A.avro_json_to_schema(sj2)[1] == A.avro_json_to_schema(sj)[1]


def test_avro_trailing_null_union_branch_order():
    """Spec-valid [T, "null"] unions put null at branch 1: decode must
    honor the recorded null-branch index, not assume branch 0 — the
    misread would misalign every subsequent field's bytes."""
    import json

    from hadoop_main_spark.sources import avro as A

    sj = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": ["long", "null"]},  # null = branch 1
                {"name": "s", "type": ["null", "string"]},  # null = branch 0
                {"name": "d", "type": "double"},
            ],
        }
    )
    _schema, plan = A.avro_json_to_schema(sj)
    assert [f[3] for f in plan] == [1, 0, -1]
    rows = [(7, "a", 0.5), (None, "bb", 1.5), (9, None, 2.5), (None, None, 3.5)]
    blob = A.encode_container(rows, sj, codec="null")
    sj2, got = A.decode_container(blob)
    assert got == rows
    # a hand-built payload with an out-of-range branch long must raise,
    # not silently misalign
    import io

    body = io.BytesIO()
    A._write_long(body, 2)  # invalid branch for field k
    bad = A.encode_container([], sj)  # header + no blocks
    sync = A._sync_marker(sj)
    block = io.BytesIO()
    A._write_long(block, 1)  # one row
    A._write_long(block, len(body.getvalue()))
    block.write(body.getvalue())
    try:
        A.decode_container(bad + block.getvalue() + sync)
        raise AssertionError("expected invalid-branch ValueError")
    except ValueError as e:
        assert "union branch" in str(e) or "avro" in str(e).lower()


def test_avro_spark_roundtrip_and_auto_input(spark, tmp_path):
    """write_avro -> read_avro row equality (incl. NULLs in long
    columns and 60-bit hash values), and auto_input('.avro') resolves
    through the pure-python fallback when spark-avro is absent."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.sources.avro import read_avro, write_avro
    from hadoop_main_spark.sources.text import auto_input

    df = (
        spark.range(2000)
        .select(
            F.col("id"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10).cast("bigint"))
            .alias("h60"),
            (F.col("id") * 0.25).alias("d"),
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
            (F.col("id") % 2 == 0).alias("flag"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "t.avro")
    n = write_avro(df, out, codec="deflate")
    assert n == 2000
    back = read_avro(spark, out)
    assert back.schema == df.schema or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in df.schema.fields]
    a = {r.id: (r.h60, r.d, r.s, r.flag) for r in df.collect()}
    b = {r.id: (r.h60, r.d, r.s, r.flag) for r in back.collect()}
    assert a == b
    via_auto = auto_input(spark, out)
    assert via_auto.count() == 2000


def test_avro_rejects_null_free_unions():
    """A union WITHOUT "null" — including single-branch [T] — still
    carries a branch-index long on the wire; treating it as a plain
    type would misalign every later byte of an externally written
    container. The schema parser must reject it (advice r6)."""
    import json

    import pytest

    from hadoop_main_spark.sources import avro as A

    for t in (["long"], ["string"], ["long", "double"]):
        sj = json.dumps(
            {
                "type": "record",
                "name": "row",
                "fields": [{"name": "k", "type": t}],
            }
        )
        with pytest.raises(ValueError, match="union"):
            A.avro_json_to_schema(sj)


def test_versioned_snapshots_time_travel_and_commit_protocol(spark, tmp_path):
    """Versioned sink: sequential versions, time travel to any
    committed version, latest = last commit, unknown version raises,
    and a TORN WRITE (data directory present, manifest entry absent)
    is invisible to readers — the manifest is the commit point."""
    import pytest

    from hadoop_main_spark.sources.versioned import (
        merge_version,
        read_version,
        write_version,
    )

    table = str(tmp_path / "tbl")
    v1 = write_version(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), table)
    v2 = write_version(spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k int, v string"), table)
    assert (v1, v2) == (1, 2)
    assert {r.k: r.v for r in read_version(spark, table, 1).collect()} == {1: "a", 2: "b"}
    assert {r.k: r.v for r in read_version(spark, table).collect()} == {
        1: "a", 2: "B", 3: "c",
    }
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, table, 99)
    # merge_version composes merge_into on the latest snapshot
    src = spark.createDataFrame(
        [(2, "Z", False), (3, "dead", True), (4, "d", False)],
        "k int, v string, is_delete boolean",
    )
    v3 = merge_version(spark, table, src, ["k"], ["v"], delete_col="is_delete")
    assert v3 == 3
    assert {r.k: r.v for r in read_version(spark, table, 3).collect()} == {
        1: "a", 2: "Z", 4: "d",
    }
    # history intact after the merge commit
    assert {r.k: r.v for r in read_version(spark, table, 1).collect()} == {1: "a", 2: "b"}
    # torn write: a v=4 data dir with NO manifest entry must be invisible
    spark.createDataFrame([(9, "torn")], "k int, v string").write.parquet(
        f"{table}/v=4"
    )
    assert read_version(spark, table).select("k").distinct().count() == 3
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, table, 4)


def test_versioned_vacuum_retention(spark, tmp_path):
    """vacuum_versions: only the last keep_last versions stay readable,
    dropped data dirs and torn-write dirs are deleted from disk, new
    commits continue the version sequence after a vacuum."""
    import os

    import pytest

    from hadoop_main_spark.sources.versioned import (
        read_version,
        vacuum_versions,
        write_version,
    )

    table = str(tmp_path / "tbl")
    for i in range(1, 5):
        write_version(
            spark.createDataFrame([(i, f"v{i}")], "k int, v string"), table
        )
    # torn write alongside the committed versions
    spark.createDataFrame([(0, "torn")], "k int, v string").write.parquet(
        f"{table}/v=99"
    )
    dropped = vacuum_versions(table, keep_last=2)
    assert dropped == [1, 2]
    assert not os.path.exists(f"{table}/v=1")
    assert not os.path.exists(f"{table}/v=99")
    assert os.path.exists(f"{table}/v=3") and os.path.exists(f"{table}/v=4")
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, table, 1)
    assert read_version(spark, table, 3).collect()[0].v == "v3"
    assert read_version(spark, table).collect()[0].v == "v4"
    # version numbering continues past the vacuum
    assert write_version(
        spark.createDataFrame([(5, "v5")], "k int, v string"), table
    ) == 5
    with pytest.raises(ValueError):
        vacuum_versions(table, keep_last=0)


def test_versioned_torn_write_reclaimed_by_next_commit(spark, tmp_path):
    """A crash between the data write and the manifest append leaves an
    uncommitted v=N directory; under the single-writer contract the
    NEXT write_version recomputes the same N and must overwrite the
    orphan instead of wedging on errorIfExists (r9 ADVICE)."""
    from hadoop_main_spark.sources.versioned import read_version, write_version

    table = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"), table)
    # simulate the torn write: v=2 data on disk, no manifest entry
    spark.createDataFrame([(9, "torn")], "k int, v string").write.parquet(
        f"{table}/v=2"
    )
    v = write_version(
        spark.createDataFrame([(2, "b")], "k int, v string"), table
    )
    assert v == 2
    assert {r.k: r.v for r in read_version(spark, table, 2).collect()} == {2: "b"}
