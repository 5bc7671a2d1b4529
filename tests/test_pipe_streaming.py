"""Pipe operator (Hadoop Streaming semantics) + Structured Streaming
windows — the pytest analog of the reference's streaming conformance
corpus (SURVEY §5.4)."""

import pytest
from pyspark.sql import functions as F

from hadoop_main_spark.operators import pipe as P
from hadoop_main_spark.streaming import windows as W


def test_pipe_identity(spark):
    df = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    out = {(r.key, r.value) for r in P.pipe(df, "cat").collect()}
    assert out == {("a", "1"), ("b", "2")}


def test_pipe_transform(spark):
    df = spark.createDataFrame([("abc", "xyz")], ["k", "v"])
    out = {(r.key, r.value) for r in P.pipe(df, "tr 'a-z' 'A-Z'").collect()}
    assert out == {("ABC", "XYZ")}


def test_pipe_custom_separator(spark):
    df = spark.createDataFrame([("a", "b")], ["k", "v"])
    out = P.pipe(df, "cat", input_sep=",", output_sep=",").collect()
    assert (out[0].key, out[0].value) == ("a", "b")


def test_pipe_missing_output_sep(spark):
    df = spark.createDataFrame([("onlykey",)], ["k"])
    out = P.pipe(df, "cat").collect()
    assert (out[0].key, out[0].value) == ("onlykey", "")


def test_pipe_failing_command(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(Exception):
        P.pipe(df, "false").collect()


def test_pipe_reduce_grouped_order(spark):
    # a reducer script that keeps only the first line per key needs
    # grouped+sorted input; awk emulates a classic streaming reducer
    df = spark.createDataFrame(
        [("k1", 5), ("k1", 1), ("k2", 7), ("k1", 3)], ["k", "v"]
    )
    out = P.pipe_reduce(
        df, "awk -F'\\t' '!seen[$1]++'", group_key="k", order_key="v"
    )
    rows = {(r.key, r.value) for r in out.collect()}
    assert rows == {("k1", "1"), ("k2", "7")}


# --- structured streaming ----------------------------------------------------


def test_tumbling_counts_stream_matches_batch(spark, sf_dir):
    stream = W.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    W.run_to_memory(W.tumbling_counts(stream, watermark="0 seconds"), "t_win")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_win").collect()
    }
    from hadoop_main_spark.tables import load_table

    batch = W.tumbling_counts(load_table(spark, sf_dir, "events"))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_sessionize_batch(spark, sf_dir):
    from hadoop_main_spark.tables import load_table

    sess = W.sessionize(load_table(spark, sf_dir, "events"))
    rows = sess.limit(5).collect()
    assert all(r.session_end >= r.session_start for r in rows)
    assert sess.count() > 0


def test_dedup_stream(spark, sf_dir):
    stream = W.read_events_stream(spark, sf_dir)
    q = (
        W.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from hadoop_main_spark.tables import load_table

    n = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert spark.table("t_dedup").count() == n


def test_stateful_running_totals(spark, sf_dir):
    from hadoop_main_spark.streaming.stateful import running_totals
    from hadoop_main_spark.tables import load_table

    stream = W.read_events_stream(spark, sf_dir)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.n_events, round(r.total_value, 6))
           for r in spark.table("t_state").collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch.collect()}
    assert got == want


def test_sliding_avg_stream_matches_batch(spark, sf_dir):
    from hadoop_main_spark.tables import load_table

    stream = W.read_events_stream(spark, sf_dir)
    W.run_to_memory(W.sliding_avg(stream, watermark="0 seconds"), "t_slide")
    got = {
        (r.window_start, r.event_type): round(r.avg_value, 9)
        for r in spark.table("t_slide").collect()
    }
    want = {
        (r.window_start, r.event_type): round(r.avg_value, 9)
        for r in W.sliding_avg(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want


def test_stream_parquet_sink_checkpointed(spark, sf_dir, tmp_path):
    stream = W.read_events_stream(spark, sf_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = W.write_stream_parquet(stream.select("event_id", "event_type"), out, ckpt)
    q.awaitTermination(120)
    from hadoop_main_spark.tables import load_table

    n = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == n
    # re-running against the same checkpoint must be a no-op (no dup rows)
    q2 = W.write_stream_parquet(W.read_events_stream(spark, sf_dir).select("event_id", "event_type"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    from hadoop_main_spark.streaming.joins import interval_join
    from hadoop_main_spark.tables import load_table

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("cu"), F.col("ts").alias("l_ts"),
            F.col("event_id").alias("click_id"),
        ).withColumnRenamed("cu", "user_id")
        buys = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"), F.col("ts").alias("r_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        return clicks, buys

    sl, sr = sides(W.read_events_stream(spark, sf_dir))
    j = interval_join(sl, sr, "user_id").select("click_id", "purchase_id")
    q = (
        j.writeStream.format("memory").queryName("t_ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.purchase_id) for r in spark.table("t_ssj").collect()}

    bl, br = sides(load_table(spark, sf_dir, "events"))
    want = {
        (r.click_id, r.purchase_id)
        for r in interval_join(bl, br, "user_id")
        .select("click_id", "purchase_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_upsert_stream_sink(spark, sf_dir, tmp_path):
    from hadoop_main_spark.tables import load_table

    out, ckpt = str(tmp_path / "up"), str(tmp_path / "upckpt")
    stream = W.read_events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_type"
    )
    q = W.upsert_stream_parquet(stream, out, ckpt, key="user_id")
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    # exactly one row per key survives the upserts
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users


def test_stream_broadcast_enrich_matches_batch(spark, sf_dir):
    from hadoop_main_spark.streaming.joins import broadcast_enrich
    from hadoop_main_spark.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = W.read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    enriched = broadcast_enrich(stream, dim, "user_id", dim_key="c_custkey")
    q = (
        enriched.writeStream.format("memory").queryName("t_enrich")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.c_mktsegment) for r in spark.table("t_enrich").collect()
    }

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    want = {
        (r.event_id, r.c_mktsegment)
        for r in broadcast_enrich(batch, dim, "user_id", dim_key="c_custkey").collect()
    }
    assert got == want and len(want) > 0
    # left join: every stream row survives even without a dim match
    assert len(got) == batch.count()


def test_stream_hll_sketch_equals_batch(spark, sf_dir, tmp_path):
    from hadoop_main_spark.functions.sketches import hll_estimate, hll_registers
    from hadoop_main_spark.tables import load_table

    out, ckpt = str(tmp_path / "hll"), str(tmp_path / "hllckpt")
    stream = W.read_events_stream(spark, sf_dir).select("user_id")
    q = W.hll_sketch_stream_parquet(stream, "user_id", out, ckpt)
    q.awaitTermination(120)

    stream_est = hll_estimate(spark.read.parquet(out)).collect()[0].est_distinct
    batch = load_table(spark, sf_dir, "events").select("user_id")
    batch_est = hll_estimate(hll_registers(batch, "user_id")).collect()[0].est_distinct
    # lossless register merge: stream and batch estimates are IDENTICAL
    assert stream_est == batch_est


def test_stream_minhash_dedup_matches_batch(spark, sf_dir):
    stream = W.read_table_stream(spark, sf_dir, "documents").select("doc_id", "text")
    q = (
        W.dedup_stream_minhash(stream, "doc_id", "text")
        .writeStream.format("memory").queryName("t_mh_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = spark.table("t_mh_dedup").count()

    # batch truth: number of distinct full minhash signatures
    from hadoop_main_spark.operators.dedup import minhash_signature
    from hadoop_main_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_sigs = (
        minhash_signature(docs, "doc_id", "text")
        .select(*[f"mh{j}" for j in range(16)])
        .distinct()
        .count()
    )
    assert kept == n_sigs
    assert kept < docs.count()  # the fixture contains near-dups


def test_pipe_multichar_separator(spark):
    # TestStreamingSeparator analog: multi-char separators survive the
    # round trip through the subprocess line protocol
    df = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], ["k", "v"])
    out = {
        (r.key, r.value)
        for r in P.pipe(df, "cat", input_sep="::", output_sep="::").collect()
    }
    assert out == {("k1", "v1"), ("k2", "v2")}


def test_pipe_combiner_then_reduce(spark):
    # TestStreamingCombiner analog: a map-side pre-aggregation
    # (Spark partial agg plays the combiner role) feeding a subprocess
    # reducer gives the same totals as the plain aggregate
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("a", 4), ("b", 5)], ["k", "v"]
    )
    combined = df.groupBy("k").agg(F.sum("v").alias("v"))  # combiner stage
    out = P.pipe_reduce(
        combined,
        "awk -F'\\t' '($1 \"\") != (p \"\") { if (NR > 1) print p \"\\t\" s; p = $1; s = 0 } "
        "{ s += $2 } END { if (NR > 0) print p \"\\t\" s }'",
        group_key="k",
    )
    rows = {(r.key, int(r.value)) for r in out.collect()}
    assert rows == {("a", 7), ("b", 8)}


def test_pipe_preserves_utf8_and_specials(spark):
    # content with UTF-8, quotes, and shell metacharacters must pass
    # through the stdin/stdout protocol unmangled
    vals = ["héllo wörld", "a\"quote'd", "dollar$and|pipe&amp"]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    out = {r.key for r in P.pipe(df, "cat").collect()}
    assert out == set(vals)


def test_pipe_large_group_streams(spark):
    # a 50k-line group must stream through the subprocess without
    # deadlock (writer thread vs stdout reader) and count exactly
    df = spark.range(50_000).select(F.lit("g").alias("k"), F.col("id").cast("string").alias("v"))
    out = P.pipe_reduce(
        df,
        "awk -F'\\t' '($1 \"\") != (p \"\") { if (NR > 1) print p \"\\t\" c; p = $1; c = 0 } "
        "{ c += 1 } END { if (NR > 0) print p \"\\t\" c }'",
        group_key="k",
    )
    rows = [(r.key, int(r.value)) for r in out.collect()]
    assert sorted(rows) == [("g", 50_000)] or sum(v for _, v in rows) == 50_000


def test_streaming_curation_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """Capstone composition: token-quality gate (stateless exprs) ->
    minhash near-dup suppression (dropDuplicates state) -> checkpointed
    parquet sink, driven as a stream; row count must equal the batch
    computation (distinct signatures among quality-passing docs)."""
    from hadoop_main_spark.operators.dedup import minhash_signature
    from hadoop_main_spark.operators.transforms import tokenize
    from hadoop_main_spark.tables import load_table

    def quality_gate(df):
        toks = tokenize("text")
        return df.filter(
            (F.size(toks) >= 20)
            & (F.size(F.array_distinct(toks)) / F.size(toks) >= 0.3)
        )

    out, ckpt = str(tmp_path / "curated"), str(tmp_path / "cckpt")
    stream = W.read_table_stream(spark, sf_dir, "documents").select("doc_id", "text")
    kept = W.dedup_stream_minhash(quality_gate(stream), "doc_id", "text")
    q = W.write_stream_parquet(kept.select("doc_id"), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out).count()

    docs = load_table(spark, sf_dir, "documents")
    want = (
        minhash_signature(quality_gate(docs), "doc_id", "text")
        .select(*[f"mh{j}" for j in range(16)])
        .distinct()
        .count()
    )
    assert got == want and got > 0


def test_hll_sink_merges_across_micro_batches(spark, sf_dir, tmp_path):
    """Multi-batch merge path: 4 source files with maxFilesPerTrigger=1
    force 4 micro-batches, so the sink's read-merge-overwrite branch
    actually executes; the final estimate must still equal the batch
    estimate (lossless register merge across batches)."""
    from hadoop_main_spark.functions.sketches import hll_estimate, hll_registers
    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "events4")
    events = load_table(spark, sf_dir, "events").select("user_id")
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "hll4"), str(tmp_path / "hll4ckpt")
    q = W.hll_sketch_stream_parquet(stream, "user_id", out, ckpt)
    q.awaitTermination(120)

    stream_est = hll_estimate(spark.read.parquet(out)).collect()[0].est_distinct
    batch_est = hll_estimate(hll_registers(events, "user_id")).collect()[0].est_distinct
    assert stream_est == batch_est


def test_pipe_null_columns_keep_field_alignment(spark):
    """Regression: NULL columns must become empty fields, not vanish
    (concat_ws drops nulls, which shifted every later field)."""
    df = spark.createDataFrame(
        [("k1", None, "v1"), ("k2", "mid", "v2")], ["a", "b", "c"]
    )
    out = {r.key: r.value for r in P.pipe(df, "cat").collect()}
    # line was a<TAB>b<TAB>c; key = first field, value = rest
    assert out["k1"] == "\tv1"  # empty middle field preserved
    assert out["k2"] == "mid\tv2"


def test_pipe_binary_roundtrip_hostile_bytes(spark):
    """Separator-hostile content (newlines, tabs, NULs, 0xFF, empty)
    must survive the subprocess boundary bit-exactly — the guarantee
    typed-bytes provides (ST/io/TypedBytesInputWriter.java:1)."""
    payloads = [
        b"plain",
        b"embedded\nnewline\r\n",
        b"tab\tand\x00nul",
        bytes(range(256)),
        b"",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "data binary").repartition(1)
    got = sorted(bytes(r.value) for r in P.pipe_binary(df, "cat").collect())
    assert got == sorted(payloads)


def test_pipe_binary_multi_column_requires_input_col(spark):
    df = spark.createDataFrame([(1, b"x")], "id int, data binary")
    with pytest.raises(ValueError):
        P.pipe_binary(df, "cat")
    got = [bytes(r.value) for r in P.pipe_binary(df, "cat", input_col="data").collect()]
    assert got == [b"x"]


def test_pipe_chunked_output_expansion(spark):
    """An output-expanding command under a tiny chunk size: results
    must be complete and correct while the task only ever holds
    chunk_rows rows (the unbounded-buffer fix)."""
    df = spark.createDataFrame([(i,) for i in range(50)], "n int").repartition(2)
    # awk emits 40 lines per input line -> 2000 output rows, chunk 16
    cmd = "awk '{ for (i = 0; i < 40; i++) print $1 \"\\t\" i }'"
    out = P.pipe(df, cmd, chunk_rows=16)
    rows = [(int(r.key), int(r.value)) for r in out.collect()]
    assert sorted(rows) == sorted((n, i) for n in range(50) for i in range(40))


def test_pipe_feed_error_propagates_not_hangs():
    """A feed-side error must close stdin, surface the exception on
    the consuming thread, and NOT hang (the silent-hang failure mode:
    child waiting on stdin EOF forever). Unit-level: Spark normalizes
    unencodable strings before they reach the writer, so the trigger
    is a failing feed iterator."""

    def bad_lines():
        yield "ok"
        raise RuntimeError("feed boom")

    with pytest.raises(RuntimeError, match="feed boom"):
        list(P._run_pipe(bad_lines(), "cat", "\t"))

    def bad_recs():
        yield b"ok"
        raise RuntimeError("feed boom bin")

    with pytest.raises(RuntimeError, match="feed boom bin"):
        list(P._run_pipe_binary(bad_recs(), "cat"))


def test_upsert_sink_recovers_from_crash_mid_swap(spark, tmp_path):
    """A crash between moving the live dir aside and swapping the new
    contents in (the round-2 delete-then-rename data-loss window) must
    NOT lose accumulated keys: the next batch restores the aside copy
    and merges against it."""
    import shutil

    out, ckpt1, ckpt2 = (
        str(tmp_path / "up"),
        str(tmp_path / "ck1"),
        str(tmp_path / "ck2"),
    )
    src = str(tmp_path / "src1")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.parquet(src)
    stream = spark.readStream.schema("k int, v string").parquet(src)
    W.upsert_stream_parquet(stream, out, ckpt1, key="k").awaitTermination(120)
    assert spark.read.parquet(out).count() == 2

    # simulate the crash state: live dir moved aside, swap never happened
    shutil.move(out, out + "__old_batch7")

    src2 = str(tmp_path / "src2")
    spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string").write.parquet(src2)
    stream2 = spark.readStream.schema("k int, v string").parquet(src2)
    W.upsert_stream_parquet(stream2, out, ckpt2, key="k").awaitTermination(120)

    got = {r.k: r.v for r in spark.read.parquet(out).collect()}
    # key 1 came ONLY from the pre-crash accumulated state
    assert got == {1: "a", 2: "B", 3: "c"}
    import os

    assert not os.path.exists(out + "__old_batch7")


def test_upsert_sink_sweeps_stale_asides_and_recovers_by_mtime(spark, tmp_path):
    """ADVICE-r3: (a) an aside left by a crash between a PREVIOUS
    batch's swap and its aside-delete must be swept by the next
    successful swap (not leak forever); (b) after a checkpoint reset
    (batch ids restart at 0) recovery must restore the NEWEST aside by
    modification time, not the highest batch id."""
    import os
    import shutil

    out = str(tmp_path / "up")
    src = str(tmp_path / "src1")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(src)
    stream = spark.readStream.schema("k int, v string").parquet(src)
    W.upsert_stream_parquet(stream, out, str(tmp_path / "ck1"), key="k").awaitTermination(120)

    # (a) stale aside from an earlier crashed batch, live dir intact
    shutil.copytree(out, out + "__old_batch5")
    src2 = str(tmp_path / "src2")
    spark.createDataFrame([(2, "b")], "k int, v string").write.parquet(src2)
    stream2 = spark.readStream.schema("k int, v string").parquet(src2)
    W.upsert_stream_parquet(stream2, out, str(tmp_path / "ck2"), key="k").awaitTermination(120)
    assert {r.k: r.v for r in spark.read.parquet(out).collect()} == {1: "a", 2: "b"}
    assert not any("__old_batch" in p for p in os.listdir(tmp_path)), os.listdir(tmp_path)

    # (b) crash window + checkpoint reset: two asides, the OLD state
    # under a HIGH batch id (backdated mtime), the NEW state under
    # batch id 0 — recovery must pick the newer mtime
    shutil.copytree(out, out + "__old_batch0")
    os.makedirs(out + "__old_batch9")
    spark.createDataFrame([(9, "stale")], "k int, v string").write.mode(
        "overwrite"
    ).parquet(out + "__old_batch9")
    past = 1_000_000_000
    os.utime(out + "__old_batch9", (past, past))
    shutil.rmtree(out)
    W._recover_replaced_dir(spark, out)
    assert {r.k: r.v for r in spark.read.parquet(out).collect()} == {1: "a", 2: "b"}


def test_hll_sink_recovers_from_crash_mid_swap(spark, sf_dir, tmp_path):
    """Same crash window for the HLL register sink: registers
    accumulated before the crash must survive via the aside copy."""
    import shutil

    from hadoop_main_spark.functions.sketches import hll_estimate
    from hadoop_main_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    half1 = events.filter("user_id % 2 = 0")
    half2 = events.filter("user_id % 2 = 1")
    out = str(tmp_path / "hll")

    src1 = str(tmp_path / "h1")
    half1.select("user_id").write.parquet(src1)
    s1 = spark.readStream.schema("user_id long").parquet(src1)
    W.hll_sketch_stream_parquet(s1, "user_id", out, str(tmp_path / "hc1")).awaitTermination(120)

    shutil.move(out, out + "__old_batch3")

    src2 = str(tmp_path / "h2")
    half2.select("user_id").write.parquet(src2)
    s2 = spark.readStream.schema("user_id long").parquet(src2)
    W.hll_sketch_stream_parquet(s2, "user_id", out, str(tmp_path / "hc2")).awaitTermination(120)

    got = hll_estimate(spark.read.parquet(out)).collect()[0][0]
    want = hll_estimate(
        __import__(
            "hadoop_main_spark.functions.sketches", fromlist=["hll_registers"]
        ).hll_registers(events, "user_id")
    ).collect()[0][0]
    # lossless merge: estimate over the recovered+merged registers is
    # identical to the single-pass batch estimate
    assert got == want


def test_pipe_binary_null_raises_unless_opted_in(spark):
    from hadoop_main_spark.operators.pipe import pipe_binary

    df = spark.createDataFrame([(b"x",), (None,)], "rec binary")
    with pytest.raises(Exception, match="NULL input value"):
        pipe_binary(df, ["cat"]).collect()
    got = sorted(bytes(r.value) for r in pipe_binary(df, ["cat"], null_as_empty=True).collect())
    assert got == [b"", b"x"]


def test_span_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming repeated-span accumulation == batch cross_doc_spans
    over all data seen: per-batch partial counts merge additively
    (documents arrive once, so distinct-doc counts are disjoint), and
    the >= 2 cut at read time catches spans whose duplication
    straddles micro-batches."""
    from hadoop_main_spark.operators.dedup import cross_doc_spans
    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "docsrc")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "spans"), str(tmp_path / "spansckpt")
    q = W.span_counts_stream_parquet(stream, "doc_id", "text", out, ckpt, window=10)
    assert q.awaitTermination(300), "stream did not finish in time"
    q.stop()  # release the checkpoint before the same-lineage restart

    def snapshot():
        return sorted(
            (r.span_hash, r.n_docs, r.n_occurrences, r.first_doc)
            for r in W.read_span_counts(spark, out, min_docs=2).collect()
        )

    got = snapshot()
    want = sorted(
        (r.span_hash, r.n_docs, r.n_occurrences, r.first_doc)
        for r in cross_doc_spans(docs, "doc_id", "text", window=10).collect()
    )
    assert got == want
    assert len(got) > 0  # the fixture really has cross-doc spans

    # REPLAY (same lineage): re-delivering already-merged batch ids
    # under the SAME ckpt_id must be skipped, not double-SUMmed. This
    # Spark build refuses to restart a query on a used checkpoint dir
    # within one session, so the replay is simulated by retagging the
    # sink rows with the checkpoint the second stream will use — its
    # batches then carry exactly the already-applied ids 0..N
    ckpt2 = str(tmp_path / "spansckpt2")
    retagged = spark.read.parquet(out).withColumn("ckpt_id", F.lit(ckpt2)).collect()
    sink_schema = spark.read.parquet(out).schema
    spark.createDataFrame(retagged, sink_schema).write.mode("overwrite").parquet(out)
    q2 = W.span_counts_stream_parquet(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "doc_id",
        "text",
        out,
        ckpt2,
        window=10,
    )
    assert q2.awaitTermination(300), "replay stream did not finish in time"
    assert snapshot() == want

    # NEW checkpoint lineage over NEW data (batch ids restart at 0):
    # the guard must scope to the checkpoint id and MERGE these
    # batches, not drop them as replays (review-r4b)
    extra_src = str(tmp_path / "docsrc2")
    extra = docs.limit(20).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    extra.repartition(2).write.mode("overwrite").parquet(extra_src)
    q3 = W.span_counts_stream_parquet(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(extra_src),
        "doc_id",
        "text",
        out,
        str(tmp_path / "spansckpt3"),
        window=10,
    )
    assert q3.awaitTermination(300), "lineage-2 stream did not finish in time"
    combined = docs.unionByName(spark.read.parquet(extra_src))
    want2 = sorted(
        (r.span_hash, r.n_docs, r.n_occurrences, r.first_doc)
        for r in cross_doc_spans(combined, "doc_id", "text", window=10).collect()
    )
    assert snapshot() == want2


def test_dedup_ingest_stream_equals_batch_self_join(spark, sf_dir, tmp_path):
    """The streaming ingest-dedup loop (within-batch pairs + cross
    pairs against all previously ingested signatures) must produce,
    over ANY batching of the corpus, exactly the one-shot self-join
    pair set — each unordered pair exactly once, same estimates."""
    from hadoop_main_spark.operators.dedup import minhash_lsh_pairs
    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "docsrc")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(5).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    sig_p, pairs_p = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    q = W.dedup_ingest_stream(
        stream, "doc_id", "text", sig_p, pairs_p, str(tmp_path / "ick")
    )
    assert q.awaitTermination(300), "ingest stream did not finish"

    got = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in spark.read.parquet(pairs_p).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", min_est_jaccard=0.5).collect()
    )
    assert got == want and len(got) > 0
    # the signature store holds every ingested doc exactly once
    assert spark.read.parquet(sig_p).count() == docs.count()


def test_dedup_ingest_stream_releases_checkpoints(spark, sf_dir, tmp_path):
    """The per-batch signature localCheckpoint must be released after
    each batch — a long-running ingest stream must not pin one cached
    RDD per micro-batch (the connected_components discipline)."""
    from hadoop_main_spark.tables import load_table

    before = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    src = str(tmp_path / "src")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    docs.repartition(3).write.mode("overwrite").parquet(src)
    q = W.dedup_ingest_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "doc_id",
        "text",
        str(tmp_path / "s"),
        str(tmp_path / "p"),
        str(tmp_path / "c"),
    )
    assert q.awaitTermination(300)
    after = [
        i.id()
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if i.id() not in before
    ]
    assert not after, f"leaked checkpoint blocks: {after}"


def test_dedup_ingest_stream_replay_after_crash_is_idempotent(spark, sf_dir, tmp_path):
    """advice-r4 (medium): if the driver crashes AFTER a batch's
    signatures land in the store but BEFORE the checkpoint commit, the
    replayed batch must not read its own signatures back as 'corpus' —
    that would emit id_a==id_b self-pairs (est 1.0) and duplicate every
    within-batch pair. Simulated by deleting the final checkpoint
    commit and restarting: the replay must reproduce the exact
    original pair set."""
    import glob
    import os

    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "docsrc")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    docs.repartition(4).write.mode("overwrite").parquet(src)
    sig_p, pairs_p, ckpt = (
        str(tmp_path / "sigs"), str(tmp_path / "pairs"), str(tmp_path / "ick")
    )

    def start():
        return W.dedup_ingest_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src),
            "doc_id", "text", sig_p, pairs_p, ckpt,
        )

    q1 = start()
    assert q1.awaitTermination(300)
    q1.stop()  # release the checkpoint registration before the restart
    want = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in spark.read.parquet(pairs_p).collect()
    )
    assert want, "fixture produced no pairs"
    # crash simulation: the last batch's sig partition EXISTS but its
    # checkpoint commit does not -> Spark replays that batch on restart
    commits = sorted(
        c for c in glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(c).isdigit()
    )
    os.remove(commits[-1])
    # the local FS keeps a hidden checksum sibling; a stale .crc makes
    # the recommit rename fail, which is not the scenario under test
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    q2 = start()
    assert q2.awaitTermination(300)
    q2.stop()
    got = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in spark.read.parquet(pairs_p).collect()
    )
    assert all(a != b for a, b, _ in got), "replay paired docs with themselves"
    assert got == want
    assert spark.read.parquet(sig_p).count() == docs.count()


def test_media_features_stream_equals_batch(spark, tmp_path):
    """Multimodal decode in Structured Streaming: streaming
    extract_features over WAV payloads (real RIFF decode in-stream,
    micro-batched source) must produce EXACTLY the batch operator's
    rows, including the zeros bad-record path."""
    import numpy as np
    import pandas as pd

    from hadoop_main_spark.operators import multimodal as MM

    def gen(batches):
        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 9 == 0:
                    payloads.append(b"not a wav")  # bad record
                else:
                    n = i % 30 + 20
                    s = ((i * 13 + np.arange(n) * 7) % 4001 - 2000).astype("<i2")
                    payloads.append(MM._wav_encode(8000, s[:, None]))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    src = str(tmp_path / "mediasrc")
    media = (
        spark.range(180)
        .selectExpr("id AS media_id")
        .mapInPandas(gen, "media_id long, payload binary")
    )
    media.repartition(3).write.mode("overwrite").parquet(src)

    out, ckpt = str(tmp_path / "feats"), str(tmp_path / "ck")
    q = W.media_features_stream(
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        out, ckpt, decoder="wav", dim=4,
    )
    assert q.awaitTermination(300)
    q.stop()
    got = {
        r.media_id: (r.n_bytes, r.digest, tuple(r.features))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.media_id: (r.n_bytes, r.digest, tuple(r.features))
        for r in MM.extract_features(
            spark.read.parquet(src), decoder="wav", dim=4
        ).collect()
    }
    assert got == want and len(got) == 180


def test_dedup_ingest_first_batch_crash_replay(spark, sf_dir, tmp_path):
    """Verdict-r5 next#6 edge: a crash during the FIRST batch leaves
    sig_path/batch=0 on disk with NO checkpoint at all. The fresh run
    replays batch 0 against a sig store whose only partition is its
    own: the strictly-earlier filter must yield an EMPTY corpus (not a
    self-join), and the final pair set must equal a one-shot run's."""
    from hadoop_main_spark.operators.dedup import minhash_signature
    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "docsrc")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    sig_p, pairs_p, ckpt = (
        str(tmp_path / "sigs"), str(tmp_path / "pairs"), str(tmp_path / "ick")
    )
    # simulate the torn first attempt: batch 0's signatures landed,
    # nothing else did (no pairs, no checkpoint commit)
    minhash_signature(docs, "doc_id", "text").write.parquet(f"{sig_p}/batch=0")

    q = W.dedup_ingest_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        "doc_id", "text", sig_p, pairs_p, ckpt,
    )
    assert q.awaitTermination(300)
    q.stop()
    got = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in spark.read.parquet(pairs_p).collect()
    )
    assert all(a != b for a, b, _ in got), "first-batch replay self-paired"
    # one-shot reference on a clean slate
    sig2, pairs2, ck2 = (
        str(tmp_path / "s2"), str(tmp_path / "p2"), str(tmp_path / "ck2")
    )
    q2 = W.dedup_ingest_stream(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        "doc_id", "text", sig2, pairs2, ck2,
    )
    assert q2.awaitTermination(300)
    q2.stop()
    want = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in spark.read.parquet(pairs2).collect()
    )
    assert got == want


def test_span_sink_recovers_from_crash_mid_swap(spark, sf_dir, tmp_path):
    """Verdict-r4 hardening: the same crash window (live dir moved
    aside, swap never happened) for the SUM-merged span sink — span
    counts accumulated before the crash must survive via the aside
    copy and the merged totals must equal the one-shot batch
    cross_doc_spans over everything ingested."""
    import shutil

    from hadoop_main_spark.operators.dedup import cross_doc_spans
    from hadoop_main_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    h1 = docs.filter("doc_id % 2 = 0")
    h2 = docs.filter("doc_id % 2 = 1")
    out = str(tmp_path / "spans")

    src1 = str(tmp_path / "s1")
    h1.write.parquet(src1)
    W.span_counts_stream_parquet(
        spark.readStream.schema("doc_id long, text string").parquet(src1),
        "doc_id", "text", out, str(tmp_path / "ck1"), window=10,
    ).awaitTermination(120)
    assert spark.read.parquet(out).count() > 0

    # crash state: live dir moved aside, swap never happened
    shutil.move(out, out + "__old_batch3")

    src2 = str(tmp_path / "s2")
    h2.write.parquet(src2)
    W.span_counts_stream_parquet(
        spark.readStream.schema("doc_id long, text string").parquet(src2),
        "doc_id", "text", out, str(tmp_path / "ck2"), window=10,
    ).awaitTermination(120)

    got = sorted(
        (r.span_hash, r.n_docs, r.n_occurrences, r.first_doc)
        for r in W.read_span_counts(spark, out, min_docs=1).collect()
    )
    want = sorted(
        (r.span_hash, r.n_docs, r.n_occurrences, r.first_doc)
        for r in cross_doc_spans(docs, "doc_id", "text", window=10, min_docs=1).collect()
    )
    assert got == want and len(got) > 0
    import os

    assert not os.path.exists(out + "__old_batch3")


def test_count_min_stream_equals_batch_and_replay(spark, sf_dir, tmp_path):
    """Streaming count-min accumulation == one-shot batch sketch over
    all data seen (counters sum exactly), replayed batches under the
    same checkpoint are skipped (SUM is not idempotent), and probing
    the accumulated sketch bounds true counts from above with exact
    hits for the heavy items."""
    from hadoop_main_spark.functions.sketches import (
        count_min_probe,
        count_min_table,
    )
    from hadoop_main_spark.tables import load_table

    src = str(tmp_path / "evsrc")
    ev = load_table(spark, sf_dir, "events").select("event_type")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    def mkstream():
        return (
            spark.readStream.schema("event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    out, ckpt = str(tmp_path / "cms"), str(tmp_path / "cmsckpt")
    q = W.count_min_stream_parquet(mkstream(), "event_type", out, ckpt)
    assert q.awaitTermination(300), "stream did not finish in time"
    q.stop()

    def snapshot():
        return sorted(
            (r.row, r.bucket, r.cnt)
            for r in W.read_count_min_sketch(spark, out).collect()
        )

    want = sorted(
        (r.row, r.bucket, r.cnt)
        for r in count_min_table(ev, "event_type").collect()
    )
    got = snapshot()
    assert got == want and len(got) > 0

    # probe the ACCUMULATED sketch: estimates upper-bound true counts
    truth = {r.event_type: r.c for r in ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()}
    items = spark.createDataFrame([(k,) for k in truth], "item string")
    est = {
        r.item: r.est_count
        for r in count_min_probe(W.read_count_min_sketch(spark, out), items, "item").collect()
    }
    assert all(est[k] >= truth[k] for k in truth)

    # replay under the same lineage (simulated by retagging ckpt_id,
    # the span-sink test's mechanism): counters must NOT double
    ckpt2 = str(tmp_path / "cmsckpt2")
    retagged = spark.read.parquet(out).withColumn("ckpt_id", F.lit(ckpt2)).collect()
    sink_schema = spark.read.parquet(out).schema
    spark.createDataFrame(retagged, sink_schema).write.mode("overwrite").parquet(out)
    q2 = W.count_min_stream_parquet(mkstream(), "event_type", out, ckpt2)
    assert q2.awaitTermination(300), "replay stream did not finish in time"
    assert snapshot() == want


def test_count_min_probe_uses_recorded_geometry(spark, tmp_path):
    """The persisted sketch records its depth/width; probing uses the
    RECORDED bucket space (a width mismatch would make the min an
    UNDER-estimate — the failure mode count-min excludes), explicit
    mismatching args raise, and merging a different geometry into an
    existing sketch path raises (review-r5)."""
    import pytest as _pt

    from hadoop_main_spark.functions.sketches import count_min_probe

    src = str(tmp_path / "cmgsrc")
    data = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 11
    spark.createDataFrame(data, "k string").repartition(2).write.parquet(src)

    def mkstream():
        return (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    out, ckpt = str(tmp_path / "cmg"), str(tmp_path / "cmgckpt")
    q = W.count_min_stream_parquet(mkstream(), "k", out, ckpt, depth=3, width=64)
    assert q.awaitTermination(300)
    q.stop()

    sk = W.read_count_min_sketch(spark, out)
    items = spark.createDataFrame([("a",), ("b",), ("c",)], "item string")
    # default-args probe must hash into the RECORDED 3x64 space
    est = {r.item: r.est_count for r in count_min_probe(sk, items, "item").collect()}
    assert est["a"] >= 7 and est["b"] >= 3 and est["c"] >= 11
    with _pt.raises(ValueError, match="width=64"):
        count_min_probe(sk, items, "item", width=256)
    # a second sink with different geometry must refuse to merge
    ckpt2 = str(tmp_path / "cmgckpt2")
    q2 = W.count_min_stream_parquet(mkstream(), "k", out, ckpt2, depth=4, width=128)
    with _pt.raises(Exception, match="depth=3"):
        q2.awaitTermination(300)


def test_span_counts_sink_recovers_from_crash_mid_swap(spark, tmp_path):
    """The span-count sink uses the same aside-then-swap replace as the
    upsert sink; a crash between moving the live dir aside and the
    swap must not lose accumulated span counts — the next batch
    restores the aside and keeps SUMMING against it (verdict-r4
    optional hardening, the upsert crash test's additive-merge twin)."""
    import shutil

    out, ck1, ck2 = (
        str(tmp_path / "spans"),
        str(tmp_path / "ck1"),
        str(tmp_path / "ck2"),
    )
    boiler = "shared boiler plate " * 10  # > window tokens, repeated spans
    src = str(tmp_path / "src1")
    spark.createDataFrame(
        [(1, boiler + "alpha"), (2, boiler + "beta")], "doc_id long, text string"
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    W.span_counts_stream_parquet(
        stream, "doc_id", "text", out, ck1, window=8
    ).awaitTermination(120)
    before = {
        r.span_hash: (r.n_docs, r.n_occurrences)
        for r in spark.read.parquet(out).collect()
    }
    assert before, "first batch produced no spans"

    # crash window: live dir moved aside, swap never happened
    shutil.move(out, out + "__old_batch9")

    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(3, boiler + "gamma")], "doc_id long, text string"
    ).write.parquet(src2)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src2)
    W.span_counts_stream_parquet(
        stream2, "doc_id", "text", out, ck2, window=8
    ).awaitTermination(120)

    got = spark.read.parquet(out)
    import os

    assert not os.path.exists(out + "__old_batch9")
    # the shared boilerplate spans must now count all THREE docs —
    # doc 1/2's contribution survived the crash and doc 3 merged in
    top = got.agg(F.max("n_docs")).collect()[0][0]
    assert top == 3
    # and batch-1 spans unique to docs 1/2 are still present
    only_before = set(before) - {r.span_hash for r in got.filter(F.col("n_docs") == 1).collect()}
    assert any(h in before for h in only_before)


def test_pq_codes_stream_equals_batch_encode(spark, tmp_path):
    """Streaming PQ ingest contract: over ANY batching, the
    accumulated code table equals the one-shot batch encode (codes are
    deterministic under a fixed codebook), ADC top-k over the
    incremental index matches the batch ranking, and re-running the
    SAME stream+checkpoint reprocesses nothing."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import similarity as SIM

    vecs = (
        spark.range(200)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (F.pmod(F.col("id") * 37 + i * 11, F.lit(100)) / 25.0 - 2.0),
            ).alias("embedding"),
        )
    )
    cb, _ = SIM.pq_codebook(vecs)
    src = str(tmp_path / "vsrc")
    vecs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    codes_p, ck = str(tmp_path / "codes"), str(tmp_path / "ck")
    q = W.pq_codes_stream_parquet(stream, cb, codes_p, ck)
    assert q.awaitTermination(300)

    got = {r.vec_id: list(r.codes) for r in W.read_pq_codes(spark, codes_p).collect()}
    want = {r.vec_id: list(r.codes) for r in SIM.pq_encode(vecs, cb).collect()}
    assert got == want

    # ADC over the incremental index == ADC over the batch encode
    qs = [(int(r.vec_id), [float(x) for x in r.embedding])
          for r in vecs.filter(F.col("vec_id") < 2).collect()]
    inc = sorted(
        (r.query_id, r.vec_id, r.pq_d2)
        for r in SIM.pq_adc_scores(W.read_pq_codes(spark, codes_p), qs, cb).collect()
    )
    bat = sorted(
        (r.query_id, r.vec_id, r.pq_d2)
        for r in SIM.pq_adc_scores(SIM.pq_encode(vecs, cb), qs, cb).collect()
    )
    assert inc == bat

    # same stream, same checkpoint: nothing new to process, table unchanged
    import os

    n_dirs = len([d for d in os.listdir(codes_p) if d.startswith("batch=")])
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = W.pq_codes_stream_parquet(stream2, cb, codes_p, ck)
    assert q2.awaitTermination(300)
    assert len([d for d in os.listdir(codes_p) if d.startswith("batch=")]) == n_dirs
    got2 = {r.vec_id: list(r.codes) for r in W.read_pq_codes(spark, codes_p).collect()}
    assert got2 == want


def test_residual_codes_stream_equals_batch_encode(spark, tmp_path):
    """Streaming TRUE-IVFADC ingest contract: new vectors are
    cell-assigned by the persisted coarse quantizer and
    residual-encoded against the index's serialized codebook; over ANY
    batching the accumulated incremental code table equals the
    one-shot batch assign+encode, and a checkpoint re-run reprocesses
    nothing."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import similarity as SIM

    def mkvecs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (F.pmod(F.col("id") * 37 + i * 11, F.lit(100)) / 25.0 - 2.0),
            ).alias("embedding"),
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("label"),
        )

    base = mkvecs(0, 200)
    idx = str(tmp_path / "residx")
    SIM.build_ivfpq_residual_index(base, idx, "label")

    newv = mkvecs(200, 400).drop("label")  # arrivals carry no cell
    src = str(tmp_path / "vsrc")
    newv.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ck = str(tmp_path / "ck")
    q = W.residual_codes_stream_parquet(stream, idx, ck)
    assert q.awaitTermination(300)

    got = {
        r.vec_id: (r.cell, list(r.codes))
        for r in W.read_residual_codes_inc(spark, idx).collect()
    }

    # batch twin with the same persisted artifacts
    cents = spark.read.parquet(f"{idx}/centroids")
    cent_rows = cents.collect()
    cents_list = [(int(r.cell), [float(x) for x in r.centroid]) for r in cent_rows]
    qcent = SIM._quantized_centroid_map(cent_rows, SIM.PQ_QSCALE)
    cb_rows = spark.read.parquet(f"{idx}/codebook").collect()
    cbx = np.zeros((4, 16, 16), dtype=np.int64)
    for r in cb_rows:
        cbx[r.m, r.code] = r.cent
    assigned = (
        SIM.kmeans_assign(newv, cents_list, "vec_id", "embedding")
        .drop("__d2")
        .withColumn("cell", F.col("cluster").cast(cents.schema["cell"].dataType))
        .drop("cluster")
    )
    want = {
        r.vec_id: (r.cell, list(r.codes))
        for r in SIM.pq_encode_residual(
            assigned, cbx, qcent, "vec_id", "embedding"
        ).collect()
    }
    assert got == want and len(got) == 200

    # replay: same stream + checkpoint processes nothing new
    inc_dir = f"{idx}/codes_inc"
    n_dirs = len([d for d in os.listdir(inc_dir) if d.startswith("batch=")])
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = W.residual_codes_stream_parquet(stream2, idx, ck)
    assert q2.awaitTermination(300)
    assert len([d for d in os.listdir(inc_dir) if d.startswith("batch=")]) == n_dirs
    got2 = {
        r.vec_id: (r.cell, list(r.codes))
        for r in W.read_residual_codes_inc(spark, idx).collect()
    }
    assert got2 == want


def test_warc_records_stream_equals_batch(spark, tmp_path):
    """WARC record walk in Structured Streaming: streaming
    warc_records over mixed plain/gzip-member WARC payloads (incl.
    chunked HTTP responses and bad records) must produce EXACTLY the
    batch operator's rows."""
    import pandas as pd

    from hadoop_main_spark.sources import warc as WA

    def gen(batches):
        for b in batches:
            ids = b["media_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 11 == 0:
                    payloads.append(b"junk, not warc")
                    continue
                body = f"<p>doc {i}</p>".encode() * (i % 4 + 1)
                recs = [
                    dict(
                        warc_type="response",
                        block=WA.http_response(body, chunked=(i % 3 == 0)),
                        target_uri=f"http://e.org/{i}",
                        content_type="application/http; msgtype=response",
                    )
                ]
                payloads.append(WA.build_warc(recs, gzip_members=(i % 2 == 1)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    src = str(tmp_path / "warcsrc")
    (
        spark.range(120)
        .selectExpr("id AS media_id")
        .mapInPandas(gen, "media_id long, payload binary")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "recs"), str(tmp_path / "ck")
    q = W.warc_records_stream_parquet(
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        out, ckpt,
    )
    assert q.awaitTermination(300)
    q.stop()
    key = lambda r: (r.media_id, r.rec_idx)  # noqa: E731
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, WA.warc_records(spark.read.parquet(src)).collect()))
    assert got == want and len(got) == 120


def test_gap_sessions_state_carry_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: a session spanning three
    micro-batches reconstructs as ONE session; a gap inside a batch
    splits; the open-session snapshot is superseded by its closed
    emission (same (key, session_start), greater-or-equal n)."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window
    from hadoop_main_spark.streaming.stateful import gap_sessions

    US = 1_000_000
    MIN = 60 * US

    def ev(eid, uid, ts_us):
        import datetime
        return (eid, uid, datetime.datetime(2024, 1, 1) +
                datetime.timedelta(microseconds=ts_us))

    # user 1: events at 0, 10min | 40min | 70min -> one session (gaps 30min
    #   exactly = not > gap with gap=30min? use gap 29min to split; keep 30min gap op:
    #   boundary is STRICTLY greater than gap) so 30-min spacing chains.
    # user 2: events at 0 | 200min -> two sessions (gap > 30min).
    batches = [
        [ev(1, 1, 0), ev(2, 1, 10 * MIN), ev(10, 2, 0)],
        [ev(3, 1, 40 * MIN)],
        [ev(4, 1, 70 * MIN), ev(11, 2, 200 * MIN)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for k, rows in enumerate(batches):
        d = str(tmp_path / f"b{k}")
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        ).coalesce(1).write.parquet(d)
        (pf,) = glob.glob(f"{d}/part-*.parquet")
        dst = f"{src}/q{k}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + k * 60, 1_700_000_000 + k * 60))
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")

    def sink(b, i):
        b.write.mode("overwrite").parquet(f"{out}/batch={i}")

    q = (
        gap_sessions(stream, "user_id", "ts", "event_id",
                     gap_us=30 * MIN)
        .writeStream.foreachBatch(sink).outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    emitted = spark.read.parquet(out)
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.col("closed").desc(), F.col("n_events").desc(),
        F.col("session_end").desc())
    final = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in emitted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").collect()
    }
    base = 1704067200 * US  # 2024-01-01 epoch us
    assert final == {
        (1, base, base + 70 * MIN, 4),          # one session across 3 batches
        (2, base, base, 1),                      # closed by the later gap
        (2, base + 200 * MIN, base + 200 * MIN, 1),
    }
    # the spanning session emitted open snapshots in earlier batches
    opens = emitted.filter((F.col("user_id") == 1) & (~F.col("closed"))).count()
    assert opens >= 2


def test_knn_graph_stream_insert_equals_sequential_batch(spark, tmp_path):
    """Streaming graph-ANN ingest contract (the HNSW insert path):
    each micro-batch's edges equal the same beam-search run
    sequentially in batch over the identical graph states; newly
    ingested vectors are REACHABLE (a duplicate of an ingested vector
    finds it at rank 1 through the reverse links); a checkpoint
    re-run reprocesses nothing."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import similarity as SIM

    def mkvecs(lo, n):
        # two coprime moduli -> no two ids within 8900 share a vector
        # (a single modulus made stream id 1040 collide with base id 43)
        return (
            spark.range(lo, lo + n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda i: (
                        F.pmod(F.col("id") * 37 + i * 11, F.lit(100)) / 25.0
                        + F.pmod(F.col("id") * 53 + i * 7, F.lit(89)) / 250.0
                        - 2.0
                    ),
                ).alias("embedding"),
            )
        )

    base = mkvecs(0, 120)
    idx = str(tmp_path / "gidx")
    SIM.build_knn_graph_index(base, idx, k=5, iterations=2)

    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    batches = [mkvecs(1000, 20), mkvecs(1020, 20), mkvecs(1040, 20)]
    for bi, bdf in enumerate(batches):
        part = str(tmp_path / f"part{bi}")
        bdf.coalesce(1).write.parquet(part)
        (pf,) = glob.glob(f"{part}/part-*.parquet")
        dst = f"{src}/b{bi}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + bi * 60,) * 2)

    inc, ck = str(tmp_path / "inc"), str(tmp_path / "gck")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.knn_graph_stream_parquet(
        stream, idx, inc, ck, k=5, beam=12, hops=3, entries=4
    )
    assert q.awaitTermination(600)

    # sequential batch reference: identical per-batch graph states
    edges = spark.read.parquet(f"{idx}/graph")
    nodes = spark.read.parquet(f"{idx}/nodes")
    for bi, bdf in enumerate(batches):
        qs = bdf.select(F.col("vec_id").alias("__qid"), "embedding")
        res = SIM.knn_graph_search(
            edges, nodes, qs, 5, 12, 3, 4, "vec_id", "embedding", "__qid"
        )
        want = set()
        for r in res.collect():
            want.add((int(r["__qid"]), int(r.rank), int(r.neighbor_id), int(r.d2)))
            want.add((int(r.neighbor_id), int(r.rank), int(r["__qid"]), int(r.d2)))
        got = {
            (int(r.id), int(r.rank), int(r.nbr_id), int(r.d2))
            for r in spark.read.parquet(f"{inc}/edges/batch={bi}").collect()
        }
        assert got == want, f"batch {bi}"
        fwd = res.select(
            F.col("__qid").alias("id"), "rank",
            F.col("neighbor_id").alias("nbr_id"), "d2",
        )
        rev = res.select(
            F.col("neighbor_id").alias("id"), "rank",
            F.col("__qid").alias("nbr_id"), "d2",
        )
        edges = edges.unionByName(fwd.unionByName(rev))
        nodes = nodes.unionByName(bdf)

    # searchability: a duplicate of an ingested vector must find it at
    # rank 1 through the reverse links
    e2, n2 = W.read_knn_graph_inc(spark, idx, inc)
    probe = mkvecs(1040, 1).select(
        F.lit(77777).cast("long").alias("query_id"), "embedding"
    )
    top = SIM.knn_graph_search(e2, n2, probe, k=3, beam=12, hops=3, entries=4)
    top1 = top.filter(F.col("rank") == 1).collect()[0]
    assert int(top1.neighbor_id) == 1040 and int(top1.d2) == 0

    # checkpoint re-run: nothing reprocessed
    n_dirs = len(os.listdir(f"{inc}/edges"))
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = W.knn_graph_stream_parquet(
        stream2, idx, inc, ck, k=5, beam=12, hops=3, entries=4
    )
    assert q2.awaitTermination(600)
    assert len(os.listdir(f"{inc}/edges")) == n_dirs


def test_graph_insert_wave_chunking_equals_single_wave(spark, tmp_path):
    """r9 verdict #3: the graph-ANN ingest wave's driver-side query
    frame is now CHUNK-CAPPED (graph_insert_edges max_wave). Chunks
    all search the PRE-WAVE graph, so a wave split into 2+ chunks must
    emit exactly the single-wave edge set; degenerate caps raise."""
    import pytest

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.streaming import windows as W

    def mkvecs(lo, n):
        return (
            spark.range(lo, lo + n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda i: (
                        F.pmod(F.col("id") * 37 + i * 11, F.lit(100)) / 25.0
                        + F.pmod(F.col("id") * 53 + i * 7, F.lit(89)) / 250.0
                        - 2.0
                    ),
                ).alias("embedding"),
            )
        )

    base = mkvecs(0, 80)
    idx = str(tmp_path / "gidx")
    SIM.build_knn_graph_index(base, idx, k=5, iterations=2)
    edges = spark.read.parquet(f"{idx}/graph")
    nodes = spark.read.parquet(f"{idx}/nodes")
    wave = mkvecs(1000, 25)

    def edge_set(df):
        return {
            (int(r.id), int(r.rank), int(r.nbr_id), int(r.d2))
            for r in df.collect()
        }

    one = edge_set(
        W.graph_insert_edges(edges, nodes, wave, k=5, beam=12, max_wave=4096)
    )
    assert one  # non-trivial wave
    for cap in (10, 7):  # 3 chunks / 4 chunks (with remainder)
        chunked = edge_set(
            W.graph_insert_edges(edges, nodes, wave, k=5, beam=12, max_wave=cap)
        )
        assert chunked == one, f"max_wave={cap}"
    # degenerate cap=1 (every query its own chunk) on a small wave
    small = mkvecs(2000, 3)
    assert edge_set(
        W.graph_insert_edges(edges, nodes, small, k=5, beam=12, max_wave=1)
    ) == edge_set(
        W.graph_insert_edges(edges, nodes, small, k=5, beam=12, max_wave=4096)
    )
    with pytest.raises(ValueError, match="max_wave"):
        W.graph_insert_edges(edges, nodes, wave, max_wave=0)
    with pytest.raises(ValueError, match="non-empty"):
        W.graph_insert_edges(edges, nodes, wave.filter(F.lit(False)))


def test_knn_graph_stream_layered_maintains_both_layers(spark, tmp_path):
    """Two-layer streaming ingest (knn_graph_stream_layered): every
    wave's layer-0 edges equal the sequential batch insert; the
    hash-sampled membership subset ALSO lands layer-1 edges equal to
    the sequential insert against the grown layer-1 graph; the
    accumulated layer-1 node set equals the membership rule applied
    to the full ingested corpus (stream and fresh build select the
    same layer-1 nodes by construction)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.operators import similarity as SIM

    def mkvecs(lo, n):
        return (
            spark.range(lo, lo + n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(16)),
                    lambda i: (
                        F.pmod(F.col("id") * 37 + i * 11, F.lit(100)) / 25.0
                        + F.pmod(F.col("id") * 53 + i * 7, F.lit(89)) / 250.0
                        - 2.0
                    ),
                ).alias("embedding"),
            )
        )

    member = F.pmod(hash64(F.col("vec_id").cast("string"), "l1"), F.lit(4)) == 0
    base = mkvecs(0, 120)
    l0, l1 = str(tmp_path / "l0"), str(tmp_path / "l1")
    SIM.build_knn_graph_index(base, l0, k=5, iterations=2)
    SIM.build_knn_graph_index(base.filter(member), l1, k=4, iterations=2)

    src = str(tmp_path / "vsrc")
    os.makedirs(src)
    batches = [mkvecs(1000, 20), mkvecs(1020, 20)]
    for bi, bdf in enumerate(batches):
        part = str(tmp_path / f"part{bi}")
        bdf.coalesce(1).write.parquet(part)
        (pf,) = glob.glob(f"{part}/part-*.parquet")
        dst = f"{src}/b{bi}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + bi * 60,) * 2)

    inc, ck = str(tmp_path / "inc"), str(tmp_path / "lck")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.knn_graph_stream_layered(
        stream, l0, l1, inc, ck, k0=5, k1=4, beam=12, hops=3, entries=4
    )
    assert q.awaitTermination(600)

    # sequential batch reference per layer
    layers = {
        "l0": [spark.read.parquet(f"{l0}/graph"),
               spark.read.parquet(f"{l0}/nodes"), 5, lambda d: d],
        "l1": [spark.read.parquet(f"{l1}/graph"),
               spark.read.parquet(f"{l1}/nodes"), 4,
               lambda d: d.filter(member)],
    }
    for bi, bdf in enumerate(batches):
        for sub, st in layers.items():
            edges, nodes, kk, pick = st
            wave = pick(bdf)
            qs = wave.select(F.col("vec_id").alias("__qid"), "embedding")
            res = SIM.knn_graph_search(
                edges, nodes, qs, kk, 12, 3, 4, "vec_id", "embedding", "__qid"
            )
            want = set()
            for r in res.collect():
                want.add((int(r["__qid"]), int(r.rank),
                          int(r.neighbor_id), int(r.d2)))
                want.add((int(r.neighbor_id), int(r.rank),
                          int(r["__qid"]), int(r.d2)))
            got = {
                (int(r.id), int(r.rank), int(r.nbr_id), int(r.d2))
                for r in spark.read.parquet(
                    f"{inc}/{sub}/edges/batch={bi}"
                ).collect()
            }
            assert got == want, f"{sub} batch {bi}"
            fwd = res.select(
                F.col("__qid").alias("id"), "rank",
                F.col("neighbor_id").alias("nbr_id"), "d2",
            )
            rev = res.select(
                F.col("neighbor_id").alias("id"), "rank",
                F.col("__qid").alias("nbr_id"), "d2",
            )
            st[0] = edges.unionByName(fwd.unionByName(rev))
            st[1] = nodes.unionByName(wave)

    # accumulated layer-1 node set == membership rule over the corpus
    (_, _), (e1, n1) = W.read_knn_graph_layered_inc(spark, l0, l1, inc)
    got_ids = {int(r.vec_id) for r in n1.select("vec_id").collect()}
    all_vecs = base.unionByName(batches[0]).unionByName(batches[1])
    want_ids = {
        int(r.vec_id)
        for r in all_vecs.filter(member).select("vec_id").collect()
    }
    assert got_ids == want_ids and got_ids  # non-empty membership
