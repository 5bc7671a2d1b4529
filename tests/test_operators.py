"""Operator unit tests on tiny in-memory DataFrames — the pytest
analog of the reference's JUnit operator layer (SURVEY.md §5.1)."""

from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64, hash64_py
from hadoop_main_spark.operators import joins as J
from hadoop_main_spark.operators import sorting as S
from hadoop_main_spark.operators import transforms as T


def test_tokenize_drops_empty(spark):
    df = spark.createDataFrame([("a  b c",), ("",), ("  x ",)], ["text"])
    rows = df.select(T.tokenize("text").alias("t")).collect()
    assert [r.t for r in rows] == [["a", "b", "c"], [], ["x"]]


def test_kv_split_missing_separator(spark):
    df = spark.createDataFrame([("k1\tv1",), ("lonely",), ("a\tb\tc",)], ["line"])
    rows = T.kv_split(df, "line").collect()
    assert [(r.key, r.value) for r in rows] == [("k1", "v1"), ("lonely", ""), ("a", "b\tc")]


def test_field_spec_parser():
    assert T.parse_field_spec("0") == [(0, 1)]
    assert T.parse_field_spec("2-4") == [(2, 5)]
    assert T.parse_field_spec("3-") == [(3, None)]
    assert T.parse_field_spec("-1") == [(0, 2)]
    assert T.parse_field_spec("0,2-3") == [(0, 1), (2, 4)]


def test_field_selection(spark):
    df = spark.createDataFrame([("a\tb\tc\td",)], ["line"])
    row = T.field_selection(df, "line", "0", "2-").collect()[0]
    assert (row.key, row.value) == ("a", "c\td")
    row = T.field_selection(df, "line", "3,0", "1").collect()[0]
    assert (row.key, row.value) == ("d\ta", "b")


def test_override_join_rightmost_wins(spark):
    # keys: 1 in all, 2 in s1+s2, 3 only s1, 4 only s3
    s1 = spark.createDataFrame([(1, "a1"), (2, "a2"), (3, "a3")], ["k", "v"])
    s2 = spark.createDataFrame([(1, "b1"), (2, "b2")], ["k", "v"])
    s3 = spark.createDataFrame([(1, "c1"), (4, "c4")], ["k", "v"])
    out = {r.k: r.v for r in J.composite_join([s1, s2, s3], "k", "override").collect()}
    assert out == {1: "c1", 2: "b2", 3: "a3", 4: "c4"}


def test_composite_outer_join(spark):
    s1 = spark.createDataFrame([(1, "a")], ["k", "v1"])
    s2 = spark.createDataFrame([(2, "b")], ["k", "v2"])
    rows = {r.k: (r.v1, r.v2) for r in J.composite_join([s1, s2], "k", "outer").collect()}
    assert rows == {1: ("a", None), 2: (None, "b")}


def test_sort_spec_compiler(spark):
    df = spark.createDataFrame([("a\t10",), ("b\t2",), ("c\t10",)], ["line"])
    rows = S.sort_by_spec(df, "line", "-k2,2nr -k1").collect()
    assert [r.line for r in rows] == ["a\t10", "c\t10", "b\t2"]


def test_secondary_sort_rank(spark):
    df = spark.createDataFrame(
        [("g1", 5), ("g1", 1), ("g1", 3), ("g2", 2)], ["g", "x"]
    )
    rows = S.secondary_sort(df, "g", "x").orderBy("g", "rank").collect()
    assert [(r.g, r.x, r.rank) for r in rows] == [
        ("g1", 1, 1),
        ("g1", 3, 2),
        ("g1", 5, 3),
        ("g2", 2, 1),
    ]


def test_hash64_matches_python(spark):
    df = spark.createDataFrame([("hello",), ("world",)], ["s"])
    rows = df.select("s", hash64("s").alias("h"), hash64("s", 7).alias("h7")).collect()
    for r in rows:
        assert r.h == hash64_py(r.s)
        assert r.h7 == hash64_py(r.s, 7)
        assert 0 <= r.h < 2**60


def test_salted_agg_matches_plain(spark):
    from hadoop_main_spark.operators.partitioning import salted_agg

    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7).alias("v")
    )
    got = {
        r.k: (r.n, r.total, r.mx)
        for r in salted_agg(
            df, ["k"], {"n": ("count", "v"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_rhp_cosine_pairs_finds_planted_dup(spark):
    from hadoop_main_spark.operators.dedup import rhp_cosine_pairs

    base = [0.5, -0.2, 0.8, 0.1]
    near = [0.5001, -0.2001, 0.8001, 0.1001]   # cosine ~ 1
    far = [-0.9, 0.4, -0.1, 0.3]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["vid", "v"]
    ).select("vid", F.col("v").cast("array<double>").alias("v"))
    pairs = rhp_cosine_pairs(df, "vid", "v", dim=4, min_cosine=0.99).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].cosine > 0.999


def test_reduce_grouped_sees_sorted_values(spark):
    import pandas as pd

    from hadoop_main_spark.operators.aggregate import reduce_grouped

    df = spark.createDataFrame(
        [("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"), ("b", 9, "y9"), ("b", 5, "y5")],
        ["k", "seq", "v"],
    )

    def first_last_concat(key, pdf: "pd.DataFrame"):
        return pd.DataFrame(
            {"k": [key[0]], "joined": ["|".join(pdf["v"])], "n": [len(pdf)]}
        )

    out = {
        r.k: (r.joined, r.n)
        for r in reduce_grouped(
            df, ["k"], ["seq"], first_last_concat, "k string, joined string, n long"
        ).collect()
    }
    assert out == {"a": ("x1|x2|x3", 3), "b": ("y5|y9", 2)}


def test_kmv_estimates_large_cardinality(spark):
    from hadoop_main_spark.functions.sketches import kmv_distinct

    df = spark.range(0, 20000).select(F.concat(F.lit("u"), (F.col("id") % 10000).cast("string")).alias("u"))
    row = kmv_distinct(df, "u", k=256).collect()[0]
    assert row.k_used == 256
    assert abs(row.est_distinct - 10000) / 10000 < 0.15  # ~1/sqrt(k) error

    small = spark.range(0, 50).select(F.col("id").cast("string").alias("u"))
    row = kmv_distinct(small, "u", k=256).collect()[0]
    assert row.est_distinct == 50.0  # exact below k


def test_hll_accuracy_and_merge(spark):
    from hadoop_main_spark.functions.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 20000).select(
        F.concat(F.lit("u"), (F.col("id") % 10000).cast("string")).alias("u"),
        (F.col("id") % 2).alias("half"),
    )
    est = hll_estimate(hll_registers(df, "u")).collect()[0]
    assert abs(est.est_distinct - 10000) / 10000 < 0.10  # ~1.04/sqrt(256) ≈ 6.5%

    # merge property: per-half registers max-merged == whole-data registers
    merged = hll_merge(hll_registers(df, "u", ["half"]).drop("half"))
    whole = hll_registers(df, "u")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_connected_components_chain_and_triangle(spark):
    from hadoop_main_spark.operators.dedup import connected_components

    # chain 1-2-3-4, triangle 10-11-12, pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_operators_survive_empty_input(spark):
    from hadoop_main_spark.operators.dedup import minhash_lsh_pairs
    from hadoop_main_spark.operators.sessions import session_stats

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_pairs(empty_docs, "doc_id", "text").count() == 0
    empty_sorted = spark.createDataFrame([], "v int")
    assert S.global_rank(empty_sorted, "v").count() == 0
    import datetime as dt
    empty_events = spark.createDataFrame([], "user_id long, ts timestamp, event_id long")
    assert session_stats(empty_events).count() == 0


def test_count_min_upper_bound_property(spark):
    from hadoop_main_spark.functions.sketches import count_min_estimate

    # 2000 tokens over 50 distinct values with known counts
    df = spark.range(0, 2000).select(
        F.concat(F.lit("w"), (F.col("id") % 50).cast("string")).alias("w")
    )
    items = df.select(F.col("w").alias("item")).distinct()
    est = {r.item: r.est_count for r in count_min_estimate(df, "w", items, "item").collect()}
    true = {r.w: r.c for r in df.groupBy("w").agg(F.count("*").alias("c")).collect()}
    assert all(est[k] >= v for k, v in true.items())      # CM never undercounts
    assert sum(est[k] == v for k, v in true.items()) >= 40  # few collisions at 4x256


def test_sort_spec_char_offsets(spark):
    # lines: field1 = label, field2 = code where chars 2-3 are the sort key
    rows = [("a\tx25z",), ("b\tx03z",), ("c\tx17z",)]
    df = spark.createDataFrame(rows, ["line"])
    out = [r.line for r in S.sort_by_spec(df, "line", "-k2.2,2.3n").collect()]
    assert out == ["b\tx03z", "c\tx17z", "a\tx25z"]
    out_r = [r.line for r in S.sort_by_spec(df, "line", "-k2.2,2.3nr").collect()]
    assert out_r == ["a\tx25z", "c\tx17z", "b\tx03z"]
    # plain field specs unchanged
    out_f1 = [r.line for r in S.sort_by_spec(df, "line", "-k1,1r").collect()]
    assert out_f1 == ["c\tx17z", "b\tx03z", "a\tx25z"]


def test_connected_components_deep_chain_converges(spark):
    from hadoop_main_spark.operators.dedup import connected_components

    # 60-node chain: min-label alone needs ~60 hops; pointer jumping
    # must close it within the 20-iteration budget
    pairs = spark.createDataFrame([(i, i + 1) for i in range(60)], ["id_a", "id_b"])
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 61


def test_salted_join_matches_plain_on_skewed_data(spark):
    from hadoop_main_spark.operators.partitioning import salted_join

    # 90% of left rows share one hot key
    left = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("rv")
    )
    got = salted_join(left, right, "k")
    plain = left.join(right, "k")
    assert got.count() == plain.count()
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0


def test_user_registered_aggregator_plugin(spark):
    from hadoop_main_spark.operators.aggregate import (
        register_aggregator,
        value_aggregator,
    )

    # a custom AggType, loadable by name like the reference's
    # UserDefinedValueAggregatorDescriptor classes
    register_aggregator(
        "LongValueRange", lambda v, cap: (F.max(v) - F.min(v)).cast("bigint")
    )
    df = spark.createDataFrame(
        [("a", 3), ("a", 10), ("b", 5)], ["k", "v"]
    )
    out = {
        r.k: (r.total, r.spread)
        for r in value_aggregator(
            df, ["k"], {"total": ("LongValueSum", "v"), "spread": ("LongValueRange", "v")}
        ).collect()
    }
    assert out == {"a": (13, 7), "b": (5, 0)}

    import pytest

    with pytest.raises(ValueError):
        register_aggregator("LongValueSum", lambda v, cap: F.sum(v))


def test_bloom_probe_duplicate_probe_values(spark):
    """Regression: duplicate values in the probes frame must not turn
    into false negatives (hit counting is per distinct hash row, not
    per exploded row)."""
    from hadoop_main_spark.functions.sketches import bloom_bits, bloom_probe

    members = spark.createDataFrame([(7,), (8,)], "k long")
    probes = spark.createDataFrame([(7,), (7,), (9,)], "k long")
    got = [
        (r.k, r.bloom_maybe)
        for r in bloom_probe(bloom_bits(members, "k"), probes, "k").collect()
    ]
    assert sorted(got) == [(7, True), (7, True), (9, False)]


def test_word_shingles_short_docs(spark):
    """Regression: docs with fewer than n tokens must yield EMPTY
    shingles (Spark sequence(1, 0) counts DOWN — unguarded it crashed
    element_at on the first short document)."""
    from hadoop_main_spark.operators.dedup import minhash_signature, word_shingles

    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two"), (3, ""), (4, "solo")],
        ["doc_id", "text"],
    )
    sh = {r.doc_id: r.s for r in df.select("doc_id", word_shingles("text").alias("s")).collect()}
    assert sh[1] == ["one two three", "two three four"]
    assert sh[2] == [] and sh[3] == [] and sh[4] == []
    # the empty-signature fallback (P-1 per slot) is reachable now
    sig = minhash_signature(df, "doc_id", "text").collect()
    assert len(sig) == 4


def test_regex_matches_backslash_classes(spark):
    """Regression: patterns with \\d etc. were mangled by SQL string
    interpolation (pattern silently became 'd+')."""
    from hadoop_main_spark.operators.transforms import regex_matches

    df = spark.createDataFrame([("abc 123 def 45",)], ["line"])
    got = sorted(r.match for r in regex_matches(df, "line", r"\d+").collect())
    assert got == ["123", "45"]


def test_exact_dedup_multi_column_no_collision(spark):
    """Regression: ('ab','c') and ('a','bc') must NOT be duplicates
    (plain concat digests collided); NULL and '' must differ."""
    from hadoop_main_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc"), (3, "a", None), (4, "a", "")],
        ["id", "x", "y"],
    )
    out = {r.id: r.is_duplicate for r in exact_dedup(df, ["x", "y"], "id").collect()}
    assert out == {1: False, 2: False, 3: False, 4: False}


def test_cosine_zero_vector_never_ranks(spark):
    """Regression: a zero-norm vector produced cosine NaN, and Spark
    ranks NaN above every real double — it became everyone's #1
    neighbor. NULL instead sorts last / fails filters."""
    from hadoop_main_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])], ["vid", "v"]
    ).select("vid", F.col("v").cast("array<float>").alias("v"))
    q = df.filter("vid = 1").select(F.col("vid").alias("query_id"), "v")
    got = brute_force_topk(df, q, "vid", "v", k=1).collect()
    assert got[0].neighbor_id == 2  # not the zero vector


def test_brute_force_topk_nan_component_batch_invariant(spark):
    """Review-r4: a vector containing a NaN component yields cosine
    NaN (denom != 0), which Spark's F.desc ranks ABOVE every real
    double — the kernel's batch-local top-k must keep it, or results
    would vary with Arrow batch boundaries / partitioning."""
    from hadoop_main_spark.operators.similarity import brute_force_topk

    rows = [(i, [0.5 + i / 100.0, 0.5]) for i in range(2, 40)]
    rows.append((99, [float("nan"), 1.0]))
    df = (
        spark.createDataFrame(rows, ["vid", "v"])
        .select("vid", F.col("v").cast("array<float>").alias("v"))
        .repartition(4)
    )
    q = spark.createDataFrame([(1, [1.0, 0.0])], ["query_id", "v"]).select(
        "query_id", F.col("v").cast("array<float>").alias("v")
    )
    got = brute_force_topk(df, q, "vid", "v", k=1).collect()
    # Spark semantics: NaN sorts above every real cosine
    assert got[0].neighbor_id == 99, got


def test_asof_join_value_col_shadowed_by_left(spark):
    """Regression: when left and right share a value column name, the
    left row's own value must NOT win the carry-forward."""
    import datetime as dt

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 999.0)], ["k", "ts", "price"]
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 5.0), (1, dt.datetime(2024, 1, 1, 14), 7.0)],
        ["k", "ts", "price"],
    )
    out = J.asof_join(left, right, on="k", value_cols=["price"]).collect()
    assert len(out) == 1 and out[0].price == 5.0  # as-of 12:00 → 10:00 row


def test_lsh_pairs_from_persisted_signatures(spark, sf_dir, tmp_path):
    """Persisted-signature reuse path yields exactly the pairs the
    from-scratch computation yields."""
    from hadoop_main_spark.operators.dedup import (
        lsh_pairs_from_signatures,
        minhash_lsh_pairs,
    )
    from hadoop_main_spark.sources.layouts import materialize_minhash_signatures
    from hadoop_main_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "sigs")
    materialize_minhash_signatures(docs, path)
    got = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in lsh_pairs_from_signatures(
            spark.read.parquet(path), "doc_id"
        ).collect()
    }
    want = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert got == want and len(want) > 0


def _model_tagged_join(sources: dict, how: str):
    """Driver-side model of DataJoinReducerBase.joinAndCollect: group
    each source's values by key, cross one value per present tag;
    inner requires every tag present, outer nulls the absent tags."""
    from itertools import product

    tags = list(sources)
    keys = set().union(*[{k for k, _ in rows} for rows in sources.values()])
    out = []
    for key in keys:
        per_tag = [[v for k, v in sources[tag] if k == key] for tag in tags]
        if how == "inner" and any(not vs for vs in per_tag):
            continue
        padded = [vs or [None] for vs in per_tag]
        for combo in product(*padded):
            out.append((key, *combo))
    return sorted(out, key=lambda r: tuple((x is None, x) for x in r))


def test_tagged_join_nary_matches_model(spark):
    cases = [
        {
            "a": [(1, 10), (1, 11), (2, 20)],
            "b": [(1, 100), (3, 300)],
            "c": [(1, 1000), (2, 2000), (3, 3000), (3, 3001)],
        },
        {"a": [(1, 1)], "b": [(2, 2)], "c": [(3, 3)]},
    ]
    for data in cases:
        srcs = {
            tag: spark.createDataFrame(rows, "k int, val int")
            for tag, rows in data.items()
        }
        for how in ("inner", "outer"):
            got = sorted(
                (
                    tuple(r)
                    for r in J.tagged_join(srcs, "k", "val", how=how).collect()
                ),
                key=lambda r: tuple((x is None, x) for x in r),
            )
            assert got == _model_tagged_join(data, how), (how, data)


def test_tagged_join_max_values_per_group(spark):
    # mapred.datajoin.maxNumOfValuesPerGroup semantics
    # (DataJoinReducerBase.regroup:103): the cap counts a key's TOTAL
    # values across sources and SKIPS the excess — the first `max`
    # values (source order, then value order here) are kept and the
    # key still joins from them; it is NOT dropped.
    data = {
        "a": [(1, 10), (1, 11), (2, 20)],
        "b": [(1, 100), (1, 101), (2, 200)],
    }
    srcs = {
        tag: spark.createDataFrame(rows, "k int, val int") for tag, rows in data.items()
    }
    got = sorted(
        tuple(r)
        for r in J.tagged_join(
            srcs, "k", "val", how="inner", max_values_per_group=3
        ).collect()
    )
    # key 1: keeps a=[10, 11] + b=[100] (3 of its 4 values)
    assert got == [(1, 10, 100), (1, 11, 100), (2, 20, 200)]

    # a tag emptied by the cap behaves like an absent source: inner
    # drops the key, outer emits nulls for that side
    data2 = {"a": [(1, 10), (1, 11)], "b": [(1, 100)]}
    srcs2 = {
        tag: spark.createDataFrame(rows, "k int, val int")
        for tag, rows in data2.items()
    }
    assert (
        J.tagged_join(srcs2, "k", "val", how="inner", max_values_per_group=2).count()
        == 0
    )
    outer = sorted(
        tuple(r)
        for r in J.tagged_join(
            srcs2, "k", "val", how="outer", max_values_per_group=2
        ).collect()
    )
    assert outer == [(1, 10, None), (1, 11, None)]


def test_bucket_id_searchsorted_all_key_types(spark):
    """The byte-encoding searchsorted bucket path must agree with the
    JVM binary-search fold for every encodable key dtype (int, double,
    string, timestamp, date, decimal, boolean), asc and desc."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import sorting as S

    cases = [
        ("int", [None, -5, 0, 3, 97], [(-5,), (0,), (50,)]),
        ("double", [None, -1.5, 0.0, 2.25, 1e12], [(-1.5,), (2.0,)]),
        # strings within the 16-byte encoding width match the fold
        # exactly; beyond-width coarsening is covered separately below
        ("string", ["", "a", "ab", "zzzz", None], [("a",), ("zzzy",)]),
        (
            "timestamp",
            [None] + [dt.datetime(2020, 1, 1 + i, 12, 30, i) for i in range(4)],
            [(dt.datetime(2020, 1, 2, 0, 0, 0),), (dt.datetime(2020, 1, 4, 12, 30, 2),)],
        ),
        (
            "date",
            [None, dt.date(1999, 12, 31), dt.date(2020, 2, 29), dt.date(2021, 1, 1)],
            [(dt.date(2020, 1, 1),), (dt.date(2020, 12, 31),)],
        ),
        (
            "decimal(10,2)",
            [None, Decimal("-7.25"), Decimal("0.00"), Decimal("123.45")],
            [(Decimal("-1.00"),), (Decimal("100.00"),)],
        ),
        ("boolean", [None, False, True], [(False,), (True,)]),
    ]
    for dtype, vals, raw_bounds in cases:
        df = spark.createDataFrame([(v,) for v in vals], f"k {dtype}")
        for asc in (True, False):
            specs = S._sort_specs(df, [("k", asc)])
            bounds = sorted(raw_bounds, reverse=not asc)
            fold = df.withColumn("p", S._bucket_id_fold(specs, bounds)).collect()
            fast = df.withColumn(
                "p", S._bucket_id(specs, bounds, [dtype.split("(")[0] if "(" not in dtype else dtype for _ in range(1)])
            ).collect()
            got_fold = {r.k: r.p for r in fold if r.k is not None}
            got_fast = {r.k: r.p for r in fast if r.k is not None}
            assert got_fold == got_fast, (dtype, asc, got_fold, got_fast)
            # null placement: the searchsorted path encodes Spark's
            # exact null ordering (asc → first, desc → LAST bucket);
            # the fold path approximates desc nulls to bucket 0
            # (documented in _at_or_after — fold only runs for
            # exotic key types)
            null_fast = next(r.p for r in fast if r.k is None)
            null_fold = next(r.p for r in fold if r.k is None)
            assert null_fast == (0 if asc else len(bounds)), (dtype, asc, null_fast)
            assert null_fold == 0, (dtype, asc, null_fold)

    # beyond-width strings: the byte encoding truncates to 16 bytes,
    # which may merge adjacent buckets (documented, monotone-safe) —
    # global_rank output must STILL be the exact total order
    long_rows = [("z" * 40,), ("z" * 39 + "y",), ("z" * 20,), ("a",), ("z" * 39,)]
    df = spark.createDataFrame(long_rows, "k string")
    for asc in (True, False):
        ranked = S.global_rank(df, ("k", asc), rank_col="r", num_partitions=4).collect()
        got = [r.k for r in sorted(ranked, key=lambda r: r.r)]
        want = sorted([r[0] for r in long_rows], reverse=not asc)
        assert got == want, (asc, got)
        assert sorted(r.r for r in ranked) == [1, 2, 3, 4, 5]


def test_global_rank_nan_null_double_keys(spark):
    """ADVICE-r3 medium: a double sort key containing NaN and NULL
    must rank exactly like Spark's own orderBy — NaN above every
    other value, NULL first on asc / last on desc. (Arrow collapses
    NULL and NaN into NaN; the companion isnull column keeps them
    apart in the searchsorted encoder.)"""
    vals = [1.0, float("nan"), 2.0, None, -1.5, float("inf"), float("-inf"), 0.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, v double")
    for asc in (True, False):
        ranked = S.global_rank(df, ("v", asc), rank_col="r", num_partitions=4)
        got = {r.id: r.r for r in ranked.collect()}
        from pyspark.sql import Window

        want = {
            r.id: r.r
            for r in df.withColumn(
                "r",
                F.row_number().over(
                    Window.orderBy(F.col("v").asc() if asc else F.col("v").desc())
                ),
            ).collect()
        }
        assert got == want, (asc, got, want)
    # forced boundary case: a NaN-adjacent literal bound — NaN must
    # land in the last bucket (asc), not bucket 0
    specs = S._sort_specs(df, ["v"])
    pid = {
        r.id: r.p
        for r in df.withColumn(
            "p", S._bucket_id(specs, [(1.5,)], ["double"])
        ).collect()
    }
    nan_id, null_id, two_id = 1, 3, 2
    assert pid[nan_id] == 1 and pid[two_id] == 1 and pid[null_id] == 0, pid


def test_global_rank_negative_zero_tie(spark):
    """Spark normalizes -0.0 == 0.0 in sort order (SPARK-26021) but
    the raw IEEE bit patterns differ; un-normalized, a split point at
    0.0 puts the -0.0 half of the tie in an earlier bucket than its
    id tiebreak allows (measured: 10 of 22 ranks wrong). The encoder
    must collapse ±0.0 before encoding."""
    from pyspark.sql import Window

    vals = []
    for i in range(10):
        vals.append((2 * i, -0.0))
        vals.append((2 * i + 1, 0.0))
    vals += [(100, -5.0), (101, 5.0)]
    df = spark.createDataFrame(vals, "id int, v double")
    got = {
        r.id: r.r
        for r in S.global_rank(
            df, "v", "id", rank_col="r", num_partitions=4,
            split_points=[(-5.0, 100), (0.0, 9), (5.0, 101)],
        ).collect()
    }
    want = {
        r.id: r.r
        for r in df.withColumn(
            "r", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id")))
        ).collect()
    }
    assert got == want


def test_global_rank_many_partitions(spark):
    """The ADVICE-r2 scale concern: bucket assignment must stay sane at
    hundreds of range partitions (binary-search, not an O(P) CASE
    chain). P=256 over 50k rows: dense exact ranks."""
    df = spark.range(50_000).select(
        (F.col("id") * 2654435761 % 1000003).alias("v"), F.col("id")
    )
    r = S.global_rank(df, "v", "id", rank_col="r", num_partitions=256)
    stats = r.agg(
        F.count("*").alias("n"), F.min("r").alias("lo"), F.max("r").alias("hi"),
        F.countDistinct("r").alias("d"),
    ).collect()[0]
    assert (stats.n, stats.lo, stats.hi, stats.d) == (50_000, 1, 50_000, 50_000)


def test_split_points_degenerate_sample_fallback(spark):
    """When the spread head-sample comes back with fewer distinct keys
    than buckets (clustered or low-cardinality input), the seeded
    reservoir fallback pass runs; ranks must stay exact either way."""
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, id int"
    ).repartition(4)
    # low-cardinality sort key: the head sample has 3 distinct values
    # for 8 buckets → the reservoir pass runs (and can't do better, so
    # the original sample is kept); bounds stay valid either way
    specs_k = S._sort_specs(df, ["k"])
    bounds = S._split_points(df, specs_k, 8)
    assert bounds == sorted(set(bounds)) and len(bounds) <= 3
    r = S.global_rank(df, "k", "id", rank_col="r", num_partitions=8)
    stats = r.agg(
        F.count("*").alias("n"), F.countDistinct("r").alias("d"),
        F.min("r").alias("lo"), F.max("r").alias("hi"),
    ).collect()[0]
    assert (stats.n, stats.d, stats.lo, stats.hi) == (1000, 1000, 1, 1000)


def test_grouped_prefix_sum_matches_single_window(spark):
    """Two-phase grouped prefix sum (range buckets + broadcast
    offsets) must equal the plain keyed-window running sum, for both
    exclusive and inclusive frames, across many buckets."""
    import random

    rnd = random.Random(7)
    rows = [
        (f"g{rnd.randrange(4)}", i, rnd.randrange(-50, 100))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, seq long, v long")
    from pyspark.sql import Window

    for exclusive in (True, False):
        end = -1 if exclusive else 0
        w = Window.partitionBy("g").orderBy("seq").rowsBetween(
            Window.unboundedPreceding, end
        )
        want = {
            (r.g, r.seq): r.p
            for r in df.withColumn(
                "p", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        got = {
            (r.g, r.seq): r.prefix
            for r in S.grouped_prefix_sum(
                df, ["g"], ["seq"], "v", exclusive=exclusive, num_partitions=16
            ).collect()
        }
        assert got == want, exclusive


def test_grouped_prefix_sum_single_scan(spark):
    """The totals branch must reuse the window exchange: one scan."""
    import tempfile

    path = tempfile.mkdtemp(prefix="gps_") + "/t"
    spark.range(5000).selectExpr(
        "cast(id % 3 as string) g", "id seq", "id % 7 v"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    out = S.grouped_prefix_sum(df, ["g"], ["seq"], "v", num_partitions=8)
    out.collect()
    final = (
        out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final


def test_kmeans_fit_converges_and_is_deterministic(spark):
    from hadoop_main_spark.operators.similarity import kmeans_assign, kmeans_fit
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    a1, cents1 = kmeans_fit(e, 8, max_iter=10)
    a2, cents2 = kmeans_fit(e, 8, max_iter=10)
    # deterministic: same centroids and assignments across runs
    assert cents1 == cents2
    m1 = {r.vec_id: r.cluster for r in a1.select("vec_id", "cluster").collect()}
    m2 = {r.vec_id: r.cluster for r in a2.select("vec_id", "cluster").collect()}
    assert m1 == m2 and len(m1) == e.count()
    # all 8 clusters survive and every vector is assigned to one
    assert sorted({c for c, _ in cents1}) == sorted(set(m1.values()))
    assert len(cents1) == 8
    # refinement helps: inertia after fit <= inertia after one step
    def inertia(cents):
        return (
            kmeans_assign(e, cents)
            .agg(F.sum(F.col("__d2")))
            .collect()[0][0]
        )

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    assert inertia(cents1) <= inertia(seeds)


def test_global_rank_dates_outside_pandas_ns_range(spark):
    """Review-r4: dates before 1677 / after 2262 overflow pandas'
    ns-resolution path; coerced-to-NaT keys encoded as epoch 0 would
    bucket 1500-01-01 AFTER 1969-01-01 (non-monotone). The encoder
    now converts at us resolution."""
    import datetime as dt

    from pyspark.sql import Window

    days = [
        dt.date(1500, 6, 1), dt.date(1969, 6, 1), dt.date(2020, 1, 1),
        dt.date(2400, 12, 31), dt.date(1677, 9, 20), dt.date(2262, 4, 12),
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(days)], "id int, d date")
    for asc in (True, False):
        got = {
            r.id: r.r
            for r in S.global_rank(df, ("d", asc), rank_col="r", num_partitions=3).collect()
        }
        want = {
            r.id: r.r
            for r in df.withColumn(
                "r",
                F.row_number().over(
                    Window.orderBy(F.col("d").asc() if asc else F.col("d").desc())
                ),
            ).collect()
        }
        assert got == want, (asc, got, want)


def test_grouped_prefix_sum_null_group_kept(spark):
    """Review-r4: rows whose group key is NULL must not vanish — the
    offsets join is null-safe now (plain equi-join drops null==null)."""
    rows = [("a", 1, 10), ("a", 2, 20), (None, 1, 5), (None, 2, 7), ("b", 1, 3)]
    df = spark.createDataFrame(rows, "g string, seq int, v int")
    got = {
        (r.g, r.seq): r.prefix
        for r in S.grouped_prefix_sum(
            df, ["g"], ["seq"], "v", exclusive=True, num_partitions=4
        ).collect()
    }
    assert got == {
        ("a", 1): 0, ("a", 2): 10, (None, 1): 0, (None, 2): 5, ("b", 1): 0,
    }, got


def test_sort_spec_open_ended_and_literal_sep(spark):
    """Review-r4: bare -kN keys on field N through END OF LINE
    (KeyFieldBasedComparator pos2-omitted semantics), and sep is a
    literal ('|' must not become regex alternation)."""
    df = spark.createDataFrame(
        [("x\t10\tb",), ("x\t10\ta",), ("y\t2\tz",)], ["line"]
    )
    out = [r.line for r in S.sort_by_spec(df, "line", "-k2").collect()]
    # field-2-through-end string order: "10\ta" < "10\tb" < "2\tz"
    assert out == ["x\t10\ta", "x\t10\tb", "y\t2\tz"], out
    # numeric open-ended: leading number of the tail
    out_n = [r.line for r in S.sort_by_spec(df, "line", "-k2n").collect()]
    assert [l.split("\t")[1] for l in out_n] == ["2", "10", "10"], out_n
    dfp = spark.createDataFrame([("a|2",), ("b|10",)], ["line"])
    out_p = [r.line for r in S.sort_by_spec(dfp, "line", "-k2,2n", sep="|").collect()]
    assert out_p == ["a|2", "b|10"], out_p


def test_bucket_id_interval_dtype_routes_to_fold(spark):
    """Review-r4: 'interval day to second'.startswith('int') must NOT
    route interval keys to the byte encoder (which would raise) — the
    fold fallback handles them."""
    df = spark.range(6).select(
        "id", F.expr("make_dt_interval(0, 0, 0, id * 10)").alias("iv")
    )
    r = S.global_rank(df, "iv", rank_col="r", num_partitions=3)
    got = {x.id: x.r for x in r.collect()}
    assert got == {i: i + 1 for i in range(6)}, got


def test_sort_specs_rejects_non_default_null_ordering(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="null ordering"):
        S._sort_specs(df, [F.asc_nulls_last("k")])
    # defaults still introspect fine
    assert S._sort_specs(df, [F.desc("k")])[0][1] is False


def test_override_join_null_value_wins(spark):
    """Review-r4: OverrideRecordReader semantics — the rightmost
    source CONTAINING THE KEY wins even when its value is NULL (a raw
    value coalesce silently resurrected the earlier source)."""
    s1 = spark.createDataFrame([(1, "a"), (2, "x")], ["k", "v"])
    s2 = spark.createDataFrame([(1, None), (3, "c")], "k int, v string")
    out = {r.k: r.v for r in J.composite_join([s1, s2], "k", "override").collect()}
    assert out == {1: None, 2: "x", 3: "c"}, out


def test_tagged_join_cap_keeps_null_keys(spark):
    """Review-r4: enabling max_values_per_group must not change WHICH
    keys exist — the allowance join is null-safe now."""
    s1 = spark.createDataFrame([(None, 1), (7, 2)], "k int, val int")
    s2 = spark.createDataFrame([(None, 9), (7, 8)], "k int, val int")
    srcs = {"a": s1, "b": s2}
    key_fn = lambda t: tuple((x is None, x) for x in t)
    plain = sorted(
        (tuple(r) for r in J.tagged_join(srcs, "k", "val", how="outer").collect()),
        key=key_fn,
    )
    capped = sorted(
        (
            tuple(r)
            for r in J.tagged_join(
                srcs, "k", "val", how="outer", max_values_per_group=10
            ).collect()
        ),
        key=key_fn,
    )
    assert capped == plain and any(t[0] is None for t in capped), (plain, capped)


def test_asof_join_carries_whole_row_not_per_column(spark):
    """Review-r4: the carry must be the latest right ROW, preserving
    its internal NULLs — per-column last(ignorenulls) built rows
    mixing values from different right rows."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1, 0)
    left = spark.createDataFrame([(1, T0 + dt.timedelta(hours=3))], ["k", "ts"])
    right = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(hours=1), 10, 1),
            (1, T0 + dt.timedelta(hours=2), None, 2),
        ],
        "k int, ts timestamp, v1 int, v2 int",
    )
    row = J.asof_join(left, right, "k").collect()[0]
    # the t=2 row wins wholesale: v1 must be NULL (not 10 from t=1)
    assert (row.v1, row.v2) == (None, 2), row


def test_simhash_keeps_empty_docs_with_sentinel(spark):
    """Review-r4: zero-token docs get signature 0 and two empty docs
    pair at hamming 0 (a plain explode dropped them entirely)."""
    from hadoop_main_spark.operators.dedup import simhash, simhash_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, "alpha beta")],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert set(sigs) == {1, 2, 3, 4}
    assert sigs[2] == 0 and sigs[3] == 0
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(df, "doc_id", "text").collect()
    }
    assert pairs[(2, 3)] == 0 and pairs[(1, 4)] == 0


def test_embedding_quantize_null_component_no_collision(spark):
    """Review-r4: [1.0, NULL, 2.0] must not collide with [1.0, 2.0]
    (concat_ws skips nulls)."""
    from hadoop_main_spark.operators.dedup import embedding_quantize_dedup

    df = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, [1.0, 2.0]), (3, [1.0, 2.0])],
        "vid int, v array<double>",
    )
    out = {r.vid for r in embedding_quantize_dedup(df, "vid", "v", grid=0.5).collect()}
    assert out == {2, 3}, out


def test_ngram_containment_doc_inside_doc(spark):
    """A short doc fully contained in a long doc scores containment
    1.0 even though jaccard is far below any dedup threshold; the
    pair must still surface via the LSH candidate path (shared
    shingles -> high minhash agreement is NOT required — containment
    uses the same candidate generator, so we plant docs similar
    enough to band-collide)."""
    from hadoop_main_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    base = "one two three four five six seven eight nine ten"
    long_doc = base + " eleven"  # 9 shingles, 8 shared -> bands collide
    df = spark.createDataFrame(
        [(1, base), (2, long_doc), (3, "totally different words entirely here")],
        ["doc_id", "text"],
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(
            df, "doc_id", "text", min_containment=0.5
        ).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0, cont
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", min_jaccard=0.01).collect()
    }
    # same candidate pair, but the symmetric score is diluted
    assert jac[(1, 2)] < cont[(1, 2)]


def test_ngram_containment_rejects_nonpositive_threshold(spark):
    import pytest as _pytest

    from hadoop_main_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        ngram_containment_pairs(df, "doc_id", "text", min_containment=0.0)


def test_semantic_dedup_pairs_within_cluster_only(spark):
    """Two tight groups around opposite corners: near-dup pairs are
    found inside each cluster, no cross-cluster pair is ever scored,
    and the max_cluster guard drops oversized clusters entirely."""
    from hadoop_main_spark.operators.similarity import semantic_dedup_pairs

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 0.0, 0.0, 1.0]
    rows = [
        (0, a),
        (1, [0.999, 0.001, 0.0, 0.0]),
        (10, b),
        (11, [0.001, 0.0, 0.001, 0.999]),
        (12, [0.0, 0.9, 0.9, 0.0]),  # its own region, assigned to one seed
    ]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cents = [(0, a), (1, b)]
    out = semantic_dedup_pairs(df, cents, "vec_id", "v", min_cosine=0.99).collect()
    got = {(r.id_a, r.id_b): r.cluster for r in out}
    assert (0, 1) in got and got[(0, 1)] == 0
    assert (10, 11) in got and got[(10, 11)] == 1
    assert all(not (ia < 10 <= ib) for ia, ib in got), got
    # guard: cap below cluster size -> no pairs at all
    none = semantic_dedup_pairs(
        df, cents, "vec_id", "v", min_cosine=0.99, max_cluster=1
    ).collect()
    assert none == []


def test_gopher_flags_null_and_empty_text(spark):
    """NULL text == empty doc: every flag is a real boolean (never
    NULL), the combined gate fails, and a healthy 60-token doc with
    stopwords passes every rule."""
    from hadoop_main_spark.operators.textstats import gopher_flags_cols

    healthy = " ".join(
        ["the quick brown foxes jumped over the lazy dogs with"] * 6
    )
    bullets = "\n".join(["- item one", "- item two", "- item three"])
    df = spark.createDataFrame(
        [(1, healthy), (2, None), (3, ""), (4, bullets)],
        "doc_id int, text string",
    )
    flags = gopher_flags_cols("text")
    out = {r.doc_id: r.asDict() for r in df.select("doc_id", *[c.alias(n) for n, c in flags.items()]).collect()}
    for did in (1, 2, 3, 4):
        for k, v in out[did].items():
            assert v is not None, (did, k)
    assert out[1]["pass_gopher"] is True
    assert out[2]["pass_gopher"] is False and out[2]["n_tokens"] == 0
    assert out[3]["pass_gopher"] is False
    assert out[4]["ok_bullet_lines"] is False  # 100% bullet lines


def test_semantic_dedup_kernel_matches_fold_bitexact(spark):
    """The grouped Arrow kernel must reproduce the Catalyst fold
    form bit-for-bit (same pairs, same cosines to the last ulp) on a
    hash-generated corpus, including a zero vector (NULL cosine ->
    no pair) and a low threshold that emits many pairs."""
    from hadoop_main_spark.functions.hashing import hash64_py
    from hadoop_main_spark.operators.similarity import (
        _semantic_dedup_pairs_fold,
        semantic_dedup_pairs,
    )

    rows = []
    for i in range(120):
        vec = [
            (hash64_py(f"{i}-{d}", "sem") % 2000) / 1000.0 - 1.0 for d in range(8)
        ]
        rows.append((i, vec))
    rows.append((999, [0.0] * 8))  # zero-norm: NULL cosine, never a pair
    # NaN component: one poisoned vector must NOT pair with its whole
    # cluster — both forms exclude NaN cosines (degenerate policy)
    rows.append((500, [float("nan")] + [0.5] * 7))
    # duplicate id in one cluster: strict id_a < id_b, never (77,77)
    rows.append((77, [1.0] + [0.0] * 7))
    rows.append((77, [0.999] + [0.001] * 7))
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cents = [(c, [float(c == d) for d in range(8)]) for c in range(4)]
    def rowset(frame):
        # multiset compare (duplicate ids yield repeated (id_a, id_b)
        # keys with distinct cosines); values must match bit-for-bit
        return sorted(
            (r.id_a, r.id_b, r.cluster, r.cosine) for r in frame.collect()
        )

    kern = rowset(semantic_dedup_pairs(df, cents, "vec_id", "v", min_cosine=0.2))
    fold = rowset(_semantic_dedup_pairs_fold(df, cents, "vec_id", "v", min_cosine=0.2))
    assert kern == fold
    assert len(kern) > 50, len(kern)
    assert not any(r[0] == 999 or r[1] == 999 for r in kern)
    # the poisoned (NaN) vector pairs with NOTHING in either form
    assert not any(r[0] == 500 or r[1] == 500 for r in kern)
    assert not any(r[0] == 77 and r[1] == 77 for r in kern)  # no self-pairs


def test_fuzzy_key_pairs_exact_recall_vs_bruteforce(spark):
    """Symmetric-delete candidates must have EXACT recall at edit
    distance 1: every brute-force Levenshtein<=1 pair (substitution,
    insertion, deletion, identical) is found; NULL keys never match;
    a hot variant bucket above the cap emits no pairs from it."""
    import itertools

    from hadoop_main_spark.operators.dedup import fuzzy_key_pairs

    keys = [
        (1, "martin"),
        (2, "martln"),   # substitution
        (3, "marti"),    # deletion
        (4, "martini"),  # insertion
        (5, "marvin"),   # distance 2 from martln, 1 from martin
        (6, "zzzzzz"),   # far from everything
        (7, None),       # never matches
        (8, "martin"),   # exact dup -> distance 0
    ]
    df = spark.createDataFrame(keys, "id int, k string")
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_key_pairs(df, "id", "k", max_distance=1).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j): lev(a, b)
        for (i, a), (j, b) in itertools.combinations(
            [(i, s) for i, s in keys if s is not None], 2
        )
        if lev(a, b) <= 1
    }
    assert got == want, (got, want)
    assert (1, 8) in got and got[(1, 8)] == 0
    # empty keys: exactly ONE '' variant each (Spark sequence(1,0)
    # counts down — review-r4b would have tripled the '' bucket and
    # pruned it), so the 3-member '' bucket survives max_bucket=3
    empties = spark.createDataFrame([(1, ""), (2, ""), (3, "x")], "id int, k string")
    got_e = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_key_pairs(empties, "id", "k", max_bucket=3).collect()
    }
    assert got_e == {(1, 2): 0, (1, 3): 1, (2, 3): 1}, got_e
    # hot-bucket guard: cap of 1 suppresses every candidate
    none = fuzzy_key_pairs(df, "id", "k", max_bucket=1).collect()
    assert none == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fuzzy_key_pairs(df, "id", "k", max_distance=2)


def test_cross_doc_spans_planted_boilerplate(spark):
    """A 20-token license header shared by three docs surfaces as one
    span group with n_docs=3; a doc shorter than the window emits
    nothing; within-doc repetition counts occurrences but not docs."""
    from hadoop_main_spark.functions.hashing import hash64_py
    from hadoop_main_spark.operators.dedup import cross_doc_spans

    header = " ".join(f"lic{i}" for i in range(20))
    docs = [
        (1, header + " body one alpha"),
        (2, header + " body two beta"),
        (3, "prefix " + header),
        (4, "short doc"),
        (5, header + " " + header),  # within-doc repeat at aligned offsets
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.span_hash: r for r in cross_doc_spans(df, "doc_id", "text", window=20).collect()}
    hh = hash64_py(header)
    assert hh in out
    r = out[hh]
    # docs 1,2,3,5 all contain the exact header window
    assert r.n_docs == 4 and r.first_doc == 1
    assert r.n_occurrences >= 5  # doc 5 contributes two aligned occurrences
    assert all(r.n_docs >= 2 for r in out.values())


def test_descriptor_first_separator_semantics(spark):
    """Review-r4b: type:id splits at the FIRST ':' (ids may be URLs)
    and head/value at the FIRST tab (values may contain tabs) — the
    reference generateEntry contract."""
    from hadoop_main_spark.operators.aggregate import aggregate_descriptor_records

    recs = [
        ("LongValueSum:url:http://x\t5",),
        ("LongValueSum:url:http://x\t7",),
        ("UniqValueCount:k\ta\tb",),  # value 'a\tb' (contains a tab)
        ("UniqValueCount:k\ta\tc",),
        ("ValueCount:plain\t1",),
    ]
    df = spark.createDataFrame(recs, "record string")
    out = {(r.agg_type, r.id): r.result for r in aggregate_descriptor_records(df).collect()}
    assert out[("LongValueSum", "url:http://x")] == 12
    assert out[("UniqValueCount", "k")] == 2  # 'a\tb' != 'a\tc'
    assert out[("ValueCount", "plain")] == 1


def test_field_selection_regex_separator(spark):
    """Review-r4b: a regex-special separator ('|', '.') must be
    treated literally, and a short line must not crash the
    key-field partitioner under ANSI mode."""
    from hadoop_main_spark.operators.partitioning import key_field_partition

    df = spark.createDataFrame([("a|b|c|d",), ("x|y",)], ["line"])
    row = T.field_selection(df, "line", "0", "2-", sep="|").collect()[0]
    assert (row.key, row.value) == ("a", "c|d")
    # fields beyond the short line partition on NULL, never raise
    parts = key_field_partition(df, 4, "line", [1, 3], sep="|")
    assert parts.count() == 2


def test_grep_top_zero(spark):
    df = spark.createDataFrame([("aa bb aa",)], ["line"])
    assert T.grep(df, "line", "[a-z]+", k=0).count() == 0
    assert T.grep(df, "line", "[a-z]+").count() == 2


def test_lang_id_detects_unsegmented_chinese(spark):
    """Review-r4b: real Chinese text is ONE whitespace token, so the
    zh profile scores by character occurrence, not token equality."""
    from hadoop_main_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [(1, "我有他的书在这里了"), (2, "the cat sat on the mat"), (3, "???")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.g for r in df.select("doc_id", lang_id("text").alias("g")).collect()}
    assert got == {1: "zh", 2: "en", 3: "und"}, got


def test_lsh_pairs_across_matches_full_self_join(spark):
    """Incremental dedup consistency: for a corpus split into
    batch/corpus sides, lsh_pairs_across must find exactly the
    cross-side subset of the full self-join's pairs (same bands, same
    estimates) — the contract that lets ingest dedup incrementally
    without re-scanning the corpus."""
    from hadoop_main_spark.operators.dedup import (
        lsh_pairs_across,
        lsh_pairs_from_signatures,
        minhash_signature,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        "one two three four five six seven eight nine",
        "one two three four five six seven eight ten",    # near-dup of 2
        "completely different content with other words here",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sig = minhash_signature(df, "doc_id", "text")
    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in lsh_pairs_from_signatures(sig, "doc_id", min_est_jaccard=0.3).collect()
    }
    new_ids = {0, 2}
    got = {
        (r.id_new, r.id_corpus): r.est_jaccard
        for r in lsh_pairs_across(
            sig.filter(F.col("doc_id").isin(*new_ids)),
            sig.filter(~F.col("doc_id").isin(*new_ids)),
            "doc_id",
            min_est_jaccard=0.3,
        ).collect()
    }
    want = {
        (a, b) if a in new_ids else (b, a): est
        for (a, b), est in full.items()
        if (a in new_ids) != (b in new_ids)
    }
    assert got == want and len(got) >= 2, (got, want)


def test_asof_join_null_ts_and_key_never_match(spark):
    """Review-r4b: a right row with NULL ts or NULL key can never
    satisfy 'right_ts <= left_ts AND key = key' — it must not be
    carried forward; NULL-key left rows come out unmatched."""
    import datetime as dt

    from hadoop_main_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    left = spark.createDataFrame(
        [(1, t1), (None, t1)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, 99), (1, t0, 7), (None, t0, 42)],
        "k int, ts timestamp, v int",
    )
    out = {r.k: r.v for r in asof_join(left, right, "k").collect()}
    assert out == {1: 7, None: None}, out


def test_sort_spec_ragged_and_trailing_garbage(spark):
    """Review-r4b: a line with fewer fields than the spec references
    must sort with an EMPTY key (ANSI element_at crashed the job);
    bounded numeric keys parse the LEADING number like the open-ended
    form ('3abc' between -2 and 10, not null-first)."""
    df = spark.createDataFrame(
        [("x\t3abc",), ("x\t-2",), ("x\t10",), ("short",)], ["line"]
    )
    rows = [r.line for r in S.sort_by_spec(df, "line", "-k2,2n").collect()]
    # missing field parses as 0: -2 < 0(short) < 3abc < 10
    assert rows == ["x\t-2", "short", "x\t3abc", "x\t10"], rows
    import pytest as _p

    with _p.raises(ValueError, match="end field"):
        S.compile_sort_spec("-k3,2", "line")


def test_global_rank_struct_key(spark):
    """Review-r4b: struct sort keys route to the fold path, whose
    bound literals must build via F.struct (F.lit(Row) raises)."""
    rows = [((i % 5, f"s{i % 7}"), i) for i in range(40)]
    df = spark.createDataFrame(
        [(a, b, i) for ((a, b), i) in rows], "a int, b string, id int"
    ).select(F.struct("a", "b").alias("k"), "id")
    got = [
        (r.k.a, r.k.b, r.id)
        for r in S.global_rank(df, "k", "id", rank_col="rank").orderBy("rank").collect()
    ]
    want = sorted(((a, b, i) for ((a, b), i) in rows))
    assert got == want


def test_split_points_null_tiebreak_column(spark):
    """Review-r4b: an all-null SECONDARY key must not discard every
    sample (zero bounds -> one bucket -> the single-task funnel);
    with encodable dtypes only leading-null rows are dropped."""
    df = spark.createDataFrame(
        [(i, None) for i in range(5000)], "k1 bigint, k2 string"
    )
    specs = S._sort_specs(df, ["k1", "k2"])
    bounds = S._split_points(df, specs, 8)
    assert len(bounds) >= 4, bounds
    ranked = S.global_rank(df, "k1", "k2", rank_col="rank")
    n_buckets = ranked.select(F.spark_partition_id()).distinct().count()
    assert ranked.count() == 5000


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented triangle counting must equal the brute-force
    count on adversarial graphs: a hub star (no triangles), a clique
    (C(k,3)), duplicate/reversed/self-loop raw edges, plus a random
    graph."""
    import itertools
    import random

    from hadoop_main_spark.operators.graph import canonical_edges, triangle_count

    rng = random.Random(7)
    raw = []
    # hub star 0-(1..12)
    raw += [(0, i) for i in range(1, 13)]
    # clique on 20..25
    raw += list(itertools.combinations(range(20, 26), 2))
    # noise: duplicates, reversals, self-loops, random edges
    raw += [(i, 0) for i in range(1, 6)] + [(3, 3), (21, 21)]
    raw += [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    df = spark.createDataFrame(raw, "x int, y int")
    edges = canonical_edges(df, "x", "y")
    got = triangle_count(edges).collect()[0].n_triangles

    es = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for a, b in es
        for c in adj[a] & adj[b]
        if a < c and b < c
    )
    assert got == want and want >= 20  # the clique alone has C(6,3)=20


def test_pagerank_int_conservation_and_order(spark):
    """Integer PageRank sanity on a hand graph: every rank >= the
    base floor, total mass stays <= scale (floors only LOSE mass,
    deterministically), and the sink of a chain outranks its source."""
    from hadoop_main_spark.operators.graph import pagerank_int

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "c")], "src string, dst string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "v string")
    scale = 10**12
    r = {x.v: x.rank for x in pagerank_int(edges, nodes, iterations=2, scale=scale).collect()}
    base = (15 * scale // 100) // 4
    assert all(v >= base for v in r.values()), r
    assert sum(r.values()) <= scale
    assert r["c"] > r["a"] == r["d"]  # c collects from a, b, d; a and d are symmetric sources


def _ref_bpe_train(words_freq, k):
    """Independent pure-Python BPE reference (Sennrich-style dict
    trainer) — same determinism contract: ties break (count desc,
    left asc, right asc)."""
    vocab = {tuple(w): f for w, f in words_freq.items()}
    merges = []
    for _ in range(k):
        stats = {}
        for toks, f in vocab.items():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, c))
        new = {}
        for toks, f in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def test_bpe_train_matches_reference(spark):
    """The distributed trainer reproduces the reference merge list
    EXACTLY (pair counts, tie-breaks, greedy overlap handling) on a
    corpus with planted overlap runs ('aaaa'), ties, and repeats."""
    from collections import Counter

    from hadoop_main_spark.operators import bpe as B

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaaa aaa aa baa aab",
        "wider wide widest new low",
        "z zz zzz zzzz z z",
    ]
    docs = spark.createDataFrame([(i, t_) for i, t_ in enumerate(texts)], "doc_id long, text string")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    got = B.bpe_train(docs, 12)
    # every per-iteration frontier checkpoint must be released
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
    wf = Counter(w for t_ in texts for w in t_.split())
    want = _ref_bpe_train(wf, 12)
    assert got == want
    # and the learned merges are non-trivial (overlap run merged)
    assert any(l == r for l, r, _ in got)


def test_bpe_apply_kernel_equals_folds_and_greedy_overlap(spark):
    """The Arrow-batched encode kernel (bpe_apply) is token-identical
    to replaying apply_merge Catalyst folds, and overlap runs resolve
    greedily left-to-right ('aaaa'->[aa,aa], 'aaa'->[aa,a])."""
    from hadoop_main_spark.operators import bpe as B

    words = ["aaaa", "aaa", "banana", "bandana", "lowlow", "z", "", "aab"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    merges = [("a", "a", 0), ("a", "n", 0), ("an", "an", 0), ("l", "o", 0), ("lo", "w", 0)]
    kernel = {
        r.doc_id: r.tokens for r in B.bpe_apply(docs, merges).collect()
    }
    # fold path: chars -> iterated apply_merge
    from pyspark.sql import functions as F

    col = B.chars_col("text")
    for l, r, _ in merges:
        col = B.apply_merge(col, l, r)
    folds = {
        r.doc_id: r.toks
        for r in docs.select("doc_id", col.alias("toks")).collect()
    }
    assert kernel == folds
    assert kernel[0] == ["aa", "aa"]
    assert kernel[1] == ["aa", "a"]
    assert kernel[2] == ["b", "anan", "a"]
    assert kernel[6] == []


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF quality contract: probing ALL cells is EXACTLY brute force
    (same neighbors, same ranks — the approximation comes only from
    cell pruning), and at the production nprobe=2 setting recall@10
    stays high on the fixture embeddings."""
    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ncells = e.select("label").distinct().count()
    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.brute_force_topk(e, q, "vec_id", "embedding", "query_id", k=10).collect()
    }
    full = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_topk(
            e, q, "label", "vec_id", "embedding", "query_id", k=10, nprobe=ncells
        ).collect()
    }
    assert full == exact
    truth = {}
    for qid, nid, _ in exact:
        truth.setdefault(qid, set()).add(nid)

    def avg_recall(nprobe: int) -> float:
        probed = {}
        for r in SIM.ivf_topk(
            e, q, "label", "vec_id", "embedding", "query_id", k=10, nprobe=nprobe
        ).collect():
            probed.setdefault(r.query_id, set()).add(r.neighbor_id)
        rs = [
            len(probed.get(qid, set()) & nbrs) / len(nbrs)
            for qid, nbrs in truth.items()
        ]
        return sum(rs) / len(rs)

    # recall grows monotonically with probed cells and is non-trivial
    # even at nprobe=2 (the fixture's `label` cells are synthetic
    # classes, not kmeans-fit cells, so absolute recall is modest —
    # the operator contract is pruning-only approximation, pinned by
    # the full-probe exactness above)
    r2, r_half = avg_recall(2), avg_recall(max(ncells // 2, 3))
    assert r2 > 0.15, r2
    assert r_half >= r2, (r2, r_half)


def test_grouped_median_ties_duplicates_and_degenerate(spark):
    """grouped_median edge semantics: heavy ties (median value
    duplicated across the bin boundary region), single-element and
    all-equal groups, negative values, NULLs excluded — always the
    value at rank (n+1) DIV 2."""
    import random

    from hadoop_main_spark.operators.aggregate import grouped_median

    rnd = random.Random(7)
    rows = []
    # group a: heavy ties around the median
    rows += [("a", float(v)) for v in [1, 2, 2, 2, 2, 3, 9]]
    # group b: even count -> lower median
    rows += [("b", float(v)) for v in [10, 20, 30, 40]]
    # group c: all equal (degenerate single hot bin)
    rows += [("c", 5.0)] * 9
    # group d: single element, negative
    rows += [("d", -3.5)]
    # group e: nulls mixed in
    rows += [("e", None), ("e", 7.0), ("e", None), ("e", 1.0), ("e", 4.0)]
    # group f: random larger group, compare vs sorted picker
    fvals = [rnd.uniform(-100, 100) for _ in range(257)]
    rows += [("f", v) for v in fvals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r.median for r in grouped_median(df, ["g"], "v", buckets=16).collect()}
    want = {
        "a": 2.0,
        "b": 20.0,
        "c": 5.0,
        "d": -3.5,
        "e": 4.0,
        "f": sorted(fvals)[(257 + 1) // 2 - 1],
    }
    assert got == want


def test_bpe_apply_java_whitespace_parity(spark):
    """bpe_apply pretokenizes with JAVA \\s+ semantics, matching
    word_vocab/tokenize: U+00A0 (and other Unicode whitespace that
    Python str.split() treats as separators) is NOT a word boundary,
    so a word the trainer saw as one unit encodes as one unit
    (review-r5)."""
    from hadoop_main_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(0, "a\u00a0b x"), (1, "p\u2003q")], "doc_id long, text string"
    )
    got = {r.doc_id: r.tokens for r in B.bpe_apply(docs, []).collect()}
    assert got[0] == ["a", "\u00a0", "b", "x"]
    assert got[1] == ["p", "\u2003", "q"]


def test_iterative_query_checkpoints_superseded(spark, sf_dir):
    """Rebuilding a lazy-checkpointing query releases the previous
    build's pinned blocks: after N build+action cycles the session
    holds at most one live checkpoint RDD per tag, not N
    (review-r5)."""
    from hadoop_main_spark.plans.registry import REGISTRY

    def persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    for name, n_tags in (("pmi_topk", 1), ("pagerank_top20", 2)):
        before = persisted_ids()
        for _ in range(3):
            REGISTRY[name].build(spark, sf_dir).count()
        new = persisted_ids() - before
        assert len(new) <= n_tags, (name, sorted(new))


def test_prefix_jaccard_join_equals_bruteforce(spark):
    """The prefix-filter similarity join is EXACT: for random small
    corpora its output equals the brute-force all-pairs Jaccard join
    at the same threshold — no false negatives (the contract that
    separates it from the MinHash-LSH family) and no false
    positives."""
    import random

    from hadoop_main_spark.operators import dedup as D2

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(rng.randrange(2, 14))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:  # planted near-dup: mutate one token
            mut = list(base)
            if len(mut) > 4:
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            docs.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    for t_num, t_den in ((1, 2), (3, 5), (4, 5)):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in D2.prefix_jaccard_pairs(
                df, "doc_id", "text", n=3, t_num=t_num, t_den=t_den
            ).collect()
        }
        grams = df.select(
            "doc_id", F.explode(F.array_distinct(D2.word_shingles("text", 3))).alias("g")
        )
        sz = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
        inter = (
            grams.alias("a")
            .join(grams.alias("b"), "g")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            .agg(F.count("*").alias("i"))
        )
        want = {
            (r.id_a, r.id_b): r.jaccard
            for r in inter.join(
                sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa")), "id_a"
            )
            .join(sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
            .filter(
                F.lit(t_den + t_num) * F.col("i") >= F.lit(t_num) * (F.col("sa") + F.col("sb"))
            )
            .select(
                "id_a",
                "id_b",
                (F.col("i").cast("double") / (F.col("sa") + F.col("sb") - F.col("i")).cast("double")).alias("jaccard"),
            )
            .collect()
        }
        assert got == want, (t_num, t_den)
        assert len(want) > 0 or (t_num, t_den) == (4, 5)


def test_grouped_quantile_edges(spark):
    """grouped_quantile: q=1 is the max, q=1/n boundaries land on
    exact order statistics, ties and single-row groups behave, NULLs
    excluded — all validated against a brute-force sort."""
    from hadoop_main_spark.operators.aggregate import grouped_quantile

    rows = [("a", v) for v in [5.0, 1.0, 3.0, 3.0, 2.0]]  # ties
    rows += [("b", 7.0)]                                   # single row
    rows += [("c", v) for v in [10.0, 20.0]]               # two rows
    rows += [("d", None), ("d", 4.0)]                      # null excluded
    df = spark.createDataFrame(rows, "k string, v double")
    qs = [("p20", 1, 5), ("p50", 1, 2), ("p100", 1, 1)]
    got = {
        (r.k, r.q): r.value
        for r in grouped_quantile(df, ["k"], "v", qs, buckets=8).collect()
    }
    import math

    data = {"a": [1.0, 2.0, 3.0, 3.0, 5.0], "b": [7.0], "c": [10.0, 20.0], "d": [4.0]}
    want = {}
    for k, vs in data.items():
        for label, num, den in qs:
            want[(k, label)] = vs[math.ceil(num * len(vs) / den) - 1]
    assert got == want


def test_pq_encode_matches_bruteforce_and_self_distance(spark, sf_dir):
    """PQ: the Arrow encode kernel matches an independent pure-Python
    argmin over the same integer grid for every vector in a sample;
    seed queries (their subvectors ARE codebook entries) score
    pq_d2=0 against themselves and rank first."""
    import math

    from pyspark.sql import Window

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb, dsub = SIM.pq_codebook(e)
    m, k = cb.shape[0], cb.shape[1]
    got = {
        r.vec_id: list(r.codes)
        for r in SIM.pq_encode(e.filter(F.col("vec_id") < 40), cb).collect()
    }
    for r in e.filter(F.col("vec_id") < 40).collect():
        q = [math.floor(float(x) * SIM.PQ_QSCALE + 0.5) for x in r.embedding]
        want = []
        for mi in range(m):
            sub = q[mi * dsub : (mi + 1) * dsub]
            dists = [
                sum((sub[j] - int(cb[mi][c][j])) ** 2 for j in range(dsub))
                for c in range(k)
            ]
            want.append(dists.index(min(dists)))
        assert got[r.vec_id] == want, r.vec_id

    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    sc = SIM.pq_adc_scores(SIM.pq_encode(e, cb), qs, cb)
    w = Window.partitionBy("query_id").orderBy("pq_d2", "vec_id")
    top1 = {
        r.query_id: (r.vec_id, r.pq_d2)
        for r in sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    for qid in (0, 1, 2):
        assert top1[qid] == (qid, 0)


def test_line_dedup_rebuild_planted(spark):
    """A shared 8-token boilerplate line is kept only at its first
    global occurrence (min (doc_id, line_idx)); docs rebuild from
    their kept lines in order; empty/short docs survive with zeros."""
    from hadoop_main_spark.operators.dedup import line_dedup_rebuild

    boiler = " ".join(f"b{i}" for i in range(8))
    uniq1 = " ".join(f"u{i}" for i in range(8))
    uniq2 = " ".join(f"v{i}" for i in range(8))
    docs = [
        (1, boiler + " " + uniq1),          # first occurrence of boiler
        (2, boiler + " " + uniq2),          # later doc: boiler removed
        (3, uniq2 + " " + boiler),          # both lines are repeats
        (4, ""),                            # no lines at all
        (5, "tail bit"),                    # one short (partial) line
        (6, boiler + " " + boiler),         # within-doc repeat: keep first
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r for r in line_dedup_rebuild(df, "doc_id", "text").collect()}
    assert len(out) == 6
    assert (out[1].n_lines, out[1].kept_lines) == (2, 2)
    assert out[1].cleaned_text == boiler + " " + uniq1
    assert (out[2].n_lines, out[2].kept_lines) == (2, 1)
    assert out[2].cleaned_text == uniq2
    # doc 3's lines both appeared earlier (uniq2 in doc 2, boiler in doc 1)
    assert (out[3].n_lines, out[3].kept_lines) == (2, 0)
    assert out[3].cleaned_text == ""
    assert (out[4].n_lines, out[4].kept_lines) == (0, 0)
    assert out[4].cleaned_text == ""
    assert (out[5].n_lines, out[5].kept_lines) == (1, 1)
    assert out[5].cleaned_text == "tail bit"
    assert (out[6].n_lines, out[6].kept_lines) == (2, 0)

    with __import__("pytest").raises(ValueError):
        line_dedup_rebuild(df, "doc_id", "text", line_len=0)


def test_table_fingerprint_order_and_null_invariants(spark):
    """The fingerprint is invariant under row order and partitioning
    (addition commutes), changes when any row changes, and does NOT
    collide (a, NULL, b) with (a, b, NULL) — the concat_ws null-drop
    trap the canonical form exists to prevent."""
    from hadoop_main_spark.operators.aggregate import table_fingerprint

    rows = [(1, "a", "x"), (2, None, "y"), (3, "c", None)]
    df = spark.createDataFrame(rows, "k int, u string, v string")
    base = table_fingerprint(df, ["k", "u", "v"]).collect()[0]
    assert base.n_rows == 3
    # reorder + repartition: identical fingerprint
    shuf = spark.createDataFrame(list(reversed(rows)), "k int, u string, v string")
    again = table_fingerprint(shuf.repartition(7), ["k", "u", "v"]).collect()[0]
    assert (again.n_rows, again.fingerprint) == (3, base.fingerprint)
    # single-row mutation changes it
    mut = spark.createDataFrame(
        [(1, "a", "x"), (2, None, "y"), (3, "c", "!")], "k int, u string, v string"
    )
    assert table_fingerprint(mut, ["k", "u", "v"]).collect()[0].fingerprint != base.fingerprint
    # null-position sensitivity
    a = spark.createDataFrame([(1, None, "b")], "k int, u string, v string")
    b = spark.createDataFrame([(1, "b", None)], "k int, u string, v string")
    fa = table_fingerprint(a, ["u", "v"]).collect()[0].fingerprint
    fb = table_fingerprint(b, ["u", "v"]).collect()[0].fingerprint
    assert fa != fb


def test_keyed_snapshot_diff_statuses(spark):
    """added/removed/changed/unchanged classification, including a
    value that changes to/from NULL (hash canonicalization must not
    equate NULL with any real value)."""
    from hadoop_main_spark.operators.aggregate import keyed_snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")], "k int, v string"
    )
    got = {r.k: r.status for r in keyed_snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",  # NULL -> 'c' is a change
        4: "removed",
        5: "added",
    }


def test_merge_into_action_branches(spark):
    """All five MERGE branches: matched update, matched delete,
    not-matched insert, not-matched delete (no-op), target-only keep —
    plus a NULL value surviving an update and a delete marker that is
    NULL in the source (treated as false)."""
    from hadoop_main_spark.operators.aggregate import merge_into

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    source = spark.createDataFrame(
        [
            (2, "B", False),   # matched update
            (3, "dead", True), # matched delete
            (5, "e", False),   # not-matched insert
            (6, "x", True),    # not-matched delete -> no-op
            (7, None, None),   # NULL delete marker -> insert with NULL value
        ],
        "k int, v string, is_delete boolean",
    )
    got = {
        r.k: r.v
        for r in merge_into(
            target, source, ["k"], ["v"], delete_col="is_delete"
        ).collect()
    }
    assert got == {1: "a", 2: "B", 4: None, 5: "e", 7: None}


def test_merge_into_without_delete_col(spark):
    """Pure upsert form: no delete marker column at all."""
    from hadoop_main_spark.operators.aggregate import merge_into

    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    source = spark.createDataFrame([(2, 99), (3, 30)], "k int, v int")
    got = {r.k: r.v for r in merge_into(target, source, ["k"], ["v"]).collect()}
    assert got == {1: 10, 2: 99, 3: 30}


def test_winnow_fingerprints_vs_python_reference(spark):
    """Independent pure-Python winnowing (Schleimer et al. SIGMOD'03,
    Fig. 5 semantics: min of each w-window of k-gram hashes, RIGHTMOST
    minimum on ties, dedup of re-selected fingerprints) must match the
    packed-BIGINT window implementation exactly — including prefix
    windows (the robust short-doc variant), a crafted all-equal-hash
    tie run, and a doc shorter than k (emits nothing)."""
    from hadoop_main_spark.functions.hashing import hash64_py
    from hadoop_main_spark.operators.winnowing import (
        FP_MOD,
        winnow_fingerprints,
        winnow_pairs,
    )

    k, w = 3, 4
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a a a a a a a a"),  # every gram identical -> one fp, rightmost pos
        (3, "tiny doc"),  # < k tokens -> no grams
        (4, "the quick brown fox jumps over the wall"),  # shares a prefix with 1
        (5, "x y z"),  # exactly one gram -> one fingerprint at pos 0
    ]

    def ref(text):
        toks = [t_ for t_ in text.split() if t_]
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [hash64_py(g, "winnow") % FP_MOD for g in grams]
        sel = set()
        for end in range(len(hs)):
            lo = max(0, end - (w - 1))
            window = hs[lo : end + 1]
            m = min(window)
            pos = lo + max(i for i, h in enumerate(window) if h == m)
            sel.add((pos, hs[pos]))
        return sel

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    want = {(i, p, h) for i, tx in docs for p, h in ref(tx)}
    assert got == want
    assert not any(i == 3 for i, _, _ in got)  # sub-k doc emits nothing
    # all-equal tie run: rightmost-min selects every window end, but
    # they all carry the SAME fingerprint value
    assert len({h for i, _, h in got if i == 2}) == 1

    # guarantee: docs 1 and 4 share >= w + k - 1 = 6 leading tokens, so
    # they MUST share a selected fingerprint (the winnowing theorem)
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(
            df, "doc_id", "text", k=k, w=w, min_shared=1
        ).collect()
    }
    assert (1, 4) in pairs


def test_scd2_run_collapse_semantics(spark):
    """SCD2 versioning on a crafted event log: consecutive equal
    states collapse into one version row; an A->B->A flip produces
    THREE versions (type-2 keeps history, it never merges
    non-adjacent runs); validity intervals chain exactly and only the
    last run is current."""
    import datetime as dt

    from hadoop_main_spark.plans.registry import REGISTRY

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=m), 100 + m, et)
        for m, et in enumerate(["A", "A", "B", "B", "B", "A"])
    ] + [(2, base, 200, "X")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(d + "/events.parquet")
        out = (
            REGISTRY["scd2_user_state"]
            .build(spark, d)
            .orderBy("user_id", "version")
            .collect()
        )
    u1 = [r for r in out if r.user_id == 1]
    assert [(r.version, r.state, r.n_events) for r in u1] == [
        (1, "A", 2),
        (2, "B", 3),
        (3, "A", 1),
    ]
    # intervals chain: each valid_to equals the next valid_from
    assert u1[0].valid_to_us == u1[1].valid_from_us
    assert u1[1].valid_to_us == u1[2].valid_from_us
    assert [r.is_current for r in u1] == [False, False, True]
    (u2,) = [r for r in out if r.user_id == 2]
    assert (u2.version, u2.is_current, u2.valid_to_us) == (1, True, None)


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    """The A-ES max-of-w-hashes key must equal an independent
    pure-Python recompute (weights, keys, and the exact top-k set),
    pinning both the weight formula and the draw hashing."""
    from hadoop_main_spark.functions.hashing import hash64_py
    from hadoop_main_spark.plans.registry import REGISTRY

    got = REGISTRY["weighted_sample_topk"].build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()
    keys = []
    for r in docs:
        w = min((r.n_chars or 0) // 200 + 1, 32)
        k = max(hash64_py(f"{r.doc_id}:{d}", "wsample") for d in range(w))
        keys.append((k, r.doc_id, w))
    keys.sort(key=lambda x: (-x[0], x[1]))
    want = [(d, w, k) for k, d, w in keys[:20]]
    assert [(r.doc_id, r.weight, r.sample_key) for r in got] == want


def test_ivfpq_full_probe_equals_plain_adc(spark, sf_dir):
    """IVFADC quality contract (the ivf_topk recall test's PQ twin):
    probing ALL cells must reproduce the plain asymmetric-distance
    ranking over the whole corpus exactly — the cell pruning is the
    ONLY approximation ivfpq adds on top of PQ."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    ncells = e.select("label").distinct().count()
    cb, _ = SIM.pq_codebook(e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = SIM.ivfpq_topk(
        e, q, "label", cb, k=5, nprobe=ncells
    ).collect()

    enc = SIM.pq_encode(e.select("vec_id", "embedding"), cb)
    qs = [(int(r.query_id), [float(x) for x in r.embedding]) for r in q.collect()]
    sc = SIM.pq_adc_scores(enc, qs, cb).filter(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy("pq_d2", "vec_id")
    plain = (
        sc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    key = lambda rows: sorted((r.query_id, r[1], r.pq_d2, r.rank) for r in rows)
    assert key(full) == key(plain)


def test_gram_matrix_exact_pca_roundtrip(spark, sf_dir):
    """The distributed sufficient statistics must reconstruct the
    covariance matrix EXACTLY (integer grid) against a direct numpy
    recompute of the collected vectors, and the driver-side PCA built
    from them must match numpy's eigendecomposition of that direct
    covariance — the full aggregate-then-solve round trip."""
    import numpy as np

    from hadoop_main_spark.operators.similarity import PQ_QSCALE, gram_matrix_exact
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    stats = {(r.i, r.j): (r.sum_xy, r.sum_x, r.sum_y, r.n)
             for r in gram_matrix_exact(e, "embedding").collect()}
    x = np.array([[float(v) for v in r.embedding] for r in e.collect()])
    q = np.floor(x * PQ_QSCALE + 0.5).astype(np.int64)
    n, dim = q.shape
    g = q.T @ q
    s = q.sum(axis=0)
    for i in range(dim):
        for j in range(i, dim):
            assert stats[(i, j)] == (g[i, j], s[i], s[j], n), (i, j)
    # covariance from the stats == numpy covariance (exact rationals
    # evaluated in float the same way on both sides)
    cov_stats = np.empty((dim, dim))
    for (i, j), (sxy, sx, sy, nn) in stats.items():
        cov_stats[i, j] = cov_stats[j, i] = (sxy - sx * sy / nn) / nn
    cov_direct = (g - np.outer(s, s) / n) / n
    assert np.array_equal(cov_stats, cov_direct)
    w1, v1 = np.linalg.eigh(cov_stats)
    w2, v2 = np.linalg.eigh(cov_direct)
    assert np.array_equal(w1, w2) and np.array_equal(v1, v2)


def test_opq_rotation_properties(spark, sf_dir):
    """Parametric OPQ rotation (Ge et al. CVPR'13): R must be exactly
    orthogonal, deterministic across calls, subspace-variance balanced
    (eigenvalue allocation: every subspace's log-variance product
    within the spread of the single largest eigenvalue), and
    rotate_vectors must apply R @ x (norm-preserving) with the input
    schema mirrored."""
    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    m = 4
    R = SIM.opq_rotation(e, m=m)
    dim = R.shape[0]
    assert R.shape == (dim, dim)
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-10)
    assert np.array_equal(R, SIM.opq_rotation(e, m=m))
    # R is the PCA basis under an allocation PERMUTATION: the rotated
    # covariance is diagonal (off-diagonal energy vanishes) and its
    # diagonal is a permutation of the original eigenvalues — and the
    # top eigenvalue lands in subspace 0 (the greedy deals the largest
    # eigenvector first, to the first empty bucket)
    x = np.array([[float(v) for v in r.embedding] for r in e.collect()])
    # the operator's covariance lives on the integer micro-grid —
    # recompute it the same way before comparing spectra
    q = np.floor(x * SIM.PQ_QSCALE + 0.5)
    n = q.shape[0]
    cov = (q.T @ q - np.outer(q.sum(0), q.sum(0)) / n) / n / SIM.PQ_QSCALE**2
    cov_rot = R @ cov @ R.T
    d = np.diag(cov_rot).copy()
    off = cov_rot - np.diag(d)
    assert np.abs(off).max() <= 1e-9 * max(d.max(), 1.0)
    evals = np.linalg.eigvalsh(cov)
    assert np.allclose(np.sort(d), np.sort(evals), rtol=1e-8, atol=1e-10)
    dsub = dim // m
    assert np.argmax(d) < dsub
    # rotate_vectors == R @ x, norms preserved, schema mirrored
    rot = SIM.rotate_vectors(e, R)
    assert [f.name for f in rot.schema.fields] == ["vec_id", "embedding"]
    sample = {int(r.vec_id): np.array(r.embedding) for r in rot.limit(20).collect()}
    orig = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in e.filter(F.col("vec_id").isin(*sample)).collect()}
    for vid, y in sample.items():
        assert np.allclose(R @ orig[vid], y, atol=1e-3)
        assert abs(np.linalg.norm(orig[vid]) - np.linalg.norm(y)) < 1e-2


def test_ivfpq_residual_wins_on_clustered_corpus(spark):
    """True IVFADC's payoff case: a corpus of tight clusters around
    far-apart centers. Residual energy << vector energy, so trained
    residual codes quantize the within-cluster geometry finely while
    raw-vector codes waste their budget spanning the centers. The
    residual variant's within-probed-cell recall@10 must beat the
    raw-vector variant's; both codebooks trained (fair fight), both
    runs deterministic."""
    import math

    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM

    rng = np.random.default_rng(9)
    n_cells, per_cell, dim = 4, 100, 16
    centers = rng.uniform(-50, 50, (n_cells, dim))
    rows = []
    vid = 0
    for cell in range(n_cells):
        for _ in range(per_cell):
            v = centers[cell] + rng.normal(0, 0.6, dim)
            rows.append((vid, [float(x) for x in v], cell))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = corpus.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    cents = SIM.ivf_centroids(corpus, "label", "embedding")
    qcent = SIM._quantized_centroid_map(cents.collect(), SIM.PQ_QSCALE)
    res_vecs = SIM.residual_vectors(corpus, qcent, "label")
    cb_res, _ = SIM.pq_trained_codebook(
        res_vecs, 16, 4, "vec_id", "__res", pre_quantized=True, max_iter=2
    )
    cb_raw, _ = SIM.pq_trained_codebook(
        corpus, 16, 4, "vec_id", "embedding", max_iter=2
    )
    out_res = SIM.ivfpq_residual_topk(
        corpus, queries, "label", codebook=cb_res, nprobe=1
    ).collect()
    out_raw = SIM.ivfpq_topk(corpus, queries, "label", cb_raw, nprobe=1).collect()

    ids = np.array([r[0] for r in rows])
    labels = np.array([r[2] for r in rows])
    X = np.array(
        [[math.floor(x * 10000 + 0.5) for x in r[1]] for r in rows], dtype=np.int64
    )
    lbl_of = {int(i): int(l) for i, l in zip(ids, labels)}

    def within_recall(out):
        got = {}
        for r in out:
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        hits = tot = 0
        for qid, neigh in got.items():
            cells = {lbl_of[nb] for nb in neigh}
            mask = np.isin(labels, list(cells)) & (ids != qid)
            qv = X[ids == qid][0]
            d = ((X[mask] - qv) ** 2).sum(axis=1)
            sub = ids[mask]
            order = np.lexsort((sub, d))
            truth = set(int(sub[i]) for i in order[:10])
            hits += len(truth & neigh)
            tot += len(truth)
        return hits / tot

    r_res, r_raw = within_recall(out_res), within_recall(out_raw)
    assert r_res > r_raw, f"residual {r_res:.2f} <= raw {r_raw:.2f}"
    # determinism: retraining + re-running reproduces exactly
    cb_res2, _ = SIM.pq_trained_codebook(
        res_vecs, 16, 4, "vec_id", "__res", pre_quantized=True, max_iter=2
    )
    assert np.array_equal(cb_res, cb_res2)
    out_res2 = SIM.ivfpq_residual_topk(
        corpus, queries, "label", codebook=cb_res, nprobe=1
    ).collect()
    assert sorted(map(tuple, out_res)) == sorted(map(tuple, out_res2))


def test_sq8_quantizer_edges_and_recall(spark):
    """SQ8 scalar quantization: codes clamp to 0..255 with degenerate
    (constant) dims pinned to 0; min/max corpus points hit the grid
    ends; and quantized top-k keeps high recall vs exact float L2 on
    a random corpus (8 bits per dimension)."""
    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM

    rng = np.random.default_rng(13)
    X = rng.uniform(-3, 3, (400, 16))
    X[:, 5] = 1.25  # degenerate dim
    rows = [(i, [float(v) for v in X[i]]) for i in range(400)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = SIM.sq8_params(corpus)
    mins, maxs = params
    assert np.isclose(mins[5], 1.25) and np.isclose(maxs[5], 1.25)
    codes = SIM._sq8_quantize(X, mins, maxs)
    assert codes.min() == 0 and codes.max() == 255
    assert (codes[:, 5] == 0).all()
    # the min/max corpus points map to the grid ends per dim
    for d in (0, 7, 15):
        assert codes[X[:, d].argmin(), d] == 0
        assert codes[X[:, d].argmax(), d] == 255
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.sq8_topk(corpus, queries, k=10, params=params).collect()
    got = {}
    for r in out:
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    hits = tot = 0
    for q, neigh in got.items():
        d = ((X - X[q]) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")
        t10 = [int(i) for i in order if i != q][:10]
        hits += len(set(t10) & neigh)
        tot += 10
    assert hits / tot >= 0.8, f"sq8 recall {hits/tot:.2f}"


def test_max_shared_spans_recovers_maximal_spans(spark):
    """ExactSubstr semantics: a shared substring of L >= window tokens
    merges into ONE span of exactly L tokens at the true offsets; two
    disjoint shared regions stay two spans; sub-window overlap emits
    nothing; a hot window shared by > max_bucket docs is skew-capped."""
    from hadoop_main_spark.operators.dedup import max_shared_spans

    w = 5
    shared = [f"s{i}" for i in range(12)]        # 12-token shared run
    other = [f"o{i}" for i in range(7)]          # second 7-token shared run
    doc_a = ["a0", "a1"] + shared + ["a2"] + other + ["a3"]
    doc_b = ["b0"] + shared + ["b1", "b2", "b3"] + other
    doc_c = ["c0", "c1", "c2"] + shared[:4]      # only 4 shared tokens: < w
    docs = [
        (1, " ".join(doc_a)),
        (2, " ".join(doc_b)),
        (3, " ".join(doc_c)),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = max_shared_spans(df, "doc_id", "text", window=w).collect()
    spans = {(r.id_a, r.id_b, r.start_a, r.start_b, r.span_len) for r in out}
    # shared run: doc_a offset 2, doc_b offset 1, exactly 12 tokens
    assert (1, 2, 2, 1, 12) in spans
    # second run: doc_a offset 15 (2+12+1), doc_b offset 16 (1+12+3)
    assert (1, 2, 15, 16, 7) in spans
    # nothing else between 1-2, nothing involving doc 3
    assert len(spans) == 2

    # min_span raises the reporting floor without changing chaining
    out2 = max_shared_spans(df, "doc_id", "text", window=w, min_span=10).collect()
    assert {(r.start_a, r.span_len) for r in out2} == {(2, 12)}

    # skew cap: a window in > max_bucket docs is dropped entirely
    hot = " ".join(f"h{i}" for i in range(w))
    many = [(i, hot) for i in range(10)]
    dfh = spark.createDataFrame(many, "doc_id int, text string")
    assert max_shared_spans(dfh, "doc_id", "text", window=w, max_bucket=9).count() == 0
    # and below the cap the pairs all appear (10 docs -> 45 pairs)
    assert max_shared_spans(dfh, "doc_id", "text", window=w, max_bucket=10).count() == 45


def test_resolve_redirects_chains_loops_and_depth(spark):
    """Bounded-depth Location-chain resolution: terminal urls pass
    through with 0 hops, chains resolve with exact hop counts, a
    chain of exactly max_hops resolves, max_hops+1 does not, and
    loops of any length are unresolved."""
    from hadoop_main_spark.operators.crawl import resolve_redirects

    frontier = spark.createDataFrame(
        [("t",), ("a",), ("x1",), ("loop_a",), ("tri_a",)], "url string"
    )
    edges = [
        ("a", "t"),                       # 1 hop
        # 6-long chain x1 -> ... -> x6 -> t: 6 hops > max_hops=5
        ("x1", "x2"), ("x2", "x3"), ("x3", "x4"), ("x4", "x5"),
        ("x5", "x6"), ("x6", "t"),
        ("loop_a", "loop_b"), ("loop_b", "loop_a"),   # 2-cycle
        ("tri_a", "tri_b"), ("tri_b", "tri_c"), ("tri_c", "tri_a"),  # 3-cycle
    ]
    red = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirects(frontier, red, max_hops=5).collect()
    }
    assert got["t"] == ("t", 0, True)
    assert got["a"] == ("t", 1, True)
    assert got["x1"][2] is False and got["x1"][1] == 5
    assert got["loop_a"][2] is False
    assert got["tri_a"][2] is False
    # a 5-hop chain resolves exactly at the bound
    f2 = spark.createDataFrame([("x2",)], "url string")
    got2 = resolve_redirects(f2, red, max_hops=5).collect()[0]
    assert (got2.final_url, got2.n_hops, got2.resolved) == ("t", 5, True)


def test_exact_substr_removal_interval_merge(spark):
    """Removal semantics: the LATER doc loses each shared span; a
    doc's overlapping cut ranges union-merge (no double-count); a doc
    that is only ever the EARLIER side loses nothing."""
    from hadoop_main_spark.operators.dedup import exact_substr_removal

    w = 5
    shared = [f"s{i}" for i in range(9)]
    # doc 1 (earliest) holds the span; docs 2 and 3 copy it; doc 3's
    # copy also overlaps a second shared run with doc 2 -> doc 3's
    # cuts from the two pairs overlap and must merge
    doc1 = ["a"] + shared + ["b"]
    doc2 = shared + ["x1", "x2", "y0", "y1", "y2", "y3", "y4"]
    doc3 = ["z"] + shared + ["y0", "y1", "y2", "y3", "y4"]
    # wait: make doc3 share s-run with 1 AND 2, plus the y-run with 2;
    # the s-run cut [1,10) and y-run cut [10,15) are adjacent-overlap
    df = spark.createDataFrame(
        [(1, " ".join(doc1)), (2, " ".join(doc2)), (3, " ".join(doc3))],
        "doc_id int, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.n_removed, r.n_kept)
           for r in exact_substr_removal(df, "doc_id", "text", window=w).collect()}
    # doc 1 is always the earlier side: loses nothing
    assert out[1] == (11, 0, 11)
    # doc 2: loses the 9-token s-run (to doc 1); its y-run is EARLIER
    # than doc 3's so it keeps the ys
    assert out[2] == (16, 9, 7)
    # doc 3: loses the s-run (vs docs 1 and 2, same tokens once) AND
    # the y-run (vs doc 2) -> 9 + 5 removed, no double-count of the
    # s-run despite two pairs cutting it
    assert out[3] == (15, 14, 1)


def test_nndescent_descent_invariant_and_determinism(spark):
    """NN-Descent (similarity.nndescent_knn_graph): each iteration's
    candidate set CONTAINS the previous neighbor list, so every node's
    top-k distance sum is non-increasing iteration over iteration (the
    descent invariant); two runs are bit-identical; self-edges never
    appear; at most k neighbors per node."""
    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM

    rng = np.random.default_rng(23)
    centers = rng.uniform(-30, 30, (4, 16))
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(50):
            v = centers[c] + rng.normal(0, 1.0, 16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def sums(iters):
        g = SIM.nndescent_knn_graph(corpus, k=5, iterations=iters).collect()
        per = {}
        for r in g:
            assert r.id != r.nbr_id
            per.setdefault(int(r.id), []).append(int(r.d2))
        assert all(len(v) <= 5 for v in per.values())
        return {i: sum(v) for i, v in per.items()}, {
            (int(r.id), int(r.rank), int(r.nbr_id), int(r.d2)) for r in g
        }

    s1, g1 = sums(1)
    s2, g2 = sums(2)
    assert set(s2) == set(s1)
    assert all(s2[i] <= s1[i] for i in s1)
    assert sum(s2.values()) < sum(s1.values())  # it actually descends
    _, g2b = sums(2)
    assert g2 == g2b  # deterministic


def test_knn_graph_compact_retrim(spark):
    """knn_graph_compact: per-node top-k by (d2, nbr) with dense
    re-ranking, duplicate edges collapse, under-full nodes keep all."""
    from hadoop_main_spark.operators import similarity as SIM

    edges = spark.createDataFrame(
        [
            (1, 9, 10, 30), (1, 2, 20, 10), (1, 3, 21, 20), (1, 4, 99, 20),
            (1, 4, 99, 20),  # duplicate edge
            (2, 7, 1, 5),
        ],
        "id long, rank long, nbr_id long, d2 long",
    )
    got = sorted(
        (r.id, r.rank, r.nbr_id, r.d2)
        for r in SIM.knn_graph_compact(edges, k=3).collect()
    )
    assert got == [
        (1, 1, 20, 10), (1, 2, 21, 20), (1, 3, 99, 20),
        (2, 1, 1, 5),
    ]


def test_rotate_vectors_rejects_null_and_ragged(spark):
    """r9 ADVICE: rotate_vectors must mirror gram_matrix_exact's input
    validation — null embedding elements or a ragged dim must raise
    loudly instead of flowing NaN into every downstream PQ consumer."""
    import numpy as np
    import pytest

    from hadoop_main_spark.operators import similarity as SIM

    R = np.eye(4)
    with_null = spark.createDataFrame(
        [(1, [1.0, 2.0, None, 4.0]), (2, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="non-null"):
        SIM.rotate_vectors(with_null, R).collect()
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="fixed dim"):
        SIM.rotate_vectors(ragged, R).collect()
    # clean input still rotates
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    got = SIM.rotate_vectors(ok, R).collect()[0]
    assert list(got.embedding) == [1.0, 2.0, 3.0, 4.0]


def test_merge_into_raises_on_duplicate_source_keys(spark):
    """r9 ADVICE: the unique-source-keys precondition is now ENFORCED —
    duplicate source keys raise (Delta's 'multiple source rows matched'
    behavior) instead of silently fanning out target rows."""
    import pytest

    from hadoop_main_spark.operators.aggregate import merge_into

    target = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    dup_src = spark.createDataFrame(
        [(2, 99), (2, 77), (3, 30)], "k int, v int"
    )
    with pytest.raises(Exception, match="multiple source rows"):
        merge_into(target, dup_src, ["k"], ["v"]).collect()
    # unique keys still merge cleanly through the guarded path
    ok_src = spark.createDataFrame([(2, 99), (3, 30)], "k int, v int")
    got = {r.k: r.v for r in merge_into(target, ok_src, ["k"], ["v"]).collect()}
    assert got == {1: 10, 2: 99, 3: 30}


def test_opq_rotation_local_matches_distributed(spark, sf_dir):
    """The Spark-free oracle-side rotation (opq_rotation_local:
    pyarrow + numpy over the same parquet) must equal the distributed
    opq_rotation BITWISE — both derive identical exact-integer moments
    and share the eigen/allocation tail, so the oracle template for
    opq_pq_topk injects the very rotation the engine used."""
    import os

    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    R_dist = SIM.opq_rotation(e, m=4)
    R_local = SIM.opq_rotation_local(
        os.path.join(sf_dir, "embeddings.parquet"), m=4
    )
    assert np.array_equal(R_dist, R_local)
    # fixed-point snap is deterministic and int64
    Rq = SIM.quantize_rotation(R_dist)
    assert Rq.dtype == np.int64
    assert np.array_equal(Rq, SIM.quantize_rotation(R_local))


def test_pq_trained_codebook_all_matches_per_subspace(spark, sf_dir):
    """pq_trained_codebook_all (one Spark job per Lloyd iteration for
    ALL m subspaces) must produce the exact codebook of the
    per-subspace pq_trained_codebook/kmeans_fit loop — same seeds,
    same fold-order distances, same 1e-7-grid centroid arithmetic,
    same empty-cluster and tie rules."""
    import numpy as np

    from hadoop_main_spark.operators import similarity as SIM
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb_ref, dsub_ref = SIM.pq_trained_codebook(e, k=16, m=4, max_iter=3)
    cb_all, dsub_all = SIM.pq_trained_codebook_all(e, k=16, m=4, max_iter=3)
    assert dsub_ref == dsub_all
    assert np.array_equal(cb_ref, cb_all)


def test_rotate_vectors_exact_model_and_validation(spark):
    """rotate_vectors_exact == the integer model floor((Rq @ q + half)
    / 2^shift) with floor semantics on NEGATIVE sums too; null /
    ragged inputs raise like the float variant."""
    import numpy as np
    import pytest

    from hadoop_main_spark.operators import similarity as SIM

    rng_rows = [
        (1, [0.5, -0.25, 0.125, -1.0]),
        (2, [-0.33333, 0.99999, -0.00005, 0.00004]),
    ]
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")
    Rq = np.array(
        [[-(1 << 20), 3, 0, 7],
         [5, 1 << 19, -9, 2],
         [0, 0, 1 << 20, 0],
         [11, -13, 17, -(1 << 18)]],
        dtype=np.int64,
    )
    got = {
        int(r.vec_id): list(r.qvec)
        for r in SIM.rotate_vectors_exact(df, Rq).collect()
    }
    import math

    for vid, comps in rng_rows:
        q = np.array(
            [math.floor(float(np.float32(x)) * 10000 + 0.5) for x in comps],
            dtype=np.int64,
        )
        s = Rq @ q
        want = [int(v) for v in ((s + (1 << 19)) >> 20)]
        assert got[vid] == want, (vid, got[vid], want)
        # floor semantics: negative components must round toward -inf
        assert any(v < 0 for v in got[1])
    with pytest.raises(Exception, match="non-null"):
        SIM.rotate_vectors_exact(
            spark.createDataFrame(
                [(1, [1.0, None, 0.0, 0.0])], "vec_id long, embedding array<float>"
            ),
            Rq,
        ).collect()
    with pytest.raises(Exception, match="fixed dim"):
        SIM.rotate_vectors_exact(
            spark.createDataFrame(
                [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
            ),
            Rq,
        ).collect()


def test_edit_distance_join_no_false_negatives(spark):
    """The q-gram positional prefix filter must be COMPLETE below the
    skew cap: every pair within Levenshtein distance d must survive
    candidate generation (the oracle replays the same filter, so only
    a brute-force check proves completeness). Crafted corpus: exact
    copies, 1-char substitution/insert/delete at various positions,
    distance-3 pairs (excluded), and short strings."""
    import itertools

    from hadoop_main_spark.operators.dedup import edit_distance_join

    base = "the quick brown fox jumps over the lazy dog xy"
    docs = [
        (0, base),
        (1, base),                          # exact copy -> d=0
        (2, "The quick brown fox jumps over the lazy dog xy"),  # sub @0
        (3, "the quick brown fox jumps over the lazy cat xy"),  # sub @40ish
        (4, "athe quick brown fox jumps over the lazy dog x"),  # insert @0
        (5, "he quick brown fox jumps over the lazy dog xyz"),  # delete @0
        (6, "the QUICK brown fox jumps over the lazy dog xy"),  # d=5 (excl)
        (7, "completely different text that matches nothing"),
        (8, "abc"),
        (9, "abd"),                          # short, d=1
        (10, "the quick brown fox jumps oXer the lazy dZg xy"),  # d=2 mid
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in edit_distance_join(df, prefix_len=60, max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        d = lev(ta[:60], tb[:60])
        if d <= 2 and len(ta[:60]) >= 3 and len(tb[:60]) >= 3:
            want[(ia, ib)] = d
    assert got == want, (got, want)
    assert (0, 1) in got and got[(0, 1)] == 0
    assert got[(8, 9)] == 1 and got[(0, 10)] == 2
    assert (0, 6) not in got


def test_hamming_band_pairs_vs_bruteforce(spark):
    """The banded pigeonhole candidate filter must be COMPLETE for
    hamming < bands and the bucket cap must drop ONLY hot buckets:
    brute-force verification on crafted 64-bit hashes spanning exact
    dups, each band's boundary, just-over-threshold pairs, and the
    63-bit sign-safe range."""
    import itertools

    import pytest

    from hadoop_main_spark.operators.dedup import hamming_band_pairs

    base = 0x123456789ABCDEF
    rows = [
        (0, base),
        (1, base),                      # hamming 0
        (2, base ^ 0b11),               # hamming 2 (band 0)
        (3, base ^ (1 << 8) ^ (1 << 16) ^ (1 << 24)),  # 3, three bands
        (4, base ^ ((1 << 6) - 1)),     # hamming 6 (band 0 heavy)
        (5, base ^ 0x7F),               # hamming 7 -> excluded at max 6
        (6, 0),
        (7, (1 << 63) - 1),             # all 63 low bits set
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_band_pairs(df, "id", "h", max_hamming=6).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 6:
            want[(ia, ib)] = d
    assert got == want, (got, want)
    assert got[(0, 1)] == 0 and (0, 5) not in got
    # guards
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_band_pairs(df, "id", "h", max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divisible"):
        hamming_band_pairs(df, "id", "h", bands=7)
    # bucket cap: 5 identical hashes with max_bucket=4 -> every band
    # bucket is hot -> no pairs from that cluster, others unaffected
    many = spark.createDataFrame(
        [(i, 42) for i in range(5)] + [(10, base), (11, base)],
        "id long, h long",
    )
    capped = {
        (r.id_a, r.id_b)
        for r in hamming_band_pairs(
            many, "id", "h", max_hamming=6, max_bucket=4
        ).collect()
    }
    assert capped == {(10, 11)}


def test_connected_components_incremental_equals_fresh(spark):
    """Incremental CC (prior components collapsed to stars + new
    edges) must equal from-scratch CC over the union, across the merge
    scenarios that matter: a new edge MERGING two prior components, a
    brand-new id joining an old cluster, a wholly new pair, untouched
    old clusters, and prior singletons staying resolvable."""
    from hadoop_main_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)],
        "id_a long, id_b long",
    )
    labels0 = connected_components(old_pairs)
    # add a prior SINGLETON (id 99, its own component) to the label set
    labels0 = labels0.unionByName(
        spark.createDataFrame([(99, 99)], "id long, component long")
    )
    new_pairs = spark.createDataFrame(
        [(3, 10),      # merges {1,2,3} with {10,11}
         (11, 50),     # brand-new id joins the merged cluster
         (60, 61),     # wholly new pair
         (99, 20)],    # prior singleton joins {20,21}
        "id_a long, id_b long",
    )
    inc = {
        (r.id, r.component)
        for r in connected_components_incremental(labels0, new_pairs).collect()
    }
    fresh = connected_components(old_pairs.unionByName(new_pairs))
    want = {(r.id, r.component) for r in fresh.collect()}
    want.add((99, 20))  # singleton resolved into {20,21}'s component
    # untouched cluster {30,31} must survive verbatim
    assert (30, 30) in inc and (31, 30) in inc
    assert inc == want, (sorted(inc), sorted(want))


def test_merge_partial_aggs_wave_split_invariance(spark):
    """Folding ANY wave split through merge_partial_aggs must equal
    the one-shot aggregate verbatim (the mergeable-summary algebra) —
    including keys present in only one wave."""
    from hadoop_main_spark.operators.aggregate import merge_partial_aggs

    rows = [
        (1, "a", 10, 100),
        (1, "a", 11, 50),
        (1, "b", 12, 7),
        (2, "a", 13, -3),
        (3, "c", 14, 0),
        (3, "c", 15, 9),
        (4, "d", 16, 42),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, c long"
    )

    def view(part):
        from pyspark.sql import functions as F

        return part.groupBy("user_id", "event_type").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        )

    want = {tuple(r) for r in view(df).collect()}
    from pyspark.sql import functions as F

    # three uneven waves: mod-3 split (wave 2 misses several keys)
    acc = None
    for k in range(3):
        wave = view(df.filter(F.pmod("event_id", F.lit(3)) == k))
        acc = (
            wave
            if acc is None
            else merge_partial_aggs(
                acc, wave, ("user_id", "event_type"),
                add_cols=("n", "s"), min_cols=("lo",), max_cols=("hi",),
            )
        )
    got = {tuple(r) for r in acc.collect()}
    assert got == want, (sorted(got), sorted(want))
