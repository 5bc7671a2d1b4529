"""Round-11 ADVICE regression tests.

One test per ADVICE.md item: (1) pdf dictionary-region anchoring +
indirect /Length rejection, (2) __spark_entry__.oracle_sql per-query
isolation, (3) revisit_warc_media duplicate-snapshot guard,
(4) graph_insert_edges chunking stays linear (covered by the existing
chunking-invariance pytest re-running over the checkpointed path),
(5) autocorr_user_value loud overflow guard.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _mini_pdf(objbody: bytes) -> bytes:
    """4-object classic-xref PDF whose 4th object is ``objbody`` (the
    adversarial slot) — same shape as test_warc_html's fixture."""
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    bodies = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        objbody,
    ]
    for num, body in enumerate(bodies, 1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    x = len(out)
    out += b"xref\n0 %d\n" % (len(offs) + 1) + b"0000000000 65535 f \n"
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
        len(offs) + 1, x,
    )
    return bytes(out)


def test_pdf_stream_payload_cannot_spoof_dict_keys():
    """/Type and /Length inside the RAW STREAM PAYLOAD must not count
    as dictionary keys: a crawl payload containing '/Type /Page' must
    not inflate n_pages, and a payload '/Length 3' must not re-frame
    the stream (the dictionary's own /Length governs)."""
    from hadoop_main_spark.sources.pdf import parse_pdf

    evil = b"BT (x) Tj ET /Type /Page /Type /Page /Length 3"
    r = parse_pdf(
        _mini_pdf(b"<< /Length %d >>\nstream\n" % len(evil)
                  + evil + b"\nendstream")
    )
    assert r["n_pages"] == 1          # only the real page object
    assert r["text"] == "x"           # stream framed by the dict length
    assert r["n_streams"] == 1


def test_pdf_indirect_length_raises():
    """'/Length 8 0 R' is an indirect reference; silently reading it
    as literal 8 mis-frames the stream — it must raise."""
    from hadoop_main_spark.sources.pdf import parse_pdf

    with pytest.raises(ValueError, match="indirect /Length"):
        parse_pdf(
            _mini_pdf(b"<< /Length 8 0 R >>\nstream\nBT (x) Tj ET\nendstream")
        )


def test_oracle_sql_isolates_failing_resolver(monkeypatch):
    """One failing callable-oracle resolver must cost only ITS entry
    (rows-only fallback), never the whole oracle map."""
    import __spark_entry__ as entry_mod

    real = entry_mod.resolve_oracle
    victim = sorted(entry_mod.REGISTRY)[0]

    def boom(spec, sf_dir):
        if spec.name == victim:
            raise RuntimeError("synthetic resolver failure")
        return real(spec, sf_dir)

    monkeypatch.setattr(entry_mod, "resolve_oracle", boom)
    oracles = entry_mod.oracle_sql()
    assert victim not in oracles
    # everything else survived — the map is still essentially complete
    assert len(oracles) >= len(entry_mod.REGISTRY) - 1


def test_revisit_warc_media_rejects_duplicate_snapshot(spark):
    """A prior_digests snapshot with two rows for one uri must fail
    loudly (merge_into discipline), not fan out duplicate WARCs."""
    import hashlib

    from hadoop_main_spark.sources.warc import revisit_warc_media

    crawl = spark.createDataFrame(
        [(1, "http://a/", bytearray(b"body-a"))],
        "media_id long, uri string, payload binary",
    )
    d = hashlib.md5(b"body-a").hexdigest()
    dup = spark.createDataFrame(
        [("http://a/", d), ("http://a/", "0" * 32)],
        "uri string, digest string",
    )
    with pytest.raises(Exception, match="multiple rows for uri"):
        revisit_warc_media(crawl, dup).collect()
    # unique snapshot still works and dedups to a revisit record
    ok = spark.createDataFrame([("http://a/", d)], "uri string, digest string")
    out = revisit_warc_media(crawl, ok).collect()
    assert len(out) == 1 and b"revisit" in bytes(out[0]["payload"])


def test_autocorr_overflow_guard_raises(spark, tmp_path):
    """Past the int64 moment bound the Spark build must RAISE (the
    DuckDB oracle's HUGEINT->BIGINT cast failure mode), never wrap."""
    from hadoop_main_spark.plans.registry import REGISTRY

    import datetime as dt

    sf = str(tmp_path)
    # 1e9 cents, 2 pairs: every moment still FITS int64 (n^2*mx^2 =
    # 4e18 < max), but the guard's 2x-headroom bound (2*n^2*mx^2 =
    # 8e18 > 4e18) trips — exactly the regime where a non-ANSI engine
    # would wrap the final n*sxy - sx*sy difference silently
    big = 1.0e7
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 7, "click", big, "{}")
        for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    q = REGISTRY["autocorr_user_value"].build(spark, sf)
    with pytest.raises(Exception, match="overflow risk"):
        q.collect()


def test_autocorr_small_values_unaffected(spark, sf_dir):
    """The guard must be invisible on in-bound data (the registry
    fixture scale)."""
    from hadoop_main_spark.plans.registry import REGISTRY

    rows = REGISTRY["autocorr_user_value"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["n_pairs"] >= 2 for r in rows)
