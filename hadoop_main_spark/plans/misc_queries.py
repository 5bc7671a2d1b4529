"""Pipe / multimodal / generator / rollup queries.

These exercise the non-pure-SQL surfaces (subprocess pipe,
Arrow-batched mapInPandas, synthetic generators); where the result
is still SQL-reproducible the oracle is provided, otherwise the
driver records a rows-only check (generator queries).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_main_spark.operators import multimodal as MM
from hadoop_main_spark.operators import pipe as PIPE
from hadoop_main_spark.plans.registry import query, t


def _codec_ids(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id spine for the media-generator queries, repartitioned to
    the session's default parallelism BEFORE the Python codec kernels:
    the sf0.1 fixture is ONE parquet file, so without this every
    encode/decode pass ran as a single task on one core (caught by the
    r7 10x scale gate — gif_frame_features grew only 1.1x on 10x data
    because it was parallelism-starved, not fast). Shuffling the
    8-byte ids is ~free next to the codec work, and decoupling kernel
    parallelism from input file layout is the same move you'd make at
    100 TB (payloads are generated downstream; only ids cross the
    exchange)."""
    return (
        t(spark, sf, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )


@query(
    "pipe_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="Hadoop-Streaming-style subprocess pipe (ST/PipeMapper.java:38): "
    "documents piped through `tr A-Z a-z` (one subprocess per task, "
    "stdin/stdout line protocol), then WordCount on the piped output — "
    "oracle reproduces the subprocess's effect with lower().",
)
def pipe_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    # newline normalization BEFORE the line-framed pipe: a text
    # containing '\n' would split into multiple physical lines and
    # the continuation tokens would silently vanish (no tab -> empty
    # value); as whitespace, '\n' and ' ' tokenize identically, so
    # the oracle is unaffected (review-r4b)
    d = t(spark, sf, "documents").select(
        "doc_id", F.regexp_replace("text", "[\r\n]", " ").alias("text")
    )
    piped = PIPE.pipe(d, "tr 'A-Z' 'a-z'")
    from hadoop_main_spark.operators.transforms import tokenize

    return (
        piped.select(F.explode(tokenize("value")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    doc="Multimodal payload plumbing: binary payload column + typed "
    "metadata, feature extraction via Arrow-batched mapInPandas (stub "
    "decoder); byte-length and digest verified against the oracle.",
)
def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    media = MM.media_table_from_documents(t(spark, sf, "documents"))
    feats = MM.extract_features(media, decoder="stub")
    return feats.select("media_id", "n_bytes", "digest")


@query(
    "png_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 12 + 4 AS h FROM documents),
    b AS (SELECT doc_id, h, unnest(generate_series(0, 3)) AS band FROM p),
    r AS (SELECT doc_id, band, h,
            (band * h) // 4 AS lo,
            greatest(((band + 1) * h) // 4, (band * h) // 4 + 1) AS hi
          FROM b),
    rows_ AS (SELECT doc_id, band,
                unnest(generate_series(least(lo, h - 1), least(hi, h) - 1)) AS rr
              FROM r)
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST((doc_id * 31 + rr) % 256 AS DOUBLE)) / 255.0 AS gray_mean
    FROM rows_
    GROUP BY doc_id, band
    """,
    doc="REAL PNG decode on the data path: per-doc gray PNGs are "
    "encoded with MIXED scanline filters (types 0-4 cycling, so the "
    "decode exercises every defilter path incl. Paeth), then "
    "extract_features(decoder='png') inflates + defilters each payload "
    "in an Arrow-batched pass and emits per-band gray means. Pixel "
    "rows are (doc_id*31 + r) % 256, so the oracle recomputes the "
    "band means in closed form — the decode itself is what is being "
    "verified.",
)
def png_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                h, w = i % 12 + 4, i % 16 + 4
                col = ((i * 31 + np.arange(h)) % 256).astype(np.uint8)
                payloads.append(
                    MM._png_encode(np.repeat(col[:, None], w, axis=1), row_filter="mixed")
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="png", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "gray_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "gray_mean")


@query(
    "jpeg_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 3 + 1 AS wb FROM documents),
    b AS (SELECT doc_id, wb, unnest(generate_series(0, 3)) AS band FROM p),
    c AS (SELECT doc_id, band, unnest(generate_series(0, wb - 1)) AS cc FROM b)
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST((doc_id * 37 + band * 11 + cc * 53) % 256 AS DOUBLE)) / 255.0
             AS gray_mean
    FROM c GROUP BY doc_id, band
    """,
    doc="REAL baseline-JPEG decode on the data path (ITU-T T.81: "
    "Huffman entropy decode, dequantize, exact 8x8 IDCT): per-doc gray "
    "JPEGs built from CONSTANT 8x8 blocks at quality 100 (all "
    "quantizers 1, so the DCT round-trip is pixel-exact — DC-only "
    "blocks), 4 block-rows x (doc_id%3+1) block-cols, block value "
    "(doc_id*37 + row*11 + col*53) % 256. extract_features("
    "decoder='jpeg') entropy-decodes each payload Arrow-batched and "
    "emits per-band gray means; with dim=4 each band is exactly one "
    "block-row, so the oracle recomputes the means in closed form — "
    "the full marker-walk + Huffman + IDCT path is what is verified.",
)
def jpeg_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                wb = i % 3 + 1
                arr = np.zeros((32, 8 * wb), dtype=np.uint8)
                for r in range(4):
                    for c in range(wb):
                        arr[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                            i * 37 + r * 11 + c * 53
                        ) % 256
                payloads.append(MM._jpeg_encode(arr, quality=100))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="jpeg", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "gray_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "gray_mean")


@query(
    "rollup_agg",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="Grouping-set rollup — absent in the reference (SURVEY §2.6), "
    "free Catalyst capability.",
)
def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )


from hadoop_main_spark.sources.teragen_exact import duckdb_oracle_sql as _tg_oracle


@query(
    "terasort_100k",
    # the oracle REGENERATES the bit-exact gensort LCG stream in pure
    # SQL (limb arithmetic over embedded skip-ahead tables) — see
    # sources/teragen_exact.duckdb_oracle_sql
    oracle=_tg_oracle(100_000),
    doc="TeraGen→TeraSort, bit-exact (EX/terasort/Random16.java:20, "
    "GenSort.java:39, TeraGen.java:218, TeraSort.java:49): 100k "
    "gensort 100-byte records from the 128-bit LCG, global "
    "total-order sort with a scalable rank. key_hex+filler_hex are "
    "the full 128-bit rand per row, so the oracle checks the entire "
    "stream; CRC record checksums (TeraChecksum analog) are pinned "
    "in tests.",
    bench=True,
)
def terasort_100k(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.sorting import global_rank
    from hadoop_main_spark.sources.teragen_exact import teragen_exact

    g = teragen_exact(spark, 100_000)
    # analytic split points: keys are uniform 80-bit values, so the
    # even hex-space split is exact — no sampling pass needed
    n = spark.sparkContext.defaultParallelism
    bounds = [("%020X" % (j * (1 << 80) // n), 0) for j in range(1, n)]
    ranked = global_rank(g, "key_hex", "rowid", rank_col="rank", split_points=bounds)
    return ranked.select("rowid", "key_hex", "filler_hex", "rank")


@query(
    "frame_sample",
    oracle="""
    SELECT media_id, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
    FROM (
      SELECT doc_id AS media_id, doc_id % 240 + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2)
    """,
    doc="Multimodal frame sampling: video rows expand to every-10th "
    "frame index (the 1->N decode-and-sample shape; a real decoder "
    "attaches frame bytes inside mapInPandas with the same plan "
    "shape). Frame counts derived deterministically from the media "
    "id; videos are the doc_id % 3 == 2 slice of the media table.",
)
def frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    videos = d.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 240 + 1).alias("n_frames"),
    )
    return videos.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))).alias("frame_idx"),
    )


@query(
    "y4m_frame_features",
    oracle="""
    WITH p AS (SELECT doc_id, (doc_id % 4 + 2) * 2 AS w,
                      (doc_id % 3 + 2) * 2 AS h, doc_id % 6 + 4 AS nf
               FROM documents),
    f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1, 2)) AS frame_idx
          FROM p),
    yc AS (SELECT doc_id, frame_idx, w, h, r.r, c.c FROM f,
           unnest(generate_series(0, h - 1)) AS r(r),
           unnest(generate_series(0, w - 1)) AS c(c)),
    ym AS (SELECT doc_id, frame_idx,
                  AVG(CAST((doc_id*7 + frame_idx*31 + r*5 + c*3) % 256 AS DOUBLE))
                    AS y_mean
           FROM yc GROUP BY doc_id, frame_idx),
    cc AS (SELECT doc_id, frame_idx, r.r, c.c FROM f,
           unnest(generate_series(0, h // 2 - 1)) AS r(r),
           unnest(generate_series(0, w // 2 - 1)) AS c(c)),
    cm AS (SELECT doc_id, frame_idx,
                  AVG(CAST((doc_id*11 + frame_idx*17 + r*3 + c*5) % 256 AS DOUBLE))
                    AS cb_mean,
                  AVG(CAST((doc_id*13 + frame_idx*19 + r*7 + c*2) % 256 AS DOUBLE))
                    AS cr_mean
           FROM cc GROUP BY doc_id, frame_idx)
    SELECT f.doc_id AS media_id, f.frame_idx,
           CAST(f.w AS BIGINT) AS width, CAST(f.h AS BIGINT) AS height,
           ym.y_mean, cm.cb_mean, cm.cr_mean
    FROM f
    JOIN ym ON ym.doc_id = f.doc_id AND ym.frame_idx = f.frame_idx
    JOIN cm ON cm.doc_id = f.doc_id AND cm.frame_idx = f.frame_idx
    """,
    doc="REAL video-container decode on the data path (verdict-r5 "
    "next#4 — closes the last sandbox-reachable stubbed modality): "
    "per-doc YUV4MPEG2 streams (C420jpeg, doc_id%6+4 frames of "
    "(doc_id%3+2)*2 x (doc_id%4+2)*2 with closed-form Y/Cb/Cr plane "
    "formulas) are container-encoded with _y4m_encode, then "
    "frame_sample REALLY parses each stream (header tags, FRAME "
    "delimiters, planar 4:2:0 layout) Arrow-batched and keeps every "
    "2nd frame with per-plane means. The oracle recomputes the means "
    "in closed form from the pixel formulas, so the full container "
    "parse + plane slicing + subsampled-chroma geometry is what is "
    "verified. Plane sums are bounded integers in double (exact), so "
    "the match is bit-exact. Only ~60-byte frame summaries ever "
    "shuffle — frames never leave the Arrow batch.",
)
def y4m_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h, nf = (i % 4 + 2) * 2, (i % 3 + 2) * 2, i % 6 + 4
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                r2 = np.arange(h // 2)[:, None]
                c2 = np.arange(w // 2)[None, :]
                frames = []
                for fi in range(nf):
                    frames.append(
                        (
                            ((i * 7 + fi * 31 + r * 5 + c * 3) % 256).astype(np.uint8),
                            ((i * 11 + fi * 17 + r2 * 3 + c2 * 5) % 256).astype(np.uint8),
                            ((i * 13 + fi * 19 + r2 * 7 + c2 * 2) % 256).astype(np.uint8),
                        )
                    )
                payloads.append(MM._y4m_encode(frames, colorspace="C420jpeg"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.frame_sample(media, every_n=2).select(
        "media_id", "frame_idx", "width", "height", "y_mean", "cb_mean", "cr_mean"
    )


@query(
    "avi_mjpeg_frame_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 5 + 3 AS nf FROM documents),
    f AS (SELECT doc_id, unnest(generate_series(0, nf - 1, 2)) AS frame_idx
          FROM p),
    blk AS (SELECT doc_id, frame_idx, r.r, c.c FROM f,
            unnest(generate_series(0, 1)) AS r(r),
            unnest(generate_series(0, 1)) AS c(c))
    SELECT doc_id AS media_id, frame_idx,
           CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS ch,
           AVG(CAST((doc_id*29 + frame_idx*41 + r*13 + c*7) % 256 AS DOUBLE))
             AS px_mean
    FROM blk GROUP BY doc_id, frame_idx
    """,
    doc="REAL compressed-frame video container on the data path: "
    "per-doc MJPEG AVIs (RIFF hdrl/movi/idx1 per the public AVI "
    "spec; doc_id%5+3 frames, each a 16x16 gray baseline JPEG of "
    "CONSTANT 8x8 blocks at quality 100 — all quantizers 1, so the "
    "DCT round-trip is pixel-exact) are assembled with "
    "_avi_mjpeg_encode, then avi_frame_sample walks the RIFF chunks "
    "and ENTROPY-DECODES every 2nd frame with the pure-Python T.81 "
    "decoder, Arrow-batched. Block (r,c) of frame f is "
    "(doc_id*29 + f*41 + r*13 + c*7) % 256, so the oracle recomputes "
    "each sampled frame's pixel mean in closed form — the container "
    "walk + per-frame JPEG decode is what is verified. Only ~50-byte "
    "frame summaries shuffle.",
)
def avi_mjpeg_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                nf = i % 5 + 3
                frames = []
                for fi in range(nf):
                    arr = np.zeros((16, 16), dtype=np.uint8)
                    for r in range(2):
                        for c in range(2):
                            arr[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                                i * 29 + fi * 41 + r * 13 + c * 7
                            ) % 256
                    frames.append(MM._jpeg_encode(arr, quality=100))
                payloads.append(MM._avi_mjpeg_encode(frames, 16, 16))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.avi_frame_sample(media, every_n=2).select(
        "media_id", "frame_idx", "width", "height", "ch", "px_mean"
    )


@query(
    "gif_frame_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 4 + 4 AS w, doc_id % 5 + 3 AS h,
                      doc_id % 4 + 2 AS nf
               FROM documents),
    f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1, 2)) AS frame_idx
          FROM p),
    px AS (SELECT doc_id, frame_idx, w, h, r.r, c.c FROM f,
           unnest(generate_series(0, h - 1)) AS r(r),
           unnest(generate_series(0, w - 1)) AS c(c))
    SELECT doc_id AS media_id, frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           AVG(CAST((doc_id*5 + frame_idx*23 + r*11 + c*3) % 256 AS DOUBLE))
             AS r_mean
    FROM px GROUP BY doc_id, frame_idx, w, h
    """,
    doc="REAL animated-GIF decode on the data path (GIF89a: LZW "
    "variable-width entropy decode, sub-block reassembly, palette "
    "mapping, frame compositing; odd docs additionally round-trip the "
    "4-pass row INTERLACE): per-doc animations on a gray-ramp palette "
    "(doc_id%4+2 full-canvas frames, pixel (r,c) of frame f = "
    "(doc_id*5 + f*23 + r*11 + c*3) % 256) are encoded with "
    "_gif_encode, then gif_frame_sample decodes + composites each "
    "stream Arrow-batched and keeps every 2nd frame. With the gray "
    "palette the red channel equals the palette index, so the oracle "
    "recomputes each sampled frame's mean in closed form — the full "
    "LZW + compositing pipeline is what is verified. Only ~60-byte "
    "frame summaries shuffle.",
    bench=True,  # r7 rotation: tracks the multimodal decode path's perf
)
def gif_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h, nf = i % 4 + 4, i % 5 + 3, i % 4 + 2
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                frames = [
                    ((i * 5 + fi * 23 + r * 11 + c * 3) % 256).astype(np.uint8)
                    for fi in range(nf)
                ]
                payloads.append(MM._gif_encode(frames, pal, interlace=bool(i % 2)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.gif_frame_sample(media, every_n=2).select(
        "media_id", "frame_idx", "width", "height", "r_mean"
    )


@query(
    "bmp_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 6 + 3 AS w, doc_id % 4 + 4 AS h,
                      doc_id % 2 AS pal8
               FROM documents),
    b AS (SELECT doc_id, w, h, pal8, unnest(generate_series(0, 3)) AS band
          FROM p),
    r AS (SELECT doc_id, w, pal8, band,
                 (band * h) // 4 AS lo,
                 greatest(((band + 1) * h) // 4, (band * h) // 4 + 1) AS hi,
                 h
          FROM b),
    cells AS (SELECT doc_id, w, pal8, band,
                     unnest(generate_series(least(lo, h - 1),
                                            least(hi, h) - 1)) AS rr
              FROM r),
    px AS (SELECT doc_id, pal8, band, rr, c.c, w FROM cells,
           unnest(generate_series(0, w - 1)) AS c(c))
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST((doc_id * 19 + rr * 5 + c * 3) % 256 AS DOUBLE)) / 255.0
             AS gray_mean
    FROM px GROUP BY doc_id, band
    """,
    doc="REAL BMP decode on the data path (Windows BITMAPINFOHEADER: "
    "bottom-up BGR rows with 4-byte stride padding for even docs, "
    "8-bit palette + BGRX color quads for odd docs — both depths "
    "exercise non-multiple-of-4 widths): per-doc gray images with "
    "pixel (r,c) = (doc_id*19 + r*5 + c*3) % 256 are encoded with "
    "_bmp_encode, then extract_features(decoder='bmp') decodes each "
    "payload Arrow-batched and emits 4 horizontal-band gray means. "
    "Gray pixels make 24-bit BGR and gray-palette decodes identical, "
    "so ONE closed-form oracle verifies both container layouts. "
    "Integer sums in double are exact — bit-exact match.",
)
def bmp_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        gray_pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = i % 6 + 3, i % 4 + 4
                v = (
                    (i * 19 + np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3)
                    % 256
                ).astype(np.uint8)
                if i % 2:  # 8-bit palette layout
                    payloads.append(MM._bmp_encode(v, palette=gray_pal))
                else:  # 24-bit BGR layout
                    payloads.append(MM._bmp_encode(np.repeat(v[:, :, None], 3, 2)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="bmp", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "gray_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "gray_mean")


@query(
    "flac_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 60 + 50 AS n FROM documents),
    b AS (SELECT doc_id, n, unnest(generate_series(0, 3)) AS band FROM p),
    r AS (SELECT doc_id, band, n,
            (band * n) // 4 AS lo,
            greatest(((band + 1) * n) // 4, (band * n) // 4 + 1) AS hi
          FROM b),
    s AS (SELECT doc_id, band,
            unnest(generate_series(least(lo, n - 1), least(hi, n) - 1)) AS j
          FROM r)
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST(abs((doc_id * 17 + j * 11) % 3001 - 1500) AS DOUBLE)) / 32768.0
             AS amp_mean
    FROM s GROUP BY doc_id, band
    """,
    doc="REAL FLAC decode on the data path (operators/flac.py: Rice "
    "entropy decode, fixed-predictor reconstruction, frame CRC-8/16 "
    "and STREAMINFO-MD5 verification): per-doc mono 16-bit streams "
    "(doc_id%60+50 samples, sample j = (doc_id*17 + j*11) % 3001 - "
    "1500) are FLAC-encoded with encode_flac (small blocks so every "
    "doc spans multiple frames), then extract_features("
    "decoder='flac') entropy-decodes each payload Arrow-batched and "
    "emits per-time-window mean absolute amplitudes — the compressed "
    "twin of wav_decode_features, same closed-form oracle contract. "
    "Sums are bounded integers in double (exact) — bit-exact match.",
)
def flac_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        from hadoop_main_spark.operators.flac import encode_flac

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n = i % 60 + 50
                s = ((i * 17 + np.arange(n) * 11) % 3001 - 1500).astype(np.int16)
                payloads.append(encode_flac(s, 8000, block_size=32))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="flac", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "amp_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "amp_mean")


@query(
    "tiff_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 5 + 4 AS w, doc_id % 7 + 5 AS h
               FROM documents),
    b AS (SELECT doc_id, w, h, unnest(generate_series(0, 3)) AS band FROM p),
    r AS (SELECT doc_id, w, band,
                 (band * h) // 4 AS lo,
                 greatest(((band + 1) * h) // 4, (band * h) // 4 + 1) AS hi,
                 h
          FROM b),
    cells AS (SELECT doc_id, w, band,
                     unnest(generate_series(least(lo, h - 1),
                                            least(hi, h) - 1)) AS rr
              FROM r),
    px AS (SELECT doc_id, band, rr, c.c FROM cells,
           unnest(generate_series(0, w - 1)) AS c(c))
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST((doc_id * 23 + rr * 7 + c * 5) % 256 AS DOUBLE)) / 255.0
             AS gray_mean
    FROM px GROUP BY doc_id, band
    """,
    doc="REAL TIFF decode on the data path (TIFF 6.0: byte-order "
    "header, IFD tag walk with inline-vs-offset values, multi-strip "
    "pixel assembly): per-doc TIFFs alternate BYTE ORDER (odd docs "
    "MM big-endian, even II) and sample layout (doc_id % 3 == 0 "
    "writes RGB with gray triples, else 8-bit grayscale), all "
    "multi-strip (rows_per_strip=3). Pixel (r,c) = "
    "(doc_id*23 + r*7 + c*5) % 256; extract_features(decoder='tiff') "
    "decodes Arrow-batched and emits 4 band gray means, matched "
    "bit-exactly by the closed-form oracle — so the endian handling, "
    "SHORT inline-value placement, and strip reassembly are what is "
    "verified.",
)
def tiff_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = i % 5 + 4, i % 7 + 5
                v = (
                    (i * 23 + np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 5)
                    % 256
                ).astype(np.uint8)
                arr = np.repeat(v[:, :, None], 3, 2) if i % 3 == 0 else v
                payloads.append(
                    MM._tiff_encode(arr, big_endian=bool(i % 2), rows_per_strip=3)
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="tiff", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "gray_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "gray_mean")


@query(
    "cross_format_pixel_dedup",
    oracle="""
    SELECT MIN(doc_id) AS first_media,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(COUNT(DISTINCT doc_id % 4) AS BIGINT) AS n_formats
    FROM documents GROUP BY doc_id % 25
    """,
    doc="CROSS-FORMAT duplicate image detection — the multimodal "
    "dedup problem byte-digests cannot touch: the SAME pixel content "
    "(class = doc_id % 25, constant 8x8 gray blocks so the q100 JPEG "
    "round-trip is pixel-exact) is stored per doc as PNG, baseline "
    "JPEG, animated-GIF first frame, or BMP (format = doc_id % 4; "
    "25 = 1 mod 4, so every class spans ALL FOUR container formats). "
    "Each payload REALLY decodes through its own codec, normalizes "
    "to canonical (h,w,3) RGB (decode_to_rgb), and groups by decoded-"
    "pixel digest: true duplicate classes reassemble across formats "
    "— re-encoded training images collapse to one representative. "
    "Only (id, digest) shuffles; the oracle knows the planted class "
    "structure in closed form (n_formats == 4 certifies every group "
    "really crossed formats).",
)
def cross_format_pixel_dedup(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen_and_digest(batches):
        import numpy as np

        gray_pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for b in batches:
            ids = b["doc_id"].astype("int64")
            digs = []
            for i in ids:
                i = int(i)
                g, fmt = i % 25, ("png", "jpeg", "gif", "bmp")[i % 4]
                arr = np.zeros((16, 16), dtype=np.uint8)
                for br in range(2):
                    for bc in range(2):
                        arr[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8] = (
                            g * 31 + br * 9 + bc * 5
                        ) % 256
                if fmt == "png":
                    payload = MM._png_encode(arr, row_filter="mixed")
                elif fmt == "jpeg":
                    payload = MM._jpeg_encode(arr, quality=100)
                elif fmt == "gif":
                    payload = MM._gif_encode([arr], gray_pal)
                else:
                    payload = MM._bmp_encode(np.repeat(arr[:, :, None], 3, 2))
                px = MM.decode_to_rgb(fmt, payload)
                digs.append(
                    hashlib.md5(
                        px.shape[0].to_bytes(4, "big")
                        + px.shape[1].to_bytes(4, "big")
                        + px.tobytes()
                    ).hexdigest()
                )
            yield pd.DataFrame({"doc_id": ids, "pixel_digest": digs})

    digests = docs.mapInPandas(gen_and_digest, "doc_id long, pixel_digest string")
    return digests.groupBy("pixel_digest").agg(
        F.min("doc_id").alias("first_media"),
        F.count("*").cast("bigint").alias("n_media"),
        F.countDistinct(F.col("doc_id") % 4).cast("bigint").alias("n_formats"),
    ).select("first_media", "n_media", "n_formats")


# ($1 "") forces STRING comparison: a first key of "0" compares
# numerically equal to the uninitialized k ("" coerces to 0) and the
# group transition would never fire for it.
_AWK_SUM = (
    "awk -F'\\t' '"
    "($1 \"\") != (k \"\") { if (NR > 1) print k \"\\t\" s; k = $1; s = 0 } "
    "{ s += $2 } "
    "END { if (NR > 0) print k \"\\t\" s }'"
)


@query(
    "pipe_reduce_sum",
    oracle="""
    SELECT user_id,
           -- COALESCE: the awk reducer sums an all-NULL group's empty
           -- strings to 0, SQL SUM would yield NULL (review-r4b)
           CAST(COALESCE(SUM(CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents
    FROM events GROUP BY user_id
    """,
    doc="Hadoop-Streaming subprocess REDUCER (ST/PipeMapRed.java:1 "
    "semantics): rows are co-located per key and sorted — the contract "
    "a streaming reducer script expects on stdin — then piped through "
    "an awk running-sum reducer that emits one line per key group. "
    "Values are integer cents (explicit floor — portable across "
    "engines), so the subprocess arithmetic is oracle-exact.",
)
def pipe_reduce_sum(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    out = PIPE.pipe_reduce(e, _AWK_SUM, group_key="user_id")
    return out.select(
        F.col("key").cast("bigint").alias("user_id"),
        F.col("value").cast("bigint").alias("total_cents"),
    )


@query(
    "media_pixel_dedup",
    oracle="""
    SELECT MIN(doc_id) AS first_media, COUNT(*) AS n_media
    FROM documents GROUP BY doc_id % 50
    """,
    doc="DECODED-pixel exact dedup for media: per-doc PNGs whose "
    "pixel content depends only on doc_id % 50 are encoded with "
    "DIFFERENT scanline-filter strategies per doc (byte-level the "
    "payloads differ; a payload-digest dedup finds nothing), then the "
    "REAL PNG decode recovers the pixel buffer and grouping by its "
    "digest finds the true duplicate classes. This is the multimodal "
    "twin of exact text dedup: only the (id, pixel-digest) pair "
    "shuffles — decoded frames never leave the Arrow batch. The "
    "oracle knows the planted class structure in closed form.",
)
def media_pixel_dedup(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen_and_digest(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            digs = []
            for i in ids:
                g = int(i) % 50
                h, w = g % 12 + 4, g % 16 + 4
                col = ((g * 31 + np.arange(h)) % 256).astype(np.uint8)
                arr = np.repeat(col[:, None], w, axis=1)
                # encode with a doc-dependent filter strategy, then
                # REALLY decode: equal pixels, different payload bytes
                payload = MM._png_encode(
                    arr, row_filter="mixed" if int(i) % 2 else "none"
                )
                pix = MM._png_decode(payload)
                digs.append(
                    hashlib.md5(
                        pix.shape[0].to_bytes(4, "big")
                        + pix.shape[1].to_bytes(4, "big")
                        + pix.tobytes()
                    ).hexdigest()
                )
            yield pd.DataFrame({"doc_id": ids, "pixel_digest": digs})

    digests = docs.mapInPandas(gen_and_digest, "doc_id long, pixel_digest string")
    return digests.groupBy("pixel_digest").agg(
        F.min("doc_id").alias("first_media"), F.count("*").alias("n_media")
    ).select("first_media", "n_media")


@query(
    "wav_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 50 + 40 AS n FROM documents),
    b AS (SELECT doc_id, n, unnest(generate_series(0, 3)) AS band FROM p),
    r AS (SELECT doc_id, band, n,
            (band * n) // 4 AS lo,
            greatest(((band + 1) * n) // 4, (band * n) // 4 + 1) AS hi
          FROM b),
    s AS (SELECT doc_id, band,
            unnest(generate_series(least(lo, n - 1), least(hi, n) - 1)) AS j
          FROM r)
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST(abs((doc_id * 13 + j * 7) % 4001 - 2000) AS DOUBLE)) / 32768.0
             AS amp_mean
    FROM s GROUP BY doc_id, band
    """,
    doc="REAL RIFF/PCM16 audio decode on the data path: per-doc mono "
    "WAVs (8 kHz, doc_id%50+40 frames, sample j = "
    "(doc_id*13 + j*7) % 4001 - 2000) are container-encoded with "
    "_wav_encode, then extract_features(decoder='wav') chunk-walks and "
    "decodes each payload Arrow-batched and emits per-time-window mean "
    "absolute amplitudes — the audio analog of the PNG/JPEG band "
    "means. The oracle recomputes the window means in closed form from "
    "the sample formula, so the full RIFF parse + PCM16 decode is what "
    "is verified. Sums are bounded integers in double (exact), so the "
    "match is bit-exact.",
)
def wav_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n = i % 50 + 40
                s = ((i * 13 + np.arange(n) * 7) % 4001 - 2000).astype("<i2")
                payloads.append(MM._wav_encode(8000, s[:, None]))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="wav", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "amp_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "amp_mean")


@query(
    "wav_g711_decode_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 50 + 40 AS n FROM documents),
    m AS (SELECT doc_id, n, unnest([0, 1]) AS law FROM p),
    b AS (SELECT doc_id, n, law, unnest(generate_series(0, 3)) AS band FROM m),
    r AS (SELECT doc_id, n, law, band,
            (band * n) // 4 AS lo,
            greatest(((band + 1) * n) // 4, (band * n) // 4 + 1) AS hi
          FROM b),
    s AS (SELECT doc_id, law, band,
            unnest(generate_series(least(lo, n - 1), least(hi, n) - 1)) AS j
          FROM r),
    c AS (SELECT doc_id, law, band, (doc_id * 11 + j * 5) % 256 AS code FROM s),
    mu AS (SELECT doc_id, law, band, 255 - code AS u FROM c WHERE law = 0),
    mudec AS (SELECT doc_id, law, band,
                CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS samp
              FROM (SELECT doc_id, law, band, u,
                      ((u % 16) * 8 + 132) * (CAST(1 AS BIGINT) << ((u // 16) % 8)) AS t
                    FROM mu)),
    al AS (SELECT doc_id, law, band, xor(code, 85) AS a FROM c WHERE law = 1),
    aldec AS (SELECT doc_id, law, band,
                CASE WHEN a >= 128 THEN t ELSE -t END AS samp
              FROM (SELECT doc_id, law, band, a,
                      CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                           WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
                           ELSE ((a % 16) * 16 + 264)
                                * (CAST(1 AS BIGINT) << ((a // 16) % 8 - 1))
                      END AS t
                    FROM al)),
    d AS (SELECT * FROM mudec UNION ALL SELECT * FROM aldec)
    SELECT doc_id * 2 + law AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST(abs(samp) AS DOUBLE)) / 32768.0 AS amp_mean
    FROM d GROUP BY doc_id, law, band
    """,
    doc="REAL G.711 telephony-audio decode on the data path (ITU-T "
    "G.711 mu-law AND A-law, RIFF format tags 7/6 per RFC 2361 — the "
    "codec every callcenter/voicemail corpus arrives in): per doc, "
    "code byte j = (doc_id*11 + j*5) % 256 sweeps all 256 codes "
    "across the corpus; both laws' WAVs are container-encoded "
    "(_wav_encode_g711), chunk-walked and EXPANDED to 16-bit linear "
    "inside the Arrow batch (vectorized complement/segment/mantissa "
    "bit math — operators/multimodal.py:_g711_mulaw_decode/"
    "_g711_alaw_decode), then per-time-window mean absolute "
    "amplitudes. The oracle re-derives the companding expansion in "
    "pure SQL from the code formula, so the G.711 bit math itself is "
    "what is verified, bit-exactly, for every code value. media_id = "
    "doc_id*2 + law (0 = mu-law, 1 = A-law).",
)
def wav_g711_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            out_ids, payloads = [], []
            for i in ids:
                i = int(i)
                n = i % 50 + 40
                codes = ((i * 11 + np.arange(n) * 5) % 256).astype(np.uint8)
                for law, name in ((0, "mulaw"), (1, "alaw")):
                    out_ids.append(i * 2 + law)
                    payloads.append(MM._wav_encode_g711(8000, codes, name))
            yield pd.DataFrame({"media_id": out_ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    feats = MM.extract_features(media, decoder="wav", dim=4)
    return feats.select(
        "media_id", F.posexplode("features").alias("band", "amp_mean")
    ).select("media_id", F.col("band").cast("long").alias("band"), "amp_mean")


@query(
    "image_dhash_dup_groups",
    oracle="""
    WITH b AS (SELECT doc_id, doc_id % 40 AS cls FROM documents),
    g AS (SELECT doc_id, cls, r.r, c.c FROM b,
          unnest(generate_series(0, 6)) AS r(r),
          unnest(generate_series(0, 7)) AS c(c)),
    bits AS (SELECT doc_id,
             CASE WHEN (cls*17 + 6*r + 10*c + 10) % 200
                       > (cls*17 + 6*r + 10*c) % 200
                  THEN (CAST(1 AS BIGINT) << (r*8 + c)) ELSE 0 END AS bv
             FROM g),
    dh AS (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS dhash FROM bits
           GROUP BY doc_id)
    SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc
    FROM dh GROUP BY dhash
    """,
    doc="Perceptual image near-dup via dHash on REAL decoded pixels: "
    "per-doc gray PNGs carry a class pattern (doc_id % 40) PLUS a "
    "per-doc uniform brightness shift ((doc_id % 7) * 4 — byte- AND "
    "pixel-different payloads), the full PNG decode + 9x7 nearest "
    "resample + horizontal-gradient hash runs Arrow-batched, and "
    "same-class images land in the same dhash group BECAUSE dHash is "
    "brightness-invariant (the shift cancels in every left<right "
    "comparison) — exactly what media_pixel_dedup's exact-digest "
    "grouping cannot do. The oracle recomputes the 56-bit hash in "
    "closed form from the pixel formula, so the decode + resample + "
    "hash pipeline is what is verified. Only (media_id, dhash) ever "
    "shuffles.",
)
def image_dhash_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                cls, shift = i % 40, (i % 7) * 4
                r = np.arange(14)[:, None]
                c = np.arange(18)[None, :]
                arr = ((cls * 17 + r * 3 + c * 5) % 200 + shift).astype(np.uint8)
                payloads.append(MM._png_encode(arr, row_filter="mixed"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    dh = MM.image_dhash(media, decoder="png")
    return dh.groupBy("dhash").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("media_id").alias("min_doc"),
    )


@query(
    "id3_apic_art_dedup",
    oracle="""
    WITH b AS (SELECT doc_id, doc_id % 40 AS cls FROM documents),
    g AS (SELECT doc_id, cls, r.r, c.c FROM b,
          unnest(generate_series(0, 6)) AS r(r),
          unnest(generate_series(0, 7)) AS c(c)),
    bits AS (SELECT doc_id,
             CASE WHEN (cls*17 + 6*r + 10*c + 10) % 200
                       > (cls*17 + 6*r + 10*c) % 200
                  THEN (CAST(1 AS BIGINT) << (r*8 + c)) ELSE 0 END AS bv
             FROM g),
    dh AS (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS dhash FROM bits
           GROUP BY doc_id)
    SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc
    FROM dh GROUP BY dhash
    """,
    doc="Cover-art near-dup across an MP3 library — the AUDIO->IMAGE "
    "composition (operators/multimodal.py:id3_album_art -> "
    "image_dhash): each doc's MP3 carries image_dhash_dup_groups' "
    "exact per-class/brightness-shifted PNG embedded in an ID3v2 "
    "APIC frame (v2.3 plain / v2.4 syncsafe frame sizes alternate by "
    "doc parity, latin-1 mime + description walk), art is extracted "
    "by the APIC reader inside the Arrow batch and flows UNCHANGED "
    "into the perceptual-hash pipeline — same-cover libraries group "
    "despite byte- and brightness-different files. The oracle is "
    "image_dhash_dup_groups' closed-form 56-bit hash verbatim: the "
    "APIC extraction must be byte-exact or every downstream hash "
    "moves. Only (media_id, dhash) ever shuffles.",
)
def id3_apic_art_dedup(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                cls, shift = i % 40, (i % 7) * 4
                r = np.arange(14)[:, None]
                c = np.arange(18)[None, :]
                arr = ((cls * 17 + r * 3 + c * 5) % 200 + shift).astype(np.uint8)
                png = MM._png_encode(arr, row_filter="mixed")
                payloads.append(
                    MM._id3v2_build(
                        {"TIT2": f"track {i}"},
                        ver=3 if i % 2 else 4,
                        apic=png,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    art = MM.id3_album_art(media).filter(
        F.col("ok") & F.col("art").isNotNull()
    ).select("media_id", F.col("art").alias("payload"))
    dh = MM.image_dhash(art, decoder="png")
    return dh.groupBy("dhash").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("media_id").alias("min_doc"),
    )


@query(
    "avro_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           md5(CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS VARCHAR))
             AS text_checksum
    FROM documents GROUP BY lang
    """,
    doc="Avro round trip ON the driver gate: the documents table is "
    "written as pure-Python Avro object-container files (deflate "
    "blocks, one per partition — sources/avro.py) and read back "
    "through auto_input's .avro dispatch; per-language counts, char "
    "sums, and an order-independent text checksum (sum of 60-bit text "
    "hashes) must match the oracle computed on the ORIGINAL parquet — "
    "any encode/decode corruption of any row moves the checksum. The "
    "write lands in a per-session temp dir (generator-query "
    "discipline, like db_count_pageview's embedded Derby). "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() resolves on the driver "
    "and the mapInArrow writer opens it on executors — one shared "
    "filesystem here; on a real cluster pass write_avro a shared-FS "
    "path (S3/HDFS) instead (same caveat as _ivfpq_index_dir).",
)
def avro_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.avro import write_avro
    from hadoop_main_spark.sources.text import auto_input

    d = t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="avro_rt_") + "/documents.avro"
    write_avro(d, out, codec="deflate")
    back = auto_input(spark, out)
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        # DECIMAL(38,0) accumulation: 2^60-bit hashes overflow int64
        # past ~8 rows (DuckDB promotes the same sum to HUGEINT, and
        # both render as plain digit strings)
        F.md5(F.sum(h60.cast("decimal(38,0)")).cast("string")).alias("text_checksum"),
    )


@query(
    "orc_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           md5(CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS VARCHAR))
             AS text_checksum
    FROM documents WHERE n_chars >= 200 GROUP BY lang
    """,
    doc="ORC round trip ON the driver gate (the warehouse column "
    "format beside parquet — Spark's built-in orc source, ORC v1 "
    "zlib-compressed stripes): documents written as ORC, read back, "
    "filtered n_chars >= 200 so the ORC reader's predicate pushdown "
    "path executes (stripe/row-group stats prune on the min/max of "
    "n_chars), then per-language counts, char sums, and the "
    "order-independent 60-bit text checksum must match the oracle on "
    "the ORIGINAL parquet. LOCAL-MODE CONTRACT: tempfile.mkdtemp() as "
    "the write target (shared FS on a real cluster — the write_avro "
    "caveat).",
)
def orc_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    d = t(spark, sf, "documents").select("doc_id", "lang", "n_chars", "text")
    out = tempfile.mkdtemp(prefix="orc_rt_") + "/documents.orc"
    d.write.option("compression", "zlib").orc(out)
    back = spark.read.orc(out).filter(F.col("n_chars") >= 200)
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.md5(F.sum(h60.cast("decimal(38,0)")).cast("string")).alias("text_checksum"),
    )


# Adversarial suffix exercising every CSV metacharacter: embedded
# newline, the quote char, the delimiter, a backslash, a tab. Spark
# side and oracle side must build the IDENTICAL bytes.
_CSV_EVIL = '\n",\\\t'


@query(
    "csv_roundtrip_agg",
    oracle=f"""
    WITH evil AS (
      SELECT lang, n_chars,
             concat(text, chr(10) || '",' || chr(92) || chr(9)) AS text
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           md5(CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS VARCHAR))
             AS text_checksum
    FROM evil GROUP BY lang
    """,
    doc="CSV round trip ON the driver gate with every RFC 4180 "
    "metacharacter planted in every row (embedded newline, the quote "
    "character itself, the delimiter, a backslash, a tab appended to "
    "each document): written with Spark's csv sink (quoteAll + "
    'escape=\'"\' — RFC 4180 doubled-quote form), read back with '
    "multiLine=true and an explicit schema, and checksummed per "
    "language against the oracle computing the same adversarial text "
    "directly on the parquet — so the quoting/escaping machinery "
    "itself is what is verified, not just happy-path values. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() write target.",
)
def csv_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    d = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.concat(F.col("text"), F.lit(_CSV_EVIL)).alias("text"),
    )
    out = tempfile.mkdtemp(prefix="csv_rt_") + "/documents.csv"
    (
        d.write.option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        # the csv SINK trims cell whitespace by default — the planted
        # trailing tab would silently vanish without these
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("doc_id long, lang string, n_chars long, text string")
        .csv(out)
    )
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.md5(F.sum(h60.cast("decimal(38,0)")).cast("string")).alias("text_checksum"),
    )


@query(
    "seqfile_roundtrip_agg",
    oracle="""
    SELECT l.layout,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           md5(CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS VARCHAR))
             AS text_checksum
    FROM documents, (VALUES ('none'), ('record'), ('block')) AS l(layout)
    GROUP BY l.layout
    """,
    doc="SequenceFile round trip ON the driver gate (verdict-r6 #4, "
    "the avro_roundtrip_agg pattern): documents (doc_id, text) pairs "
    "are written as real Hadoop SequenceFiles in all THREE reference "
    "layouts — uncompressed NONE, gzip RECORD, gzip BLOCK "
    "(IO/SequenceFile.java:222) — read back through the Writable "
    "reader, and aggregated per layout: row count, id sum, and an "
    "order-independent 60-bit text checksum must equal the oracle "
    "computed on the ORIGINAL parquet for every layout; any "
    "encode/decode corruption in any layout moves its row. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() as the write target "
    "(shared FS on a real cluster — the write_avro caveat).",
)
def seqfile_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.sequencefile import (
        read_sequencefile,
        write_sequencefile,
    )

    d = t(spark, sf, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="seqrt_")
    parts = []
    for layout, codec, block in (
        ("none", None, None),
        ("record", "gzip", False),
        ("block", "gzip", True),
    ):
        out = f"{base}/{layout}"
        write_sequencefile(d, out, compression=codec, block_compress=block)
        back = read_sequencefile(spark, out, key="doc_id", value="text")
        parts.append(back.withColumn("layout", F.lit(layout)))
    allb = parts[0].unionByName(parts[1]).unionByName(parts[2])
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return allb.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        # DECIMAL(38,0) accumulation mirrors avro_roundtrip_agg: 60-bit
        # hashes overflow int64 past ~8 rows; DuckDB's HUGEINT sum and
        # this both render as plain digit strings under md5()
        F.md5(F.sum(h60.cast("decimal(38,0)")).cast("string")).alias("text_checksum"),
    )


@query(
    "fixedwidth_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
    doc="FixedLengthInputFormat round trip ON the driver gate "
    "(MRC/mapreduce/lib/input/FixedLengthInputFormat.java:47): each "
    "document row is serialized as a fixed-width text record "
    "(zero-padded 12-char doc_id | space-padded 8-char lang | "
    "zero-padded 10-char n_chars), written as plain text across the "
    "session's default parallelism, sliced back into columns by "
    "read_fixed_width's offsets, and re-aggregated per language — "
    "counts, id sums, and char sums must match the oracle on the "
    "original parquet, so any mis-sliced offset or padding bug moves "
    "a value. LOCAL-MODE CONTRACT: tempfile.mkdtemp() target.",
)
def fixedwidth_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.text import read_fixed_width

    d = t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="fixedrt_") + "/docs"
    (
        d.select(
            F.concat(
                F.lpad(F.col("doc_id").cast("string"), 12, "0"),
                F.rpad("lang", 8, " "),
                F.lpad(F.col("n_chars").cast("string"), 10, "0"),
            ).alias("value")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .text(out)
    )
    back = read_fixed_width(spark, out, [12, 8, 10], ["doc_id", "lang", "n_chars"])
    return (
        back.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.trim("lang").alias("lang"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@query(
    "xml_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM documents GROUP BY lang
    """,
    doc="StreamXmlRecordReader round trip ON the driver gate "
    "(ST/StreamXmlRecordReader.java:1): documents are serialized as "
    "<doc><id>..</id><lang>..</lang><n>..</n></doc> elements across "
    "the session's default parallelism (one XML shard per task), "
    "read back with read_xml_records's begin/end-mark scan, fields "
    "re-extracted, and re-aggregated per language against the oracle "
    "on the original parquet — a mis-framed record boundary or "
    "dropped element moves a count. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() target.",
)
def xml_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.text import read_xml_records

    d = t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="xmlrt_") + "/docs"
    (
        d.select(
            F.concat(
                F.lit("<doc><id>"),
                F.col("doc_id").cast("string"),
                F.lit("</id><lang>"),
                F.col("lang"),
                F.lit("</lang><n>"),
                F.col("n_chars").cast("string"),
                F.lit("</n></doc>"),
            ).alias("value")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .text(out)
    )
    back = read_xml_records(spark, out, "doc")
    return (
        back.select(
            F.regexp_extract("record", "<id>([^<]*)</id>", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.regexp_extract("record", "<lang>([^<]*)</lang>", 1).alias("lang"),
            F.regexp_extract("record", "<n>([^<]*)</n>", 1)
            .cast("bigint")
            .alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
    )


@query(
    "har_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
    doc="Hadoop Archive round trip ON the driver gate "
    "(hadoop-tools/hadoop-archives/, HarFileSystem.java:57 VERSION=3): "
    "documents are serialized as tab-separated text shards, archived "
    "into a .har (part concatenation + _index/_masterindex), read "
    "back THROUGH the har:// filesystem at the archive ROOT (the "
    "reader resolves the index and slices part files), re-parsed and "
    "re-aggregated per language against the oracle on the original "
    "parquet — an index offset bug or truncated entry moves a sum. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() target.",
)
def har_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.har import create_har

    d = t(spark, sf, "documents")
    base = tempfile.mkdtemp(prefix="harrt_")
    src, har = f"{base}/src", f"{base}/docs.har"
    (
        d.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("lang"),
                F.col("n_chars").cast("string"),
            ).alias("value")
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .text(src)
    )
    create_har(spark, src, har)
    back = spark.read.text(f"har://{har}/")
    p = F.split("value", "\t")
    return (
        back.select(
            F.element_at(p, 1).cast("bigint").alias("doc_id"),
            F.element_at(p, 2).alias("lang"),
            F.element_at(p, 3).cast("bigint").alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@query(
    "distcp_roundtrip_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           md5(CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS VARCHAR))
             AS text_checksum
    FROM documents GROUP BY lang
    """,
    doc="DistCp round trip ON the driver gate "
    "(hadoop-tools/hadoop-distcp/.../DistCp.java:1): the whole sf "
    "fixture directory is copied by the distributed copier "
    "(size-balanced listing buckets, per-task byte copy), then the "
    "documents COPY is read and aggregated — per-language counts and "
    "the order-independent 60-bit text checksum must equal the "
    "oracle computed on the ORIGINAL file, certifying a byte-exact "
    "distributed copy end-to-end. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() target.",
)
def distcp_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.distcp import distcp

    dst_dir = tempfile.mkdtemp(prefix="distcprt_")
    dst = f"{dst_dir}/documents.parquet"
    report = distcp(spark, sf.rstrip("/"), dst_dir)
    bad = report.filter(F.col("ok") == 0).count() if "ok" in report.columns else 0
    if bad:
        raise RuntimeError(f"distcp reported {bad} failed copies")
    back = spark.read.parquet(dst)
    h60 = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.md5(F.sum(h60.cast("decimal(38,0)")).cast("string")).alias("text_checksum"),
    )


@query(
    "gif_truecolor_frame_features",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 5 + 4 AS w, doc_id % 3 + 5 AS h,
                      doc_id % 3 + 3 AS nf
               FROM documents),
    f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1, 2)) AS frame_idx
          FROM p),
    px AS (SELECT doc_id, frame_idx, w, h, r.r, c.c FROM f,
           unnest(generate_series(0, h - 1)) AS r(r),
           unnest(generate_series(0, w - 1)) AS c(c))
    SELECT doc_id AS media_id, frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           AVG(CAST((doc_id*7 + frame_idx*31) % 256 AS DOUBLE)) AS r_mean,
           AVG(CAST((r*17 + c) % 256 AS DOUBLE)) AS g_mean,
           AVG(CAST((doc_id*3 + r + frame_idx) % 256 AS DOUBLE)) AS b_mean
    FROM px GROUP BY doc_id, frame_idx, w, h
    """,
    doc="TRUE-COLOR animated GIF on the data path (round-7 encoder "
    "extension): per-doc animations are encoded with _gif_encode_rgb "
    "— a LOCAL color table per frame, so the animation's total color "
    "count is unbounded even though each frame is capped at 256 — "
    "then gif_frame_sample LZW-decodes + composites each stream "
    "through the decoder's local-table path and keeps every 2nd "
    "frame. Pixel (r,c) of frame f: R=(doc*7+f*31)%256 (constant per "
    "frame, distinct across frames), G=(r*17+c)%256, "
    "B=(doc*3+r+f)%256; the oracle recomputes the sampled frames' "
    "channel means in closed form.",
)
def gif_truecolor_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h, nf = i % 5 + 4, i % 3 + 5, i % 3 + 3
                rr = np.arange(h)[:, None]
                cc = np.arange(w)[None, :]
                frames = []
                for f in range(nf):
                    a = np.empty((h, w, 3), np.uint8)
                    a[:, :, 0] = (i * 7 + f * 31) % 256
                    a[:, :, 1] = (rr * 17 + cc) % 256
                    a[:, :, 2] = (i * 3 + rr + f) % 256
                    frames.append(a)
                payloads.append(MM._gif_encode_rgb(frames))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.gif_frame_sample(media, every_n=2).select(
        "media_id", "frame_idx", "width", "height", "r_mean", "g_mean", "b_mean"
    )


def _stream_dedup_oracle() -> str:
    # the EXACT dedup_minhash_lsh oracle: the streaming union-over-
    # batches invariant says the accumulated pair set equals the
    # one-shot self-join pair set, so the two queries must share one
    # oracle definition (the _SEM_CAND_CTE discipline).
    from hadoop_main_spark.plans.llm_queries import _AGREE, _MINHASH_PREFIX, J

    return (
        _MINHASH_PREFIX
        + f"""
    SELECT id_a, id_b, CAST(({_AGREE}) AS DOUBLE) / {float(J)} AS est_jaccard
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5
    """
    )


@query(
    "stream_dedup_roundtrip",
    oracle=_stream_dedup_oracle(),
    doc="Structured Streaming ON the driver gate (verdict-r7 #1, the "
    "roundtrip-agg pattern applied to §2.12): documents are split "
    "into 4 parquet files, replayed as a REAL multi-micro-batch file "
    "stream (maxFilesPerTrigger=1, availableNow), and fed through "
    "the full production ingest-dedup loop (dedup_ingest_stream: "
    "per-batch MinHash signatures, within-batch LSH pairs, "
    "cross-batch banded probe against the accumulated signature "
    "store, replay-idempotent per-batch partition sinks). The "
    "accumulated pair set read back from the sink must equal the "
    "one-shot batch self-join pair set — the documented "
    "union-over-batch-partitions invariant — so the oracle is "
    "dedup_minhash_lsh's oracle verbatim; any watermark, "
    "checkpoint-replay, or cross-batch-probe bug surfaces as a "
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time (write + awaitTermination) and returns a "
    "batch read of the sink — plans-only tooling (dump_plans, "
    "plan_lint) pays a multi-second stream execution per call. "
    "missing/duplicated pair. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() sinks (shared FS on a real cluster).",
)
def stream_dedup_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import dedup_ingest_stream

    d = t(spark, sf, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="streamrt_")
    src = f"{base}/src"
    # 4 source files -> 4 genuine micro-batches; which docs land in
    # which batch is irrelevant by the union invariant
    d.repartition(4).write.parquet(src)
    q = dedup_ingest_stream(
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "doc_id",
        "text",
        sig_path=f"{base}/sigs",
        pairs_path=f"{base}/pairs",
        checkpoint=f"{base}/ckpt",
        min_est_jaccard=0.5,
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/pairs").select("id_a", "id_b", "est_jaccard")


@query(
    "audio_container_meta",
    oracle="""
    WITH br AS (SELECT [32,40,48,56,64,80,96,112,128,160,192,224,256,320] AS t),
    p AS (SELECT doc_id AS i, doc_id % 2 AS kind, doc_id // 2 AS j FROM documents),
    mp3 AS (
      SELECT i,
             list_value(44100, 48000, 32000)[j % 3 + 1] AS rate,
             CASE WHEN i % 8 = 0 THEN 1 ELSE 2 END AS channels,
             j % 4 + 2 AS nf, j % 2 AS vary
      FROM p WHERE kind = 0),
    mp3f AS (
      SELECT m.i, m.rate, m.channels, m.nf, m.vary, f.f,
             CAST(t[(m.j2 + f.f * m.vary) % 14 + 1] AS BIGINT) AS brf,
             (m.j2 + f.f) % 2 AS pad
      FROM (SELECT *, i // 2 AS j2 FROM mp3) m,
           LATERAL (SELECT unnest(generate_series(0, m.nf - 1)) AS f) f,
           br),
    mp3a AS (
      SELECT i, 'mp3' AS codec, CAST(nf AS BIGINT) AS n_units,
             CAST(nf * 1152 AS BIGINT) AS total_samples,
             CAST(rate AS BIGINT) AS sample_rate,
             CAST(channels AS BIGINT) AS channels,
             CAST(SUM(144000 * brf // rate + pad) AS BIGINT) AS payload_bytes,
             CAST(1000000 * nf * 1152 // rate AS BIGINT) AS duration_us,
             MAX(vary) = 1 AS vbr
      FROM mp3f GROUP BY i, nf, rate, channels),
    ogg AS (
      SELECT i, j, CASE WHEN i % 4 = 1 THEN 'opus' ELSE 'vorbis' END AS codec,
             j % 3 + 1 AS npages, i % 40 + 5 AS psize,
             j % 2 + 1 AS channels
      FROM p WHERE kind = 1),
    ogga AS (
      SELECT i, codec, CAST(npages + 1 AS BIGINT) AS n_units,
             CAST(CASE WHEN codec = 'opus'
                  THEN 960 * (j % 4 + 1) * npages
                  ELSE (list_value(44100, 48000, 32000)[j % 3 + 1] // 100) * npages
                  END AS BIGINT) AS total_samples,
             CAST(CASE WHEN codec = 'opus' THEN 48000
                  ELSE list_value(44100, 48000, 32000)[j % 3 + 1] END AS BIGINT)
               AS sample_rate,
             CAST(channels AS BIGINT) AS channels,
             CAST(CASE WHEN codec = 'opus' THEN 47 ELSE 58 END
                  + npages * (28 + psize) AS BIGINT) AS payload_bytes,
             CAST(1000000 * (CASE WHEN codec = 'opus'
                    THEN 960 * (j % 4 + 1) * npages
                    ELSE (list_value(44100, 48000, 32000)[j % 3 + 1] // 100) * npages END)
                  // (CASE WHEN codec = 'opus' THEN 48000
                      ELSE list_value(44100, 48000, 32000)[j % 3 + 1] END)
               AS BIGINT) AS duration_us,
             TRUE AS vbr
      FROM ogg)
    SELECT i AS media_id, codec, n_units, total_samples, sample_rate,
           channels, payload_bytes, duration_us, vbr
    FROM (SELECT * FROM mp3a UNION ALL SELECT * FROM ogga)
    """,
    doc="Compressed-audio CONTAINER metadata walk (the honest "
    "remainder of the environment-blocked codec frontier, verdict-r7 "
    "#7): PCM decode for mp3/opus/vorbis stays NotImplementedError "
    "(no codec libraries), but the CONTAINERS are public framings — "
    "ISO 11172-3 MPEG frame headers (bitrate/sample-rate tables, "
    "padding-aware frame lengths, ID3v2 prefix + ID3v1 trailer skip) "
    "and RFC 3533 Ogg pages (lacing tables, REAL page CRC32 poly "
    "0x04C11DB7 verified, OpusHead / vorbis ID-header codec "
    "dispatch, granule-position duration). Even docs carry synthetic "
    "MP3 frame sequences (CBR and VBR, some ID3-prefixed), odd docs "
    "Ogg-Opus/Ogg-Vorbis streams built with correct CRCs; the walker "
    "emits typed metadata (codec, channels, rate, exact integer "
    "duration_us) without decoding one audio sample — the ffprobe "
    "tier that fronts a 100 TB media-curation pipeline. Oracle "
    "recomputes every field in closed form.",
)
def audio_container_meta(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)
    BR3 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    RATES = [44100, 48000, 32000]

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                j = i // 2
                if i % 2 == 0:  # mp3
                    rate_idx = j % 3
                    rate = RATES[rate_idx]
                    mode = 3 if i % 8 == 0 else 0
                    nf, vary = j % 4 + 2, j % 2
                    out = bytearray()
                    if i % 4 == 0:  # ID3v2 prefix (skipped by walker)
                        sz = i % 23
                        out += b"ID3\x04\x00\x00" + bytes([0, 0, sz >> 7, sz & 0x7F])
                        out += b"\x00" * sz
                    for f in range(nf):
                        bidx = (j + f * vary) % 14 + 1
                        pad = (j + f) % 2
                        h = (
                            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                            | (bidx << 12) | (rate_idx << 10) | (pad << 9)
                            | (mode << 6)
                        )
                        flen = 144000 * BR3[bidx - 1] // rate + pad
                        out += h.to_bytes(4, "big") + b"\x00" * (flen - 4)
                    if i % 8 == 4:  # ID3v1 trailer (also skipped)
                        out += b"TAG" + b"\x00" * 125
                    payloads.append(bytes(out))
                else:  # ogg
                    npages, psize = j % 3 + 1, i % 40 + 5
                    channels = j % 2 + 1
                    serial = 0x5EED0000 + i
                    if i % 4 == 1:  # opus
                        pre_skip = 312 + i % 5
                        step = 960 * (j % 4 + 1)
                        head = (
                            b"OpusHead" + bytes([1, channels])
                            + pre_skip.to_bytes(2, "little")
                            + (48000).to_bytes(4, "little") + b"\x00\x00\x00"
                        )
                        grans = [pre_skip + step * (pg + 1) for pg in range(npages)]
                    else:  # vorbis
                        rate = RATES[j % 3]
                        head = (
                            b"\x01vorbis" + b"\x00" * 4 + bytes([channels])
                            + rate.to_bytes(4, "little") + b"\x00" * 14
                        )
                        grans = [(rate // 100) * (pg + 1) for pg in range(npages)]
                    out = MM._ogg_page(0, serial, 0, head, header_type=2)
                    for pg in range(npages):
                        body = bytes((pg * 31 + k) % 251 for k in range(psize))
                        out += MM._ogg_page(
                            grans[pg], serial, pg + 1, body,
                            header_type=4 if pg == npages - 1 else 0,
                        )
                    payloads.append(out)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.audio_container_meta(media)


def _timesplit_stream(
    spark: SparkSession, df: DataFrame, ts_col: str, src: str, parts: int = 4
) -> DataFrame:
    """Replay ``df`` as a ``parts``-micro-batch file stream in EVENT-
    TIME order: contiguous time-range slices, one single-file batch
    each, mtimes strictly increasing so FileStreamSource (oldest-
    first) feeds them in order — the watermark-contract replay shared
    by every stream_*_roundtrip driver gate. Returns the readStream
    DataFrame (maxFilesPerTrigger=1)."""
    import datetime
    import glob
    import os
    import shutil

    os.makedirs(src)
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    span = (hi - lo).total_seconds()
    for k in range(parts):
        a = lo if k == 0 else lo + datetime.timedelta(seconds=span * k / parts)
        b = hi if k == parts - 1 else lo + datetime.timedelta(
            seconds=span * (k + 1) / parts
        )
        cond = (F.col(ts_col) >= F.lit(a)) & (
            F.col(ts_col) <= F.lit(b) if k == parts - 1 else F.col(ts_col) < F.lit(b)
        )
        part_dir = f"{src}__part{k}"
        df.filter(cond).coalesce(1).write.parquet(part_dir)
        (pf,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/q{k}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + k * 60, 1_700_000_000 + k * 60))
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


@query(
    "stream_window_roundtrip",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mt FROM events),
    agg AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2)
    SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start, event_type,
           n_events, total_value
    FROM agg, mx
    WHERE ws + INTERVAL 1 HOUR <= mt - INTERVAL 2 HOUR
    """,
    doc="Watermarked windowed aggregation ON the driver gate (the "
    "second §2.12 certification beside stream_dedup_roundtrip, which "
    "covers the foreachBatch path — this covers the NATIVE streaming "
    "state path): events replay as a 4-micro-batch file stream "
    "through tumbling_counts (1-hour event-time windows, 2-hour "
    "watermark) into an append-mode exactly-once parquet sink "
    "(availableNow). Append mode emits a window only once the "
    "watermark (max event time - 2h, ratcheted batch over batch) "
    "passes its end, so the sink must hold EXACTLY the windows with "
    "window_end <= max(ts) - 2h with batch-identical counts/sums — "
    "the oracle recomputes that closed set, so a watermark-advance, "
    "state-eviction, or replay bug moves rows. The replay respects "
    "the watermark CONTRACT: batches are TIME-RANGE quartiles fed in "
    "event-time order (file mtimes force the file source's "
    "oldest-first ordering) — a randomly-shuffled replay makes 3/4 "
    "of the corpus late beyond any finite watermark and append mode "
    "rightly DROPS it (measured: 2711 of 3370 windows survive a "
    "random 4-way split), which is exactly the semantics the "
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time (write + awaitTermination) and returns a "
    "batch read of the sink — plans-only tooling (dump_plans, "
    "plan_lint) pays a multi-second stream execution per call. "
    "watermark promises, not a bug. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() sinks.",
)
def stream_window_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import (
        stream_partition_scope,
        tumbling_counts,
        write_stream_parquet,
    )

    e = t(spark, sf, "events")
    base = tempfile.mkdtemp(prefix="streamwrt_")
    stream = _timesplit_stream(spark, e, "ts", f"{base}/src")
    # volume-derived state partitioning for the stateful window agg
    # (optimization r12; see sized_stream_partitions)
    with stream_partition_scope(spark, f"{base}/src", n_batches=4):
        q = write_stream_parquet(
            tumbling_counts(stream, window="1 hour", watermark="2 hours"),
            f"{base}/out",
            f"{base}/ckpt",
        )
        q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_start"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        "total_value",
    )


@query(
    "stream_session_roundtrip",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sid AS (
      SELECT user_id, ts,
             SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM b)
    SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sid GROUP BY user_id, session_id
    """,
    doc="CUSTOM STATEFUL streaming ON the driver gate (the third "
    "§2.12 certification — stream_dedup_roundtrip covers foreachBatch, "
    "stream_window_roundtrip the native watermark state path; this "
    "covers applyInPandasWithState arbitrary state): events replay as "
    "a 4-micro-batch event-time-ordered file stream through "
    "gap_sessions (30-min gap sessionization, open session carried in "
    "the state store across batches), per-batch partition-overwrite "
    "sink (replay-idempotent), and the reconstructed FINAL session "
    "set — per (user, session_start) the greatest emission; closed "
    "beats open — must equal the batch sessionize oracle PER SESSION "
    "(start/end/n exact), not just per user. A state carry, batch-"
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time (write + awaitTermination) and returns a "
    "batch read of the sink — plans-only tooling (dump_plans, "
    "plan_lint) pays a multi-second stream execution per call. "
    "boundary merge, or session-splitting bug moves rows. LOCAL-MODE "
    "CONTRACT: tempfile.mkdtemp() sinks (shared FS on a real cluster).",
)
def stream_session_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window
    from hadoop_main_spark.streaming.stateful import gap_sessions

    e = t(spark, sf, "events").select("user_id", "ts", "event_id")
    base = tempfile.mkdtemp(prefix="streamsess_")
    stream = _timesplit_stream(spark, e, "ts", f"{base}/src")
    out = f"{base}/out"

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    # NO stream_partition_scope here (optimization r12, measured):
    # applyInPandasWithState does real per-key Python work — shrinking
    # the state partitioning serializes that compute; unlike the
    # JVM-native window/join state whose per-partition store machinery
    # dominates at fixture scale, this one wants the parallelism.
    q = (
        gap_sessions(stream, "user_id", "ts", "event_id")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out)
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.col("closed").desc(), F.col("n_events").desc(), F.col("session_end").desc()
    )
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "stream_interval_join_roundtrip",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
    doc="STREAM-STREAM interval join ON the driver gate (the fourth "
    "§2.12 certification): clicks and purchases replay as TWO "
    "watermarked 4-micro-batch file streams (event-time-ordered, the "
    "watermark-contract replay) through interval_join (purchases "
    "within 1 hour after the click, 2-hour watermark bounding both "
    "state stores) into an append parquet sink; the emitted pair set "
    "must equal the batch range join exactly. Cross-batch pairs — a "
    "click in quartile k matching a purchase in k+1 — certify the "
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time (write + awaitTermination) and returns a "
    "batch read of the sink — plans-only tooling (dump_plans, "
    "plan_lint) pays a multi-second stream execution per call. "
    "join state survives exactly as long as the watermark promises; "
    "a premature state eviction or a dropped late row moves pairs. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() sinks.",
)
def stream_interval_join_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.joins import interval_join
    from hadoop_main_spark.streaming.windows import (
        stream_partition_scope,
        write_stream_parquet,
    )

    e = t(spark, sf, "events")
    base = tempfile.mkdtemp(prefix="streamssj_")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("click_id")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("purchase_id")
    )
    sl = _timesplit_stream(spark, clicks, "l_ts", f"{base}/src_l")
    sr = _timesplit_stream(spark, buys, "r_ts", f"{base}/src_r")
    j = interval_join(sl, sr, "user_id").select("click_id", "purchase_id")
    # volume-derived state partitioning for the stream-stream join
    # state (optimization r12; see sized_stream_partitions)
    with stream_partition_scope(
        spark, [f"{base}/src_l", f"{base}/src_r"], n_batches=4
    ):
        q = write_stream_parquet(j, f"{base}/out", f"{base}/ckpt")
        q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select("click_id", "purchase_id")


@query(
    "stream_running_totals_roundtrip",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Per-key RUNNING state ON the driver gate (the fifth §2.12 "
    "certification; completes stateful.py — gap_sessions is gated by "
    "stream_session_roundtrip, this gates running_totals): events "
    "replay as a 4-micro-batch file stream (any split — totals "
    "commute) through the applyInPandasWithState running (count, sum) "
    "fold on an EXACT integer grid (value is on the 1-cent grid, so "
    "summing cents keeps cross-engine float parity regardless of "
    "accumulation order), per-batch partition-overwrite sink, and the "
    "LAST emission per key — n_events strictly grows, so max wins — "
    "must equal the batch groupBy exactly. A lost batch, a stale "
    "state read, or a double-applied replay moves a count. "
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time. LOCAL-MODE CONTRACT: tempfile.mkdtemp() "
    "sinks.",
)
def stream_running_totals_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window
    from hadoop_main_spark.streaming.stateful import running_totals

    e = t(spark, sf, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    base = tempfile.mkdtemp(prefix="streamrun_")
    src = f"{base}/src"
    e.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{base}/out"

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    # NO stream_partition_scope here (optimization r12, measured):
    # applyInPandasWithState does real per-key Python work — shrinking
    # the state partitioning serializes that compute (see the
    # stream_session_roundtrip note).
    q = (
        running_totals(stream, "user_id", "cents")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("total_value") / 100).alias("total_value"),
        )
    )


@query(
    "stream_sliding_window_roundtrip",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mt FROM events),
    exp AS (
      SELECT date_trunc('hour', ts) - INTERVAL (t.k) HOUR AS ws, event_type, value
      FROM events, unnest([0, 1]) AS t(k)),
    agg AS (SELECT ws, event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                     AS avg_value
            FROM exp GROUP BY 1, 2)
    SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start, event_type, avg_value
    FROM agg, mx
    WHERE ws + INTERVAL 2 HOUR <= mt - INTERVAL 4 HOUR
    """,
    doc="SLIDING (overlapping) event-time windows ON the driver gate "
    "(the seventh §2.12 certification — tumbling is gated by "
    "stream_window_roundtrip; overlapping windows keep one state row "
    "PER COVERING WINDOW per key, a different eviction shape): events "
    "replay as the 4-batch event-time-ordered file stream through "
    "sliding_avg (2h window / 1h slide / 4h watermark) into the "
    "append-mode exactly-once sink; each event lands in exactly two "
    "windows (the unnest([0,1]) expansion in the oracle) and the sink "
    "must hold exactly the windows with window_end <= max(ts) - 4h "
    "with batch-identical decimal-exact averages. BUILD-COST NOTE: "
    "this builder EXECUTES the full streaming job at plan-build time. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() sinks.",
)
def stream_sliding_window_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import (
        sliding_avg,
        stream_partition_scope,
        write_stream_parquet,
    )

    e = t(spark, sf, "events")
    base = tempfile.mkdtemp(prefix="streamslw_")
    stream = _timesplit_stream(spark, e, "ts", f"{base}/src")
    # volume-derived state partitioning for the sliding-window agg
    # (optimization r12; see sized_stream_partitions)
    with stream_partition_scope(spark, f"{base}/src", n_batches=4):
        q = write_stream_parquet(
            sliding_avg(
                stream, window="2 hours", slide="1 hour", watermark="4 hours"
            ),
            f"{base}/out",
            f"{base}/ckpt",
        )
        q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_start"),
        "event_type",
        "avg_value",
    )


@query(
    "stream_upsert_roundtrip",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts, event_id % 4 AS b FROM events),
    lastb AS (SELECT user_id, MAX(b) AS b FROM e GROUP BY user_id),
    agg AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n_events,
                   MAX(ts) AS max_ts
            FROM e GROUP BY user_id, b)
    SELECT a.user_id, a.n_events,
           CAST(epoch_us(a.max_ts) AS BIGINT) AS max_ts_us
    FROM agg a JOIN lastb l ON a.user_id = l.user_id AND a.b = l.b
    """,
    doc="Keyed UPSERT sink ON the driver gate (the eighth §2.12 "
    "certification — the read+merge+rename-aside-swap last-write-wins "
    "machinery, the dimension-table sink shape): events split into 4 "
    "DETERMINISTIC batches (event_id mod 4, mtime-ordered so the "
    "file source replays them in order), each batch pre-reduced to "
    "one (user_id, n_events, max_ts) row per user, upserted on "
    "user_id; the final table must hold, for every user, exactly the "
    "row from the LAST batch containing that user — which the oracle "
    "recomputes from the mod-4 split in closed form. A lost "
    "accumulated key, a stale read of the being-replaced dir, or a "
    "double-applied replay moves a row. BUILD-COST NOTE: this "
    "builder EXECUTES the full streaming job at plan-build time. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() sinks.",
)
def stream_upsert_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from hadoop_main_spark.streaming.windows import upsert_stream_parquet

    e = t(spark, sf, "events").select("user_id", "event_id", "ts")
    base = tempfile.mkdtemp(prefix="streamup_")
    src = f"{base}/src"
    os.makedirs(src)
    for k in range(4):
        part_dir = f"{base}/part{k}"
        (
            e.filter(F.col("event_id") % 4 == k)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"), F.max("ts").alias("max_ts"))
            .coalesce(1)
            .write.parquet(part_dir)
        )
        (pf,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/q{k}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + k * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = upsert_stream_parquet(stream, f"{base}/out", f"{base}/ckpt", key="user_id")
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.unix_micros("max_ts").alias("max_ts_us"),
    )


@query(
    "video_container_meta",
    oracle="""
    WITH p AS (SELECT doc_id AS i,
                      list_value('isom', 'mp42', 'qt  ')[doc_id % 3 + 1] AS brand,
                      list_value(600, 1000, 90000)[doc_id % 3 + 1] AS ts,
                      doc_id % 7 + 1 AS secs, doc_id % 5 AS rem,
                      list_value('avc1', 'hev1', 'vp09')[doc_id % 3 + 1] AS vcodec,
                      160 * (doc_id % 4 + 1) AS w, 90 * (doc_id % 4 + 1) AS h,
                      doc_id % 2 = 0 AS has_audio
               FROM documents)
    SELECT i AS media_id, brand, CAST(ts AS BIGINT) AS timescale,
           CAST(1000000 * (ts * secs + rem) // ts AS BIGINT) AS duration_us,
           CAST(CASE WHEN has_audio THEN 2 ELSE 1 END AS BIGINT) AS n_tracks,
           vcodec AS video_codec, CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CASE WHEN has_audio THEN 'mp4a' ELSE '' END AS audio_codec
    FROM p
    """,
    doc="ISO-BMFF (MP4) container metadata walk — the video side of "
    "audio_container_meta's ffprobe tier (ISO/IEC 14496-12 box tree: "
    "32-bit/largesize/to-EOF box sizes, ftyp major brand, mvhd "
    "version 0 AND 1 timescale/duration, per-trak hdlr video/audio "
    "classification, stsd first-entry codec fourcc, tkhd 16.16 "
    "fixed-point dimensions; mdat skipped whole — zero sample bytes "
    "touched, codec payload decode stays NotImplementedError). "
    "Fixtures vary brand/timescale/duration remainder/mvhd version/"
    "track layout per doc; the oracle recomputes every field in "
    "closed form including the integer-exact duration_us floor.",
)
def video_container_meta(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                brand = ["isom", "mp42", "qt  "][i % 3]
                ts = [600, 1000, 90000][i % 3]
                duration = ts * (i % 7 + 1) + i % 5
                tracks = [
                    (
                        b"vide",
                        [b"avc1", b"hev1", b"vp09"][i % 3],
                        160 * (i % 4 + 1),
                        90 * (i % 4 + 1),
                    )
                ]
                if i % 2 == 0:
                    tracks.append((b"soun", b"mp4a", 0, 0))
                payloads.append(
                    MM._mp4_build(
                        brand, ts, duration, tracks,
                        mvhd_v1=(i % 2 == 1), trailing_mdat=i % 33,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.video_container_meta(media)


@query(
    "mkv_container_meta",
    oracle="""
    WITH p AS (SELECT doc_id AS i,
                      list_value('webm', 'matroska')[doc_id % 2 + 1] AS doc_type,
                      list_value(1000000, 100000, 20000)[doc_id % 3 + 1] AS scale_ns,
                      (doc_id % 9 + 1) * 100 AS dur_ticks,
                      doc_id % 3 <> 2 AS has_video,
                      doc_id % 2 = 0 AS has_audio
               FROM documents)
    SELECT i AS media_id, doc_type,
           CAST(scale_ns AS BIGINT) AS timestamp_scale_ns,
           CAST(scale_ns * dur_ticks // 1000 AS BIGINT) AS duration_us,
           CAST(CASE WHEN has_video THEN 1 ELSE 0 END
                + CASE WHEN has_audio THEN 1 ELSE 0 END AS BIGINT) AS n_tracks,
           CASE WHEN has_video
                THEN list_value('V_VP9', 'V_MPEG4/ISO/AVC')[i % 2 + 1]
                ELSE '' END AS video_codec,
           CAST(CASE WHEN has_video THEN 320 + 16 * (i % 8) ELSE 0 END AS BIGINT)
             AS width,
           CAST(CASE WHEN has_video THEN 240 + 8 * (i % 8) ELSE 0 END AS BIGINT)
             AS height,
           CASE WHEN has_audio
                THEN (CASE WHEN i % 4 = 0 THEN 'A_OPUS' ELSE 'A_VORBIS' END)
                ELSE '' END AS audio_codec,
           CAST(CASE WHEN has_audio THEN i % 7 + 1 ELSE 0 END AS BIGINT)
             AS audio_channels
    FROM p
    """,
    doc="Matroska/WebM CONTAINER metadata walk (RFC 8794 EBML + the "
    "public Matroska element registry — the third leg of the "
    "ffprobe tier beside audio_container_meta and "
    "video_container_meta): variable-length-integer element IDs and "
    "sizes (marker-bit semantics, the reserved all-ones UNKNOWN-SIZE "
    "form for streamed Segments supported per spec), EBML DocType, "
    "Info TimestampScale/Duration (4- and 8-byte floats), TrackEntry "
    "type/codec/dimensions/channels; Clusters skipped whole — zero "
    "sample bytes touched, VP9/AVC/Opus PAYLOAD decode stays "
    "honestly NotImplementedError. Fixtures vary doc type, timestamp "
    "scale, duration, track layout (including zero-track files), "
    "streamed-vs-sized Segments, and Cluster filler; the oracle "
    "recomputes every field in closed form.",
)
def mkv_container_meta(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                tracks = []
                if i % 3 != 2:
                    tracks.append(
                        (1, ["V_VP9", "V_MPEG4/ISO/AVC"][i % 2],
                         320 + 16 * (i % 8), 240 + 8 * (i % 8), 0)
                    )
                if i % 2 == 0:
                    tracks.append(
                        (2, "A_OPUS" if i % 4 == 0 else "A_VORBIS",
                         0, 0, i % 7 + 1)
                    )
                payloads.append(
                    MM._mkv_build(
                        ["webm", "matroska"][i % 2],
                        [1_000_000, 100_000, 20_000][i % 3],
                        float((i % 9 + 1) * 100),
                        tracks,
                        unknown_segment_size=(i % 5 == 0),
                        cluster_bytes=i % 77,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.mkv_container_meta(media)


#: the WARC/HTML fixture template, defined ONCE for both warc queries
#: (generator side here, oracle side in the SQL CTE below): title
#: 'Doc &amp; <i>', i%4+1 space-joined nav links, an <h1>, one <p>
#: per text line (html-escaped), a dropped comment + style block.
def _warc_html(i: int, text: str) -> str:
    import html as _h

    n = i % 4 + 1
    links = " ".join(f'<a href="/l{k}">L{k}</a>' for k in range(n))
    esc = _h.escape(text or "", quote=False)
    return (
        f"<html><head><title>Doc &amp; {i}</title><style>p{{color:red}}</style>"
        f"</head><body><nav>{links}</nav><h1>H {i}</h1><p>"
        + esc.replace("\n", "</p><p>")
        + f"</p><!-- c{i} --></body></html>"
    )


#: the SAME template as a DuckDB expression over (i, text)
_WARC_HTML_SQL = """
    '<html><head><title>Doc &amp; ' || i || '</title><style>p{color:red}</style>'
    || '</head><body><nav>' || links || '</nav><h1>H ' || i || '</h1><p>'
    || replace(replace(replace(replace(COALESCE(text, ''),
         '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), chr(10), '</p><p>')
    || '</p><!-- c' || i || ' --></body></html>'
"""

_WARC_LINKS_SQL = """
    CASE i % 4 + 1
      WHEN 1 THEN '<a href="/l0">L0</a>'
      WHEN 2 THEN '<a href="/l0">L0</a> <a href="/l1">L1</a>'
      WHEN 3 THEN '<a href="/l0">L0</a> <a href="/l1">L1</a> <a href="/l2">L2</a>'
      ELSE '<a href="/l0">L0</a> <a href="/l1">L1</a> <a href="/l2">L2</a> <a href="/l3">L3</a>'
    END
"""


def _warc_media(spark: SparkSession, sf: str) -> DataFrame:
    """Shared generator: one WARC per doc (warcinfo + request +
    response whose HTTP body is the HTML template over the doc's
    text); odd docs use the Common Crawl gzip-member-per-record
    layout."""
    import pandas as pd

    from hadoop_main_spark.sources import warc as W

    docs = t(spark, sf, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            out_id, out_p = [], []
            for i, text in zip(b["doc_id"].astype("int64"), b["text"]):
                i = int(i)
                uri = f"http://example.org/doc/{i}"
                html = _warc_html(i, text if text is not None else "")
                recs = [
                    dict(
                        warc_type="warcinfo",
                        block=b"software: hadoop-main-spark\r\n",
                        content_type="application/warc-fields",
                    ),
                    dict(
                        warc_type="request", block=W.http_request(uri),
                        target_uri=uri,
                        content_type="application/http; msgtype=request",
                    ),
                    dict(
                        warc_type="response",
                        # every 4th doc ships the body CHUNKED — the
                        # wire form real crawls actually contain
                        block=W.http_response(
                            html.encode("utf-8"), chunked=(i % 4 == 2)
                        ),
                        target_uri=uri,
                        content_type="application/http; msgtype=response",
                    ),
                ]
                out_id.append(i)
                out_p.append(W.build_warc(recs, gzip_members=(i % 2 == 1)))
            yield pd.DataFrame({"media_id": out_id, "payload": out_p})

    return docs.mapInPandas(gen, "media_id long, payload binary")


# Shared verbatim by warc_ingest_meta (batch) and stream_warc_roundtrip
# (the streaming ingest must reproduce the batch walk exactly).
_WARC_META_ORACLE = f"""
    WITH base AS (SELECT doc_id AS i, text FROM documents),
    h AS (SELECT i, ({_WARC_HTML_SQL.replace('links', _WARC_LINKS_SQL)}) AS html
          FROM base),
    recs AS (
      SELECT i, 0 AS rec_idx, 'warcinfo' AS warc_type, '' AS target_uri,
             CAST(octet_length(encode('software: hadoop-main-spark' || chr(13) || chr(10)))
                  AS BIGINT) AS content_length,
             CAST(0 AS BIGINT) AS http_status, '' AS http_content_type,
             CAST(octet_length(encode('software: hadoop-main-spark' || chr(13) || chr(10)))
                  AS BIGINT) AS body_bytes,
             md5('software: hadoop-main-spark' || chr(13) || chr(10)) AS body_md5
      FROM h
      UNION ALL
      SELECT i, 1, 'request', 'http://example.org/doc/' || i,
             CAST(octet_length(encode('GET http://example.org/doc/' || i
               || ' HTTP/1.1' || chr(13) || chr(10) || 'Host: example.org'
               || chr(13) || chr(10) || chr(13) || chr(10))) AS BIGINT),
             CAST(0 AS BIGINT), '', CAST(0 AS BIGINT), md5('')
      FROM h
      UNION ALL
      SELECT i, 2, 'response', 'http://example.org/doc/' || i,
             CAST(CASE WHEN i % 4 = 2 THEN
               -- chunked wire form: fixed headers + hex-size line +
               -- body + CRLF + '0' CRLF CRLF terminator
               octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10)
                 || 'Content-Type: text/html' || chr(13) || chr(10)
                 || 'Transfer-Encoding: chunked'
                 || chr(13) || chr(10) || chr(13) || chr(10)))
               + length(printf('%x', octet_length(encode(html)))) + 2
               + octet_length(encode(html)) + 2 + 5
             ELSE
               octet_length(encode('HTTP/1.1 200 OK' || chr(13) || chr(10)
                 || 'Content-Type: text/html' || chr(13) || chr(10)
                 || 'Content-Length: ' || octet_length(encode(html))
                 || chr(13) || chr(10) || chr(13) || chr(10))) + octet_length(encode(html))
             END AS BIGINT),
             CAST(200 AS BIGINT), 'text/html',
             CAST(octet_length(encode(html)) AS BIGINT), md5(html)
      FROM h)
    SELECT i AS media_id, CAST(rec_idx AS BIGINT) AS rec_idx, warc_type,
           target_uri, content_length, http_status, http_content_type,
           body_bytes, body_md5
    FROM recs
    """


@query(
    "warc_ingest_meta",
    oracle=_WARC_META_ORACLE,
    doc="WARC (ISO 28500) ingestion ON the driver gate — the Common "
    "Crawl first mile: each doc becomes a 3-record WARC (warcinfo + "
    "request + response whose application/http block wraps an HTML "
    "page built from the doc text), odd docs in the Common Crawl "
    "gzip-member-per-record layout (concatenated-member inflate with "
    "a truncation-detecting eof check), and sources/warc.py walks "
    "records, parses the HTTP message, and emits type/uri/status/"
    "length/md5 rows — every field recomputed byte-exactly by the "
    "oracle including Content-Length octet math over the identically "
    "constructed strings. Bodies never leave the Arrow batch; only "
    "~100-byte metadata rows shuffle.",
)
def warc_ingest_meta(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.sources.warc import warc_records

    # explicit projection: warc_records also surfaces the revisit
    # headers (warc_profile/refers_to_uri/payload_digest, all '' for
    # this fixture) — warc_revisit_dedup gates those
    return warc_records(_warc_media(spark, sf)).select(
        "media_id", "rec_idx", "warc_type", "target_uri",
        "content_length", "http_status", "http_content_type",
        "body_bytes", "body_md5",
    )


@query(
    "dhash_near_groups",
    oracle="""
    WITH b AS (SELECT doc_id, doc_id % 40 AS cls FROM documents),
    g AS (SELECT doc_id, cls, r.r, c.c FROM b,
          unnest(generate_series(0, 6)) AS r(r),
          unnest(generate_series(0, 7)) AS c(c)),
    bits AS (SELECT doc_id,
             CASE WHEN (cls*17 + 6*r + 10*c + 10) % 200
                       > (cls*17 + 6*r + 10*c) % 200
                  THEN (CAST(1 AS BIGINT) << (r*8 + c)) ELSE 0 END AS bv
             FROM g),
    dh AS (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS dhash FROM bits
           GROUP BY doc_id),
    grp AS (SELECT dhash, MIN(doc_id) AS gid FROM dh GROUP BY dhash),
    bands AS (SELECT gid, dhash, bb.b AS band,
                     (dhash >> (bb.b * 8)) & 255 AS band_val
              FROM grp, unnest(generate_series(0, 6)) bb(b)),
    cand AS (SELECT DISTINCT a.gid AS id_a, b.gid AS id_b,
                    a.dhash AS ha, b.dhash AS hb
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_val = b.band_val
                  AND a.gid < b.gid)
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 6
    ORDER BY id_a, id_b
    """,
    doc="NEAR-duplicate image GROUP pairing (extends "
    "image_dhash_dup_groups, which resolves EXACT-dHash clusters: "
    "this asks which clusters are perceptually NEAR each other — the "
    "cluster-merge signal an image-dedup pipeline feeds back): the "
    "same brightness-shifted class PNGs decode and hash through the "
    "REAL 56-bit dHash path, collapse to one canonical row per "
    "distinct hash (mass-dup corpora must pair GROUPS, not docs — a "
    "doc-pair list is output-quadratic here), then "
    "dedup.hamming_band_pairs finds group pairs within Hamming 6: "
    "7 x 8-bit bands, pigeonhole (6 < 7) guarantees a shared band, "
    "so candidates are one band-keyed equi-join — never all-pairs — "
    "with the exact bit_count XOR verify. The oracle replays the "
    "closed-form hash, the grouping, the banding, and the verify.",
)
def dhash_near_groups(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from hadoop_main_spark.operators.dedup import hamming_band_pairs

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                cls, shift = i % 40, (i % 7) * 4
                r = np.arange(14)[:, None]
                c = np.arange(18)[None, :]
                arr = ((cls * 17 + r * 3 + c * 5) % 200 + shift).astype(np.uint8)
                payloads.append(MM._png_encode(arr, row_filter="mixed"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    grp = (
        MM.image_dhash(media, decoder="png")
        .filter(F.col("dhash") >= 0)
        .groupBy("dhash")
        .agg(F.min("media_id").alias("gid"))
    )
    return hamming_band_pairs(
        grp, "gid", "dhash", max_hamming=6, bands=7, bits=56
    ).orderBy("id_a", "id_b")


def _afp_bit_sql() -> str:
    """The closed-form fingerprint bit for the audio fixture: hash64
    base bit per (group, bit position), one deterministic flip for
    3/4 of the docs — the SQL twin of the generator in
    audio_fingerprint_dedup (same hash64 salt, same flip rule)."""
    from hadoop_main_spark.functions.hashing import hash64_sql

    base = hash64_sql("CAST(g AS VARCHAR) || '_' || CAST(b AS VARCHAR)", "afp")
    return f"""CASE WHEN doc_id % 4 <> 0 AND b = (doc_id * 7) % 16
                THEN 1 - ({base} % 2) ELSE ({base} % 2) END"""


@query(
    "audio_fingerprint_dedup",
    oracle=f"""
    WITH p AS (SELECT doc_id, doc_id % 25 AS g FROM documents),
    gb AS (SELECT doc_id, g, b.b AS b FROM p,
           unnest(generate_series(0, 55)) b(b)),
    bits AS (SELECT doc_id, b, {_afp_bit_sql()} AS bit FROM gb),
    fp AS (SELECT doc_id,
             CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << b)) AS BIGINT)
               AS afp
           FROM bits GROUP BY doc_id),
    grp AS (SELECT afp, MIN(doc_id) AS gid FROM fp GROUP BY afp),
    bands AS (SELECT gid, afp, bb.b AS band, (afp >> (bb.b * 8)) & 255 AS band_val
              FROM grp, unnest(generate_series(0, 6)) bb(b)),
    cand AS (SELECT DISTINCT a.gid AS id_a, b.gid AS id_b,
                    a.afp AS ha, b.afp AS hb
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_val = b.band_val
                  AND a.gid < b.gid)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 6
    ORDER BY id_a, id_b
    """,
    doc="NEAR-duplicate AUDIO detection end to end — the modality the "
    "dedup family lacked beside text (MinHash/SimHash/spans) and "
    "images (dHash): per-doc mono WAVs whose 57 chunk amplitudes walk "
    "a hash64-derived bit sequence (25 base recordings, 3/4 of docs "
    "re-'mastered' with one deterministic energy flip) are container-"
    "encoded, then multimodal.audio_energy_fingerprint REALLY decodes "
    "the RIFF/PCM16 payload and emits the 56-bit energy-delta "
    "fingerprint (Haitsma & Kalker's sign-of-difference core, "
    "time-domain — the honest no-FFT-library analog), distinct "
    "fingerprints collapse to canonical GROUPS (mass-dup corpora pair "
    "groups, not docs — the dhash_near_groups discipline), and "
    "dedup.hamming_band_pairs finds group pairs within Hamming 6 via "
    "7x8-bit pigeonhole bands. Group count is bounded by the base x "
    "flip-position product (~325), NOT the corpus, so output and "
    "band buckets stay constant as docs scale; PCM never shuffles. "
    "The oracle replays bits, packing, grouping, banding and the "
    "bit_count verify in closed form from the shared hash64 salt.",
)
def audio_fingerprint_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.dedup import hamming_band_pairs

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        from hadoop_main_spark.functions.hashing import hash64_py

        base = {
            g: np.array(
                [hash64_py(f"{g}_{b}", "afp") % 2 for b in range(56)],
                dtype=np.int64,
            )
            for g in range(25)
        }
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                bits = base[i % 25].copy()
                if i % 4 != 0:
                    bits[(i * 7) % 16] ^= 1
                # chunk-constant amplitudes realizing the bit sequence:
                # a_0 = 200, each bit steps +-1, so E_{c+1} > E_c iff
                # bit_c = 1 (values stay in [144, 256] — positive, and
                # squares are exact in int64)
                amps = np.concatenate(
                    [np.array([200], dtype=np.int64), 200 + np.cumsum(2 * bits - 1)]
                )
                samples = np.repeat(amps, 8).astype("<i2")
                payloads.append(MM._wav_encode(8000, samples[:, None]))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    grp = (
        MM.audio_energy_fingerprint(media)
        .filter(F.col("afp") >= 0)
        .groupBy("afp")
        .agg(F.min("media_id").alias("gid"))
    )
    return hamming_band_pairs(
        grp, "gid", "afp", max_hamming=6, bands=7, bits=56
    ).orderBy("id_a", "id_b")


def _vfp_bit_sql() -> str:
    """The closed-form fingerprint bit for the video fixture: hash64
    base bit per (group, bit position), one deterministic flip for
    2/3 of the docs — the SQL twin of the generator in
    video_fingerprint_dedup (same hash64 salt, same flip rule)."""
    from hadoop_main_spark.functions.hashing import hash64_sql

    base = hash64_sql("CAST(g AS VARCHAR) || '_' || CAST(b AS VARCHAR)", "vfp")
    return f"""CASE WHEN doc_id % 3 <> 0 AND b = (doc_id * 11) % 16
                THEN 1 - ({base} % 2) ELSE ({base} % 2) END"""


@query(
    "video_fingerprint_dedup",
    oracle=f"""
    WITH p AS (SELECT doc_id, doc_id % 20 AS g FROM documents),
    gb AS (SELECT doc_id, g, b.b AS b FROM p,
           unnest(generate_series(0, 55)) b(b)),
    bits AS (SELECT doc_id, b, {_vfp_bit_sql()} AS bit FROM gb),
    fp AS (SELECT doc_id,
             CAST(SUM(CAST(bit AS BIGINT) * (CAST(1 AS BIGINT) << b)) AS BIGINT)
               AS vfp
           FROM bits GROUP BY doc_id),
    grp AS (SELECT vfp, MIN(doc_id) AS gid FROM fp GROUP BY vfp),
    bands AS (SELECT gid, vfp, bb.b AS band, (vfp >> (bb.b * 8)) & 255 AS band_val
              FROM grp, unnest(generate_series(0, 6)) bb(b)),
    cand AS (SELECT DISTINCT a.gid AS id_a, b.gid AS id_b,
                    a.vfp AS ha, b.vfp AS hb
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_val = b.band_val
                  AND a.gid < b.gid)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 6
    ORDER BY id_a, id_b
    """,
    doc="NEAR-duplicate VIDEO detection end to end — completes the "
    "near-dup modality MATRIX (text spans / image dHash / audio "
    "energy deltas / video temporal shape): per-doc Cmono Y4M clips "
    "whose 57 constant-luma frames walk a hash64-derived bit "
    "sequence (20 base clips, 2/3 of docs re-graded with one "
    "deterministic brightness flip) container-encode, then "
    "multimodal.video_luma_fingerprint REALLY decodes each Y4M "
    "stream and emits the 56-bit temporal-difference fingerprint "
    "(the TIRI/ordinal-signature core: bit = does the next frame's "
    "exact int64 luma sum rise — re-encodes preserving brightness "
    "ORDER collapse together), distinct fingerprints collapse to "
    "canonical GROUPS, and dedup.hamming_band_pairs pairs groups "
    "within Hamming 6 via 7x8-bit pigeonhole bands. Group count is "
    "bounded by the fixture design (~100) at any corpus scale; "
    "frames never shuffle. The oracle replays bits, packing, "
    "grouping, banding and the bit_count verify in closed form from "
    "the shared hash64 salt.",
)
def video_fingerprint_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.dedup import hamming_band_pairs

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        from hadoop_main_spark.functions.hashing import hash64_py

        base = {
            g: np.array(
                [hash64_py(f"{g}_{b}", "vfp") % 2 for b in range(56)],
                dtype=np.int64,
            )
            for g in range(20)
        }
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                bits = base[i % 20].copy()
                if i % 3 != 0:
                    bits[(i * 11) % 16] ^= 1
                # constant-luma 8x8 frames realizing the bit sequence:
                # L_0 = 120, each bit steps +-1 (range [64, 176] fits
                # uint8), so sum(Y_{f+1}) > sum(Y_f) iff bit_f = 1
                lum = np.concatenate(
                    [np.array([120], dtype=np.int64), 120 + np.cumsum(2 * bits - 1)]
                ).astype(np.uint8)
                frames = [
                    (np.full((8, 8), v, dtype=np.uint8), None, None) for v in lum
                ]
                payloads.append(MM._y4m_encode(frames, colorspace="Cmono"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    grp = (
        MM.video_luma_fingerprint(media)
        .filter(F.col("vfp") >= 0)
        .groupBy("vfp")
        .agg(F.min("media_id").alias("gid"))
    )
    return hamming_band_pairs(
        grp, "gid", "vfp", max_hamming=6, bands=7, bits=56
    ).orderBy("id_a", "id_b")


# Shared verbatim by pdf_text_extract (batch) and stream_pdf_roundtrip
# (the streaming ingest must reproduce the batch walk exactly).
_PDF_META_ORACLE = """
    WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    m AS (SELECT doc_id, t,
                 greatest(CAST(ceil(length(t) / 256.0) AS BIGINT), 1) AS np,
                 CAST(length(t)
                      + (length(t) - length(replace(t, '(', '')))
                      + (length(t) - length(replace(t, ')', '')))
                      + (length(t) - length(replace(t, '\\', ''))) AS BIGINT)
                   AS esc_len
          FROM d)
    SELECT doc_id AS media_id,
           CAST(2 + 2 * np AS BIGINT) AS n_objects,
           np AS n_pages,
           np AS n_streams,
           CAST(0 AS BIGINT) AS n_opaque_streams,
           CAST(31 * np + esc_len AS BIGINT) AS stream_bytes,
           t AS text
    FROM m
    ORDER BY media_id
    """


@query(
    "pdf_text_extract",
    oracle=_PDF_META_ORACLE,
    doc="PDF container walk + text extraction (ISO 32000-1 — the "
    "DOCUMENT-container tier beside the WARC web tier and the "
    "media containers; training corpora are full of PDFs and this is "
    "their first pipeline stage): each doc's text is written as a "
    "REAL multi-page PDF (one page + one uncompressed content stream "
    "per 256 chars, literal-string escaping, classic xref with true "
    "byte offsets), then sources/pdf.py:parse_pdf walks it back — "
    "header/%%EOF/startxref verification, xref rows validated and "
    "every in-use object visited AT ITS RECORDED OFFSET, stream "
    "/Length framing, BT..ET Tj literal extraction with \\-escape "
    "decoding — and the closed-form oracle pins object/page/stream "
    "counts, total stream bytes (31 overhead per page + escaped text "
    "length), and the EXACT text roundtrip. FlateDecode streams "
    "inflate; other filters are counted as opaque (the honest codec "
    "boundary, cf. multimodal).",
)
def pdf_text_extract(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from hadoop_main_spark.sources.pdf import pdf_encode, pdf_meta

    docs = t(spark, sf, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for i, text in zip(b["doc_id"].astype("int64"), b["text"]):
                ids.append(int(i))
                payloads.append(pdf_encode(text if text is not None else ""))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return pdf_meta(media).orderBy("media_id")


@query(
    "pdf15_text_extract",
    oracle="""
    WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    m AS (SELECT doc_id, t,
                 greatest(CAST(ceil(length(t) / 256.0) AS BIGINT), 1) AS np
          FROM d)
    SELECT doc_id AS media_id,
           CAST(2 * np + 4 AS BIGINT) AS n_objects,
           np AS n_pages,
           CAST(np + 2 AS BIGINT) AS n_streams,
           CAST(0 AS BIGINT) AS n_opaque_streams,
           t AS text
    FROM m
    ORDER BY media_id
    """,
    doc="PDF 1.5 walk (ISO 32000-1 §7.5.7/§7.5.8 — verdict r10 "
    "next-round #6; how most post-2005 PDFs in a real crawl are "
    "written): each doc re-encodes with the structure objects "
    "(catalog, page tree, page dicts) Flate-COMPRESSED inside an "
    "/ObjStm and a binary /Type /XRef cross-reference STREAM "
    "(W=[1 4 2], type-2 rows pointing into the ObjStm) instead of a "
    "classic table, and parse_pdf walks it back: xref-stream row "
    "decode, type-1 offset visits verified against the object "
    "header, ObjStm header parse with per-index objnum verification, "
    "page classification INSIDE the object stream, and the same "
    "BT..ET literal text extraction. Oracle pins the closed-form "
    "object/page/stream counts and the exact text; total stream "
    "bytes include compressed structure streams (not closed-form) "
    "and are deliberately out of this gate — the classic-form "
    "pdf_text_extract pins byte accounting. /Prev incremental "
    "chains raise (honest boundary).",
)
def pdf15_text_extract(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.sources.pdf import pdf15_encode, pdf_meta

    docs = t(spark, sf, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for i, text in zip(b["doc_id"].astype("int64"), b["text"]):
                ids.append(int(i))
                payloads.append(pdf15_encode(text if text is not None else ""))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return pdf_meta(media).select(
        "media_id", "n_objects", "n_pages", "n_streams",
        "n_opaque_streams", "text",
    ).orderBy("media_id")


@query(
    "stream_pdf_roundtrip",
    oracle=_PDF_META_ORACLE,
    doc="Streaming PDF ingest ON the driver gate (the document-"
    "container twin of stream_warc_roundtrip): the per-doc multi-page "
    "PDFs replay as two mtime-ordered parity waves through "
    "streaming/windows.py:pdf_meta_stream — the SAME xref-verified "
    "walk + BT..ET literal extraction as the batch operator, "
    "exactly-once file sink — and the accumulated sink must equal "
    "pdf_text_extract's closed-form oracle VERBATIM: a record lost "
    "at a batch boundary, a replayed file double-write, or any "
    "stream-vs-batch walker divergence moves a row. BUILD-COST NOTE: "
    "executes the streaming job at plan-build time. LOCAL-MODE "
    "CONTRACT: tempfile.mkdtemp().",
)
def stream_pdf_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd

    from hadoop_main_spark.sources.pdf import pdf_encode
    from hadoop_main_spark.streaming.windows import pdf_meta_stream

    docs = t(spark, sf, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            ids, payloads = [], []
            for i, text in zip(b["doc_id"].astype("int64"), b["text"]):
                ids.append(int(i))
                payloads.append(pdf_encode(text if text is not None else ""))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    base = tempfile.mkdtemp(prefix="streampdf_")
    src = f"{base}/src"
    os.makedirs(src)
    for w in (0, 1):
        part_dir = f"{base}/part{w}"
        media.filter(F.pmod(F.col("media_id"), F.lit(2)) == w).coalesce(
            1
        ).write.parquet(part_dir)
        (pf,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/w{w}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + w * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = pdf_meta_stream(stream, f"{base}/out", f"{base}/ckpt")
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        "media_id", "n_objects", "n_pages", "n_streams",
        "n_opaque_streams", "stream_bytes", "text",
    ).orderBy("media_id")


@query(
    "warc_revisit_dedup",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'response' ELSE 'revisit' END
             AS warc_type,
           CASE WHEN doc_id % 3 = 0 THEN ''
                ELSE 'http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'
           END AS warc_profile,
           CASE WHEN doc_id % 3 = 0 THEN ''
                ELSE 'http://example.org/doc/' || CAST(doc_id AS VARCHAR)
           END AS refers_to_uri,
           'md5:' || md5(CASE WHEN doc_id % 3 = 0
                              THEN 'v2 ' || COALESCE(text, '')
                              ELSE COALESCE(text, '') END) AS payload_digest,
           CASE WHEN doc_id % 3 = 0
                THEN md5('v2 ' || COALESCE(text, ''))
                ELSE md5('') END AS body_md5,
           CAST(CASE WHEN doc_id % 3 = 0
                     THEN octet_length(encode('v2 ' || COALESCE(text, '')))
                     ELSE 0 END AS BIGINT) AS body_bytes
    FROM documents
    ORDER BY media_id
    """,
    doc="WARC ``revisit`` records (ISO 28500 §6.7 — verdict-r9 #7, "
    "the one record class parse_warc didn't yet surface, and Common "
    "Crawl's actual storage-dedup mechanism) COMPOSED with the "
    "versioned sink: crawl 1's per-URI payload digests commit as a "
    "versioned snapshot (sources/versioned.py write_version), then "
    "the recrawl — every 3rd doc changed, the rest identical — "
    "writes through sources/warc.py:revisit_warc_media, which joins "
    "the prior snapshot's digests uri-keyed and emits a full "
    "``response`` record for changed payloads but a tiny ``revisit`` "
    "record (empty block, WARC-Profile identical-payload-digest, "
    "WARC-Refers-To-Target-URI, WARC-Payload-Digest) for unchanged "
    "ones. The records parse back through warc_records and must "
    "match the closed-form oracle: record type, profile, refers-to, "
    "digest, and body md5/bytes all derived from the doc-id change "
    "rule. LOCAL-MODE CONTRACT: tempfile.mkdtemp() snapshot dir.",
)
def warc_revisit_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _recrawl_records(spark, sf)
        .select(
            "media_id", "warc_type", "warc_profile", "refers_to_uri",
            "payload_digest", "body_md5", "body_bytes",
        )
        # LAZY checkpoint before the deterministic sort (the
        # edit_distance_join / suffix pattern, optimization r12):
        # orderBy's range-sampling pass otherwise re-executes the
        # whole crawl->revisit-write->parse chain (three Python
        # kernel stages) a second time — measured 3.0 s -> chain-only
        # 1.2 s at sf0.1. Eager would move the cost out of the timed
        # action and cheat the bench.
        .localCheckpoint(eager=False)
        .orderBy("media_id")
    )


def _recrawl_crawl(docs: DataFrame, changed: bool) -> DataFrame:
    """Deterministic crawl frame over (doc_id, text): per doc a uri,
    the payload bytes, and the payload's md5 — the recrawl (``changed``)
    bumps every 3rd doc to a 'v2 ' body, the change rule every
    recrawl-family oracle replays closed-form."""

    def run(batches):
        import hashlib

        for b in batches:
            ids, uris, payloads, digests = [], [], [], []
            for i, text in zip(b["doc_id"].astype("int64"), b["text"]):
                i = int(i)
                body = text if text is not None else ""
                if changed and i % 3 == 0:
                    body = "v2 " + body
                pbytes = body.encode("utf-8")
                ids.append(i)
                uris.append(f"http://example.org/doc/{i}")
                payloads.append(pbytes)
                digests.append(hashlib.md5(pbytes).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "uri": uris, "payload": payloads,
                 "digest": digests}
            )

    schema = "media_id long, uri string, payload binary, digest string"
    return docs.mapInPandas(run, schema)


def _recrawl_records(spark: SparkSession, sf: str) -> DataFrame:
    """The snapshot->recrawl->revisit-write->parse chain shared by
    warc_revisit_dedup and recrawl_maintenance: crawl 1's digests
    commit as a versioned snapshot, the recrawl writes through
    revisit_warc_media against that snapshot, and the one-record
    WARCs parse back through warc_records."""
    import tempfile

    from hadoop_main_spark.sources.versioned import read_version, write_version
    from hadoop_main_spark.sources.warc import revisit_warc_media, warc_records

    docs = t(spark, sf, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )
    crawl1 = _recrawl_crawl(docs, changed=False)
    snap = tempfile.mkdtemp(prefix="warcsnap_")
    write_version(crawl1.select("uri", "digest"), snap)
    crawl2 = _recrawl_crawl(docs, changed=True)
    warcs = revisit_warc_media(
        crawl2.select("media_id", "uri", "payload"),
        read_version(spark, snap),
    )
    return warc_records(warcs)


@query(
    "warc_html_text_extract",
    oracle=f"""
    WITH base AS (SELECT doc_id AS i, text FROM documents),
    x AS (SELECT i,
            trim(regexp_replace(
              'Doc & ' || i || ' '
              || CASE i % 4 + 1
                   WHEN 1 THEN 'L0' WHEN 2 THEN 'L0 L1'
                   WHEN 3 THEN 'L0 L1 L2' ELSE 'L0 L1 L2 L3' END
              || ' H ' || i || ' ' || COALESCE(text, ''),
              '[ \\t\\n\\r\\f]+', ' ', 'g')) AS txt
          FROM base)
    SELECT i AS doc_id, 'Doc & ' || i AS title,
           CAST(i % 4 + 1 AS BIGINT) AS n_links,
           CAST(length(txt) AS BIGINT) AS n_chars,
           md5(txt) AS text_md5
    FROM x
    """,
    doc="The FULL Common Crawl text-mining pipeline end to end under "
    "one oracle: WARC bytes (gzip members on odd docs) -> record "
    "walk -> HTTP response body -> structural HTML->text extraction "
    "(operators/html.py: script/style/comment subtrees dropped, "
    "block tags to spaces, inline tags vanish, HTML5 entity decode "
    "THEN whitespace collapse) -> per-doc title / link count / "
    "char count / text digest. The oracle rebuilds the expected "
    "EXTRACTED text in closed form from the same template (escape "
    "-> unescape round-trips the raw text, so the recovered body "
    "must equal the whitespace-collapsed original) — any record-"
    "walk, HTTP-parse, tag-strip, entity, or whitespace bug moves "
    "the digest. This is the trafilatura tier of a 100 TB web "
    "corpus; text crosses no shuffle — only digests and counts.",
)
def warc_html_text_extract(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    import pandas as pd

    from hadoop_main_spark.operators.html import (
        decode_http_body,
        html_to_text,
    )
    from hadoop_main_spark.sources.warc import parse_warc

    media = _warc_media(spark, sf)

    def extract(batches):
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                recs = parse_warc(bytes(payload))
                rec = next(r for r in recs if r["warc_type"] == "response")
                # charset-aware decode off the Content-Type header
                # (the fixture is utf-8-default; latin-1/utf-16 paths
                # are unit-tested in test_warc_html.py)
                markup = decode_http_body(rec["body"], rec["http_content_type"])
                text, title, n_links = html_to_text(markup)
                rows.append(
                    {
                        "doc_id": mid, "title": title,
                        "n_links": n_links, "n_chars": len(text),
                        "text_md5": hashlib.md5(text.encode("utf-8")).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "n_links", "n_chars", "text_md5"]
            )

    return media.mapInPandas(
        extract,
        "doc_id long, title string, n_links long, n_chars long, text_md5 string",
    )


@query(
    "mp3_id3_tags",
    oracle="""
    SELECT doc_id AS media_id,
           'Tïtle ' || doc_id AS title,
           'Ärtist ' || (doc_id % 13) AS artist,
           CASE doc_id % 3 WHEN 0 THEN 'Gold' WHEN 1 THEN 'Sølv' ELSE 'Brönze' END
             AS album,
           TRUE AS ok
    FROM documents
    """,
    doc="ID3v2 TEXT-frame reading (id3.org public spec — the "
    "library-metadata tier beside audio_container_meta's codec "
    "tier): leading ID3v2.3 (plain frame sizes, utf-16-BOM text) and "
    "ID3v2.4 (syncsafe frame sizes, utf-8 text) tags are walked for "
    "TIT2/TPE1/TALB, with padding skip and trailing-NUL strip; even "
    "docs carry v2.4, odd docs v2.3, every value includes non-ASCII "
    "so both encodings' decode paths are value-checked. Audio "
    "frames behind the tag stay untouched — zero samples decoded.",
)
def mp3_id3_tags(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    docs = _codec_ids(spark, sf)

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                frames = {
                    "TIT2": f"Tïtle {i}",
                    "TPE1": f"Ärtist {i % 13}",
                    "TALB": ["Gold", "Sølv", "Brönze"][i % 3],
                }
                tag = MM._id3v2_build(frames, ver=4 if i % 2 == 0 else 3,
                                      pad=i % 9)
                # one dummy audio frame follows the tag (never decoded)
                payloads.append(tag + b"\xff\xfb\x90\x00" + b"\x00" * 32)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.mp3_id3_tags(media)


@query(
    "image_exif_meta",
    oracle="""
    WITH p AS (SELECT doc_id AS i FROM documents)
    SELECT i AS media_id,
      CASE WHEN i % 37 = 5 THEN 'bad'
           WHEN i % 2 = 1 THEN 'MM' ELSE 'II' END AS endian,
      CASE WHEN i % 37 = 5 THEN ''
           ELSE 'Make' || CAST(i % 5 AS VARCHAR) END AS make,
      CASE WHEN i % 37 = 5 THEN ''
           ELSE 'Model' || CAST(i % 11 AS VARCHAR) END AS model,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE i % 8 + 1 END AS BIGINT)
        AS orientation,
      CASE WHEN i % 37 = 5 THEN ''
           ELSE strftime(DATE '2024-01-01' + INTERVAL (i % 365) DAY, '%Y:%m:%d')
                || ' ' || lpad(CAST(i % 24 AS VARCHAR), 2, '0')
                || ':' || lpad(CAST((i * 7) % 60 AS VARCHAR), 2, '0')
                || ':' || lpad(CAST(i % 60 AS VARCHAR), 2, '0') END AS datetime,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE 1 END AS BIGINT) AS exposure_num,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE i % 500 + 2 END AS BIGINT)
        AS exposure_den,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE i % 80 + 10 END AS BIGINT)
        AS fnumber_num,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE 10 END AS BIGINT) AS fnumber_den,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE 100 * (i % 32 + 1) END AS BIGINT)
        AS iso,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE 16 + i % 8 END AS BIGINT) AS pix_x,
      CAST(CASE WHEN i % 37 = 5 THEN 0 ELSE 8 + i % 5 END AS BIGINT) AS pix_y
    FROM p
    """,
    doc="JPEG EXIF (APP1 / TIFF-IFD) metadata walk — the exiftool "
    "tier beside the container walks (verdict r8 #7): every doc "
    "carries a REAL JPEG (the committed T.81 encoder) with an EXIF "
    "APP1 spliced after SOI — Make/Model/Orientation/DateTime in "
    "IFD0, ExposureTime/FNumber/ISO/PixelX/YDimension in the 0x8769 "
    "sub-IFD, alternating II/MM byte order so BOTH endian walks are "
    "driver-gated — and one doc in 37 ships with NO APP1, exercising "
    "the bad-record path (endian='bad', zeros) that keeps one corrupt "
    "file from killing a 100 TB walk. The walker reuses the TIFF 6.0 "
    "IFD discipline of _tiff_decode against embedded EXIF; camera/"
    "orientation/timestamp columns surface without decoding one "
    "pixel. Oracle recomputes every field in closed form.",
)
def image_exif_meta(spark: SparkSession, sf: str) -> DataFrame:
    import datetime

    import numpy as np
    import pandas as pd

    docs = _codec_ids(spark, sf)
    base_jpeg = MM._jpeg_encode(np.zeros((8, 8), dtype=np.uint8))
    base_date = datetime.date(2024, 1, 1)

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 37 == 5:  # no APP1 at all -> bad-record path
                    payloads.append(base_jpeg)
                    continue
                d = base_date + datetime.timedelta(days=i % 365)
                dt = (f"{d:%Y:%m:%d} "
                      f"{i % 24:02d}:{(i * 7) % 60:02d}:{i % 60:02d}")
                app1 = MM._exif_app1(
                    f"Make{i % 5}",
                    f"Model{i % 11}",
                    i % 8 + 1,
                    dt,
                    (1, i % 500 + 2),
                    (i % 80 + 10, 10),
                    100 * (i % 32 + 1),
                    16 + i % 8,
                    8 + i % 5,
                    big_endian=(i % 2 == 1),
                )
                payloads.append(base_jpeg[:2] + app1 + base_jpeg[2:])
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    return MM.image_exif_meta(media)


@query(
    "html_link_graph",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 50 AS s FROM documents),
    lnk AS (SELECT doc_id, s, unnest(generate_series(1, doc_id % 5)) AS j FROM d),
    e AS (SELECT DISTINCT 'h' || s AS src,
                 'h' || ((doc_id * 7 + j * 13) % 50) AS dst
          FROM lnk WHERE 'h' || s <> 'h' || ((doc_id * 7 + j * 13) % 50)),
    nodes AS (SELECT DISTINCT v FROM (
        SELECT 'h' || s AS v FROM d
        UNION SELECT dst AS v FROM e)),
    n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY src),
    r0 AS (SELECT v, 1000000000000 // n_nodes AS r FROM nodes CROSS JOIN n),
    c1 AS (SELECT dst AS v, SUM(r0.r // deg.dg) AS cs
           FROM e JOIN deg USING (src) JOIN r0 ON r0.v = e.src GROUP BY dst),
    r1 AS (SELECT nodes.v,
                  150000000000 // n_nodes + (85 * coalesce(cs, 0)) // 100 AS r
           FROM nodes LEFT JOIN c1 USING (v) CROSS JOIN n),
    c2 AS (SELECT dst AS v, SUM(r1.r // deg.dg) AS cs
           FROM e JOIN deg USING (src) JOIN r1 ON r1.v = e.src GROUP BY dst),
    r2 AS (SELECT nodes.v,
                  150000000000 // n_nodes + (85 * coalesce(cs, 0)) // 100 AS r
           FROM nodes LEFT JOIN c2 USING (v) CROSS JOIN n)
    SELECT v AS host, CAST(r AS BIGINT) AS rank
    FROM r2 ORDER BY r DESC, v LIMIT 20
    """,
    doc="Host-level web link graph from REAL HTML outlink extraction "
    "(operators/html.py:extract_links -> operators/graph.py:"
    "pagerank_int — the web-family composition that closes the loop "
    "from markup to graph analytics): each doc's page at host "
    "h(doc_id%50) links to doc_id%5 computed targets through all "
    "THREE href attribute forms (double-quoted, single-quoted, "
    "unquoted), plus a relative href (host-filtered out identically "
    "on both sides) and two LEAK-GUARD anchors — one commented out, "
    "one inside a script string — pointing at a host the oracle does "
    "NOT model: if extraction ever leaked non-content anchors, "
    "'hleak' would enter the graph and every rank would move. Edges "
    "dedup to (src_host, dst_host); 2 integer PageRank iterations "
    "(damping 0.85, BIGINT 1e12-units, bit-identical across "
    "engines); top-20 hosts. Markup never shuffles — only (id, href) "
    "rows leave the Arrow batch.",
)
def html_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint
    from hadoop_main_spark.operators.graph import pagerank_int
    from hadoop_main_spark.operators.html import extract_links

    docs = _codec_ids(spark, sf)

    def gen(batches):
        for b in batches:
            ids = b["doc_id"].astype("int64")
            urls, markups = [], []
            for i in ids:
                i = int(i)
                anchors = []
                for j in range(1, i % 5 + 1):
                    tgt = f"https://h{(i * 7 + j * 13) % 50}.example/p{j}"
                    form = j % 3
                    if form == 0:
                        anchors.append(f'<a href="{tgt}">l{j}</a>')
                    elif form == 1:
                        anchors.append(f"<a href='{tgt}'>l{j}</a>")
                    else:
                        anchors.append(f"<a href={tgt}>l{j}</a>")
                markups.append(
                    f"<html><head><title>Page {i}</title>"
                    "<script>var x = '<a href=\"https://hleak.example/y\">';"
                    "</script></head><body>"
                    '<!-- <a href="https://hleak.example/x">c</a> -->'
                    f"<p>doc {i}</p><a href=\"/about\">about</a>"
                    + " ".join(anchors)
                    + "</body></html>"
                )
                urls.append(f"https://h{i % 50}.example/doc{i}")
            yield pd.DataFrame(
                {"page_id": ids, "page_url": urls, "markup": markups}
            )

    pages = docs.mapInPandas(
        gen, "page_id long, page_url string, markup string"
    )
    host_of = lambda c: F.regexp_extract(c, r"^https://([^/.]+)\.example/", 1)  # noqa: E731
    links = extract_links(pages)
    page_hosts = pages.select(host_of(F.col("page_url")).alias("src"), "page_id")
    edges = (
        links.join(page_hosts, "page_id")
        .select("src", host_of(F.col("href")).alias("dst"))
        .filter((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )
    # lazy-checkpointed like pagerank_top20: the iteration consumes
    # edges/nodes from many branches; both tables are host-bounded
    edges = supersede_checkpoint(
        "html_link_graph.edges", edges.localCheckpoint(eager=False)
    )
    nodes = supersede_checkpoint(
        "html_link_graph.nodes",
        page_hosts.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=False),
    )
    ranked = pagerank_int(edges, nodes, iterations=2, scale=10**12)
    return (
        ranked.select(F.col("v").alias("host"), F.col("rank").cast("bigint").alias("rank"))
        .orderBy(F.desc("rank"), F.asc("host"))
        .limit(20)
    )


@query(
    "stream_warc_roundtrip",
    oracle=_WARC_META_ORACLE,
    doc="Streaming WARC ingest ON the driver gate (the ninth §2.12 "
    "certification — the crawl-ingest resume path): the per-doc WARC "
    "payloads are written to 4 DETERMINISTIC parquet batches "
    "(media_id mod 4, mtime-ordered so the file source replays them "
    "in order) and replayed one file per trigger through the "
    "PRODUCTION streaming ingest (streaming/windows.py:"
    "warc_records_stream_parquet — the stateless ISO 28500 record "
    "walk + gzip-member inflate + chunked/gzip HTTP wire-form decode "
    "unchanged inside Structured Streaming, exactly-once parquet "
    "sink). The accumulated sink must equal the batch walk VERBATIM "
    "— warc_ingest_meta's byte-exact oracle, shared verbatim: a "
    "record lost at a batch boundary, a replayed file, or any "
    "divergence between the streaming and batch code paths moves a "
    "row. BUILD-COST NOTE: this builder EXECUTES the full streaming "
    "job at plan-build time — plans-only tooling (dump_plans, "
    "plan_lint) pays a multi-second stream execution per call. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() sinks.",
)
def stream_warc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from hadoop_main_spark.streaming.windows import warc_records_stream_parquet

    media = _warc_media(spark, sf)
    base = tempfile.mkdtemp(prefix="streamwarc_")
    src = f"{base}/src"
    os.makedirs(src)
    for k in range(4):
        part_dir = f"{base}/part{k}"
        media.filter(F.col("media_id") % 4 == k).coalesce(1).write.parquet(part_dir)
        (pf,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/q{k}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + k * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = warc_records_stream_parquet(stream, f"{base}/out", f"{base}/ckpt")
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        "media_id",
        "rec_idx",
        "warc_type",
        "target_uri",
        "content_length",
        "http_status",
        "http_content_type",
        "body_bytes",
        "body_md5",
    )


@query(
    "stream_media_features_roundtrip",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 12 + 4 AS h FROM documents),
    b AS (SELECT doc_id, h, unnest(generate_series(0, 3)) AS band FROM p),
    r AS (SELECT doc_id, band, h,
            (band * h) // 4 AS lo,
            greatest(((band + 1) * h) // 4, (band * h) // 4 + 1) AS hi
          FROM b),
    rows_ AS (SELECT doc_id, band,
                unnest(generate_series(least(lo, h - 1), least(hi, h) - 1)) AS rr
              FROM r)
    SELECT doc_id AS media_id, CAST(band AS BIGINT) AS band,
           AVG(CAST((doc_id * 31 + rr) % 256 AS DOUBLE)) / 255.0 AS gray_mean
    FROM rows_
    GROUP BY doc_id, band
    """,
    doc="Streaming MULTIMODAL ingest ON the driver gate (r9 verdict "
    "missing#3 — the media-decode ingest loop, previously "
    "stream==batch-pytest-only): per-doc gray PNGs with MIXED "
    "scanline filters (types 0-4 cycling — every defilter path incl. "
    "Paeth exercises inside Structured Streaming) replay as two "
    "mtime-ordered parity waves through the production path "
    "(streaming/windows.py:media_features_stream — the SAME "
    "Arrow-batched extract_features kernel as the batch operator, "
    "exactly-once file sink), and the accumulated per-band gray "
    "means must equal png_decode_features' closed-form oracle "
    "(pixel rows are (doc_id*31 + r) % 256). A dropped wave, a "
    "replayed file double-write, or any stream-vs-batch decoder "
    "divergence moves a row. BUILD-COST NOTE: executes the streaming "
    "job at plan-build time. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp().",
)
def stream_media_features_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd

    from hadoop_main_spark.streaming.windows import media_features_stream

    docs = _codec_ids(spark, sf)

    def gen(batches):
        import numpy as np

        for b in batches:
            ids = b["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                h, w = i % 12 + 4, i % 16 + 4
                col = ((i * 31 + np.arange(h)) % 256).astype(np.uint8)
                payloads.append(
                    MM._png_encode(
                        np.repeat(col[:, None], w, axis=1), row_filter="mixed"
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "media_id long, payload binary")
    base = tempfile.mkdtemp(prefix="streammedia_")
    src = f"{base}/src"
    os.makedirs(src)
    for w in (0, 1):
        part_dir = f"{base}/part{w}"
        media.filter(F.pmod(F.col("media_id"), F.lit(2)) == w).coalesce(
            1
        ).write.parquet(part_dir)
        (pf,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/w{w}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + w * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = media_features_stream(
        stream, f"{base}/out", f"{base}/ckpt", decoder="png", dim=4
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{base}/out")
        .select("media_id", F.posexplode("features").alias("band", "gray_mean"))
        .select(
            "media_id", F.col("band").cast("long").alias("band"), "gray_mean"
        )
    )


def _recrawl_oracle() -> str:
    """One-shot-equality oracle for recrawl_maintenance: the full
    MinHash->LSH->verify->recursive-CTE clustering replayed from
    scratch, left-joined to every document with the closed-form
    doc_id %% 3 change rule for the record class.  Built lazily to
    keep the llm_queries import at call time (misc_queries loads
    after it, but module-body import cycles stay impossible)."""
    from hadoop_main_spark.plans.llm_queries import _CC_MID, _MINHASH_PREFIX

    return (
        _MINHASH_PREFIX.replace("WITH", "WITH RECURSIVE", 1)
        + _CC_MID
        + """
 , sizes AS (SELECT doc_id AS cid, canonical_id,
             COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
             FROM comp)
SELECT d.doc_id,
       CASE WHEN d.doc_id % 3 = 0 THEN 'response' ELSE 'revisit' END
         AS warc_type,
       COALESCE(s.canonical_id, d.doc_id) AS canonical_id,
       CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size
FROM documents d LEFT JOIN sizes s ON s.cid = d.doc_id
ORDER BY doc_id
"""
    )


@query(
    "recrawl_maintenance",
    oracle=lambda sf_dir: _recrawl_oracle(),
    doc="RECRAWL CAPSTONE (verdict r10 next-round #5 — the operational "
    "loop a 100 TB crawl actually runs, composing the now-complete "
    "pieces end to end): crawl 1's per-URI digests commit as a "
    "versioned snapshot (sources/versioned.py), the recrawl (every "
    "3rd doc changed) writes storage-deduped WARCs through "
    "revisit_warc_media (ISO 28500 §6.7), the records parse back "
    "through warc_records, and THE PARSED RECORD CLASS ITSELF defines "
    "the ingest wave: docs that came back as full ``response`` "
    "records are the changed set, their near-dup pairs graft onto "
    "the unchanged corpus's prior clustering via "
    "connected_components_incremental (star collapse, O(log d_new) "
    "re-convergence). Output per document: the record class it was "
    "stored as, its cluster canonical id, and the cluster size — "
    "which must equal the ONE-SHOT clustering of the whole corpus "
    "verbatim (the incremental path may not lose a merge or a "
    "singleton), with the record class matching the closed-form "
    "change rule. A wrong revisit decision corrupts the wave and "
    "moves cluster rows — the composition, not just the pieces, is "
    "what's verified. LOCAL-MODE CONTRACT: tempfile.mkdtemp() "
    "snapshot dir.",
)
def recrawl_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators import dedup as D

    rec = _recrawl_records(spark, sf).select(
        F.col("media_id").alias("doc_id"), "warc_type"
    )
    # rec feeds TWO consumers (the changed-set filter defining the
    # ingest wave, and the final record-class join) — without a
    # barrier the whole snapshot->recrawl->revisit-write->parse chain
    # (three Python kernel stages) executes once PER consumer
    # (optimization r12, verdict-r11 #3; the decontaminate pattern).
    # Lazy: the chain still runs fresh inside every timed action.
    rec = rec.localCheckpoint(eager=False)
    docs = t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", min_est_jaccard=0.5
    ).localCheckpoint()  # pin iteration input without cache-manager
    # registration (the cc_incremental_resolution discipline)
    # the wave comes OUT OF THE PARSED WARC: a doc stored as a full
    # response record changed content and re-enters clustering
    ch = rec.filter(F.col("warc_type") == "response").select("doc_id")
    ca = ch.select(F.col("doc_id").alias("id_a"), F.lit(True).alias("__ca"))
    cb = ch.select(F.col("doc_id").alias("id_b"), F.lit(True).alias("__cb"))
    marked = pairs.join(ca, "id_a", "left").join(cb, "id_b", "left")
    old = marked.filter(
        F.col("__ca").isNull() & F.col("__cb").isNull()
    ).select("id_a", "id_b")
    wave = marked.filter(
        F.col("__ca").isNotNull() | F.col("__cb").isNotNull()
    ).select("id_a", "id_b")
    labels0 = D.connected_components(old)
    comp = D.connected_components_incremental(labels0, wave).withColumnRenamed(
        "id", "doc_id"
    )
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    labeled = comp.join(sizes, "component")
    return (
        docs.select("doc_id")
        .join(rec, "doc_id")
        .join(labeled, "doc_id", "left")
        .select(
            "doc_id",
            "warc_type",
            F.coalesce(F.col("component"), F.col("doc_id")).alias(
                "canonical_id"
            ),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("bigint")
            .alias("cluster_size"),
        )
        # LAZY checkpoint before the sort: the range-sampling pass
        # otherwise re-executes the record-class + cluster joins
        # (optimization r12, the warc_revisit_dedup note)
        .localCheckpoint(eager=False)
        .orderBy("doc_id")
    )
