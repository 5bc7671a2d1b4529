"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` payload columns with a
typed metadata struct. The Spark-side machinery — schema,
partition-friendly layout, Arrow-batched UDF signatures, batch
shapes — is real and tested. Decoders: ``'ppm'`` is a REAL pure-
numpy pipeline for uncompressed P6 images (header parse, pixel
reshape, nearest-neighbor resize, re-encode, band features);
``'png'`` is a REAL stdlib-zlib + numpy PNG codec (chunk walk with
CRC verify, IDAT inflate, all five scanline filters, palette
expansion — 8-bit non-interlaced); ``'wav'`` the real RIFF/PCM16
audio path; ``'stub'`` is a deterministic fake for arbitrary blobs;
codec formats whose libraries are absent here (JPEG/opus/mp3) raise
a clearly-marked NotImplementedError — plug one into the same
mapInPandas signature.

Scale notes: payloads dominate row size — keep them in their own
column (Parquet stores them contiguously), never in the shuffle key,
and resize/feature-extract *before* any wide operation so shuffles
move features (KBs) not media (MBs). `mapInPandas` keeps the decode
batch-parallel with Arrow transfer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_format", StringType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in binary blob with real
    per-row variance), metadata derived deterministically."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("stub/raw").alias("meta_format"),
        (F.col("n_chars") % 640 + 16).alias("meta_width"),
        (F.col("n_chars") % 480 + 16).alias("meta_height"),
    )


# --- real decoder for the uncompressed PPM (P6) image format -----------------
# Pure numpy — no media libraries needed, so this path is REAL, not a
# stub: header parse, pixel-buffer reshape, nearest-neighbor resample,
# re-encode. Codec formats (JPEG/PNG/...) still raise NotImplementedError.


def _ppm_decode(p: bytes):
    """Parse a binary P6 PPM (maxval ≤ 255) into an (h, w, 3) uint8
    array. Header = 'P6', width, height, maxval tokens separated by
    whitespace, with '#' comments allowed between tokens."""
    import numpy as np

    if not p.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    toks, i, n = [], 2, len(p)
    while len(toks) < 3:
        while i < n and p[i : i + 1].isspace():
            i += 1
        if i < n and p[i : i + 1] == b"#":
            while i < n and p[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not p[j : j + 1].isspace():
            j += 1
        toks.append(int(p[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pix = np.frombuffer(p, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3)


def _ppm_encode(arr) -> bytes:
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_resize(p: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample (index-mapped, the same policy as the
    stub byte resample and the audio sample mapper)."""
    import numpy as np

    arr = _ppm_decode(p)
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return _ppm_encode(np.ascontiguousarray(arr[rows][:, cols]))


def _image_band_features(arr, dim: int) -> list[float]:
    """Shared pixel-feature kernel for all REAL image decoders (PPM,
    PNG): split the image into ``dim`` horizontal bands, each band
    contributes its mean gray level in [0, 1]. Accepts (h, w) gray or
    (h, w, ch) arrays."""
    import numpy as np

    arr = arr.astype(np.float64)
    h = arr.shape[0]
    out = []
    for b in range(dim):
        lo, hi = (b * h) // dim, max(((b + 1) * h) // dim, (b * h) // dim + 1)
        band = arr[min(lo, h - 1) : min(hi, h)]
        out.append(float(band.mean()) / 255.0 if band.size else 0.0)
    return out


def _ppm_features(p: bytes, dim: int) -> list[float]:
    """Real pixel features over P6 payloads (see _image_band_features).
    Malformed payloads take the zeros bad-record path (same policy as
    _wav_features: one bad row must not kill a 100 TB feature pass)."""
    try:
        arr = _ppm_decode(p)
    except ValueError:
        return [0.0] * dim
    return _image_band_features(arr, dim)


# --- real decoder for the PNG image format (stdlib zlib + numpy) -------------
# PNG is DEFLATE (stdlib zlib) over per-scanline filtered bytes — no
# external media library needed, so this path is REAL like PPM/WAV:
# chunk walk with CRC verify, IDAT concat + inflate, per-row defilter
# (all five filter types 0-4 per the PNG spec §9), palette expansion.
# 8-bit depth, color types 0/2/3/4/6, non-interlaced. 16-bit and Adam7
# raise ValueError (bad-record path downstream). JPEG/opus/mp3 remain
# honestly NotImplementedError (their codecs are not in this container).


def _png_paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): nearest of left/up/up-left
    to the linear estimate a + b - c, ties broken left, up, up-left."""
    pth = a + b - c
    pa, pb, pc = abs(pth - a), abs(pth - b), abs(pth - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels per pixel (3 = palette, 1 index byte/pixel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_decode(p: bytes):
    """Parse an 8-bit non-interlaced PNG into an (h, w, ch) uint8 array
    (ch = 1 gray, 2 gray+alpha, 3 RGB — palette expanded, 4 RGBA).
    Chunk CRCs are verified; multiple IDAT chunks are concatenated
    before one inflate, as the spec requires."""
    import zlib

    import numpy as np

    if not p.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i, n = len(_PNG_SIG), len(p)
    w = h = depth = ctype = interlace = None
    idat, plte = [], None
    while i + 8 <= n:
        size = int.from_bytes(p[i : i + 4], "big")
        cid = p[i + 4 : i + 8]
        body = p[i + 8 : i + 8 + size]
        crc = int.from_bytes(p[i + 8 + size : i + 12 + size], "big")
        if zlib.crc32(cid + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {cid!r} chunk")
        if cid == b"IHDR":
            if size != 13:
                raise ValueError("malformed IHDR")
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    if depth != 8:
        raise ValueError(f"{depth}-bit PNG not supported (8-bit only)")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette image missing PLTE chunk")
    ch = _PNG_CHANNELS[ctype]
    try:
        inflated = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # normalize to ValueError so the shared bad-record path catches it
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    raw = np.frombuffer(inflated, dtype=np.uint8)
    stride = w * ch + 1  # 1 filter byte + w*ch sample bytes per scanline
    if raw.size != h * stride:
        raise ValueError("decompressed size mismatch")
    lines = raw.reshape(h, stride)
    recon = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    bpp = ch  # bytes per pixel at 8-bit depth
    for r in range(h):
        ft, row = int(lines[r, 0]), lines[r, 1:]
        if ft == 0:  # None
            rec = row.copy()
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            rec = row.copy()
            for off in range(bpp):
                # uint8 cumsum wraps mod 256 — exactly the spec arithmetic
                rec[off::bpp] = np.cumsum(row[off::bpp], dtype=np.uint8)
        elif ft == 2:  # Up
            rec = row + prev  # uint8 add wraps mod 256
        elif ft == 3:  # Average: left dependence is inherently sequential
            rec = np.empty_like(row)
            for x in range(row.size):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth: sequential per byte
            rec = np.empty_like(row)
            for x in range(row.size):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + _png_paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        recon[r] = rec
        prev = rec
    if ctype == 3:
        if int(recon.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        return plte[recon.reshape(h, w)]
    return recon.reshape(h, w, ch)


def _png_encode(arr, row_filter: str = "none") -> bytes:
    """Re-encode an (h, w) gray or (h, w, ch) uint8 array as an 8-bit
    PNG (color type 0/4/2/6 by channel count). ``row_filter='mixed'``
    cycles filter types 0-4 across scanlines so a decode of the output
    exercises every defilter path; ``'none'`` writes filter 0 rows."""
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.int64)
    bpp = ch
    out_rows = []
    for r in range(h):
        cur = flat[r]
        up = flat[r - 1] if r else np.zeros_like(cur)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), up[:-bpp]])
        ft = r % 5 if row_filter == "mixed" else 0
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - up
        elif ft == 3:
            filt = cur - (left + up) // 2
        else:  # Paeth
            pred = np.array(
                [_png_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, ul)],
                dtype=np.int64,
            )
            filt = cur - pred
        out_rows.append(bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + cid
            + body
            + (zlib.crc32(cid + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    idat = zlib.compress(b"".join(out_rows))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _png_resize(p: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a PNG payload (same index-mapping
    policy as _ppm_resize), re-encoded at the same channel count
    (palette images come back as RGB — the decode already expanded)."""
    import numpy as np

    arr = _png_decode(p)
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return _png_encode(np.ascontiguousarray(arr[rows][:, cols]))


def _png_features(p: bytes, dim: int) -> list[float]:
    """Real pixel features over PNG payloads: the shared per-band gray
    means (_image_band_features) over the COLOR channels only — alpha
    (color types 4/6) is metadata, not luminance, so it is dropped.
    Malformed payloads take the zeros bad-record path."""
    try:
        arr = _png_decode(p)
    except ValueError:
        return [0.0] * dim
    if arr.shape[2] in (2, 4):
        arr = arr[:, :, : arr.shape[2] - 1]
    return _image_band_features(arr, dim)


# --- real decoder for the uncompressed WAV (RIFF PCM16) audio format ---------
# Pure numpy, same precedent as PPM: chunk walk, int16 frame reshape,
# nearest-sample rate conversion, re-encode. Compressed codecs
# (opus/mp3/aac) still raise NotImplementedError.


def _wav_decode(p: bytes):
    """Parse a RIFF/WAVE container with 16-bit PCM into
    (sample_rate, channels, frames int16 array of shape (n, ch)).
    Walks chunks (word-aligned) so extra chunks (LIST, fact) are
    skipped like any real parser does."""
    import numpy as np

    if len(p) < 12 or p[0:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(p)
    rate = channels = bits = None
    data = None
    while i + 8 <= n:
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        body = p[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise ValueError(f"compressed WAV (format {fmt}) not supported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"{bits}-bit PCM not supported (16-bit only)")
    if channels < 1:
        raise ValueError("invalid channel count")
    frames = len(data) // (2 * channels)
    pcm = np.frombuffer(data, dtype="<i2", count=frames * channels)
    return rate, channels, pcm.reshape(frames, channels)


def _wav_encode(rate: int, samples) -> bytes:
    """Re-encode an (n, ch) int16 frame array as a minimal PCM16 WAV."""
    import numpy as np

    frames, channels = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block = 2 * channels
    fmt = (
        b"fmt \x10\x00\x00\x00\x01\x00"
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _wav_resample_payload(p: bytes, dst_rate: int):
    """Rate-convert a PCM16 WAV by nearest-sample index mapping (the
    same policy as the PPM resize and the stub resampler), vectorized
    per payload. Returns (n_frames_in, n_frames_out, new payload)."""
    import numpy as np

    rate, channels, pcm = _wav_decode(p)
    n_in = pcm.shape[0]
    n_out = (n_in * dst_rate) // rate if rate else 0
    idx = (np.arange(n_out) * n_in) // max(n_out, 1)
    out = pcm[idx] if n_out else pcm[:0]
    return n_in, n_out, _wav_encode(dst_rate, out)


def _wav_features(p: bytes, dim: int) -> list[float]:
    """Real audio features: ``dim`` time windows, each contributing
    its mean absolute amplitude in [0, 1] (channel-averaged) — the
    audio analog of the PPM band means. Malformed payloads take the
    zeros bad-record path (same policy as audio_resample: one bad
    row must not kill a 100 TB feature pass)."""
    import numpy as np

    try:
        _, _, pcm = _wav_decode(p)
    except ValueError:
        return [0.0] * dim
    x = np.abs(pcm.astype(np.float64)).mean(axis=1) if pcm.size else pcm[:, 0]
    n = x.shape[0]
    out = []
    for b in range(dim):
        lo, hi = (b * n) // dim, max(((b + 1) * n) // dim, (b * n) // dim + 1)
        win = x[min(lo, max(n - 1, 0)) : min(hi, n)]
        out.append(float(win.mean()) / 32768.0 if win.size else 0.0)
    return out


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'embedding' from the payload bytes: md5-seeded
    values in [0,1). Stands in for a real decode→model pipeline."""
    out = []
    h = payload
    for i in range(dim):
        h = hashlib.md5(h + bytes([i & 0xFF])).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def extract_features(
    media: DataFrame, decoder: str = "stub", dim: int = 8, batch_check: bool = False
) -> DataFrame:
    """Decode + feature-extract each payload via Arrow-batched
    mapInPandas. ``decoder='stub'`` produces deterministic fake
    features; ``decoder='ppm'`` REALLY decodes binary P6 payloads
    (pure numpy, see _ppm_decode) and emits per-band gray means; any
    other name requires decode libraries absent here.
    """
    if decoder == "stub":
        feat = _stub_features
    elif decoder == "ppm":
        feat = _ppm_features
    elif decoder == "png":
        feat = _png_features
    elif decoder == "wav":
        feat = _wav_features
    else:
        raise NotImplementedError(
            f"decoder '{decoder}' needs media libraries not present in this "
            "environment; 'ppm'/'png'/'wav' are the real no-library paths, "
            "'stub' the fake"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if batch_check and len(b) == 0:
                continue
            # NULL payload = bad record: normalize to b'' (zeros
            # policy) instead of a TypeError killing the task
            payloads = b["payload"].map(lambda p: bytes(p) if p is not None else b"")
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "features": payloads.map(lambda p: feat(p, dim)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize(media: DataFrame, width: int, height: int, decoder: str = "stub") -> DataFrame:
    """Resize as a real Arrow-batched pass: decode -> resample ->
    re-encode per payload inside mapInPandas (batch shape and schema
    are the production ones). ``decoder='ppm'`` is a REAL pipeline
    for binary P6 payloads (numpy header parse + nearest-neighbor
    resample + re-encode); ``decoder='stub'`` keeps the deterministic
    byte resample for arbitrary blobs; codec formats raise."""
    target = width * height

    def _stub_resize(p: bytes) -> bytes:
        # deterministic fake resample: stretch/shrink bytes to the
        # target pixel count by index mapping (stands in for a codec)
        if not p:
            return b"\x00" * target
        n = len(p)
        return bytes(p[(i * n) // target] for i in range(target))

    if decoder == "stub":
        payload_fn = _stub_resize
    elif decoder == "ppm":
        payload_fn = lambda p: _ppm_resize(p, width, height)  # noqa: E731
    elif decoder == "png":
        payload_fn = lambda p: _png_resize(p, width, height)  # noqa: E731
    else:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "'ppm'/'png' are the real no-library paths, 'stub' the fake"
        )

    out_schema = media.schema

    def _safe(p) -> bytes:
        # NULL payload = bad record -> empty payload out; a malformed
        # payload under a REAL decoder likewise must not kill the task
        # (the extract_features/audio_resample zeros policy)
        if p is None:
            return b""
        try:
            return payload_fn(bytes(p))
        except ValueError:
            return b""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b["payload"] = b["payload"].map(_safe)
            b["meta_width"] = width
            b["meta_height"] = height
            yield b

    return media.mapInPandas(run, out_schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only variant (no payload rewrite) — kept for cheap
    schema tests."""
    return media.withColumn("meta_width", F.lit(width).cast("long")).withColumn(
        "meta_height", F.lit(height).cast("long")
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (real decoder would attach the frame bytes).
    Demonstrates the 1→N explode shape feature pipelines need."""
    frames = F.sequence(F.lit(0), (F.col("meta_width") % 5 + 1))  # fake frame count
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .filter(F.col("frame_idx") % every_n == 0)
    )


AUDIO_SCHEMA = "media_id long, n_samples_in long, n_samples_out long, out_digest string"


def audio_resample(
    media: DataFrame, src_rate: int = 44100, dst_rate: int = 16000, decoder: str = "stub"
) -> DataFrame:
    """Audio resampling plumbing: decode payload to PCM samples,
    rate-convert, report sample counts + output digest — the whole
    pass Arrow-batched in mapInPandas (one Python worker round trip
    per batch, never per row). ``decoder='wav'`` is a REAL pipeline
    for RIFF/PCM16 payloads (numpy chunk walk + nearest-sample rate
    conversion + re-encode; the source rate comes from the header,
    ``src_rate`` is ignored); ``decoder='stub'`` reads raw bytes as
    headerless int16 PCM at ``src_rate``; compressed codecs raise."""
    if decoder not in ("stub", "wav"):
        raise NotImplementedError(
            "compressed audio codecs are not available in this environment; "
            "'wav' is the real no-library path, 'stub' the headerless fake"
        )
    import hashlib

    def _resample(p) -> tuple[int, int, str]:
        # null payload = bad record: report zeros instead of killing
        # the task (one bad row must not fail a 100 TB pass)
        p = bytes(p) if p is not None else b""
        if decoder == "wav":
            try:
                n_in, n_out, enc = _wav_resample_payload(p, dst_rate)
            except ValueError:
                # malformed payload = bad record, same zeros policy
                return 0, 0, hashlib.md5(b"").hexdigest()
            return n_in, n_out, hashlib.md5(enc).hexdigest()
        n_in = len(p) // 2
        n_out = (n_in * dst_rate) // src_rate
        # index-mapped nearest-sample pick (stands in for a filter bank)
        out = bytearray()
        for i in range(n_out):
            j = (i * n_in) // max(n_out, 1)
            out += p[2 * j : 2 * j + 2]
        return n_in, n_out, hashlib.md5(bytes(out)).hexdigest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            trip = b["payload"].map(_resample)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_samples_in": trip.map(lambda t: t[0]).astype("int64"),
                    "n_samples_out": trip.map(lambda t: t[1]).astype("int64"),
                    "out_digest": trip.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_SCHEMA)
