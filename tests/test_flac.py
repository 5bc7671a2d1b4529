"""FLAC codec: encoder-path roundtrips plus hand-crafted frames for
the decode-only features (LPC, stereo decorrelation, wasted bits,
rice2/partitions/escape) the fixed-predictor encoder never emits."""

import hashlib

import numpy as np
import pytest

from hadoop_main_spark.operators import flac as FL


def test_flac_roundtrip_mono_stereo_extremes():
    rng = np.random.default_rng(7)
    n = 6000
    t = np.arange(n)
    mono = (3000 * np.sin(t / 50) + rng.integers(-200, 200, n)).astype(np.int16)
    dec, rate = FL.decode_flac(FL.encode_flac(mono, 8000, block_size=4096))
    assert rate == 8000 and (dec[:, 0] == mono).all()
    st = np.stack([mono, (mono // 2 + 17).astype(np.int16)], axis=1)
    dec2, rate2 = FL.decode_flac(FL.encode_flac(st, 44100, block_size=999))
    assert rate2 == 44100 and (dec2 == st).all()
    ext = np.array([-32768, 32767, 0, -1, 1] * 50, dtype=np.int16)
    d3, _ = FL.decode_flac(FL.encode_flac(ext, 8000, block_size=64))
    assert (d3[:, 0] == ext).all()


def test_flac_malformed_raises():
    blob = FL.encode_flac(np.arange(500, dtype=np.int16), 8000)
    for cut in (3, 10, 40, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            FL.decode_flac(blob[:cut])
    # bit flips anywhere surface as ValueError (which one depends on
    # where the corruption lands: CRC mismatch, lost sync, exhausted
    # bitstream, MD5 mismatch — all are the same bad-record contract)
    for at in (20, 60, 100, len(blob) - 40):
        bad = bytearray(blob)
        bad[at] ^= 0xFF
        with pytest.raises(ValueError):
            FL.decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        FL.decode_flac(b"fLaX" + blob[4:])


def _stream(frames_bits, samples, rate=8000, ch=1):
    """Assemble a FLAC stream from pre-built frame payload writers."""
    out = bytearray(FL.FLAC_MAGIC)
    si = FL._BitWriter()
    si.write(16, 16); si.write(65535, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(ch - 1, 3); si.write(15, 5)
    si.write(samples.shape[0], 36)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    out += b"\x80\x00\x00\x22" + si.bytes() + md5
    for head, body in frames_bits:
        frame = head + body
        out += frame + FL._crc16(frame).to_bytes(2, "big")
    return bytes(out)


def _frame_head(frame_no, bs, chasn, ch_code_bits=4):
    w = FL._BitWriter()
    w.write(0b11111111111110, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)   # 16-bit blocksize at end
    w.write(0, 4)   # rate from STREAMINFO
    w.write(chasn, 4)
    w.write(4, 3)   # 16 bps
    w.write(0, 1)
    w.align()
    head = bytes(w.buf) + FL._utf8_coded(frame_no) + (bs - 1).to_bytes(2, "big")
    return head + bytes([FL._crc8(head)])


def _verbatim_sub(w, x, bits=16):
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    for v in x:
        w.write(int(v), bits)


def test_flac_decodes_lpc_subframe():
    """Hand-built LPC frame: order 2, coefs [2, -1] with shift 0 ==
    the fixed-order-2 predictor, so the expected samples are known."""
    bs = 32
    x = (np.arange(bs) ** 2 % 97).astype(np.int64) - 40
    res = np.diff(x, 2)  # fixed-2 residual == LPC([2,-1], shift 0)
    w = FL._BitWriter()
    w.write(0, 1); w.write(32 + 1, 6); w.write(0, 1)  # LPC order 2 (type 33)
    for i in range(2):
        w.write(int(x[i]), 16)
    w.write(14, 4)   # precision 15 bits
    w.write(0, 5)    # shift 0
    w.write(2, 15)   # coef 2
    w.write(-1, 15)  # coef -1
    w.write(0, 2); w.write(0, 4)  # rice 4-bit, partition order 0
    w.write(6, 4)
    FL._rice_encode(w, res, 6)
    w.align()
    blob = _stream([(_frame_head(0, bs, 0), w.bytes())],
                   x.astype(np.int16)[:, None].reshape(bs, 1))
    dec, _ = FL.decode_flac(blob)
    assert (dec[:, 0] == x).all()


@pytest.mark.parametrize("chasn", [8, 9, 10])
def test_flac_decodes_stereo_decorrelation(chasn):
    bs = 24
    rng = np.random.default_rng(chasn)
    left = rng.integers(-5000, 5000, bs).astype(np.int64)
    right = rng.integers(-5000, 5000, bs).astype(np.int64)
    side = left - right
    w = FL._BitWriter()
    if chasn == 8:    # left/side
        _verbatim_sub(w, left, 16); _verbatim_sub(w, side, 17)
    elif chasn == 9:  # side/right
        _verbatim_sub(w, side, 17); _verbatim_sub(w, right, 16)
    else:             # mid/side
        mid = (left + right) >> 1
        _verbatim_sub(w, mid, 16); _verbatim_sub(w, side, 17)
    w.align()
    want = np.stack([left, right], axis=1).astype(np.int16)
    blob = _stream([(_frame_head(0, bs, chasn), w.bytes())], want, ch=2)
    dec, _ = FL.decode_flac(blob)
    assert (dec == want).all()


def test_flac_decodes_wasted_bits_rice2_partitions_escape():
    bs = 16
    x = (np.arange(bs, dtype=np.int64) - 8) * 4  # all multiples of 4
    w = FL._BitWriter()
    # constant subframe with 2 wasted bits
    w.write(0, 1); w.write(0, 6); w.write(1, 1)  # wasted flag
    w.write(1, 1)  # unary 1 -> wasted = 2
    w.write(7 >> 2, 14)  # constant value 1 (14 effective bits), <<2 = 4
    w.align()
    want = np.full((bs, 1), 4, dtype=np.int16)
    blob = _stream([(_frame_head(0, bs, 0), w.bytes())], want)
    dec, _ = FL.decode_flac(blob)
    assert (dec == want).all()
    # verbatim-order-0 FIXED with rice2 (5-bit params), partition order 2,
    # one partition escaped to raw 6-bit storage
    w2 = FL._BitWriter()
    w2.write(0, 1); w2.write(8, 6); w2.write(0, 1)  # FIXED order 0
    w2.write(1, 2)   # residual method 1 = rice2
    w2.write(2, 4)   # partition order 2 -> 4 partitions of 4
    for part in range(4):
        if part == 1:
            w2.write(31, 5)  # escape
            w2.write(6, 5)   # 6-bit raw residuals
            for v in x[4:8]:
                w2.write(int(v), 6)
        else:
            w2.write(3, 5)
            FL._rice_encode(w2, x[part * 4 : part * 4 + 4], 3)
    w2.align()
    want2 = x.astype(np.int16)[:, None]
    blob2 = _stream([(_frame_head(0, bs, 0), w2.bytes())], want2)
    dec2, _ = FL.decode_flac(blob2)
    assert (dec2 == want2).all()


def test_flac_encode_validates_header_field_widths():
    """block_size rides in 16-bit header fields and sample_rate in the
    20-bit STREAMINFO field: out-of-range values must raise ValueError
    up front, never OverflowError or a silently truncated stream
    (advice r6)."""
    s = np.arange(64, dtype=np.int16)
    for bs in (0, 15, 65536, 1 << 20):
        with pytest.raises(ValueError, match="block_size"):
            FL.encode_flac(s, 8000, block_size=bs)
    for sr in (0, -1, 1 << 20, 1 << 24):
        with pytest.raises(ValueError, match="sample_rate"):
            FL.encode_flac(s, sr)
    # boundary values remain valid and roundtrip
    dec, rate = FL.decode_flac(FL.encode_flac(s, (1 << 20) - 1, block_size=16))
    assert rate == (1 << 20) - 1 and (dec[:, 0] == s).all()


def test_flac_encoder_lpc_and_stereo_decorrelation():
    """Round-7 encoder upgrades: LPC subframes (Levinson-Durbin,
    quantized coefficients) and per-frame stereo channel-assignment
    selection must (a) roundtrip bit-exact, (b) actually be CHOSEN on
    correlated material, and (c) compress it well below the fixed-
    predictor-only floor (~0.6x PCM per NOTES r6)."""
    rng = np.random.default_rng(3)
    n = 48000
    t = np.arange(n)
    base = (8000 * np.sin(t / 80.0) + 3000 * np.sin(t / 7.0)).astype(np.int64)
    L = (base + rng.integers(-50, 50, n)).astype(np.int16)
    R = (base + rng.integers(-50, 50, n) + 100).astype(np.int16)
    st = np.stack([L, R], axis=1)
    stats: dict = {}
    blob = FL.encode_flac(st, 44100, _stats=stats)
    dec, rate = FL.decode_flac(blob)
    assert rate == 44100 and (dec == st).all()
    assert "lpc" in stats["kinds"], "LPC never chosen on a smooth sweep"
    assert any(c in (8, 9, 10) for c in stats["chasn"]), (
        "no decorrelated frame chosen on near-identical channels"
    )
    assert len(blob) < 0.55 * st.size * 2, f"ratio {len(blob)/(st.size*2):.3f}"
    # white noise: the exact-cost planner must fall back (verbatim /
    # fixed-0) and never blow the stream up
    noise = rng.integers(-32768, 32768, n).astype(np.int16)
    b3 = FL.decode_flac(FL.encode_flac(noise, 8000))[0]
    assert (b3[:, 0] == noise).all()
    # anti-correlated stereo: side channel is WIDER than either input;
    # the planner should keep channels independent, and the roundtrip
    # must stay exact at the 17-bit side extremes either way
    ext = np.array([[-32768, 32767], [32767, -32768], [0, -1], [1, 0]] * 64,
                   dtype=np.int16)
    d4, _ = FL.decode_flac(FL.encode_flac(ext, 8000, block_size=64))
    assert (d4 == ext).all()


def test_flac_encoder_rice_partitions():
    """Encode-side Rice partitions (the decoder has read them since
    r6): a block with an in-block quiet->loud transition must choose
    partition order > 0 with per-partition k adapting to each half,
    beat the single-partition cost, and still roundtrip bit-exact."""
    rng = np.random.default_rng(5)
    x = np.concatenate(
        [rng.integers(-8, 8, 2048), rng.integers(-4000, 4000, 2048)]
    ).astype(np.int16)
    d, _ = FL.decode_flac(FL.encode_flac(x, 8000, block_size=4096))
    assert (d[:, 0] == x).all()
    plan = FL._plan_subframe(x.astype(np.int64), 16)
    assert plan["po"] > 0, "partitions never chosen on a non-stationary block"
    ks = plan["ks"]
    assert max(ks) - min(ks) >= 4, f"per-partition k did not adapt: {ks}"
    res = x.astype(np.int64)
    order = plan["order"] if plan["kind"] == "fixed" else 0
    for _ in range(order):
        res = np.diff(res)
    if plan["kind"] == "fixed":
        c0 = FL._rice_plan(res, 4096, order, max_po=0)[0]
        cn = FL._rice_plan(res, 4096, order)[0]
        assert cn < c0
