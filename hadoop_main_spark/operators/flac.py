"""REAL FLAC codec (pure Python + numpy; no external libraries).

Per the public FLAC format specification (xiph.org / RFC 9639):
"fLaC" magic + STREAMINFO metadata block, frames with sync-coded
headers (UTF-8-coded frame numbers, CRC-8), per-channel subframes
(CONSTANT / VERBATIM / FIXED order 0-4 / LPC up to order 32, wasted
bits), Rice-coded residuals (4- and 5-bit parameter variants,
partition orders, verbatim-escape), inter-channel decorrelation
(left-side / right-side / mid-side), and frame CRC-16.

DECODER: full support for the 16-bit subset above — enough to read
real-world 16-bit FLAC files. ENCODER: 16-bit, per-block exact-bit-
cost subframe planning across CONSTANT / VERBATIM / FIXED order 0-4
/ LPC orders 2,4,8 (Levinson-Durbin with error-feedback 14-bit
coefficient quantization), per-frame stereo-mode selection
(independent / left-side / side-right / mid-side), and Rice
partition orders 0-6 with per-partition parameters — spec-valid
output any FLAC player accepts (correlated stereo ~0.47x PCM).

Everything is ValueError-normalized for the bad-record handlers,
like the other codecs in operators/multimodal.py.
"""

from __future__ import annotations

FLAC_MAGIC = b"fLaC"

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("flac: bitstream exhausted")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("flac: runaway unary code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def tell_bytes(self) -> int:
        return self.byte + (1 if self.bit else 0)


def _utf8_coded(value: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers (like
    UTF-8 but extended to 7 bytes / 36 payload bits)."""
    if value < 0x80:
        return bytes([value])
    for n, lead, cap in (
        (2, 0xC0, 11), (3, 0xE0, 16), (4, 0xF0, 21),
        (5, 0xF8, 26), (6, 0xFC, 31), (7, 0xFE, 36),
    ):
        if value < (1 << cap):
            first = 0xFE if n == 7 else lead | (value >> (6 * (n - 1)))
            out = [first]
            for i in range(n - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("flac: frame number too large")


def _read_utf8_coded(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad UTF-8-coded number")
    value = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        value = (value << 6) | (c & 0x3F)
    return value


#: block-size-bits table (frame header): index -> samples (0 = reserved,
#: 6/7 = get from end of header 8/16 bits)
_BLOCKSIZES = [0, 192, 576, 1152, 2304, 4608, -8, -16,
               256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
_SAMPLE_RATES = [0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
                 32000, 44100, 48000, 96000, -8, -16, -160, None]
_SAMPLE_SIZES = [0, 8, 12, None, 16, 20, 24, 32]

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# --- encode -------------------------------------------------------------------


def _rice_encode(w: "_BitWriter", res, k: int) -> None:
    for v in res:
        z = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
        w.write_unary(z >> k)
        w.write(z, k)


def _rice_plan(res, bs: int, order: int, max_po: int = 6) -> tuple[int, int, list[int]]:
    """Exact-cost Rice partition search: returns (total residual-coding
    bits INCLUDING the 2-bit method + 4-bit partition-order + per-
    partition 4-bit k fields, partition order, per-partition k list).

    Partition order po splits the block into 2^po partitions of
    bs >> po samples (the first loses the ``order`` warmup samples);
    per-partition k adapts to non-stationary residuals — the encode-
    side half of the decoder's existing partition support. k is
    searched over 0..14 (15 is the 4-bit escape code) with prefix sums
    per k, so any partition slice costs O(1) to evaluate."""
    import numpy as np

    z = res.astype(np.int64)
    z = (z << 1) ^ (z >> 63)
    pref = [np.concatenate(([0], np.cumsum(z >> k))) for k in range(15)]

    def slice_best(lo: int, hi: int) -> tuple[int, int]:
        n = hi - lo
        best_k, best_c = 0, None
        for k in range(15):
            c = int(pref[k][hi] - pref[k][lo]) + n * (k + 1)
            if best_c is None or c < best_c:
                best_k, best_c = k, c
        return best_k, best_c or 0

    best = None
    for po in range(0, max_po + 1):
        if bs % (1 << po):
            break  # higher orders cannot divide bs either
        step = bs >> po
        if step <= order:
            # RFC 9639 requires (block size >> partition order) to be
            # STRICTLY larger than the predictor order — step == order
            # would make the first partition zero samples, which strict
            # decoders reject even though lenient ones tolerate it.
            break
        total, ks, pos = 0, [], 0
        for part in range(1 << po):
            size = step - order if part == 0 else step
            k, c = slice_best(pos, pos + size)
            total += 4 + c  # 4-bit k field + payload
            ks.append(k)
            pos += size
        cost = 2 + 4 + total  # method + partition-order fields
        if best is None or cost < best[0]:
            best = (cost, po, ks)
    assert best is not None
    return best


def _lpc_coefs(x, order: int):
    """Levinson-Durbin over the Welch-windowed autocorrelation:
    float reflection recursion, returning float LPC coefficients
    a[0..order-1] with x[n] ~ sum a[j] * x[n-1-j], or None when the
    signal has no usable correlation (constant / too short / unstable
    recursion)."""
    import numpy as np

    m = len(x)
    if m <= order * 2:
        return None
    w = x.astype(np.float64)
    # Welch window tapers block edges so the autocorrelation is not
    # biased by the rectangular cut (the standard pre-LPC window)
    t = (np.arange(m) - (m - 1) / 2.0) / ((m + 1) / 2.0)
    w = w * (1.0 - t * t)
    autoc = np.empty(order + 1)
    for lag in range(order + 1):
        autoc[lag] = float(np.dot(w[: m - lag], w[lag:]))
    if autoc[0] <= 0.0:
        return None
    err = autoc[0]
    a = np.zeros(order)
    used = 0
    for i in range(order):
        acc = autoc[i + 1] - (np.dot(a[:i], autoc[i:0:-1]) if i else 0.0)
        if err <= 0.0 or not np.isfinite(acc):
            break
        k = acc / err
        if not np.isfinite(k) or abs(k) >= 1.0:
            break
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        used = i + 1
        err *= 1.0 - k * k
    if used == 0:
        return None
    return a[:used]


def _quantize_lpc(a, prec: int = 14, max_shift: int = 15):
    """Quantize float LPC coefficients to ``prec``-bit signed ints with
    a common right-shift (the FLAC wire form), error-feedback rounding
    like libFLAC so the quantization error does not accumulate down
    the coefficient vector. Returns (coefs, shift) or None."""
    import numpy as np

    cmax = float(np.abs(a).max())
    if cmax <= 0.0 or not np.isfinite(cmax):
        return None
    # largest shift keeping every coef within the signed prec range
    shift = max_shift
    lim = (1 << (prec - 1)) - 1
    while shift > 0 and cmax * (1 << shift) > lim:
        shift -= 1
    if cmax * (1 << shift) > lim:
        return None
    q = []
    e = 0.0
    for c in a:
        v = c * (1 << shift) + e
        qi = int(np.floor(v + 0.5))
        qi = max(-(lim + 1), min(lim, qi))
        e = v - qi
        q.append(qi)
    if all(v == 0 for v in q):
        return None
    return q, shift


def _lpc_residual(x, coefs, shift: int):
    """EXACTLY the decoder's inverse: res[i] = x[i] -
    ((sum coefs[j] * x[i-1-j]) >> shift) in integer arithmetic
    (numpy's int64 >> is the same arithmetic floor shift)."""
    import numpy as np

    order = len(coefs)
    acc = np.zeros(len(x) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        acc += int(c) * x[order - 1 - j : len(x) - 1 - j]
    return x[order:] - (acc >> shift)


#: subframe header bits: 1 pad + 6 type + 1 wasted-flag
_SUB_HDR = 8


def _plan_subframe(x, eff: int) -> dict:
    """Choose the cheapest spec-valid encoding for one channel of one
    block by EXACT bit cost: CONSTANT, FIXED order 0-4, LPC (Levinson-
    Durbin, error-feedback-quantized coefficients), VERBATIM fallback.
    Returns a plan dict consumed by :func:`_write_subframe`."""
    import numpy as np

    bs = len(x)
    if bool(np.all(x == x[0])):
        return {"kind": "constant", "bits": _SUB_HDR + eff, "v": int(x[0])}
    plans = [{"kind": "verbatim", "bits": _SUB_HDR + bs * eff}]
    res = x
    for order in range(0, 5):
        if order:
            if bs <= order:
                break
            res = np.diff(res)
        cost, po, ks = _rice_plan(res if order else x, bs, order)
        plans.append(
            {
                "kind": "fixed",
                "order": order,
                "po": po,
                "ks": ks,
                "bits": _SUB_HDR + order * eff + cost,
            }
        )
    prec = 14
    for order in (2, 4, 8):
        a = _lpc_coefs(x, order)
        if a is None:
            continue
        q = _quantize_lpc(a, prec)
        if q is None:
            continue
        coefs, shift = q
        lres = _lpc_residual(x, coefs, shift)
        cost, po, ks = _rice_plan(lres, bs, len(coefs))
        plans.append(
            {
                "kind": "lpc",
                "order": len(coefs),
                "coefs": coefs,
                "shift": shift,
                "prec": prec,
                "po": po,
                "ks": ks,
                "bits": _SUB_HDR
                + len(coefs) * eff
                + 4  # precision-1 field
                + 5  # shift field
                + len(coefs) * prec
                + cost,
            }
        )
    return min(plans, key=lambda p: p["bits"])


def _write_subframe(body: "_BitWriter", plan: dict, x, eff: int) -> None:
    import numpy as np

    body.write(0, 1)  # padding
    kind = plan["kind"]
    if kind == "constant":
        body.write(0, 6)
        body.write(0, 1)  # no wasted bits
        body.write(plan["v"], eff)
        return
    if kind == "verbatim":
        body.write(1, 6)
        body.write(0, 1)
        for v in x:
            body.write(int(v), eff)
        return
    order = plan["order"]
    if kind == "fixed":
        body.write(0b001000 | order, 6)
        body.write(0, 1)
        for i in range(order):
            body.write(int(x[i]), eff)
        res = x
        for _ in range(order):
            res = np.diff(res)
    else:  # lpc
        body.write(32 + order - 1, 6)
        body.write(0, 1)
        for i in range(order):
            body.write(int(x[i]), eff)
        body.write(plan["prec"] - 1, 4)
        body.write(plan["shift"], 5)
        for c in plan["coefs"]:
            body.write(int(c), plan["prec"])
        res = _lpc_residual(x, plan["coefs"], plan["shift"])
    body.write(0, 2)  # residual method: 4-bit rice
    po = plan["po"]
    body.write(po, 4)
    bs, pos = len(x), 0
    for part, k in enumerate(plan["ks"]):
        size = (bs >> po) - (order if part == 0 else 0)
        body.write(k, 4)
        _rice_encode(body, res[pos : pos + size], k)
        pos += size


def encode_flac(
    samples, sample_rate: int = 8000, block_size: int = 4096, _stats: dict | None = None
) -> bytes:
    """Encode int16 PCM (n,) mono or (n, 2) stereo into a FLAC stream.

    Per block: every subframe picks the cheapest of CONSTANT / FIXED
    order 0-4 / LPC (Levinson-Durbin analysis, 14-bit error-feedback-
    quantized coefficients, orders 2/4/8) / VERBATIM by exact bit
    cost, and stereo frames additionally pick the cheapest channel
    assignment among independent, left/side, side/right, and mid/side
    (RFC 9639 inter-channel decorrelation — the side channel costs
    one extra bit of depth but correlated channels compress far
    smaller). One Rice partition per subframe with the exact-cost k.
    The decoder accepts all of it (it always has); these are the
    encode-side halves the round-6 encoder lacked.

    ``_stats``: pass a dict to collect {"chasn": [...], "kinds": [...]}
    per frame/subframe — test introspection only, no wire effect."""
    import hashlib

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError("encode_flac takes (n,) mono or (n, 2) stereo int16")
    n, ch = s.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    # Header-width validation (advice r6): block_size rides in 16-bit
    # STREAMINFO/frame fields (and 65536 would silently truncate;
    # >65536 raised OverflowError from to_bytes); sample_rate has 20
    # bits in STREAMINFO.  Normalize both to ValueError up front.
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size must be in 16..65535, got {block_size}")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"sample_rate must be in 1..{(1 << 20) - 1}, got {sample_rate}")
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    out = bytearray(FLAC_MAGIC)
    # STREAMINFO (last-metadata flag set, type 0, length 34)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # bps - 1 = 15
    si.write(n, 36)
    out += b"\x80\x00\x00\x22" + si.bytes() + md5

    sx = s.astype(np.int64)
    for frame_no, lo in enumerate(range(0, n, block_size)):
        blk = sx[lo : lo + block_size]
        bs = blk.shape[0]
        if ch == 1:
            chasn = 0
            subs = [(blk[:, 0], 16)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right  # 17-bit range
            mid = (left + right) >> 1  # decoder recovers the dropped
            # low bit from side's parity (mid/side reconstruction)
            pl = _plan_subframe(left, 16)
            pr = _plan_subframe(right, 16)
            ps = _plan_subframe(side, 17)
            pm = _plan_subframe(mid, 16)
            options = [
                (pl["bits"] + pr["bits"], 1, [(left, 16, pl), (right, 16, pr)]),
                (pl["bits"] + ps["bits"], 8, [(left, 16, pl), (side, 17, ps)]),
                (ps["bits"] + pr["bits"], 9, [(side, 17, ps), (right, 16, pr)]),
                (pm["bits"] + ps["bits"], 10, [(mid, 16, pm), (side, 17, ps)]),
            ]
            _, chasn, planned = min(options, key=lambda o: o[0])
            subs = [(x, eff, p) for x, eff, p in planned]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(chasn, 4)  # channel assignment (indep or decorrelated)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        w.align()
        head = bytes(w.buf) + _utf8_coded(frame_no) + int(bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])
        body = _BitWriter()
        if _stats is not None:
            _stats.setdefault("chasn", []).append(chasn)
        for sub in subs:
            if len(sub) == 3:
                x, eff, plan = sub
            else:
                x, eff = sub
                plan = _plan_subframe(x, eff)
            if _stats is not None:
                _stats.setdefault("kinds", []).append(plan["kind"])
            _write_subframe(body, plan, x, eff)
        body.align()
        frame = head + body.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


# --- decode -------------------------------------------------------------------


def _read_residual(r: "_BitReader", bs: int, order: int):
    import numpy as np

    method = r.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    kbits = 4 + method
    escape = (1 << kbits) - 1
    po = r.read(4)
    if bs % (1 << po):
        raise ValueError("flac: partition order does not divide block size")
    out = np.empty(bs - order, dtype=np.int64)
    pos = 0
    for part in range(1 << po):
        cnt = (bs >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        k = r.read(kbits)
        if k == escape:
            nbits = r.read(5)
            for i in range(cnt):
                v = r.read(nbits) if nbits else 0
                if nbits and v >= 1 << (nbits - 1):
                    v -= 1 << nbits
                out[pos + i] = v
        else:
            for i in range(cnt):
                q = r.read_unary()
                z = (q << k) | (r.read(k) if k else 0)
                out[pos + i] = (z >> 1) ^ -(z & 1)  # un-zigzag
        pos += cnt
    return out


def _read_subframe(r: "_BitReader", bs: int, bps: int):
    import numpy as np

    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    typ = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if typ == 0:  # CONSTANT
        v = r.read(eff)
        if v >= 1 << (eff - 1):
            v -= 1 << eff
        x = np.full(bs, v, dtype=np.int64)
    elif typ == 1:  # VERBATIM
        x = np.empty(bs, dtype=np.int64)
        for i in range(bs):
            v = r.read(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            x[i] = v
    elif 8 <= typ <= 12:  # FIXED order 0..4
        order = typ - 8
        x = np.empty(bs, dtype=np.int64)
        for i in range(order):
            v = r.read(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            x[i] = v
        res = _read_residual(r, bs, order)
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            x[i] = res[i - order] + sum(
                c * x[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif typ >= 32:  # LPC order 1..32
        order = typ - 31
        x = np.empty(bs, dtype=np.int64)
        for i in range(order):
            v = r.read(eff)
            if v >= 1 << (eff - 1):
                v -= 1 << eff
            x[i] = v
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = r.read(5)  # unsigned per the spec erratum
        coefs = []
        for _ in range(order):
            c = r.read(prec)
            if c >= 1 << (prec - 1):
                c -= 1 << prec
            coefs.append(c)
        res = _read_residual(r, bs, order)
        for i in range(order, bs):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {typ}")
    return x << wasted


def decode_flac(p: bytes):
    """Decode a FLAC stream to (samples int16 ndarray (n, ch),
    sample_rate). Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5
    of the decoded PCM. Raises ValueError on anything malformed."""
    import hashlib

    import numpy as np

    try:
        if p[:4] != FLAC_MAGIC:
            raise ValueError("not a FLAC stream (bad magic)")
        pos = 4
        streaminfo = None
        while True:
            if pos + 4 > len(p):
                raise ValueError("flac: truncated metadata")
            last = p[pos] & 0x80
            btype = p[pos] & 0x7F
            blen = int.from_bytes(p[pos + 1 : pos + 4], "big")
            body = p[pos + 4 : pos + 4 + blen]
            if len(body) != blen:
                raise ValueError("flac: truncated metadata block")
            if btype == 0:
                streaminfo = body
            pos += 4 + blen
            if last:
                break
        if streaminfo is None or len(streaminfo) < 34:
            raise ValueError("flac: missing STREAMINFO")
        si = _BitReader(streaminfo)
        si.read(16)
        si.read(16)
        si.read(24)
        si.read(24)
        rate = si.read(20)
        ch = si.read(3) + 1
        bps = si.read(5) + 1
        total = si.read(36)
        md5_expect = streaminfo[18:34]
        if bps != 16:
            raise ValueError(f"flac: only 16-bit supported, got {bps}")
        if total == 0:
            raise ValueError("flac: streams without a declared sample total "
                             "are unsupported")
        chans: list = [[] for _ in range(ch)]
        got = 0
        while got < total:
            r = _BitReader(p, pos)
            sync = r.read(14)
            if sync != 0b11111111111110:
                raise ValueError("flac: lost frame sync")
            r.read(1)  # reserved
            r.read(1)  # blocking strategy
            bsbits = r.read(4)
            srbits = r.read(4)
            chasn = r.read(4)
            ssbits = r.read(3)
            r.read(1)
            _read_utf8_coded(r)
            bs = _BLOCKSIZES[bsbits]
            if bs == 0:
                raise ValueError("flac: reserved block size code")
            if bs == -8:
                bs = r.read(8) + 1
            elif bs == -16:
                bs = r.read(16) + 1
            sr = _SAMPLE_RATES[srbits]
            if sr == -8:
                r.read(8)
            elif sr == -16:
                r.read(16)
            elif sr == -160:
                r.read(16)
            elif sr is None:
                raise ValueError("flac: invalid sample rate code")
            fbps = _SAMPLE_SIZES[ssbits]
            if fbps is None:
                raise ValueError("flac: reserved sample size code")
            if fbps == 0:
                fbps = bps
            hdr_end = r.tell_bytes()
            if _crc8(p[pos:hdr_end]) != p[hdr_end]:
                raise ValueError("flac: frame header CRC-8 mismatch")
            r = _BitReader(p, hdr_end + 1)
            if chasn < 8:
                if chasn + 1 != ch:
                    raise ValueError("flac: channel count mismatch")
                subs = [_read_subframe(r, bs, fbps) for _ in range(ch)]
            elif chasn in (8, 9, 10):
                if ch != 2:
                    raise ValueError("flac: stereo decorrelation on non-stereo")
                extra = (0, 1) if chasn == 8 else ((1, 0) if chasn == 9 else (0, 1))
                a = _read_subframe(r, bs, fbps + extra[0])
                b = _read_subframe(r, bs, fbps + extra[1])
                if chasn == 8:  # left/side
                    subs = [a, a - b]
                elif chasn == 9:  # side/right
                    subs = [a + b, b]
                else:  # mid/side
                    side = b
                    mid = (a << 1) | (side & 1)
                    subs = [(mid + side) >> 1, (mid - side) >> 1]
            else:
                raise ValueError(f"flac: reserved channel assignment {chasn}")
            r.align()
            body_end = r.tell_bytes()
            crc = int.from_bytes(p[body_end : body_end + 2], "big")
            if _crc16(p[pos:body_end]) != crc:
                raise ValueError("flac: frame CRC-16 mismatch")
            for c in range(ch):
                chans[c].append(subs[c])
            got += bs
            pos = body_end + 2
        if got != total:
            raise ValueError(f"flac: decoded {got} of {total} samples")
        s = np.stack(
            [np.concatenate(c)[:total] for c in chans], axis=1
        )
        if s.min() < -(1 << 15) or s.max() >= 1 << 15:
            raise ValueError("flac: decoded sample out of 16-bit range")
        s16 = s.astype(np.int16)
        if hashlib.md5(s16.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("flac: STREAMINFO MD5 mismatch on decoded PCM")
        return s16, rate
    except IndexError as e:
        # slicing past the buffer end anywhere in the frame walk
        raise ValueError(f"malformed FLAC ({type(e).__name__}: {e})") from e
