"""Baseline JPEG codec, pure stdlib + numpy (public ITU-T T.81 spec).

Decoder: SOI/APPn/DQT/SOF0|1|2/DHT/DRI/SOS/EOI marker parse, canonical
Huffman decode with byte-stuffing and restart markers, multi-scan
coefficient-store engine covering BASELINE and PROGRESSIVE (SOF2) DCT —
both spectral selection and successive approximation per T.81 Annex G
(a baseline image is simply one full-band scan) — dequantize, zigzag,
vectorized separable IDCT, generic h/v chroma upsample (nearest),
full-range BT.601 YCbCr->RGB. Arithmetic coding (SOF9+) and lossless
modes raise NotImplementedError — the honest remaining stub.

Encoders (the test twins and fixture generators): 4:4:4 or grayscale
baseline (encode_jpeg) and progressive (encode_jpeg_progressive: the
classic libjpeg scan script — DC first at Al=1, AC spectral bands at
Al=1, AC refinement to Al=0 with cross-block EOB runs and deferred
correction bits, DC refinement). Quality-scaled Annex-K-style quant
tables; per-image/per-scan canonical Huffman tables built from the
actual symbol frequencies and emitted in DHT — so the decoder's table
parsing is exercised for real. Progressive and baseline encode the SAME
quantized coefficients, so decoded pixels must agree bit-for-bit (the
coefficient-level identity tests/test_round4 pins).

This mirrors the reference's stance of decoding payload formats inline in
the pipeline workers (builder/docformat payload handling); here it backs
``stages/multimodal.DecodeMedia(fake=False)``.
"""

from __future__ import annotations

import heapq
import itertools
import struct

import numpy as np

# zigzag order: index i of the scan -> position in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# base luminance/chrominance quant tables (Annex K examples, public spec)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64).reshape(8, 8)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64).reshape(8, 8)

# separable DCT basis: A[k, x] = c(k) * cos((2x+1) k pi / 16)
_A = np.array([[((1 / np.sqrt(8)) if k == 0 else 0.5)
                * np.cos((2 * x + 1) * k * np.pi / 16)
                for x in range(8)] for k in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _quality_tables(quality: int,
                    max_val: int = 255) -> tuple[np.ndarray, np.ndarray]:
    """``max_val=65535`` for Pq=1 (16-bit) tables: low qualities then keep
    their true step sizes instead of clipping at the 8-bit ceiling."""
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, max_val))
    return out[0], out[1]


# --------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 byte-stuffing removed, stops at
    any other marker (RSTn are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def byte_align(self) -> None:
        self.bits = 0
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _build_huff(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG assignment."""
    table = {}
    code = 0
    it = iter(values)
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1: low-order `size` bits, one's-complement negatives
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _ac_first(r: _BitReader, ac_tab, blk, k: int, se: int, al: int,
              eobrun: int) -> int:
    """Progressive first AC scan for one block (T.81 G.2; Al=0 + se=63
    degenerates to exactly the baseline AC decode). Returns eobrun."""
    if eobrun > 0:
        return eobrun - 1
    while k <= se:
        sym = _huff_decode(r, ac_tab)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run == 15:
                k += 16                          # ZRL
                continue
            eobrun = (1 << run) - 1              # EOBRUN covers this block
            if run:
                eobrun += r.read(run)
            break
        k += run
        if k > se:
            raise ValueError("AC coefficient overflow")
        blk[k] = _extend(r.read(size), size) * (1 << al)
        k += 1
    return eobrun


def _ac_refine(r: _BitReader, ac_tab, blk, ss: int, se: int, al: int,
               eobrun: int) -> int:
    """Progressive AC refinement scan for one block (T.81 G.1.2.3 /
    successive approximation): newly-nonzero coefficients arrive as
    (run, 1) symbols + sign bit; already-nonzero history coefficients
    crossed on the way absorb one correction bit each."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_decode(r, ac_tab)
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    eobrun = 1 << run            # covers this block too
                    if run:
                        eobrun += r.read(run)
                    break
                val = 0                          # ZRL: 16 zero-history slots
            else:
                if size != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if r.read(1) else -p1
            while k <= se:
                if blk[k] != 0:
                    if r.read(1) and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else -p1
                    k += 1
                else:
                    if run == 0:
                        break
                    run -= 1
                    k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if r.read(1) and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(payload: bytes, pos: int, scan: list[dict], coef: dict,
                 pred: dict, huff: dict, ss: int, se: int, ah: int, al: int,
                 restart_interval: int, mcux: int, mcuy: int) -> int:
    """Decode one entropy-coded scan (baseline or progressive) into the
    per-component coefficient store; returns the byte position of the
    next marker. Interleaved scans walk the MCU grid; single-component
    scans walk that component's own block raster (T.81 A.2)."""
    r = _BitReader(payload, pos)
    eobrun = 0
    units = []                                   # (comp, by, bx) per MCU
    if len(scan) > 1:
        for my, mx in itertools.product(range(mcuy), range(mcux)):
            mcu = []
            for c in scan:
                for by, bx in itertools.product(range(c["v"]), range(c["h"])):
                    mcu.append((c, my * c["v"] + by, mx * c["h"] + bx))
            units.append(mcu)
    else:
        c = scan[0]
        for by, bx in itertools.product(range(c["nby"]), range(c["nbx"])):
            units.append([(c, by, bx)])

    mcu_count = 0
    for mcu in units:
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            r.byte_align()
            if payload[r.pos] == 0xFF and 0xD0 <= payload[r.pos + 1] <= 0xD7:
                r.pos += 2
            for cid in pred:
                pred[cid] = 0
            eobrun = 0
        mcu_count += 1
        for c, by, bx in mcu:
            blk = coef[c["id"]][by, bx]
            if ss == 0:
                if ah == 0:                      # DC first (or baseline)
                    size = _huff_decode(r, huff[(0, c["td"])])
                    pred[c["id"]] += _extend(r.read(size), size)
                    blk[0] = pred[c["id"]] << al
                elif r.read(1):                  # DC refinement: one bit
                    blk[0] = int(blk[0]) | (1 << al)
            if se >= 1 and not (ss == 0 and se == 0):
                ac_tab = huff[(1, c["ta"])]
                if ah == 0:
                    eobrun = _ac_first(r, ac_tab, blk, max(ss, 1), se, al,
                                       eobrun)
                else:
                    eobrun = _ac_refine(r, ac_tab, blk, ss, se, al, eobrun)
    r.byte_align()
    return r.pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG -> uint8 (h, w, c) with c = 1 (grayscale) or 3 (RGB).

    Handles baseline (SOF0/1) AND progressive (SOF2) DCT streams — both
    spectral selection and successive approximation, per ITU-T T.81
    Annex G — via one multi-scan coefficient-store engine (a baseline
    image is simply one full-band scan). Arithmetic coding (SOF9+) and
    lossless modes remain unimplemented."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    coef: dict[int, np.ndarray] | None = None
    pred: dict[int, int] = {}
    hmax = vmax = mcux = mcuy = 0
    try:
        while True:
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker expected")
            # 0xFF fill bytes are legal padding before a marker (B.1.1.2)
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:                   # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue                         # TEM / RSTn: no length word
            (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
            seg = payload[pos + 2:pos + seglen]
            if marker == 0xDB:                   # DQT
                p = 0
                while p < len(seg):
                    prec, tid = seg[p] >> 4, seg[p] & 0xF
                    tab = np.zeros(64)
                    if prec:                     # Pq=1: 16-bit big-endian
                        tab[_ZIGZAG] = np.frombuffer(seg, ">u2", 64, p + 1) \
                            .astype(np.float64)
                        p += 129
                    else:
                        tab[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                        p += 65
                    qt[tid] = tab.reshape(8, 8)
            elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 prog
                _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                comps = []
                for i in range(nc):
                    cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                                  "tq": tq})
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "only baseline/progressive Huffman JPEG is supported "
                    "(arithmetic-coded and lossless modes are not)")
            elif marker == 0xC4:                 # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0xF
                    bits = list(seg[p + 1:p + 17])
                    nv = sum(bits)
                    vals = list(seg[p + 17:p + 17 + nv])
                    huff[(tc, th)] = _build_huff(bits, vals)
                    p += 17 + nv
            elif marker == 0xDD:                 # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:                 # SOS — one of possibly many
                if w is None:
                    raise ValueError("JPEG missing SOF")
                if h == 0:
                    # DNL stream (B.2.5): SOF declared 0 lines; the real
                    # height arrives in the DNL segment after the first
                    # scan. 0xFFDC past this point is unambiguous — inside
                    # entropy data 0xFF is always escaped with 0x00 or a
                    # RSTn (D0-D7) byte.
                    dnl_at = payload.find(b"\xff\xdc", pos)
                    if dnl_at < 0:
                        raise ValueError(
                            "JPEG SOF declares 0 lines but no DNL marker "
                            "follows the scan")
                    (h,) = struct.unpack(
                        ">H", payload[dnl_at + 4:dnl_at + 6])
                    if h == 0:
                        raise ValueError("DNL declares 0 lines")
                if coef is None:
                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    coef = {}
                    for c in comps:
                        cw = -(-w * c["h"] // hmax)   # component pixel dims
                        ch = -(-h * c["v"] // vmax)
                        c["nbx"] = -(-cw // 8)
                        c["nby"] = -(-ch // 8)
                        coef[c["id"]] = np.zeros(
                            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                        pred[c["id"]] = 0
                ns = seg[0]
                scan = []
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                    comp = next(c for c in comps if c["id"] == cs)
                    comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                    scan.append(comp)
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                for cid in pred:                 # DC pred resets per scan
                    pred[cid] = 0
                pos = _decode_scan(payload, pos + seglen, scan, coef, pred,
                                   huff, ss, se, ahal >> 4, ahal & 0xF,
                                   restart_interval, mcux, mcuy)
                continue
            pos += seglen
    except _MarkerHit as exc:
        # a non-RST marker inside entropy data == the stream was cut
        raise ValueError("truncated JPEG stream") from exc
    if coef is None:
        raise ValueError("JPEG has no scan data")

    out = []
    for c in comps:
        q = qt[c["tq"]].reshape(64)
        bh, bw = coef[c["id"]].shape[:2]
        zz = coef[c["id"]].reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz                     # zigzag -> natural order
        nat *= q
        px = np.einsum("ij,njk,kl->nil", _A.T,
                       nat.reshape(-1, 8, 8), _A) + 128.0
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        if c["h"] != hmax or c["v"] != vmax:
            yi = np.arange(vmax * mcuy * 8) * c["v"] // vmax
            xi = np.arange(hmax * mcux * 8) * c["h"] // hmax
            plane = plane[yi][:, xi]
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)            # byte stuffing
        self.acc &= (1 << self.n) - 1

    def byte_align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (caller must be byte-aligned)."""
        assert self.n == 0
        self.out.extend(b)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _canonical_code_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Huffman code lengths (capped at 16 by construction scale — symbol
    sets here are tiny) with a dummy symbol so no real code is all-ones."""
    heap = [(f, i, (sym,)) for i, (sym, f) in enumerate(sorted(freqs.items()))]
    heap.append((0, len(heap), (None,)))         # dummy absorbs the all-1s code
    heapq.heapify(heap)
    depth: dict[int | None, int] = {s: 0 for _, _, syms in heap for s in syms}
    tie = len(heap)
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tie, sa + sb))
        tie += 1
    depth.pop(None, None)
    return {s: max(1, d) for s, d in depth.items()}


def _huff_spec(freqs: dict[int, int]) -> tuple[list[int], list[int],
                                               dict[int, tuple[int, int]]]:
    """-> (BITS[16], VALUES, symbol -> (code, length)) canonical tables."""
    lengths = _canonical_code_lengths(freqs or {0: 1})
    if max(lengths.values()) > 16:
        raise ValueError("Huffman depth > 16 (unexpected for these inputs)")
    order = sorted(lengths, key=lambda s: (lengths[s], s))
    bits = [0] * 16
    for s in order:
        bits[lengths[s] - 1] += 1
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = lengths[order[0]]
    code <<= prev_len
    for s in order:
        code <<= lengths[s] - prev_len
        prev_len = lengths[s]
        codes[s] = (code, prev_len)
        code += 1
    return bits, order, codes


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _component_coefficients(pixels: np.ndarray, quality: int):
    """Shared front half of both encoders: color transform, 8x8 DCT,
    quantization, zigzag — returns (qcoef per comp, qtabs, tqs, comp_tab,
    h, w, bh, bw, nc)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels only")
    qlum, qchrom = _quality_tables(quality)
    f = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qtabs = [qlum, qchrom, qchrom]
        tqs = [0, 1, 1]
        comp_tab = [0, 1, 1]
    else:
        planes = [f[..., 0]]
        qtabs = [qlum]
        tqs = [0]
        comp_tab = [0]
    bh, bw = -(-h // 8), -(-w // 8)
    qcoef: list[list[np.ndarray]] = []
    for plane, q in zip(planes, qtabs):
        padded = np.pad(plane - 128.0, ((0, bh * 8 - h), (0, bw * 8 - w)),
                        mode="edge")
        blocks = []
        for by, bx in itertools.product(range(bh), range(bw)):
            d = _dct2(padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
            blocks.append(np.rint(d / q).astype(np.int64).reshape(64)[_ZIGZAG])
        qcoef.append(blocks)
    return qcoef, qtabs, tqs, comp_tab, h, w, bh, bw, nc


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                quant_precision: int = 8,
                dnl: bool = False) -> bytes:
    """uint8 (h, w) | (h, w, 1) grayscale or (h, w, 3) RGB -> baseline
    JPEG, per-image canonical Huffman tables. ``subsampling``: "444"
    (default, no subsampling) or "420" (2x2-mean chroma downsample,
    luma h=v=2 — produces interleaved multi-block MCUs, exercising the
    decoder's generic MCU walk and chroma upsample for real).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (byte-aligned, DC predictors reset) — the error-resilience
    feature real camera/web JPEGs carry. ``quant_precision=16`` writes
    DQT with Pq=1 (16-bit big-endian entries, T.81 extended precision).
    ``dnl=True`` declares 0 lines in SOF and appends the real height as
    a DNL segment after the scan (B.2.5 — the streaming-source shape
    where height is unknown until the last row)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels only")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    use420 = subsampling == "420" and nc == 3
    qlum, qchrom = _quality_tables(
        quality, 65535 if quant_precision == 16 else 255)
    f = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qtabs = [qlum, qchrom, qchrom]
        tqs = [0, 1, 1]
    else:
        planes = [f[..., 0]]
        qtabs = [qlum]
        tqs = [0]
    comp_tab = [0] + ([1, 1] if nc == 3 else [])

    if use420:
        factors = [(2, 2), (1, 1), (1, 1)]       # (h, v) per component
        he, we = -(-h // 2) * 2, -(-w // 2) * 2  # pad to even, then mean
        for ci in (1, 2):
            pe = np.pad(planes[ci], ((0, he - h), (0, we - w)), mode="edge")
            planes[ci] = pe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        mcux, mcuy = -(-w // 16), -(-h // 16)
    else:
        factors = [(1, 1)] * nc
        mcux, mcuy = -(-w // 8), -(-h // 8)

    # per-component block grids (grid row-major), zigzag-quantized
    qcoef: list[list[np.ndarray]] = []
    grids: list[tuple[int, int]] = []
    for ci, (plane, q) in enumerate(zip(planes, qtabs)):
        ch, cw = factors[ci][1] * mcuy * 8, factors[ci][0] * mcux * 8
        padded = np.pad(plane - 128.0,
                        ((0, ch - plane.shape[0]), (0, cw - plane.shape[1])),
                        mode="edge")
        gh, gw = ch // 8, cw // 8
        grids.append((gh, gw))
        blocks = []
        for by, bx in itertools.product(range(gh), range(gw)):
            d = _dct2(padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
            # natural -> zigzag scan order: scan[i] = natural[_ZIGZAG[i]]
            blocks.append(np.rint(d / q).astype(np.int64).reshape(64)[_ZIGZAG])
        qcoef.append(blocks)

    # block visit order = the interleaved-MCU walk (T.81 A.2.3); for 4:4:4
    # this degenerates to row-major, byte-identical to the old encoder
    visit: list[list[int]] = [[] for _ in range(nc)]
    for my, mx in itertools.product(range(mcuy), range(mcux)):
        for ci in range(nc):
            fh, fv = factors[ci]
            _, gw = grids[ci]
            for by, bx in itertools.product(range(fv), range(fh)):
                visit[ci].append((my * fv + by) * gw + (mx * fh + bx))

    def _block_symbols(zz: np.ndarray, prev: int):
        dcs = _category(int(zz[0]) - prev)
        acs = []
        k = 1
        run = 0
        last_nz = max(np.flatnonzero(zz), default=0)
        while k < 64:
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    acs.append(0x00)
                    break
                run += 1
                if run == 16:
                    acs.append(0xF0)
                    run = 0
            else:
                acs.append((run << 4) | _category(v))
                run = 0
            k += 1
        return dcs, acs

    # pass 1: symbol statistics — the SAME MCU walk as emission, with the
    # same restart-boundary DC-predictor resets (a stats pass that skips
    # the resets produces diff categories the real stream never uses)
    dc_freq: list[dict[int, int]] = [{}, {}]
    ac_freq: list[dict[int, int]] = [{}, {}]
    blocks_per_mcu = [factors[ci][0] * factors[ci][1] for ci in range(nc)]
    prev = [0] * nc
    cursors = [0] * nc
    mcu_count = 0
    for _my, _mx in itertools.product(range(mcuy), range(mcux)):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            prev = [0] * nc
        mcu_count += 1
        for ci in range(nc):
            t = comp_tab[ci]
            for _ in range(blocks_per_mcu[ci]):
                zz = qcoef[ci][visit[ci][cursors[ci]]]
                cursors[ci] += 1
                dcs, acs = _block_symbols(zz, prev[ci])
                prev[ci] = int(zz[0])
                dc_freq[t][dcs] = dc_freq[t].get(dcs, 0) + 1
                for sym in acs:
                    ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
    ntab = 2 if nc == 3 else 1
    dc_specs = [_huff_spec(dc_freq[i]) for i in range(ntab)]
    ac_specs = [_huff_spec(ac_freq[i]) for i in range(ntab)]

    out = bytearray(b"\xff\xd8")                 # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    if quant_precision not in (8, 16):
        raise ValueError("quant_precision must be 8 or 16")
    for tid, q in enumerate([qlum] + ([qchrom] if nc == 3 else [])):
        if quant_precision == 16:
            zz16 = q.reshape(64)[_ZIGZAG].astype(">u2")
            seg(0xDB, bytes([0x10 | tid]) + zz16.tobytes())
        else:
            zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
            seg(0xDB, bytes([tid]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, 0 if dnl else h, w, nc)
    for ci in range(nc):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, tqs[ci]])
    seg(0xC0, sof)
    for tc, specs in ((0, dc_specs), (1, ac_specs)):
        for th, (bits, vals, _codes) in enumerate(specs):
            seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        t = comp_tab[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    # pass 2: entropy coding — interleave blocks per MCU in visit order
    bwr = _BitWriter()
    prev = [0] * nc
    cursors = [0] * nc
    mcu_count = 0
    for _my, _mx in itertools.product(range(mcuy), range(mcux)):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            bwr.byte_align()
            n_rst = (mcu_count // restart_interval - 1) % 8
            bwr.raw(bytes([0xFF, 0xD0 + n_rst]))
            prev = [0] * nc
        mcu_count += 1
        for ci in range(nc):
            t = comp_tab[ci]
            dc_codes = dc_specs[t][2]
            ac_codes = ac_specs[t][2]
            for _ in range(blocks_per_mcu[ci]):
                zz = qcoef[ci][visit[ci][cursors[ci]]]
                cursors[ci] += 1
                diff = int(zz[0]) - prev[ci]
                prev[ci] = int(zz[0])
                size = _category(diff)
                bwr.write(*dc_codes[size])       # (code, length)
                if size:
                    bwr.write(_mag_bits(diff, size), size)
                k = 1
                run = 0
                last_nz = max(np.flatnonzero(zz), default=0)
                while k < 64:
                    v = int(zz[k])
                    if v == 0:
                        if k > last_nz:
                            bwr.write(*ac_codes[0x00])
                            break
                        run += 1
                        if run == 16:
                            bwr.write(*ac_codes[0xF0])
                            run = 0
                    else:
                        size = _category(v)
                        bwr.write(*ac_codes[(run << 4) | size])
                        bwr.write(_mag_bits(v, size), size)
                        run = 0
                    k += 1
    out.extend(bwr.flush())
    if dnl:                                      # B.2.5: NL after 1st scan
        seg(0xDC, struct.pack(">H", h))
    out.extend(b"\xff\xd9")                      # EOI
    return bytes(out)


# ----------------------------------------------------- progressive encoder

_MAX_EOBRUN = 0x7FFF


def _flush_eobrun(ev: list, eobrun: int, pending_bits: list) -> int:
    """Emit an accumulated EOBRUN symbol (+ its deferred correction bits,
    refinement scans only) — total blocks covered n = (1<<r) + extra."""
    if eobrun:
        r = eobrun.bit_length() - 1
        ev.append(("sym", r << 4))
        if r:
            ev.append(("bits", eobrun - (1 << r), r))
        for b in pending_bits:
            ev.append(("bits", b, 1))
        pending_bits.clear()
    return 0


def _ac_first_events(blocks, ss: int, se: int, al: int) -> list:
    """Events for a progressive first AC scan over one component: t-values
    (toward-zero shift by Al), RLE with ZRL and cross-block EOB runs."""
    ev: list = []
    eobrun = 0
    none: list = []
    for zz in blocks:
        band = [int(np.sign(v)) * (abs(int(v)) >> al)
                for v in zz[ss:se + 1]]
        if not any(band):
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                eobrun = _flush_eobrun(ev, eobrun, none)
            continue
        eobrun = _flush_eobrun(ev, eobrun, none)
        run = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i, v in enumerate(band):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                ev.append(("sym", 0xF0))
                run -= 16
            s = _category(v)
            ev.append(("sym", (run << 4) | s))
            ev.append(("bits", _mag_bits(v, s), s))
            run = 0
        if last_nz < len(band) - 1:
            eobrun = 1
    _flush_eobrun(ev, eobrun, none)
    return ev


def _ac_refine_events(blocks, ss: int, se: int, al: int) -> list:
    """Events for a progressive AC refinement scan (T.81 G.1.2.3 encoder):
    newly-nonzero coefficients as (run-of-zero-history, 1) + sign bit;
    correction bits for history coefficients interleave exactly where the
    decoder's advance loop reads them; trailing content folds into EOB
    runs whose deferred bits flush after the EOBRUN symbol."""
    ev: list = []
    eobrun = 0
    pending: list = []
    for zz in blocks:
        a = [abs(int(v)) for v in zz[ss:se + 1]]
        hist = [(x >> (al + 1)) != 0 for x in a]
        av = [x >> al for x in a]
        newly = [i for i in range(len(a)) if not hist[i] and av[i]]
        for i in newly:
            if av[i] != 1:
                raise ValueError("coefficient grew by >1 bit in one scan "
                                 "(invalid successive approximation)")
        if newly:
            eobrun = _flush_eobrun(ev, eobrun, pending)
        j = 0
        for np_ in newly:
            span = list(range(j, np_))
            zrun = sum(1 for i in span if not hist[i])
            while zrun > 15:
                ev.append(("sym", 0xF0))
                consumed = 0
                while consumed < 16:
                    i = span.pop(0)
                    if hist[i]:
                        ev.append(("bits", av[i] & 1, 1))
                    else:
                        consumed += 1
                zrun -= 16
            ev.append(("sym", (zrun << 4) | 1))
            ev.append(("bits", 1 if zz[ss + np_] > 0 else 0, 1))
            for i in span:
                if hist[i]:
                    ev.append(("bits", av[i] & 1, 1))
            j = np_ + 1
        if j <= len(a) - 1:
            eobrun += 1
            pending.extend(av[i] & 1 for i in range(j, len(a)) if hist[i])
            if eobrun == _MAX_EOBRUN:
                eobrun = _flush_eobrun(ev, eobrun, pending)
    _flush_eobrun(ev, eobrun, pending)
    return ev


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) | (h, w, 1) grayscale or (h, w, 3) RGB -> PROGRESSIVE
    JPEG (SOF2), 4:4:4, per-scan canonical Huffman tables.

    Scan script (the classic libjpeg shape — exercises BOTH progressive
    dimensions): interleaved DC first at Al=1; per-component AC spectral
    bands 1-5 and 6-63 at Al=1; per-component AC refinement 1-63 to Al=0;
    interleaved DC refinement to Al=0. Progressive and baseline encode
    the SAME quantized coefficients, so `decode_jpeg` must reproduce the
    baseline decode bit-for-bit (pinned by tests)."""
    qcoef, qtabs, tqs, comp_tab, h, w, bh, bw, nc = \
        _component_coefficients(pixels, quality)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    qlum = qtabs[0]
    for tid, q in enumerate([qlum] + ([qtabs[1]] if nc == 3 else [])):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tid]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, tqs[ci]])
    seg(0xC2, sof)                               # SOF2: progressive DCT

    def emit_scan(scan_comps: list[int], ss: int, se: int, ah: int, al: int,
                  events_per_table: dict[int, list], tc: int | None) -> None:
        """DHT (per-scan canonical tables from real symbol stats) + SOS +
        entropy data for one scan. ``events_per_table``: table id ->
        interleaved event list; interleaved DC scans pass one MERGED
        stream under key -1 with ("sym", tab, s) triples."""
        specs: dict[int, tuple] = {}
        if tc is not None:
            freqs: dict[int, dict[int, int]] = {}
            merged = events_per_table[-1]
            for e in merged:
                if e[0] == "sym":
                    t, s = (e[1], e[2]) if len(e) == 3 else (0, e[1])
                    freqs.setdefault(t, {})
                    freqs[t][s] = freqs[t].get(s, 0) + 1
            for t in sorted(freqs):
                specs[t] = _huff_spec(freqs[t])
                bits, vals, _codes = specs[t]
                seg(0xC4, bytes([(tc << 4) | t]) + bytes(bits) + bytes(vals))
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            # DC-first events carry per-component table ids (lum/chroma);
            # AC scans are single-component with one per-scan table (0)
            td = comp_tab[ci] if (tc == 0 and specs) else 0
            ta = 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        bwr = _BitWriter()
        for e in events_per_table[-1]:
            if e[0] == "sym":
                t, s = (e[1], e[2]) if len(e) == 3 else (0, e[1])
                bwr.write(*specs[t][2][s])
            else:
                _, v, n = e
                if n:
                    bwr.write(v, n)
        out.extend(bwr.flush())

    # --- scan 1: DC first, interleaved, Al=1
    ev: list = []
    prev = [0] * nc
    for bi in range(bh * bw):
        for ci in range(nc):
            v1 = int(qcoef[ci][bi][0]) >> 1      # DC point transform: floor
            diff = v1 - prev[ci]
            prev[ci] = v1
            s = _category(diff)
            ev.append(("sym", comp_tab[ci], s))
            ev.append(("bits", _mag_bits(diff, s), s))
    emit_scan(list(range(nc)), 0, 0, 0, 1, {-1: ev}, tc=0)

    # --- per-component AC first scans (spectral bands), Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            ev = _ac_first_events(qcoef[ci], ss, se, 1)
            emit_scan([ci], ss, se, 0, 1, {-1: ev}, tc=1)

    # --- per-component AC refinement to Al=0
    for ci in range(nc):
        ev = _ac_refine_events(qcoef[ci], 1, 63, 0)
        emit_scan([ci], 1, 63, 1, 0, {-1: ev}, tc=1)

    # --- DC refinement to Al=0: one raw bit per block, interleaved
    ev = []
    for bi in range(bh * bw):
        for ci in range(nc):
            ev.append(("bits", int(qcoef[ci][bi][0]) & 1, 1))
    emit_scan(list(range(nc)), 0, 0, 1, 0, {-1: ev}, tc=None)

    out.extend(b"\xff\xd9")
    return bytes(out)
