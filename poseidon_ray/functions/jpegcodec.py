"""Baseline JPEG codec, pure stdlib + numpy (public ITU-T T.81 spec).

Decoder: SOI/APPn/DQT/SOF0|1/DHT/DRI/SOS/EOI marker parse, canonical
Huffman decode with byte-stuffing and restart markers, DC diff + AC
run-length entropy decode, dequantize, zigzag, separable IDCT (numpy
matmul), generic h/v chroma upsample (nearest), full-range BT.601
YCbCr->RGB. Progressive (SOF2) and arithmetic coding raise
NotImplementedError — they are the honest remaining stub.

Encoder (the test twin and fixture generator): 4:4:4 or grayscale
baseline, quality-scaled Annex-K-style quant tables, per-image canonical
Huffman tables built from the actual symbol frequencies and emitted in
DHT — so the decoder's table parsing is exercised for real, with no
dependence on remembering the spec's example tables.

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


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
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


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (h, w, c) with c = 1 (grayscale) or 3 (RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # 0xFF fill bytes are legal padding before any marker (T.81 B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI
            raise ValueError("JPEG has no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                             # TEM / RSTn: no length word
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64)
                tab[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qt[tid] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):             # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported "
                                      "(baseline only)")
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                scan.append(comp)
            pos += seglen
            break
        pos += seglen
    if w is None:
        raise ValueError("JPEG missing SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c in comps}
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(payload, pos)
    mcu_count = 0
    try:
        for my, mx in itertools.product(range(mcuy), range(mcux)):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.byte_align()
                if payload[r.pos] == 0xFF and 0xD0 <= payload[r.pos + 1] <= 0xD7:
                    r.pos += 2
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in scan:
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                q = qt[c["tq"]]
                for by, bx in itertools.product(range(c["v"]), range(c["h"])):
                    coef = np.zeros(64)
                    size = _huff_decode(r, dc_tab)
                    pred[c["id"]] += _extend(r.read(size), size)
                    coef[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(r, ac_tab)
                        if sym == 0x00:              # EOB
                            break
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16                  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC coefficient overflow")
                        coef[k] = _extend(r.read(size), size)
                        k += 1
                    block = np.zeros(64)
                    block[_ZIGZAG] = coef
                    px = _idct2(block.reshape(8, 8) * q) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
    except _MarkerHit as exc:
        # a non-RST marker inside entropy data == the stream was cut
        raise ValueError("truncated JPEG stream") from exc

    out = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            yi = np.arange(vmax * mcuy * 8) * c["v"] // vmax
            xi = np.arange(hmax * mcux * 8) * c["h"] // hmax
            p = p[yi][:, xi]
        out.append(p[:h, :w])
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

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
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


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) | (h, w, 1) grayscale or (h, w, 3) RGB -> baseline
    JPEG, 4:4:4 (no subsampling), per-image canonical Huffman tables."""
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
    else:
        planes = [f[..., 0]]
        qtabs = [qlum]
        tqs = [0]

    bh, bw = -(-h // 8), -(-w // 8)
    # quantized zigzag coefficients per component, block row-major
    qcoef: list[list[np.ndarray]] = []
    for plane, q in zip(planes, qtabs):
        padded = np.pad(plane - 128.0, ((0, bh * 8 - h), (0, bw * 8 - w)),
                        mode="edge")
        blocks = []
        for by, bx in itertools.product(range(bh), range(bw)):
            d = _dct2(padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
            # natural -> zigzag scan order: scan[i] = natural[_ZIGZAG[i]]
            zz = np.rint(d / q).astype(np.int64).reshape(64)[_ZIGZAG]
            blocks.append(zz)
        qcoef.append(blocks)

    # pass 1: symbol statistics
    def _symbols(blocks: list[np.ndarray]):
        dcs, acs, prev = [], [], 0
        for zz in blocks:
            diff = int(zz[0]) - prev
            prev = int(zz[0])
            dcs.append(_category(diff))
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

    dc_freq: list[dict[int, int]] = [{}, {}]
    ac_freq: list[dict[int, int]] = [{}, {}]
    comp_tab = [0] + ([1, 1] if nc == 3 else [])
    for ci, blocks in enumerate(qcoef):
        dcs, acs = _symbols(blocks)
        for s in dcs:
            dc_freq[comp_tab[ci]][s] = dc_freq[comp_tab[ci]].get(s, 0) + 1
        for s in acs:
            ac_freq[comp_tab[ci]][s] = ac_freq[comp_tab[ci]].get(s, 0) + 1
    ntab = 2 if nc == 3 else 1
    dc_specs = [_huff_spec(dc_freq[i]) for i in range(ntab)]
    ac_specs = [_huff_spec(ac_freq[i]) for i in range(ntab)]

    out = bytearray(b"\xff\xd8")                 # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    for tid, q in enumerate([qlum] + ([qchrom] if nc == 3 else [])):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tid]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, tqs[ci]])    # h=v=1: 4:4:4
    seg(0xC0, sof)
    for tc, specs in ((0, dc_specs), (1, ac_specs)):
        for th, (bits, vals, _codes) in enumerate(specs):
            seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        t = comp_tab[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bwr = _BitWriter()
    prev = [0] * nc
    for by, bx in itertools.product(range(bh), range(bw)):
        bi = by * bw + bx
        for ci in range(nc):
            t = comp_tab[ci]
            dc_codes = dc_specs[t][2]
            ac_codes = ac_specs[t][2]
            zz = qcoef[ci][bi]
            diff = int(zz[0]) - prev[ci]
            prev[ci] = int(zz[0])
            size = _category(diff)
            bwr.write(*dc_codes[size])           # (code, length)
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
    out.extend(b"\xff\xd9")                      # EOI
    return bytes(out)
