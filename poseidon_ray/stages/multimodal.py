"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Decode support is split honestly by what this container can do:

- REAL decoders (pure numpy / stdlib — no external libs needed):
  * PPM ``P6`` / PGM ``P5`` images -> (h, w, c) uint8 pixel tensors
  * PNG (8-bit gray/RGB/palette/alpha, non-interlaced AND Adam7) -> uint8
    (stdlib zlib inflate + numpy scanline unfiltering incl. Paeth)
  * JPEG, baseline AND progressive (``functions/jpegcodec``: multi-scan
    huffman + dequant + IDCT per ITU-T T.81 incl. Annex-G spectral
    selection / successive approximation; arithmetic coding still refuses)
  * RIFF/WAVE PCM-16 audio -> sample tensor (folded to uint8 feature range)
  * YUV4MPEG2 video -> uint8 RGB frame stacks (C420/C444, BT.601)
- STUBBED: formats needing ffmpeg (MP3/MP4) raise NotImplementedError at
  the exact point it would be called (``fake=False``), or run a
  deterministic stand-in (``fake=True``) so the Ray-side plumbing — schema,
  batch sizing, actor lifecycle, output layout — is exercised regardless.

Batch sizes here are intentionally SMALL: a 4 MB payload x 256-row batch x
8 actors is 8 GB of heap — the memory-aware sizing rule from the top-level
design notes.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # image | audio | video
    ("payload", pa.large_binary()),
    ("meta", pa.string()),           # JSON sidecar (source, declared dims...)
])


# ------------------------------------------------------------ real decoders

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 interlace pass grid: (x0, y0, dx, dy) per the public PNG spec
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(arr: np.ndarray, ph: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (None/Sub/Up/Average/Paeth) for one
    (sub)image: ``arr`` is (ph, stride+1) with the filter byte first."""
    ftypes = arr[:, 0]
    out = np.zeros((ph, stride), dtype=np.uint8)
    for y in range(ph):
        f = int(ftypes[y])
        cur = arr[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:                         # None
            rec = cur
        elif f == 2:                       # Up — fully vectorized
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):               # Sub/Average/Paeth: left-dependent
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + prev[x]) >> 1
                else:
                    up = prev[x]
                    ul = prev[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb_ and pa_ <= pc_) else (
                        up if pb_ <= pc_ else ul)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[y] = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array (h, w, c). Pure stdlib zlib + numpy scanline
    unfiltering (None/Sub/Up/Average/Paeth per the public PNG spec),
    8-bit depth, color types gray/RGB/palette/gray+alpha/RGBA,
    non-interlaced AND Adam7-interlaced (r4: each of the 7 passes is an
    independent filtered subimage scattered back on its pass grid).
    Palette images are expanded to RGB."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # chunk header + data + CRC
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} not supported (8 only)")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color} not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline data size mismatch")
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        img = _png_unfilter(arr, h, stride, ch).reshape(h, w, ch)
    else:
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(h - y0) // dy))
            if pw == 0 or ph == 0:
                continue                   # empty pass: no data at all
            stride = pw * ch
            need = ph * (stride + 1)
            arr = np.frombuffer(raw, dtype=np.uint8, count=need,
                                offset=off).reshape(ph, stride + 1)
            off += need
            sub = _png_unfilter(arr, ph, stride, ch).reshape(ph, pw, ch)
            img[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG interlaced data size mismatch")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w, c) uint8 -> minimal valid PNG (filter 0, one IDAT). Pure
    stdlib — the sink twin of ``decode_png`` (and the test fixture).
    ``interlace=True`` writes an Adam7 stream (7 per-pass subimages)."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    if not interlace:
        raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary PNM -> uint8 array (h, w, c). Pure
    numpy; supports whitespace + '#' comments per the spec; maxval <= 255."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    n = w * h * channels
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, channels)


_Y4M_MAGIC = b"YUV4MPEG2 "


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 (.y4m) uncompressed video -> uint8 RGB frames
    (n, h, w, 3). Pure numpy + the public Y4M layout: one ASCII stream
    header (W/H/F/C params), then per frame a ``FRAME...\\n`` marker and
    raw planar YCbCr. Colorspaces C420* (2x2-subsampled chroma, upsampled
    here by nearest) and C444; full-range BT.601 conversion (the
    ``C420jpeg`` convention — also applied to the other tags: synthetic
    fixtures here are full-range, and a production sink would swap in the
    limited-range matrix)."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    cspace = "420jpeg"
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cspace = tok[1:].decode()
    if not w or not h:
        raise ValueError("Y4M missing W/H")
    if cspace.startswith("420"):
        cw, chh = (w + 1) // 2, (h + 1) // 2
    elif cspace == "444":
        cw, chh = w, h
    else:
        raise ValueError(f"Y4M colorspace C{cspace} not supported")
    ysz, csz = w * h, cw * chh
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = payload.index(b"\n", pos) + 1
        if pos + ysz + 2 * csz > len(payload):
            raise ValueError("Y4M truncated frame")
        y = np.frombuffer(payload, np.uint8, ysz, pos).reshape(h, w)
        cb = np.frombuffer(payload, np.uint8, csz, pos + ysz).reshape(chh, cw)
        cr = np.frombuffer(payload, np.uint8, csz,
                           pos + ysz + csz).reshape(chh, cw)
        pos += ysz + 2 * csz
        if cw != w:  # nearest-neighbor chroma upsample
            cb = cb[np.arange(h) // 2][:, np.arange(w) // 2]
            cr = cr[np.arange(h) // 2][:, np.arange(w) // 2]
        yf = y.astype(np.float64)
        cbf = cb.astype(np.float64) - 128.0
        crf = cr.astype(np.float64) - 128.0
        rgb = np.stack([yf + 1.402 * crf,
                        yf - 0.344136 * cbf - 0.714136 * crf,
                        yf + 1.772 * cbf], axis=-1)
        frames.append(np.clip(np.rint(rgb), 0, 255).astype(np.uint8))
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)


def encode_y4m(frames: np.ndarray, fps: int = 25,
               colorspace: str = "420jpeg") -> bytes:
    """(n, h, w, 3) uint8 RGB -> minimal .y4m (full-range BT.601; chroma
    2x2 box-averaged for C420*, or C444). The sink twin of ``decode_y4m``
    and the video test fixture."""
    n, h, w, _ = frames.shape
    sub = colorspace.startswith("420")
    if sub and (w % 2 or h % 2):
        raise ValueError("C420 needs even dimensions")
    parts = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C%s\n"
             % (w, h, fps, colorspace.encode())]
    f = frames.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    yp = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(np.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
    cr = np.clip(np.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
    for i in range(n):
        cbi, cri = cb[i], cr[i]
        if sub:
            cbi = cbi.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cri = cri.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        parts.append(b"FRAME\n" + yp[i].astype(np.uint8).tobytes()
                     + np.rint(cbi).astype(np.uint8).tobytes()
                     + np.rint(cri).astype(np.uint8).tobytes())
    return b"".join(parts)


def decode_wav_pcm16(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM-16 -> int16 samples (n, channels). Stdlib `wave`."""
    import wave

    with wave.open(io.BytesIO(payload)) as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM-16 supported")
        frames = f.readframes(f.getnframes())
        return np.frombuffer(frames, dtype="<i2").reshape(-1, f.getnchannels())


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


class DecodeMedia:
    """binary payload -> (dims, channels, mean, pixel/sample tensor).

    ``fake=False``: REAL decode for PNM/PNG/baseline-JPEG images, PCM WAV
    audio and Y4M video; raises NotImplementedError for formats that need
    ffmpeg (MP3/MP4). ``fake=True`` (default): deterministic stand-in for
    every payload."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, float, bytes]:
        if payload[:2] in (b"P6", b"P5"):
            px = decode_pnm(payload)
            h, w, c = px.shape
            return w, h, c, float(px.mean()), px.tobytes()
        if payload[:8] == _PNG_SIG:
            px = decode_png(payload)
            h, w, c = px.shape
            return w, h, c, float(px.mean()), px.tobytes()
        if payload[:4] == b"RIFF":
            samples = decode_wav_pcm16(payload)
            n, c = samples.shape
            # fold to the uint8 feature range shared with images
            folded = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
            return n, 1, c, float(samples.mean()), folded.tobytes()
        if payload.startswith(_Y4M_MAGIC):
            frames = decode_y4m(payload)
            n, h, w, c = frames.shape
            # single-tensor contract: first frame; per-frame work is
            # SampleFrames' job
            first = frames[0].tobytes() if n else b""
            return w, h, c, float(frames.mean()) if n else 0.0, first
        if payload[:2] == b"\xff\xd8":
            from poseidon_ray.functions.jpegcodec import decode_jpeg

            px = decode_jpeg(payload)
            h, w, c = px.shape
            return w, h, c, float(px.mean()), px.tobytes()
        raise NotImplementedError(
            "compressed audio/video (MP3/MP4) needs ffmpeg — not in this "
            "container; PNM/PNG/baseline-JPEG images, PCM WAV and Y4M video "
            "decode for real, or run with fake=True for the stand-in")

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, chans, means, tensors = [], [], [], [], []
        for payload in t["payload"].to_pylist():
            if self.fake:
                w, h = _fake_dims(payload)
                arr = np.frombuffer(payload, dtype=np.uint8)
                widths.append(w)
                heights.append(h)
                chans.append(1)
                means.append(float(arr.mean()) if len(arr) else 0.0)
                tensors.append(payload)
            else:
                w, h, c, m, tensor = self._decode_one(payload)
                widths.append(w)
                heights.append(h)
                chans.append(c)
                means.append(m)
                tensors.append(tensor)
        return pa.table({
            "media_id": t["media_id"],
            "media_type": t["media_type"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "channels": pa.array(chans, type=pa.int32()),
            "mean_value": pa.array(means, type=pa.float64()),
            "tensor": pa.array(tensors, type=pa.large_binary()),
        })


class SampleFrames:
    """video payload -> one row per sampled frame (media_id, frame_idx,
    width, height, channels, tensor): the frame-sampling stage of a video
    training-data pipeline, as an actor-pool ``map_batches`` class (small
    batches — a clip x batch x actor must fit the worker heap).

    Sampling: ``every_n`` (stride) or ``n_samples`` uniformly spaced over
    the clip. ``fake=False``: REAL decode for Y4M clips, NotImplementedError
    at the codec call site for compressed containers (MP4/MKV need ffmpeg).
    ``fake=True`` (default): deterministic stand-in frames so the Ray-side
    plumbing runs on opaque payloads."""

    def __init__(self, every_n: int | None = None, n_samples: int = 4,
                 fake: bool = True):
        self.every_n = every_n
        self.n_samples = n_samples
        self.fake = fake

    def _indices(self, n_frames: int) -> np.ndarray:
        if n_frames <= 0:
            return np.empty(0, dtype=np.int64)
        if self.every_n:
            return np.arange(0, n_frames, self.every_n, dtype=np.int64)
        k = min(self.n_samples, n_frames)
        return np.unique(np.linspace(0, n_frames - 1, k).round()
                         .astype(np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, ws, hs, cs, tensors = [], [], [], [], [], []
        mids = t["media_id"].to_pylist()
        for row, payload in enumerate(t["payload"].to_pylist()):
            if payload.startswith(_Y4M_MAGIC) and not self.fake:
                frames = decode_y4m(payload)
                n, h, w, c = frames.shape
                per_frame = [frames[i].tobytes()
                             for i in self._indices(n)]
            elif self.fake:
                dig = hashlib.sha256(payload).digest()
                n = 1 + dig[2] % 15
                w, h = _fake_dims(payload)
                c = 3
                per_frame = [hashlib.sha256(payload + bytes([i])).digest()
                             for i in self._indices(n)]
            else:
                raise NotImplementedError(
                    "compressed video (MP4/MKV) needs ffmpeg — not in this "
                    "container; Y4M decodes for real, or run fake=True")
            for j, tensor in zip(self._indices(n), per_frame):
                ids.append(mids[row])
                idxs.append(int(j))
                ws.append(w)
                hs.append(h)
                cs.append(c)
                tensors.append(tensor)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int64()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "channels": pa.array(cs, type=pa.int32()),
            "tensor": pa.array(tensors, type=pa.large_binary()),
        })


def sample_frames(ds, *, every_n: int | None = None, n_samples: int = 4,
                  concurrency=(1, 4), batch_size: int = 8, fake: bool = True):
    """Filter to video rows -> actor-pool frame sampling. Batch size is
    SMALL on purpose: clips are the largest payloads in the table."""
    vids = ds.filter(
        expr="media_type == 'video'") if "media_type" in ds.schema().names \
        else ds
    return vids.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_n": every_n, "n_samples": n_samples,
                               "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class ResizeMedia:
    """Images: REAL nearest-neighbor resize of the pixel tensor to fit the
    target box (ratio kept). Audio/opaque tensors: dims clamped only."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["channels"].to_numpy(zero_copy_only=False).astype(np.int64)
        types = t["media_type"].to_pylist()
        out_w, out_h, out_tensor = [], [], []
        for i, payload in enumerate(t["tensor"].to_pylist()):
            scale = min(1.0, self.target / max(w[i], h[i], 1))
            nw, nh = max(1, int(w[i] * scale)), max(1, int(h[i] * scale))
            if (types[i] == "image" and len(payload) == w[i] * h[i] * c[i]
                    and (nw, nh) != (w[i], h[i])):
                px = np.frombuffer(payload, dtype=np.uint8).reshape(
                    h[i], w[i], c[i])
                yi = (np.arange(nh) * h[i] // nh)
                xi = (np.arange(nw) * w[i] // nw)
                payload = px[yi][:, xi].tobytes()
            out_w.append(nw)
            out_h.append(nh)
            out_tensor.append(payload)
        return pa.table({
            "media_id": t["media_id"],
            "media_type": t["media_type"],
            "width": pa.array(out_w, type=pa.int32()),
            "height": pa.array(out_h, type=pa.int32()),
            "channels": t["channels"],
            "mean_value": t["mean_value"],
            "tensor": pa.array(out_tensor, type=pa.large_binary()),
        })


class ExtractFeatures:
    """tensor -> fixed-dim normalized histogram (a deterministic stand-in
    for a model forward pass; a real model would be loaded HERE in
    __init__, once per actor)."""

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real feature extraction needs a model")
        feats = []
        col = "tensor" if "tensor" in t.column_names else "payload"
        for payload in t[col].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.dim, range=(0, 256))
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32))
        return pa.table({
            "media_id": t["media_id"],
            "embedding": pa.array([f.tolist() for f in feats],
                                  type=pa.list_(pa.float32())),
        })


def media_pipeline(ds, *, target: int = 224, feature_dim: int = 32,
                   concurrency=(1, 4), batch_size: int = 32,
                   fake: bool = True):
    """decode -> resize -> features, all actor pools, small batches."""
    decoded = ds.map_batches(DecodeMedia, fn_constructor_kwargs={"fake": fake},
                             batch_format="pyarrow", batch_size=batch_size,
                             concurrency=concurrency)
    resized = decoded.map_batches(ResizeMedia,
                                  fn_constructor_kwargs={"target": target},
                                  batch_format="pyarrow", batch_size=batch_size,
                                  concurrency=concurrency)
    return resized.map_batches(ExtractFeatures,
                               fn_constructor_kwargs={"dim": feature_dim},
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=concurrency)


def synthesize_media(n: int, seed: int = 42, real_formats: bool = False) -> pa.Table:
    """Deterministic payloads for tests/benchmarks. ``real_formats=True``
    emits REAL P6 images, PCM-16 WAV files and Y4M clips (all decodable by
    the fake=False path)."""
    rng = np.random.default_rng(seed)
    payloads, types = [], []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        types.append(mtype)
        if real_formats and mtype == "image":
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 9 == 6:           # every 3rd image: baseline JPEG
                from poseidon_ray.functions.jpegcodec import encode_jpeg

                payloads.append(encode_jpeg(px, quality=95))
            else:
                payloads.append(
                    b"P6\n# synth\n%d %d\n255\n" % (w, h) + px.tobytes())
        elif real_formats and mtype == "audio":
            import wave

            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(8000)
                f.writeframes(rng.integers(-32768, 32767, size=int(
                    rng.integers(100, 2000)), dtype=np.int16).tobytes())
            payloads.append(buf.getvalue())
        elif real_formats and mtype == "video":
            n_frames = int(rng.integers(4, 13))
            w, h = 2 * int(rng.integers(4, 17)), 2 * int(rng.integers(4, 17))
            # solid-color frames: survive 2x2 chroma averaging exactly
            colors = rng.integers(0, 256, size=(n_frames, 1, 1, 3),
                                  dtype=np.uint8)
            frames = np.broadcast_to(colors, (n_frames, h, w, 3)).copy()
            payloads.append(encode_y4m(frames))
        else:
            payloads.append(rng.integers(0, 256, size=int(
                rng.integers(64, 4096)), dtype=np.uint8).tobytes())
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(types, type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "meta": pa.array(["{}"] * n, type=pa.string()),
    })
