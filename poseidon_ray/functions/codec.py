"""Posting-list codec: delta + varint encoding with block-max skip metadata.

Reimplements, from the public delta-varint idea, the reference's posting
layout (``common/proto/poseidon_if.proto:26-40``: DocIdList stores
``raw[i]-raw[i-1]`` so protobuf varints stay short; combiner/reducer codec
``InvertedIndexGenerateCombiner.java:111-176``) — but with real numpy
vectorization and an added block-max table (Ding & Suel block-max WAND) the
reference only hinted at (unused FastPForCompressedDocIdList,
poseidon_if.proto:43-46).

All functions are pure numpy — no Ray, heavily unit-tested.

Wire formats
------------
postings  : varint(delta doc_ids), first value absolute
tf_bytes  : varint(tf) per posting, same order
blockmax  : per block of `block_size` postings —
            uint64 last_docid (LE) + float64 max_impact (LE), concatenated.
            impact = tf / (tf + k1*(1 - b + b*dl/avgdl)); score =
            idf * (k1+1) * impact, so per-block max_impact gives a valid
            score upper bound for WAND skipping.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_VARINT_BYTES = 10


def encode_varint(values: np.ndarray) -> bytes:
    """Vectorized LEB128 varint encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=_U64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: 1 + floor(bitlen-1 / 7) via threshold compares
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nbytes += (v >= _U64(1) << _U64(7 * k)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    for b in range(_MAX_VARINT_BYTES):
        mask = nbytes > b
        if not mask.any():
            break
        pos = starts[mask] + b
        byte = ((v[mask] >> _U64(7 * b)) & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def decode_varint(data: bytes) -> np.ndarray:
    """Vectorized varint decode -> uint64 array."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) == 0:
        return np.empty(0, dtype=_U64)
    is_end = (buf & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=_U64)
    for b in range(int(lengths.max())):
        mask = lengths > b
        vals[mask] |= (buf[starts[mask] + b] & _U64(0x7F)).astype(_U64) << _U64(7 * b)
    return vals


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """Delta + varint encode. ``doc_ids`` must be sorted ascending (duplicates
    allowed — the reference keeps same-doc entries with distinct rows,
    InvertedIndexGenerateReducer.java:396-414; we aggregate tf instead so
    ids are unique, but the codec does not require it)."""
    ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    if len(ids) == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return encode_varint(deltas)


def decode_postings(data: bytes) -> np.ndarray:
    deltas = decode_varint(data)
    return np.cumsum(deltas, dtype=_U64)


def bm25_impacts(tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float,
                 k1: float, b: float) -> np.ndarray:
    """Per-posting impact in float64; full score = idf * (k1+1) * impact."""
    tf = tfs.astype(np.float64)
    norm = k1 * (1.0 - b + b * (doc_lens.astype(np.float64) / avgdl))
    return tf / (tf + norm)


def encode_blockmax(doc_ids: np.ndarray, impacts: np.ndarray,
                    block_size: int) -> bytes:
    """Skip table: (last_docid, max_impact) per block of `block_size`."""
    n = len(doc_ids)
    if n == 0:
        return b""
    nblocks = (n + block_size - 1) // block_size
    last = np.ascontiguousarray(doc_ids, dtype=_U64)[
        np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1
    ]
    maxes = np.array(
        [impacts[i * block_size:(i + 1) * block_size].max() for i in range(nblocks)],
        dtype=np.float64,
    )
    out = np.empty(nblocks, dtype=np.dtype([("last", "<u8"), ("max", "<f8")]))
    out["last"] = last
    out["max"] = maxes
    return out.tobytes()


def decode_blockmax(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(data, dtype=np.dtype([("last", "<u8"), ("max", "<f8")]))
    return arr["last"].copy(), arr["max"].copy()


def intersect_sorted(lists: list[np.ndarray]) -> np.ndarray:
    """Conjunctive AND of sorted unique doc_id arrays — the reference's
    DocIdIntersect (service/searcher/poseidon/doc_gz_client.go:90-104, which
    hash-intersects on logId). Smallest-first; np.intersect1d on sorted
    unique inputs is a vectorized merge."""
    if not lists:
        return np.empty(0, dtype=_U64)
    lists = sorted(lists, key=len)
    acc = lists[0]
    for nxt in lists[1:]:
        if len(acc) == 0:
            break
        acc = np.intersect1d(acc, nxt, assume_unique=True)
    return acc.astype(_U64, copy=False)
