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
postings  : varint(delta doc_ids); the delta RESETS (absolute value) at every
            block boundary, so any block decodes independently — the skip
            structure block-max WAND needs to avoid touching skipped blocks.
tf_bytes  : varint(tf) per posting, same order
dl_bytes  : varint(doc_len) per posting, same order (carrying |d| with the
            posting removes the query-time doc-length lookup entirely; the
            global avgdl derives from directory stats: sum(cf)/N)
blockmax  : per block of `block_size` postings — LE records
            (uint64 last_docid, uint32 tf_max, uint32 dl_min,
             uint32 off_doc, uint32 off_tf, uint32 off_dl)
            where off_* are byte offsets of the block start inside the
            term's postings/tf_bytes/dl_bytes. BM25 impact
            tf/(tf + k1*(1-b+b*dl/avgdl)) is increasing in tf and
            decreasing in dl, so f(tf_max, dl_min) is a valid per-block
            score upper bound computable at query time once avgdl is known
            (avgdl is a global statistic unavailable during the build pass).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_VARINT_BYTES = 10


_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, _MAX_VARINT_BYTES)],
                       dtype=_U64)


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value: 1 + floor((bitlen-1)/7) — one
    searchsorted pass over the 9 power-of-128 thresholds (exact for the
    full uint64 range, no per-threshold boolean arrays)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    return 1 + np.searchsorted(_THRESHOLDS, v, side="right")


def encode_varint(values: np.ndarray) -> bytes:
    """Vectorized LEB128 varint encode of a uint64 array. Fast path: an
    all-below-128 array (typical for tfs / doc_lens / dense deltas) IS its
    byte representation."""
    v = np.ascontiguousarray(values, dtype=_U64)
    n = len(v)
    if n == 0:
        return b""
    if v.max() < 128:
        return v.astype(np.uint8).tobytes()
    nbytes = varint_lengths(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    max_b = int(nbytes.max())
    for b in range(max_b):
        mask = nbytes > b
        if mask.all():
            pos = starts + b
            byte = ((v >> _U64(7 * b)) & _U64(0x7F)).astype(np.uint8)
            cont = ((nbytes > b + 1).astype(np.uint8)) << 7
        else:
            pos = starts[mask] + b
            byte = ((v[mask] >> _U64(7 * b)) & _U64(0x7F)).astype(np.uint8)
            cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def decode_varint(data: bytes) -> np.ndarray:
    """Vectorized varint decode -> uint64 array. Fast path: no continuation
    bits anywhere means one byte per value."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) == 0:
        return np.empty(0, dtype=_U64)
    cont_mask = buf & 0x80
    if not cont_mask.any():
        return buf.astype(_U64)
    is_end = cont_mask == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(len(ends), dtype=_U64)
    for b in range(int(lengths.max())):
        mask = lengths > b
        if mask.all():
            vals |= (buf[starts + b] & _U64(0x7F)).astype(_U64) << _U64(7 * b)
        else:
            vals[mask] |= (buf[starts[mask] + b] & _U64(0x7F)).astype(_U64) << _U64(7 * b)
    return vals


def postings_deltas(doc_ids: np.ndarray, block_size: int | None = None) -> np.ndarray:
    """Deltas with an absolute reset at every `block_size` boundary.
    ``doc_ids`` must be sorted ascending (duplicates allowed — the reference
    keeps same-doc entries with distinct rows,
    InvertedIndexGenerateReducer.java:396-414; we aggregate tf instead so
    ids are unique, but the codec does not require it)."""
    ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    if len(ids) == 0:
        return ids
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    if block_size:
        resets = np.arange(0, len(ids), block_size)
        deltas[resets] = ids[resets]
    return deltas


def encode_postings(doc_ids: np.ndarray, block_size: int | None = None) -> bytes:
    return encode_varint(postings_deltas(doc_ids, block_size))


def undelta(deltas: np.ndarray, block_size: int | None = None) -> np.ndarray:
    """Inverse of postings_deltas: cumulative sum with per-block restarts,
    vectorized (naive global cumsum, then subtract each block's carry-in)."""
    if len(deltas) == 0 or not block_size or len(deltas) <= block_size:
        return np.cumsum(deltas, dtype=_U64)
    naive = np.cumsum(deltas, dtype=_U64)
    resets = np.arange(block_size, len(deltas), block_size)
    # carry-in of block j is naive[reset_j - 1]; uint64 wraparound cancels
    # between the cumsum and this subtraction, so the result is exact
    block_lens = np.diff(np.concatenate([resets, [len(deltas)]]))
    carry = np.concatenate(
        [np.zeros(block_size, dtype=_U64),
         np.repeat(naive[resets - 1], block_lens)]
    )
    return naive - carry


def decode_postings(data: bytes, block_size: int | None = None) -> np.ndarray:
    return undelta(decode_varint(data), block_size)


def delta_with_resets(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Delta-encode with an absolute restart at each ``starts`` position
    (arbitrary segment boundaries — the chunk/segment packing primitive)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    deltas = v.copy()
    if len(v) > 1:
        deltas[1:] = v[1:] - v[:-1]  # uint wrap at boundaries is
    deltas[starts] = v[starts]       # overwritten right here
    return deltas


def undelta_segments(deltas: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Inverse of delta_with_resets for arbitrary segment starts,
    vectorized: global cumsum minus each segment's carry-in (uint64
    wraparound cancels exactly)."""
    if len(deltas) == 0:
        return np.asarray(deltas, dtype=_U64)
    naive = np.cumsum(np.ascontiguousarray(deltas, dtype=_U64), dtype=_U64)
    seg_lens = np.diff(np.append(starts, len(deltas)))
    carry = np.zeros(len(starts), dtype=_U64)
    carry[1:] = naive[starts[1:] - 1]
    return naive - np.repeat(carry, seg_lens)


def bm25_impacts(tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float,
                 k1: float, b: float) -> np.ndarray:
    """Per-posting impact in float64; full score = idf * (k1+1) * impact."""
    tf = tfs.astype(np.float64)
    norm = k1 * (1.0 - b + b * (doc_lens.astype(np.float64) / avgdl))
    return tf / (tf + norm)


BLOCKMAX_DTYPE = np.dtype(
    [("last", "<u8"), ("tf_max", "<u4"), ("dl_min", "<u4"),
     ("off_doc", "<u4"), ("off_tf", "<u4"), ("off_dl", "<u4")]
)


def encode_blockmax(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
                    block_size: int) -> bytes:
    """Skip table for ONE term (convenience wrapper over the batched path
    used by the segment builder)."""
    n = len(doc_ids)
    if n == 0:
        return b""
    ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    tfs = np.asarray(tfs, dtype=_U64)
    dls = np.asarray(doc_lens, dtype=_U64)
    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)
    out = np.empty(len(starts), dtype=BLOCKMAX_DTYPE)
    out["last"] = ids[ends - 1]
    out["tf_max"] = np.maximum.reduceat(tfs, starts)
    out["dl_min"] = np.minimum.reduceat(dls, starts)
    dd = varint_lengths(postings_deltas(ids, block_size))
    out["off_doc"] = np.concatenate([[0], np.cumsum(dd)])[starts]
    out["off_tf"] = np.concatenate([[0], np.cumsum(varint_lengths(tfs))])[starts]
    out["off_dl"] = np.concatenate([[0], np.cumsum(varint_lengths(dls))])[starts]
    return out.tobytes()


def decode_blockmax(data: bytes) -> np.ndarray:
    """Structured array view (last, tf_max, dl_min, off_doc, off_tf, off_dl)."""
    return np.frombuffer(data, dtype=BLOCKMAX_DTYPE)


def block_upper_bounds(tf_max: np.ndarray, dl_min: np.ndarray, idf: float,
                       avgdl: float, k1: float, b: float) -> np.ndarray:
    """Per-block BM25 score upper bound from the skip table."""
    impacts = bm25_impacts(tf_max, dl_min, avgdl, k1, b)
    return idf * (k1 + 1.0) * impacts


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
