"""Posting codec round-trip — FIXTURES.md F4 cases."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from poseidon_ray.functions import codec

CASES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([7], dtype=np.uint64),
    np.array([0, 0, 0], dtype=np.uint64),                     # duplicate ids
    np.array([1, 2, 3, 4, 5], dtype=np.uint64),
    np.array([1, 1 + 127, 1 + 127 + 128], dtype=np.uint64),   # 2^7 boundary
    np.array([0, 2**14 - 1, 2**14, 2**14 + 1], dtype=np.uint64),
    np.array([0, 2**28, 2**28 + 2**28], dtype=np.uint64),
    np.array([0, 2**63 - 1, 2**63, 2**64 - 2], dtype=np.uint64),  # huge gaps
    np.arange(10**6, dtype=np.uint64) * 3,                    # cap-boundary size
]


@pytest.mark.parametrize("ids", CASES, ids=range(len(CASES)))
def test_postings_roundtrip(ids):
    enc = codec.encode_postings(ids)
    out = codec.decode_postings(enc)
    np.testing.assert_array_equal(out, ids)


def test_varint_roundtrip_values():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**64 - 1], dtype=np.uint64)
    np.testing.assert_array_equal(codec.decode_varint(codec.encode_varint(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(values):
    arr = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(codec.decode_varint(codec.encode_varint(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500))
def test_postings_roundtrip_property(values):
    ids = np.sort(np.array(values, dtype=np.uint64))
    np.testing.assert_array_equal(codec.decode_postings(codec.encode_postings(ids)), ids)


def test_varint_compactness():
    # small deltas must be 1 byte each (the point of delta encoding,
    # poseidon_if.proto:26-40)
    ids = np.arange(1000, dtype=np.uint64)
    assert len(codec.encode_postings(ids)) == 1000


@pytest.mark.parametrize("block_size", [64, 128])
def test_blockmax(block_size):
    rng = np.random.default_rng(42)
    n = 1000
    ids = np.cumsum(rng.integers(1, 50, n)).astype(np.uint64)
    tfs = rng.integers(1, 30, n).astype(np.uint32)
    dls = rng.integers(10, 5000, n).astype(np.uint32)
    bm = codec.decode_blockmax(codec.encode_blockmax(ids, tfs, dls, block_size))
    nblocks = (n + block_size - 1) // block_size
    assert len(bm) == nblocks
    k1, b, avgdl, idf = 1.2, 0.75, 900.0, 2.5
    ub = codec.block_upper_bounds(bm["tf_max"], bm["dl_min"], idf, avgdl, k1, b)
    impacts = codec.bm25_impacts(tfs, dls, avgdl, k1, b)
    scores = idf * (k1 + 1.0) * impacts
    doc_bytes = codec.encode_postings(ids, block_size)
    tf_bytes = codec.encode_varint(tfs.astype(np.uint64))
    dl_bytes = codec.encode_varint(dls.astype(np.uint64))
    for i in range(nblocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        assert bm["last"][i] == ids[hi - 1]
        assert bm["tf_max"][i] == tfs[lo:hi].max()
        assert bm["dl_min"][i] == dls[lo:hi].min()
        # the WAND safety property: bound dominates every real score in block
        assert ub[i] >= scores[lo:hi].max() - 1e-12
        # block-independent decode via stored byte offsets
        end_doc = bm["off_doc"][i + 1] if i + 1 < nblocks else len(doc_bytes)
        blk = codec.decode_varint(doc_bytes[bm["off_doc"][i]:end_doc])
        np.testing.assert_array_equal(np.cumsum(blk, dtype=np.uint64), ids[lo:hi])
        end_tf = bm["off_tf"][i + 1] if i + 1 < nblocks else len(tf_bytes)
        np.testing.assert_array_equal(
            codec.decode_varint(tf_bytes[bm["off_tf"][i]:end_tf]), tfs[lo:hi])


@pytest.mark.parametrize("block_size", [1, 3, 64, 128])
def test_blocked_postings_roundtrip(block_size):
    rng = np.random.default_rng(7)
    for n in [0, 1, 5, 64, 128, 129, 1000]:
        ids = np.cumsum(rng.integers(1, 1000, n)).astype(np.uint64)
        enc = codec.encode_postings(ids, block_size)
        np.testing.assert_array_equal(codec.decode_postings(enc, block_size), ids)


def test_intersect_sorted():
    a = np.array([1, 3, 5, 7, 9], dtype=np.uint64)
    b = np.array([3, 4, 5, 9, 11], dtype=np.uint64)
    c = np.array([5, 9], dtype=np.uint64)
    np.testing.assert_array_equal(codec.intersect_sorted([a, b, c]), [5, 9])
    assert len(codec.intersect_sorted([a, np.array([], dtype=np.uint64)])) == 0
    np.testing.assert_array_equal(codec.intersect_sorted([a]), a)


def test_delta_with_resets_roundtrip():
    rng = np.random.default_rng(5)
    vals = np.sort(rng.integers(0, 2**40, 500).astype(np.uint64))
    # arbitrary segment starts (first must be 0)
    starts = np.unique(np.concatenate([[0], rng.integers(1, 500, 20)]))
    deltas = codec.delta_with_resets(vals, starts)
    out = codec.undelta_segments(deltas, starts)
    np.testing.assert_array_equal(out, vals)
    # each segment's first stored value is absolute
    np.testing.assert_array_equal(deltas[starts], vals[starts])


def test_undelta_segments_single():
    v = np.array([7, 9, 30], dtype=np.uint64)
    d = codec.delta_with_resets(v, np.array([0]))
    np.testing.assert_array_equal(codec.undelta_segments(d, np.array([0])), v)


def test_undelta_segments_descending_boundaries():
    # doc ids RESTART lower at segment boundaries (chunks from different
    # term groups) — uint wraparound in the delta must cancel exactly
    v = np.array([100, 200, 5, 6, 3], dtype=np.uint64)
    starts = np.array([0, 2, 4])
    d = codec.delta_with_resets(v, starts)
    np.testing.assert_array_equal(codec.undelta_segments(d, starts), v)
