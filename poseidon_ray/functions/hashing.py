"""Deterministic hashing.

The reference hashes tokens with murmur3_x86_32 on BOTH sides of a language
boundary (Java builder: util/MurmurHash3.java:68-118; Go query:
spaolacci/murmur3 via inverted_index_gz_client.go:47-53) — a consistency trap
this single-implementation module avoids. We use pandas' SipHash-based
``hash_array`` (fixed key, vectorized, uint64) for term partitioning and
sha256 for the per-row content invariant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "poseidon_ray_0123"  # 16 bytes, fixed => reproducible runs


def hash_terms(terms) -> np.ndarray:
    """uint64 hash per term. Accepts a pyarrow Array/ChunkedArray, numpy
    object array, or list of str. Vectorized (C siphash under the hood)."""
    if isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = terms.to_numpy(zero_copy_only=False)
    arr = np.asarray(terms, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def term_partition(terms, num_partitions: int) -> np.ndarray:
    """Unsalted shuffle key: hash(term) % P — the TokenId/FileId bucketing
    analog (docs/build_inverted_index.md:54-87)."""
    return (hash_terms(terms) % np.uint64(num_partitions)).astype(np.uint32)


def salted_partition(
    terms,
    doc_ids: np.ndarray,
    num_partitions: int,
    hot_terms: set[str] | dict,
    salt_factor: int,
) -> np.ndarray:
    """Shuffle key with hot-term salting (north rule; SURVEY §2.5 A7).

    Hot terms get ``salt_factor`` distinct partitions chosen by doc_id range
    (doc_id // stride-free modulo keeps salted shards doc-disjoint), so no
    single segment-build group has to absorb a stopword-class posting list.
    Salted shards are re-merged logically at directory load (df/cf summed);
    postings stay physically split, which is rank-safe because BM25 only
    needs global df/cf plus per-doc tf.
    """
    h = hash_terms(terms)
    part = (h % np.uint64(num_partitions)).astype(np.uint32)
    if not hot_terms or salt_factor <= 1:
        return part
    if isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = terms.to_numpy(zero_copy_only=False)
    terms = np.asarray(terms, dtype=object)
    hot_mask = np.isin(terms, list(hot_terms))
    if hot_mask.any():
        salt = (doc_ids[hot_mask] % np.uint64(salt_factor)).astype(np.uint64)
        part[hot_mask] = (
            (h[hot_mask] + salt * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(num_partitions)
        ).astype(np.uint32)
    return part


def sha256_column(values) -> list[str]:
    """Per-row sha256 hex of a string column (the BASELINE.json per-row
    invariant). hashlib releases the GIL per call; loop is C-speed."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    return [hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest() for v in values]


def stable_int_hash(data: bytes) -> int:
    """64-bit stable hash of bytes (manifest lineage ids)."""
    return int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
