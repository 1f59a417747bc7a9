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

_HASH_KEY = "poseidon_ray_012"  # exactly 16 bytes, fixed => reproducible runs


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


def sha256_column(values) -> list[str]:
    """Per-row sha256 hex of a string column (the BASELINE.json per-row
    invariant). hashlib releases the GIL per call; loop is C-speed."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    return [hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest() for v in values]


def stable_int_hash(data: bytes) -> int:
    """64-bit stable hash of bytes (manifest lineage ids)."""
    return int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
