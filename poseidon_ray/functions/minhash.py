"""MinHash signatures + LSH banding (Broder resemblance sketches;
Leskovec/Rajaraman/Ullman banding analysis). Pure numpy, deterministic.

Signature: k permutations approximated by 2-universal hashing
``(a_i * h(x) + b_i) mod p`` over the token/shingle hash set.
LSH: signature split into ``bands`` bands of ``rows`` values; equal band
hash => candidate pair. Estimated Jaccard = fraction of matching
signature positions.
"""

from __future__ import annotations

import numpy as np

from poseidon_ray.functions.hashing import hash_terms

_P = np.uint64((1 << 61) - 1)  # Mersenne prime


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        rng = np.random.default_rng(seed)
        a = rng.integers(1, int(_P), size=num_perm, dtype=np.uint64)
        b = rng.integers(0, int(_P), size=num_perm, dtype=np.uint64)
        _PERM_CACHE[key] = (a, b)
    return _PERM_CACHE[key]


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Word k-shingles; falls back to the token set when the doc is short."""
    if len(tokens) <= k:
        return list(tokens)
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(shingle_list: list[str], num_perm: int,
                      seed: int = 42) -> np.ndarray:
    """uint64 signature of length num_perm (all-max for an empty doc)."""
    sigs = minhash_signatures_batch([shingle_list], num_perm, seed)
    return sigs[0]


def minhash_signatures_batch(shingle_lists: list[list[str]], num_perm: int,
                             seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) signatures for a whole batch in ONE pass: hash
    every shingle of every doc together, apply all permutations as one
    (num_perm x total) matrix op, then per-doc mins via minimum.reduceat."""
    a, b = _perm_params(num_perm, seed)
    n_docs = len(shingle_lists)
    lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.empty(total, dtype=object)
    pos = 0
    for s in shingle_lists:
        flat[pos:pos + len(s)] = s
        pos += len(s)
    h = hash_terms(flat) % _P
    vals = (a[:, None] * h[None, :] + b[:, None]) % _P  # (num_perm, total)
    nonempty = lens > 0
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])[nonempty]
    mins = np.minimum.reduceat(vals, starts, axis=1)    # (num_perm, n_nonempty)
    out[nonempty] = mins.T
    return out


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """One uint64 bucket key per band (hash of the band's rows)."""
    return band_hashes_batch(signature[None, :], bands)[0]


def band_hashes_batch(signatures: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) bucket keys from (n_docs, num_perm) signatures."""
    n_docs, num_perm = signatures.shape
    rows = num_perm // bands
    sig = signatures[:, : bands * rows].reshape(n_docs, bands, rows)
    mix = np.uint64(0x9E3779B97F4A7C15)
    out = np.zeros((n_docs, bands), dtype=np.uint64)
    for r in range(rows):
        out = (out ^ sig[:, :, r]) * mix
    # fold band index in so identical bands in different positions differ
    return out + np.arange(bands, dtype=np.uint64)[None, :]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(tokens_a: set[str], tokens_b: set[str]) -> float:
    if not tokens_a and not tokens_b:
        return 1.0
    inter = len(tokens_a & tokens_b)
    union = len(tokens_a | tokens_b)
    return inter / union if union else 0.0
