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


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=num_perm, dtype=np.uint64)
    return a, b


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Word k-shingles; falls back to the token set when the doc is short."""
    if len(tokens) <= k:
        return list(tokens)
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(shingle_list: list[str], num_perm: int,
                      seed: int = 42) -> np.ndarray:
    """uint64 signature of length num_perm (all-max for an empty doc)."""
    a, b = _perm_params(num_perm, seed)
    if not shingle_list:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    h = hash_terms(np.array(shingle_list, dtype=object)) % _P
    # (num_perm, n) matrix of permuted hashes -> row-wise min
    vals = (a[:, None] * h[None, :] + b[:, None]) % _P
    return vals.min(axis=1)


def band_hashes(signature: np.ndarray, bands: int) -> np.ndarray:
    """One uint64 bucket key per band (hash of the band's rows)."""
    rows = len(signature) // bands
    sig = signature[: bands * rows].reshape(bands, rows)
    mix = np.uint64(0x9E3779B97F4A7C15)
    out = np.zeros(bands, dtype=np.uint64)
    for r in range(rows):
        out = (out ^ sig[:, r]) * mix
    # fold band index in so identical bands in different positions differ
    return out + np.arange(bands, dtype=np.uint64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(tokens_a: set[str], tokens_b: set[str]) -> float:
    if not tokens_a and not tokens_b:
        return 1.0
    inter = len(tokens_a & tokens_b)
    union = len(tokens_a | tokens_b)
    return inter / union if union else 0.0
