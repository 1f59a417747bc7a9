"""Text-analysis kernels for training-data pipelines: token counting,
quality metrics, language ID, document fingerprinting, SimHash.

All functions take an Arrow string array and return Arrow/numpy columns;
vectorized with pyarrow.compute where the kernel exists, numpy otherwise.
These power the ``queries()`` entries the driver checks against DuckDB
(integer-valued metrics are chosen so float association can never break
the value-hash comparison).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from poseidon_ray.functions.hashing import hash_terms
from poseidon_ray.functions.tokenize import tokenize_simple

# ------------------------------------------------------------- counting

def token_count(values: pa.Array) -> pa.Array:
    """Whitespace token count (empty string -> 0). SQL twin:
    len(list_filter(string_split_regex(text,'\\s+'), x -> x <> ''))."""
    values = pc.fill_null(values, "")
    split = pc.split_pattern_regex(values, r"\s+")
    flat = split.flatten() if not isinstance(split, pa.ChunkedArray) else split.combine_chunks().flatten()
    # count non-empty per row: total lengths minus empties, vectorized
    lens = pc.list_value_length(split)
    # subtract empties: build mask of empty strings and re-aggregate
    nonempty = pc.cast(pc.not_equal(pc.utf8_length(flat), 0), pa.int64())
    lens_np = lens.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens_np)])
    ne = nonempty.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(ne)])
    return pa.array(csum[offsets[1:]] - csum[offsets[:-1]], type=pa.int64())


def char_class_counts(values: pa.Array) -> dict[str, pa.Array]:
    """Integer per-doc character-class counts (exact-match safe vs SQL)."""
    values = pc.fill_null(values, "")
    n_chars = pc.cast(pc.utf8_length(values), pa.int64())

    def count_removed(pattern: str) -> pa.Array:
        kept = pc.replace_substring_regex(values, pattern, "")
        return pc.cast(pc.utf8_length(kept), pa.int64())

    return {
        "n_chars": n_chars,
        "n_punct": count_removed(r"[a-zA-Z0-9\s]"),   # chars left = punct-ish
        "n_digits": count_removed(r"[^0-9]"),
        "n_spaces": count_removed(r"[^ ]"),
    }


def quality_scores(values: pa.Array) -> dict[str, np.ndarray]:
    """Float quality ratios (length/punct/stopword) for filtering pipelines
    (not oracle-checked — float ratios live outside the SQL-parity set)."""
    c = char_class_counts(values)
    n = c["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = np.where(n == 0, 1.0, n)
    toks = token_count(values).to_numpy(zero_copy_only=False)
    terms, tfs, dl = tokenize_simple(values)
    stop = np.zeros(len(values), dtype=np.float64)
    for i, (ts, fs) in enumerate(zip(terms, tfs)):
        if dl[i]:
            stop[i] = sum(f for t, f in zip(ts, fs) if t in _STOPWORDS) / dl[i]
    return {
        "punct_ratio": c["n_punct"].to_numpy(zero_copy_only=False) / n,
        "digit_ratio": c["n_digits"].to_numpy(zero_copy_only=False) / n,
        "tokens_per_100_chars": 100.0 * toks / n,
        "stopword_ratio": stop,
    }


_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be for on with as at by it this".split()
)

# ------------------------------------------------------------- language ID

# tiny per-language marker-word profiles (public-knowledge function words);
# heuristic n-gram/stopword scoring in the spirit of Cavnar & Trenkle
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was", "a"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"},
    "es": {"el", "la", "los", "las", "es", "una", "en", "que", "por", "con"},
}


def detect_language(values: pa.Array) -> pa.Array:
    """Marker-word vote per doc; 'und' when nothing matches."""
    terms, tfs, _dl = tokenize_simple(values)
    out = []
    for ts, fs in zip(terms, tfs):
        best, best_score = "und", 0
        tset = dict(zip(ts, fs))
        for lang, markers in _LANG_MARKERS.items():
            score = sum(tset.get(m, 0) for m in markers)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return pa.array(out, type=pa.string())


# ------------------------------------------------------------- fingerprints

_FP_BASE = np.uint64(1099511628211)   # FNV prime as rolling base
_FP_WINDOW = 8


def rolling_fingerprint(values: pa.Array) -> pa.Array:
    """Winnowing-style document fingerprint: min of rolling byte-window
    hashes (Schleimer et al. winnowing, simplified to a single min)."""
    out = np.zeros(len(values), dtype=np.uint64)
    vals = pc.fill_null(values, "").to_pylist()
    for i, text in enumerate(vals):
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(b) < _FP_WINDOW:
            out[i] = hash_terms([text])[0] if text else 0
            continue
        h = np.zeros(len(b) - _FP_WINDOW + 1, dtype=np.uint64)
        acc = np.zeros_like(h)
        for j in range(_FP_WINDOW):
            acc = acc * _FP_BASE + b[j:len(b) - _FP_WINDOW + 1 + j].astype(np.uint64)
        h = acc
        out[i] = h.min()
    return pa.array(out, type=pa.uint64())


def simhash64(values: pa.Array) -> pa.Array:
    """64-bit SimHash (Charikar) over simple tokens weighted by tf."""
    terms, tfs, _dl = tokenize_simple(values)
    out = np.zeros(len(values), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, (ts, fs) in enumerate(zip(terms, tfs)):
        if not ts:
            continue
        hs = hash_terms(np.array(ts, dtype=object))
        w = np.asarray(fs, dtype=np.int64)
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (w[:, None] * (2 * bitmat - 1)).sum(axis=0)
        out[i] = np.packbits((votes > 0)[::-1]).view(">u8")[0]
    return pa.array(out, type=pa.uint64())


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpacking bytes
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
