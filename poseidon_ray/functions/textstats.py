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
from poseidon_ray.functions.tokenize import (string_buffers, tokenize_simple,
                                             tokenize_simple_flat)

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
    gt, gtf, gp, dl = tokenize_simple_flat(values)
    stop = np.zeros(len(values), dtype=np.float64)
    if len(gt):
        mask = np.isin(gt, list(_STOPWORDS))
        counts = np.bincount(gp[mask], weights=gtf[mask].astype(np.float64),
                             minlength=len(values))
        nz = dl > 0
        stop[nz] = counts[nz] / dl[nz]
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
    """Marker-word vote per doc; 'und' when nothing matches. Whole-batch
    vectorized: one isin + one bincount per language over the flat
    (row, term, tf) arrays — no per-row Python."""
    n = len(values)
    gt, gtf, gp, _dl = tokenize_simple_flat(values)
    langs = list(_LANG_MARKERS)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    if len(gt):
        w = gtf.astype(np.float64)
        for j, lang in enumerate(langs):
            mask = np.isin(gt, list(_LANG_MARKERS[lang]))
            if mask.any():
                scores[:, j] = np.bincount(
                    gp[mask], weights=w[mask], minlength=n).astype(np.int64)
    best = np.argmax(scores, axis=1)     # first max wins = dict-order vote
    names = np.array(langs + ["und"], dtype=object)
    best = np.where(scores.max(axis=1) > 0, best, len(langs))
    return pa.array(names[best], type=pa.string())


# ------------------------------------------------------------- fingerprints

_FP_BASE = np.uint64(1099511628211)   # FNV prime as rolling base
_FP_WINDOW = 8


def rolling_fingerprint(values: pa.Array) -> pa.Array:
    """Winnowing-style document fingerprint: min of rolling byte-window
    hashes (Schleimer et al. winnowing, simplified to a single min).
    Whole-batch vectorized: the polynomial rolling hash runs ONCE over the
    batch's concatenated utf-8 buffer; per-row mins come from one
    ``minimum.reduceat`` over each row's window range (windows spanning row
    boundaries are excluded by construction of the ranges)."""
    values = pc.fill_null(values, "")
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    n_rows = len(values)
    out = np.zeros(n_rows, dtype=np.uint64)
    if n_rows == 0:
        return pa.array(out, type=pa.uint64())
    offsets, data = string_buffers(values)
    row_lens = offsets[1:] - offsets[:-1]
    short = row_lens < _FP_WINDOW
    if short.any():
        # short rows: hash the whole text (empty -> 0), tiny minority path
        texts = np.asarray(values.to_pylist(), dtype=object)[short]
        vals = np.array([hash_terms([t])[0] if t else 0 for t in texts],
                        dtype=np.uint64)
        out[np.flatnonzero(short)] = vals
    if data is not None and (~short).any():
        nwin_all = len(data) - _FP_WINDOW + 1
        acc = np.zeros(nwin_all, dtype=np.uint64)
        for j in range(_FP_WINDOW):
            acc = acc * _FP_BASE + data[j:nwin_all + j].astype(np.uint64)
        long_rows = np.flatnonzero(~short)
        starts = offsets[:-1][long_rows]
        ends = starts + (row_lens[long_rows] - _FP_WINDOW + 1)
        # interleaved [s0,e0,s1,e1,...]: even reduceat slots = min over the
        # row's own windows [s,e); odd slots (gaps) are discarded. One
        # sentinel keeps idx==nwin_all legal for the buffer-final row.
        idx = np.empty(2 * len(starts), dtype=np.int64)
        idx[0::2] = starts
        idx[1::2] = ends
        guarded = np.concatenate([acc, [np.uint64(0)]])
        red = np.minimum.reduceat(guarded, idx)
        out[long_rows] = red[0::2]
    return pa.array(out, type=pa.uint64())


def simhash64(values: pa.Array) -> pa.Array:
    """64-bit SimHash (Charikar) over simple tokens weighted by tf.
    Whole-batch vectorized: one hash pass over the flat token array, then
    64 per-row bincount votes (no per-row Python)."""
    n = len(values)
    gt, gtf, gp, _dl = tokenize_simple_flat(values)
    out = np.zeros(n, dtype=np.uint64)
    if len(gt) == 0:
        return pa.array(out, type=pa.uint64())
    hs = hash_terms(gt)
    w = gtf.astype(np.float64)
    row_w = np.bincount(gp, weights=w, minlength=n)   # Σ tf per row
    sig = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        bit = ((hs >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(gp, weights=w * bit, minlength=n)
        # votes = ones - (row_w - ones) > 0  <=>  2*ones > row_w
        sig |= (2.0 * ones > row_w).astype(np.uint64) << np.uint64(b)
    return pa.array(sig, type=pa.uint64())


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpacking bytes
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
