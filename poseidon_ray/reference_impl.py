"""Brute-force reference implementation (the conformance oracle).

Plays the role of the reference Go searcher for rank-identity testing
(BASELINE.json: "rank-identical docIDs and BM25 scores versus the
reference"): a pure in-memory Python/numpy implementation with NO posting
compression, NO partitioning, NO pruning — just the definitionally-correct
computation. The Ray engine must match its top-k (doc_id, score) lists
bit-for-bit (float64) under the shared tiebreak (score desc, doc_id asc).

Tokenization is shared with the engine on purpose: tokenizer *correctness*
is pinned by its own golden tests (tests/test_tokenize.py); what this oracle
independently re-derives is docID assignment, df/cf/avgdl statistics, BM25
scoring and top-k selection.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from poseidon_ray.functions.tokenize import TOKENIZERS, tokenize_query
from poseidon_ray.schema import BM25Params, IndexSpec


@dataclass
class BruteForceIndex:
    num_docs: int = 0
    # field -> term -> {doc_id: tf}
    postings: dict = field(default_factory=dict)
    # field -> doc_id -> doc_len
    doc_lens: dict = field(default_factory=dict)
    doc_ids: np.ndarray | None = None
    sha256: dict = field(default_factory=dict)
    bm25: BM25Params = field(default_factory=BM25Params)


def assign_doc_ids(table: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Independent re-derivation of the docID rule: global rank under
    lexicographic (repo, path, commit) order."""
    import pandas as pd

    df = table.select(["repo", "path", "commit"]).to_pandas()
    order = np.lexsort((df["commit"].to_numpy(), df["path"].to_numpy(),
                        df["repo"].to_numpy()))
    doc_of_row = np.empty(len(order), dtype=np.uint64)
    doc_of_row[order] = np.arange(len(order), dtype=np.uint64)
    return table, doc_of_row


def build_brute_force(table: pa.Table, spec: IndexSpec | None = None) -> BruteForceIndex:
    spec = spec or IndexSpec()
    idx = BruteForceIndex(bm25=spec.bm25)
    _, doc_of_row = assign_doc_ids(table)
    idx.num_docs = table.num_rows
    idx.doc_ids = doc_of_row
    contents = table["content"].to_pylist()
    for row, did in enumerate(doc_of_row):
        idx.sha256[int(did)] = hashlib.sha256(
            contents[row].encode("utf-8", "surrogatepass")).hexdigest()
    for fld, (source, tok) in spec.fields.items():
        col = table[source]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        terms_rows, tfs_rows, dls = TOKENIZERS[tok](col)
        p: dict[str, dict[int, int]] = {}
        dl_map: dict[int, int] = {}
        for row in range(table.num_rows):
            did = int(doc_of_row[row])
            dl_map[did] = int(dls[row])
            for t, tf in zip(terms_rows[row], tfs_rows[row]):
                p.setdefault(t, {})[did] = int(tf)
        idx.postings[fld] = p
        idx.doc_lens[fld] = dl_map
    return idx


def bm25_idf(num_docs: int, df: int) -> float:
    return math.log(1.0 + (num_docs - df + 0.5) / (df + 0.5))


def score_query(
    idx: BruteForceIndex,
    text: str,
    field_name: str = "content",
    mode: str = "or",
    k: int = 10,
    tokenizer: str | None = None,
    spec: IndexSpec | None = None,
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k; returns [(doc_id, score)] sorted by
    (score desc, doc_id asc). AND mode scores only the intersection."""
    spec = spec or IndexSpec()
    tok = tokenizer or spec.fields[field_name][1]
    terms = tokenize_query(text, tok)
    p = idx.postings.get(field_name, {})
    dl_map = idx.doc_lens.get(field_name, {})
    n = idx.num_docs
    cf_total = sum(tf for tp in p.values() for tf in tp.values())
    avgdl = cf_total / n if n else 0.0
    k1, b = idx.bm25.k1, idx.bm25.b

    term_posts = [p.get(t, {}) for t in terms]
    if not terms:
        return []
    if mode == "and":
        docs = set(term_posts[0].keys())
        for tp in term_posts[1:]:
            docs &= set(tp.keys())
    else:
        docs = set()
        for tp in term_posts:
            docs |= set(tp.keys())
    scores: dict[int, float] = {}
    for t, tp in zip(terms, term_posts):
        if not tp:
            continue
        idf = bm25_idf(n, len(tp))
        for d in docs:
            tf = tp.get(d)
            if tf is None:
                continue
            dl = dl_map.get(d, 0)
            denom = tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 0.0))
            # association mirrors the engine: (idf*(k1+1)) * (tf/denom)
            scores[d] = scores.get(d, 0.0) + (idf * (k1 + 1.0)) * (tf / denom)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
