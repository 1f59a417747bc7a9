"""Deduplication stages for large-scale training-data pipelines.

All are shuffle-on-a-small-key designs: the wide exchange always moves
hashes/signatures (tens of bytes/doc), never document content.

- exact:    sha256(content) hash-partition -> per-group first (the natural
            extension of the reference's within-line token dedup, SURVEY
            §2.7 — the reference never dedups docs).
- minhash:  shingle -> MinHash signature -> LSH band buckets (groupby) ->
            candidate pairs with estimated Jaccard.
- simhash:  64-bit SimHash -> 16-bit band buckets -> pairs by Hamming
            distance (Charikar / Manku et al. near-dup design).
- embedding: random-hyperplane LSH buckets -> within-bucket cosine pairs.

Pair emission is bucket-local (map_groups), so cost scales with bucket
sizes, not corpus^2; a global ``unique`` on (a, b) dedups pairs found in
several bands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from poseidon_ray.functions import minhash as mh
from poseidon_ray.functions import textstats
from poseidon_ray.functions.hashing import sha256_column
from poseidon_ray.functions.tokenize import tokenize_simple


# ------------------------------------------------------------------ exact

def exact_dedup_groups(ds: ray.data.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> ray.data.Dataset:
    """(content_sha, keep_id, n_copies): hash-partition + per-group min —
    keep_id is the smallest id with that exact content."""

    def add_sha(t: pa.Table) -> pa.Table:
        sha = pa.array(sha256_column(t[text_col]))
        return pa.table({ "content_sha": sha, id_col: t[id_col] })

    hashed = ds.map_batches(add_sha, batch_format="pyarrow")

    def reduce_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = g[id_col]
        return pa.table({
            "content_sha": g["content_sha"][:1],
            "keep_id": pa.array([pc.min(ids).as_py()], type=pa.int64()),
            "n_copies": pa.array([g.num_rows], type=pa.int64()),
        })

    return hashed.groupby("content_sha").map_groups(reduce_group, batch_format="pyarrow")


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Filter to one representative row per distinct content. Broadcasts the
    keep-set (ray.put) into a vectorized filter — no second shuffle of the
    content; at 10^12 scale swap the broadcast for a hash join on sha."""
    keep = exact_dedup_groups(ds, id_col, text_col)
    keep_ids = np.sort(
        keep.to_pandas()["keep_id"].to_numpy()
    )
    ref = ray.put(keep_ids)

    def filt(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        k = ray.get(ref)
        pos = np.searchsorted(k, ids)
        pos = np.minimum(pos, len(k) - 1)
        return t.filter(pa.array(k[pos] == ids))

    return ds.map_batches(filt, batch_format="pyarrow")


# ------------------------------------------------------------------ pair emission

N_PAIR_SHARDS = 1024  # coarse shuffle key: thousands of fine LSH buckets per
                      # group, so per-group Python overhead amortizes


def _shard_pair_indices(buckets_sorted: np.ndarray, max_bucket: int = 256):
    """(ia, ib) GLOBAL index pairs for every fine bucket inside one shard —
    the input must be sorted by bucket. One small Python loop over buckets
    builds index lists; everything downstream is one vectorized pass."""
    starts = np.flatnonzero(np.diff(buckets_sorted,
                                    prepend=buckets_sorted[0] + 1))
    ends = np.append(starts[1:], len(buckets_sorted))
    ia_all, ib_all = [], []
    for s, e in zip(starts, ends):
        n = min(e - s, max_bucket)
        if n >= 2:
            iu = np.triu_indices(n, k=1)
            ia_all.append(iu[0] + s)
            ib_all.append(iu[1] + s)
    if not ia_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ia_all), np.concatenate(ib_all)


# ------------------------------------------------------------------ minhash LSH

class MinHashStage:
    """Actor-pool batch fn: doc -> one row per band, fully vectorized
    (one hash pass + one permutation matrix op per batch). Signatures are
    truncated to uint32 for the shuffle (equality semantics survive; a
    2^-32 truncation collision only nudges an estimate)."""

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        terms_rows, _tfs, _dl = tokenize_simple(col)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shingle_lists = [mh.shingles(toks, self.k) for toks in terms_rows]
        sigs = mh.minhash_signatures_batch(shingle_lists, self.num_perm)
        buckets = mh.band_hashes_batch(sigs, self.bands)        # (n, bands)
        sig32 = sigs.astype(np.uint32)
        n, bands = buckets.shape
        sig_bytes = sig32.tobytes()
        itemsize = self.num_perm * 4
        sig_col = pa.array(
            [sig_bytes[i * itemsize:(i + 1) * itemsize] for i in range(n)
             for _ in range(bands)], type=pa.large_binary())
        flat_buckets = buckets.ravel()
        return pa.table({
            "shard": pa.array((flat_buckets % np.uint64(N_PAIR_SHARDS))
                              .astype(np.uint32)),
            "bucket": pa.array(flat_buckets, type=pa.uint64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "sig": sig_col,
        })


def minhash_candidate_pairs(ds: ray.data.Dataset, *, num_perm: int = 128,
                            bands: int = 32, shingle_k: int = 3,
                            id_col: str = "doc_id", text_col: str = "text",
                            min_jaccard: float = 0.5,
                            concurrency=(1, 8)) -> ray.data.Dataset:
    """(doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduped across bands."""
    rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency,
    )

    rows_per_band = num_perm // bands
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "est_jaccard": pa.array([], type=pa.float64())})

    def shard_pairs(g: pa.Table) -> pa.Table:
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        bandcol = g["band"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, buckets))
        buckets, ids, bandcol = buckets[order], ids[order], bandcol[order]
        sig_buf = b"".join(g["sig"].to_pylist())
        sigs = np.frombuffer(sig_buf, dtype=np.uint32).reshape(len(ids), -1)[order]
        ia, ib = _shard_pair_indices(buckets)
        if len(ia) == 0:
            return empty
        pa_ids, pb_ids = ids[ia], ids[ib]
        neq = pa_ids != pb_ids
        ia, ib, pa_ids, pb_ids = ia[neq], ib[neq], pa_ids[neq], pb_ids[neq]
        if len(ia) == 0:
            return empty
        # a hot bucket cluster surfaces the SAME pair from many bands:
        # compare signatures once per unique pair, not per occurrence
        porder = np.lexsort((pb_ids, pa_ids))
        pa_s, pb_s = pa_ids[porder], pb_ids[porder]
        new_pair = np.empty(len(pa_s), dtype=bool)
        new_pair[0] = True
        np.logical_or(pa_s[1:] != pa_s[:-1], pb_s[1:] != pb_s[:-1],
                      out=new_pair[1:])
        group_of = np.cumsum(new_pair) - 1          # occurrence -> unique idx
        uniq_occ = porder[new_pair]                  # one occurrence per pair
        eq = sigs[ia[uniq_occ]] == sigs[ib[uniq_occ]]
        est = eq.mean(axis=1)
        jkeep = est >= min_jaccard
        if not jkeep.any():
            return empty
        # ownership: emit a pair only from its FIRST fully-matching band
        # (that band's bucket provably lands in exactly one shard) — output
        # is globally unique with no second dedup shuffle
        band_eq = eq[jkeep].reshape(-1, bands, rows_per_band).all(axis=2)
        bstar = np.argmax(band_eq, axis=1)
        kept_groups = np.flatnonzero(jkeep)
        # does THIS shard hold an occurrence of the pair with band == bstar?
        occ_band = bandcol[ia]                       # == bandcol[ib] per row
        target = np.full(len(est), -1, dtype=np.int64)
        target[kept_groups] = bstar
        mine_occ = occ_band[porder] == target[group_of]
        final_groups = np.unique(group_of[mine_occ])
        sel = uniq_occ[final_groups]
        return pa.table({
            "doc_a": pa.array(ids[ia[sel]], type=pa.int64()),
            "doc_b": pa.array(ids[ib[sel]], type=pa.int64()),
            "est_jaccard": pa.array(est[final_groups], type=pa.float64()),
        })

    return rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")


# ------------------------------------------------------------------ simhash

def simhash_pairs(ds: ray.data.Dataset, *, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance 3 shares at least one exact band (pigeonhole)."""

    def sig_rows(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sh = textstats.simhash64(col).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        chunks = np.concatenate([
            ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            | (np.uint64(b) << np.uint64(16)) for b in range(4)
        ])
        return pa.table({
            "shard": pa.array((chunks % np.uint64(N_PAIR_SHARDS)).astype(np.uint32)),
            "bucket": pa.array(chunks, type=pa.uint64()),
            "band": pa.array(bands),
            "doc_id": pa.array(np.tile(ids, 4), type=pa.int64()),
            "simhash": pa.array(np.tile(sh, 4), type=pa.uint64()),
        })

    rows = ds.map_batches(sig_rows, batch_format="pyarrow")
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "hamming": pa.array([], type=pa.int64())})

    def shard_pairs(g: pa.Table) -> pa.Table:
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sh = g["simhash"].to_numpy(zero_copy_only=False)
        bandcol = g["band"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, buckets))
        buckets, ids, sh, bandcol = (buckets[order], ids[order], sh[order],
                                     bandcol[order])
        ia, ib = _shard_pair_indices(buckets)
        if len(ia) == 0:
            return empty
        dist = textstats.hamming_distance(sh[ia], sh[ib])
        keep = (dist <= max_hamming) & (ids[ia] != ids[ib])
        if not keep.any():
            return empty
        ia, ib, dist = ia[keep], ib[keep], dist[keep]
        # first-matching-band ownership => globally unique output
        xor = np.bitwise_xor(sh[ia], sh[ib])
        band_eq = np.stack([
            ((xor >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
            for b in range(4)
        ], axis=1)
        first = np.argmax(band_eq, axis=1)
        mine = first == bandcol[ia]
        return pa.table({
            "doc_a": pa.array(ids[ia][mine], type=pa.int64()),
            "doc_b": pa.array(ids[ib][mine], type=pa.int64()),
            "hamming": pa.array(dist[mine], type=pa.int64()),
        })

    return rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")


# ------------------------------------------------------------------ embeddings

def embedding_neardup_pairs(ds: ray.data.Dataset, *, dim: int, n_planes: int = 12,
                            min_cosine: float = 0.9, seed: int = 42,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> ray.data.Dataset:
    """Random-hyperplane LSH buckets, then exact cosine inside buckets."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket_rows(t: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        bits = (unit @ p) > 0
        bucket = np.packbits(bits, axis=1, bitorder="little")[:, :2]
        bucket = bucket[:, 0].astype(np.uint64) | (bucket[:, 1].astype(np.uint64) << np.uint64(8))
        return pa.table({
            "shard": pa.array((bucket % np.uint64(N_PAIR_SHARDS)).astype(np.uint32)),
            "bucket": pa.array(bucket, type=pa.uint64()),
            id_col: t[id_col],
            "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
        })

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow")
    empty = pa.table({"vec_a": pa.array([], type=pa.int64()),
                      "vec_b": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})

    def shard_pairs(g: pa.Table) -> pa.Table:
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        unit = np.stack(g["unit"].to_pylist())
        order = np.lexsort((ids, buckets))
        buckets, ids, unit = buckets[order], ids[order], unit[order]
        ia, ib = _shard_pair_indices(buckets)
        if len(ia) == 0:
            return empty
        cos = np.einsum("ij,ij->i", unit[ia], unit[ib])
        keep = (cos >= min_cosine) & (ids[ia] != ids[ib])
        return pa.table({
            "vec_a": pa.array(ids[ia][keep], type=pa.int64()),
            "vec_b": pa.array(ids[ib][keep], type=pa.int64()),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        })

    return rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")
