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

def _pairs_from_bucket(ids: np.ndarray, payload: np.ndarray | None = None,
                       max_bucket: int = 256):
    """All (a<b) pairs of a bucket, capped to guard degenerate buckets
    (cap is accounted, mirroring the reference's skew caps A6)."""
    ids = ids[:max_bucket]
    n = len(ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    iu = np.triu_indices(n, k=1)
    return ids[iu[0]], ids[iu[1]]


# ------------------------------------------------------------------ minhash LSH

class MinHashStage:
    """Actor-pool batch fn: doc -> signature + band bucket rows."""

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        terms_rows, _tfs, _dl = tokenize_simple(t[self.text_col].combine_chunks()
                                                if isinstance(t[self.text_col], pa.ChunkedArray)
                                                else t[self.text_col])
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        out_band, out_key, out_id, out_sig = [], [], [], []
        for did, toks in zip(ids, terms_rows):
            sig = mh.minhash_signature(mh.shingles(toks, self.k), self.num_perm)
            bh = mh.band_hashes(sig, self.bands)
            for b in range(self.bands):
                out_band.append(b)
                out_key.append(int(bh[b]))
                out_id.append(int(did))
                out_sig.append(sig.tobytes())
        return pa.table({
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_key, type=pa.uint64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
            "sig": pa.array(out_sig, type=pa.large_binary()),
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

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        sigs = [np.frombuffer(g["sig"][int(i)].as_py(), dtype=np.uint64)
                for i in order]
        a, b = _pairs_from_bucket(np.arange(len(ids)))
        out_a, out_b, out_j = [], [], []
        for i, j in zip(a, b):
            est = mh.estimate_jaccard(sigs[i], sigs[j])
            if est >= min_jaccard and ids[i] != ids[j]:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_j.append(est)
        return pa.table({
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "est_jaccard": pa.array(out_j, type=pa.float64()),
        })

    pairs = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair can surface in several bands: keep one row per (a, b)
    def first_of_pair(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(first_of_pair,
                                                        batch_format="pyarrow")


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
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bands, buckets, out_ids, out_sh = [], [], [], []
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands.extend([b] * len(ids))
            buckets.extend((chunk.astype(np.uint64) | (np.uint64(b) << np.uint64(16))).tolist())
            out_ids.extend(ids.tolist())
            out_sh.extend(sh.tolist())
        return pa.table({
            "bucket": pa.array(buckets, type=pa.uint64()),
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "simhash": pa.array(out_sh, type=pa.uint64()),
        })

    rows = ds.map_batches(sig_rows, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sh = g["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        ia, ib = _pairs_from_bucket(np.arange(len(ids)))
        if len(ia) == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        dist = textstats.hamming_distance(sh[ia], sh[ib])
        keep = (dist <= max_hamming) & (ids[ia] != ids[ib])
        return pa.table({
            "doc_a": pa.array(ids[ia][keep], type=pa.int64()),
            "doc_b": pa.array(ids[ib][keep], type=pa.int64()),
            "hamming": pa.array(dist[keep], type=pa.int64()),
        })

    pairs = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


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
            "bucket": pa.array(bucket, type=pa.uint64()),
            id_col: t[id_col],
            "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
        })

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        unit = np.stack(g["unit"].to_pylist())
        order = np.argsort(ids)
        ids, unit = ids[order], unit[order]
        ia, ib = _pairs_from_bucket(np.arange(len(ids)))
        if len(ia) == 0:
            return pa.table({"vec_a": pa.array([], type=pa.int64()),
                             "vec_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        cos = np.einsum("ij,ij->i", unit[ia], unit[ib])
        keep = (cos >= min_cosine) & (ids[ia] != ids[ib])
        return pa.table({
            "vec_a": pa.array(ids[ia][keep], type=pa.int64()),
            "vec_b": pa.array(ids[ib][keep], type=pa.int64()),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        })

    pairs = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
