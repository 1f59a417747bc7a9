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


MAX_BROADCAST_KEEP_IDS = 50_000_000  # ~400 MB of int64 — broadcast ceiling


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text",
                strategy: str = "shuffle") -> ray.data.Dataset:
    """Filter to one representative (min-id) row per distinct content.

    ``strategy="shuffle"`` (default, the 10^12-scale path): map-side combine
    keeps one min-id row per sha per block, then ONE groupby(sha) shuffle
    picks the global min. No driver-side state at all; any sha group is
    bounded by the block count (each block contributes <= 1 row per sha).
    Content moves through the object store once — same order of cost as the
    docID sort the index build already pays.

    ``strategy="broadcast"``: hash-only shuffle for the keep set, then a
    broadcast filter — cheaper when the keep set is small, but driver-bound;
    refuses above MAX_BROADCAST_KEEP_IDS rather than silently OOMing.
    """
    if strategy == "shuffle":
        def combine(t: pa.Table) -> pa.Table:
            sha = np.asarray(sha256_column(t[text_col]), dtype=object)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, sha))
            first = np.zeros(len(order), dtype=bool)
            if len(order):
                first[0] = True
                first[1:] = sha[order][1:] != sha[order][:-1]
            sel = order[first]
            out = t.take(pa.array(sel, type=pa.int64()))
            return out.append_column("content_sha",
                                     pa.array(sha[sel], type=pa.string()))

        def keep_min(g: pa.Table) -> pa.Table:
            ids = g[id_col].to_numpy(zero_copy_only=False)
            i = int(np.lexsort((ids,))[0])
            return g.slice(i, 1).drop_columns(["content_sha"])

        combined = ds.map_batches(combine, batch_format="pyarrow")
        return combined.groupby("content_sha").map_groups(
            keep_min, batch_format="pyarrow")

    keep = exact_dedup_groups(ds, id_col, text_col) \
        .select_columns(["keep_id"]).materialize()
    if keep.count() > MAX_BROADCAST_KEEP_IDS:
        raise ValueError(
            f"keep set ({keep.count()} ids) exceeds broadcast ceiling "
            f"{MAX_BROADCAST_KEEP_IDS}; use strategy='shuffle'")
    keep_ids = np.sort(keep.to_pandas()["keep_id"].to_numpy())
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


def _shard_pair_indices(buckets_sorted: np.ndarray,
                        max_bucket: int | None = None):
    """(ia, ib) GLOBAL index pairs for every fine bucket inside one shard —
    the input must be sorted by (bucket, doc_id). One small Python loop over
    buckets builds index lists; everything downstream is one vectorized pass.

    ``max_bucket``: buckets with more members emit STAR edges — the bucket's
    min-id member paired with every other member (n-1 edges instead of
    n(n-1)/2) — so a 10k-member duplicate cluster costs O(n), yet every
    member stays connected to the cluster representative (connectivity-exact
    for dedup; no pair silently dropped, unlike a hard truncation).
    ``None`` = emit every pair (exhaustive mode for truth/oracle queries).

    Boundary detection uses explicit != (NOT np.diff-with-prepend: uint64 +
    a Python int promotes to float64 on NumPy 1.x, and bucket hashes exceed
    2^53, so diff values round to 0 and whole runs vanish)."""
    starts = np.flatnonzero(np.concatenate(
        [[True], buckets_sorted[1:] != buckets_sorted[:-1]]))
    ends = np.append(starts[1:], len(buckets_sorted))
    ia_all, ib_all = [], []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        if max_bucket is None or n <= max_bucket:
            iu = np.triu_indices(n, k=1)
            ia_all.append(iu[0] + s)
            ib_all.append(iu[1] + s)
        else:
            # star mode: input sorted by (bucket, id) => element s is the min
            ia_all.append(np.full(n - 1, s, dtype=np.int64))
            ib_all.append(np.arange(s + 1, e, dtype=np.int64))
    if not ia_all:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ia_all), np.concatenate(ib_all)


def _dedup_pairs(pairs: ray.data.Dataset, cols: tuple[str, ...]) -> ray.data.Dataset:
    """Global (doc_a, doc_b) dedup for capped-mode pair streams. Rows for
    the same pair are IDENTICAL (est/hamming/cosine are functions of the two
    signatures alone), so keeping any one is deterministic. The shuffle
    moves only output pairs — tiny next to the signature exchange."""

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(list(cols)).map_groups(first, batch_format="pyarrow")


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
                            max_bucket: int | None = 256,
                            concurrency=(1, 8)) -> ray.data.Dataset:
    """(doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduped across bands.

    ``max_bucket=None``: exhaustive pairs with first-fully-matching-band
    ownership — globally unique output with NO extra shuffle (exact mode,
    used by the oracle/truth queries).
    ``max_bucket=N``: oversized buckets emit star edges (see
    ``_shard_pair_indices``); ownership is then undecidable locally (a
    pair's owning band may sit in a capped bucket that never generated it),
    so capped mode emits per-shard-unique pairs and appends a small global
    pair-dedup groupby instead.
    """
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
        ia, ib = _shard_pair_indices(buckets, max_bucket)
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
        if max_bucket is not None:
            # capped mode: per-shard unique, global dedup appended below
            sel = uniq_occ[jkeep]
            return pa.table({
                "doc_a": pa.array(ids[ia[sel]], type=pa.int64()),
                "doc_b": pa.array(ids[ib[sel]], type=pa.int64()),
                "est_jaccard": pa.array(est[jkeep], type=pa.float64()),
            })
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

    out = rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")
    if max_bucket is not None:
        out = _dedup_pairs(out, ("doc_a", "doc_b"))
    return out


# ------------------------------------------------------------------ simhash

def simhash_pairs(ds: ray.data.Dataset, *, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_bucket: int | None = 256) -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance 3 shares at least one exact band (pigeonhole).

    ``max_bucket`` semantics match ``minhash_candidate_pairs``: None =
    exhaustive + first-band ownership (no dedup shuffle); N = star edges
    for oversized buckets + a global pair-dedup groupby."""

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
        ia, ib = _shard_pair_indices(buckets, max_bucket)
        if len(ia) == 0:
            return empty
        dist = textstats.hamming_distance(sh[ia], sh[ib])
        keep = (dist <= max_hamming) & (ids[ia] != ids[ib])
        if not keep.any():
            return empty
        ia, ib, dist = ia[keep], ib[keep], dist[keep]
        if max_bucket is not None:
            # capped mode: per-shard unique pairs (a pair can recur across
            # band rows whose buckets land in this shard); global pair-dedup
            # appended below
            porder = np.lexsort((ids[ib], ids[ia]))
            pa_s, pb_s = ids[ia][porder], ids[ib][porder]
            new_pair = np.empty(len(pa_s), dtype=bool)
            new_pair[0] = True
            np.logical_or(pa_s[1:] != pa_s[:-1], pb_s[1:] != pb_s[:-1],
                          out=new_pair[1:])
            sel = porder[new_pair]
            ia, ib, dist = ia[sel], ib[sel], dist[sel]
            return pa.table({
                "doc_a": pa.array(ids[ia], type=pa.int64()),
                "doc_b": pa.array(ids[ib], type=pa.int64()),
                "hamming": pa.array(dist, type=pa.int64()),
            })
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

    out = rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")
    if max_bucket is not None:
        out = _dedup_pairs(out, ("doc_a", "doc_b"))
    return out


# ------------------------------------------------------------------ embeddings

def embedding_neardup_pairs(ds: ray.data.Dataset, *, dim: int,
                            n_tables: int = 16, planes_per_table: int = 6,
                            min_cosine: float = 0.9, seed: int = 42,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            max_bucket: int | None = 256) -> ray.data.Dataset:
    """Banded random-hyperplane LSH (Charikar SimHash for angles): L
    independent tables of b hyperplanes each; vectors agreeing on all b
    signs in ANY table become candidates, then exact cosine inside the
    bucket. Recall for a pair at angle θ is 1-(1-(1-θ/π)^b)^L — with the
    defaults (L=16, b=6) a cosine-0.5 pair is caught w.p. ~0.93, vs ~0.006
    for the old single 16-bit table. Output is deduped across tables."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * planes_per_table))
    planes_ref = ray.put(planes)

    def bucket_rows(t: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        n = len(unit)
        bits = (unit @ p) > 0                       # (n, L*b)
        bits = bits.reshape(n, n_tables, planes_per_table)
        weights = (np.uint64(1) << np.arange(planes_per_table, dtype=np.uint64))
        codes = (bits.astype(np.uint64) * weights).sum(axis=2)   # (n, L)
        # fold the table id into the bucket key so tables never collide
        bucket = (codes << np.uint64(8)) | np.arange(n_tables, dtype=np.uint64)
        flat_bucket = bucket.ravel()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "shard": pa.array((flat_bucket % np.uint64(N_PAIR_SHARDS)).astype(np.uint32)),
            "bucket": pa.array(flat_bucket, type=pa.uint64()),
            id_col: pa.array(np.repeat(ids, n_tables), type=pa.int64()),
            "unit": pa.array(np.repeat(unit, n_tables, axis=0).tolist(),
                             type=pa.list_(pa.float64())),
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
        ia, ib = _shard_pair_indices(buckets, max_bucket)
        if len(ia) == 0:
            return empty
        cos = np.einsum("ij,ij->i", unit[ia], unit[ib])
        keep = (cos >= min_cosine) & (ids[ia] != ids[ib])
        if not keep.any():
            return empty
        ka, kb, kc = ids[ia][keep], ids[ib][keep], cos[keep]
        # per-shard unique (same pair can recur across tables in one shard)
        porder = np.lexsort((kb, ka))
        ka, kb, kc = ka[porder], kb[porder], kc[porder]
        new_pair = np.empty(len(ka), dtype=bool)
        new_pair[0] = True
        np.logical_or(ka[1:] != ka[:-1], kb[1:] != kb[:-1], out=new_pair[1:])
        return pa.table({
            "vec_a": pa.array(ka[new_pair], type=pa.int64()),
            "vec_b": pa.array(kb[new_pair], type=pa.int64()),
            "cosine": pa.array(kc[new_pair], type=pa.float64()),
        })

    out = rows.groupby("shard").map_groups(shard_pairs, batch_format="pyarrow")
    return _dedup_pairs(out, ("vec_a", "vec_b"))


def cosine_pairs_exact(ds: ray.data.Dataset, *, min_cosine: float,
                       n_bands: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> ray.data.Dataset:
    """EXACT all-pairs cosine >= min_cosine via a blocked cartesian: vector
    v goes to every cell (min(r, s), max(r, s)) for its band r = hash(id) %
    n_bands — O(N * n_bands) replication, O(N^2) compute spread over
    n_bands*(n_bands+1)/2 cells, NO driver-side matrix. The exact baseline
    the LSH variant trades recall against (same role as brute_force_topk
    for ANN)."""

    def cell_rows(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        band = (ids % n_bands).astype(np.int64)
        cells, own = [], []
        for other in range(n_bands):
            lo = np.minimum(band, other)
            hi = np.maximum(band, other)
            cells.append(lo * n_bands + hi)
            own.append(np.full(len(ids), other, dtype=np.int64))
        n_rep = n_bands
        return pa.table({
            "cell": pa.array(np.concatenate(cells), type=pa.int64()),
            id_col: pa.array(np.tile(ids, n_rep), type=pa.int64()),
            "band": pa.array(np.tile(band, n_rep), type=pa.int64()),
            "unit": pa.array(np.tile(unit, (n_rep, 1)).tolist(),
                             type=pa.list_(pa.float64())),
        })

    rows = ds.map_batches(cell_rows, batch_format="pyarrow")
    empty = pa.table({"vec_a": pa.array([], type=pa.int64()),
                      "vec_b": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})

    def cell_pairs(g: pa.Table) -> pa.Table:
        cell = int(g["cell"][0].as_py())
        lo, hi = divmod(cell, n_bands)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        band = g["band"].to_numpy(zero_copy_only=False)
        # replication sends each vector to the cell once per other-band; the
        # cell only needs each vector once
        order = np.argsort(ids, kind="stable")
        first = order[np.concatenate([[True], ids[order][1:] != ids[order][:-1]])]
        ids, band = ids[first], band[first]
        unit = np.stack(g["unit"].to_pylist())[first]
        if lo == hi:
            sub = np.flatnonzero(band == lo)
            if len(sub) < 2:
                return empty
            iu = np.triu_indices(len(sub), k=1)
            ia, ib = sub[iu[0]], sub[iu[1]]
        else:
            a_idx = np.flatnonzero(band == lo)
            b_idx = np.flatnonzero(band == hi)
            if len(a_idx) == 0 or len(b_idx) == 0:
                return empty
            ia = np.repeat(a_idx, len(b_idx))
            ib = np.tile(b_idx, len(a_idx))
        cos = np.einsum("ij,ij->i", unit[ia], unit[ib])
        keep = cos >= min_cosine
        if not keep.any():
            return empty
        a, b = ids[ia][keep], ids[ib][keep]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({
            "vec_a": pa.array(a2, type=pa.int64()),
            "vec_b": pa.array(b2, type=pa.int64()),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        })

    return rows.groupby("cell").map_groups(cell_pairs, batch_format="pyarrow")


# ------------------------------------------------------------------ exact pair verify

def verify_pairs_exact_jaccard(ds_docs: ray.data.Dataset,
                               pairs: ray.data.Dataset, *,
                               id_col: str = "doc_id", text_col: str = "text",
                               num_shards: int = 256) -> ray.data.Dataset:
    """EXACT set-Jaccard for every candidate pair, fully distributed (the
    scale-shaped verification pass after LSH candidate generation):

    1. docs -> sorted unique token-HASH arrays (uint64; a 2^-64 collision is
       the only approximation) — content never leaves this stage.
    2. each pair (a, b) picks a pair-shard; requests (doc, shard) are
       emitted for both members.
    3. groupby(doc) joins requests with hash arrays -> one (shard, doc,
       hashes) copy per distinct requesting shard.
    4. groupby(shard) has both members of every owned pair -> vectorized
       sorted-array intersection sizes.

    Output: (doc_a, doc_b, n_inter, n_union) as int64 — integer-exact, so a
    threshold like 10*n_inter >= 9*n_union (J >= 0.9) is float-free and matches
    a DuckDB twin bit-for-bit.

    The docs side is pre-filtered to pair MEMBERS (broadcast of the member
    id set — pairs are output-sized, orders of magnitude below the corpus)
    so the hash pass never tokenizes docs no pair references; above
    MAX_BROADCAST_KEEP_IDS members the filter is skipped and every doc is
    hashed (still correct, one full pass).
    """
    from poseidon_ray.functions.hashing import hash_terms

    pairs = pairs.materialize()
    if 0 < pairs.count() <= MAX_BROADCAST_KEEP_IDS // 2:
        pdf = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
        member_ids = np.unique(np.concatenate(
            [pdf["doc_a"].to_numpy(), pdf["doc_b"].to_numpy()])).astype(np.int64)
        ref = ray.put(member_ids)

        def member_filter(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            k = ray.get(ref)
            pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
            return t.filter(pa.array(k[pos] == ids))

        ds_docs = ds_docs.map_batches(member_filter, batch_format="pyarrow")

    def doc_hash_rows(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        terms_rows, _tfs, _dl = tokenize_simple(col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for toks in terms_rows:
            if toks:
                h = np.unique(hash_terms(np.array(toks, dtype=object)))
            else:
                h = np.empty(0, dtype=np.uint64)
            blobs.append(h.tobytes())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shard": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "hashes": pa.array(blobs, type=pa.large_binary()),
            "pair_a": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "pair_b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
        })

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _pair_shard(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x = (a.astype(np.uint64) * _MIX) ^ (b.astype(np.uint64) + _MIX)
        return (x % np.uint64(num_shards)).astype(np.int64)

    def request_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ps = _pair_shard(a, b)
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "shard": pa.array(np.concatenate([ps, ps]), type=pa.int64()),
            "hashes": pa.array([b""] * (2 * len(a)), type=pa.large_binary()),
            "pair_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
            "pair_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
        })

    docs_side = ds_docs.map_batches(doc_hash_rows, batch_format="pyarrow")
    reqs_side = pairs.map_batches(request_rows, batch_format="pyarrow")

    def route(g: pa.Table) -> pa.Table:
        shards = g["shard"].to_numpy(zero_copy_only=False)
        is_doc = shards == -1
        doc_rows = np.flatnonzero(is_doc)
        if len(doc_rows) == 0:     # pair references a doc not in the corpus
            return pa.table({"shard": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "hashes": pa.array([], type=pa.large_binary()),
                             "pair_a": pa.array([], type=pa.int64()),
                             "pair_b": pa.array([], type=pa.int64())})
        blob = g["hashes"][doc_rows[0]].as_py()
        doc_id = g["doc_id"][0].as_py()
        want = np.unique(shards[~is_doc])
        return pa.table({
            "shard": pa.array(want, type=pa.int64()),
            "doc_id": pa.array([doc_id] * len(want), type=pa.int64()),
            "hashes": pa.array([blob] * len(want), type=pa.large_binary()),
            "pair_a": pa.array([-1] * len(want), type=pa.int64()),
            "pair_b": pa.array([-1] * len(want), type=pa.int64()),
        })

    routed = docs_side.union(reqs_side).groupby("doc_id").map_groups(
        route, batch_format="pyarrow")

    # pair rows (for the pair list) + routed doc rows, co-located by shard
    def pair_shard_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "shard": pa.array(_pair_shard(a, b), type=pa.int64()),
            "doc_id": pa.array(np.full(len(a), -1, dtype=np.int64)),
            "hashes": pa.array([b""] * len(a), type=pa.large_binary()),
            "pair_a": pa.array(a, type=pa.int64()),
            "pair_b": pa.array(b, type=pa.int64()),
        })

    shard_side = pairs.map_batches(pair_shard_rows, batch_format="pyarrow")

    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "n_inter": pa.array([], type=pa.int64()),
                      "n_union": pa.array([], type=pa.int64())})

    def verify(g: pa.Table) -> pa.Table:
        doc_ids = g["doc_id"].to_numpy(zero_copy_only=False)
        is_pair = doc_ids == -1
        sets: dict[int, np.ndarray] = {}
        for i in np.flatnonzero(~is_pair):
            sets[int(doc_ids[i])] = np.frombuffer(
                g["hashes"][i].as_py(), dtype=np.uint64)
        pa_ids = g["pair_a"].to_numpy(zero_copy_only=False)[is_pair]
        pb_ids = g["pair_b"].to_numpy(zero_copy_only=False)[is_pair]
        out_a, out_b, out_i, out_u = [], [], [], []
        for a, b in zip(pa_ids, pb_ids):
            ha, hb = sets.get(int(a)), sets.get(int(b))
            if ha is None or hb is None:
                continue
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            out_a.append(int(a))
            out_b.append(int(b))
            out_i.append(inter)
            out_u.append(len(ha) + len(hb) - inter)
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "n_inter": pa.array(out_i, type=pa.int64()),
            "n_union": pa.array(out_u, type=pa.int64()),
        })

    return routed.union(shard_side).groupby("shard").map_groups(
        verify, batch_format="pyarrow")
