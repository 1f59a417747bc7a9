"""Distributed cardinality sketches (HyperLogLog).

The exact-UV path (``events_pv``/A5, ``state/segments.py``) shuffles every
distinct (key, value) pair — correct, and what the reference's PV/UV
reducer does (builder ReduceGroupData uv counting), but at 10^10 users the
shuffle IS the cost. HyperLogLog (Flajolet et al. 2007, public algorithm)
replaces it with a fixed 2^p-byte register array per key: per-block
partials combine by elementwise max (associative + commutative, so block
structure and merge order never change the answer), and the wide exchange
moves m bytes per (key, block) instead of one row per distinct value.

Scale shape: partial registers are built fully vectorized per block
(``np.maximum.at`` over a (keys x m) matrix), the merge is a coarse
key-hash groupby with ONE zero-copy reshape + ``np.maximum.reduceat`` per
shard (O(shards) Python calls), and register rows are fixed_size_binary so
the Arrow buffer converts to a 2-D numpy view without a per-row loop.

Estimator: standard HLL with the small-range linear-counting fallback.
The 64-bit hash (functions/hashing.hash_terms, fixed-key SipHash) makes
the 32-bit large-range correction unnecessary. Relative error is
~1.04/sqrt(2^p): p=14 -> 0.8%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from poseidon_ray.functions.hashing import hash_terms

N_SKETCH_SHARDS = 256  # coarse merge-shard count — O(shards) Python calls


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: index = top p bits, rank = leading
    zeros of the low 64-p bits + 1. Bit length via ``np.frexp`` — exact
    because 64-p <= 53 mantissa bits for p >= 11 (asserted by callers)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = (h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1)))
    _, exp = np.frexp(low.astype(np.float64))  # exp == bit_length(low)
    rank = (64 - p) - exp + 1  # low == 0 -> frexp exp 0 -> rank 64-p+1
    return idx, rank.astype(np.uint8)


def _estimate(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate for a (k x m) uint8 register matrix."""
    m = regs.shape[1]
    e = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
    zeros = np.sum(regs == 0, axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lin, e)


def _regs_matrix(col: pa.ChunkedArray | pa.Array, m: int) -> np.ndarray:
    """Zero-copy view of a fixed_size_binary(m) column as (rows, m) uint8."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = col.buffers()[1]
    off = col.offset * m
    return np.frombuffer(buf, dtype=np.uint8,
                         count=len(col) * m, offset=off).reshape(-1, m)


def hll_count_distinct_by(ds: ray.data.Dataset, key_col: str, val_col: str,
                          *, precision: int = 14,
                          num_shards: int = N_SKETCH_SHARDS
                          ) -> ray.data.Dataset:
    """Approximate distinct ``val_col`` per ``key_col`` ->
    (key, n_distinct_est: int64). Shuffle weight: m = 2^precision bytes per
    (key, block), independent of the number of distinct values."""
    if not 11 <= precision <= 16:
        raise ValueError("precision must be in [11, 16]")
    m = 1 << precision

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        h = hash_terms(t[val_col])
        uk, kinv = np.unique(keys, return_inverse=True)
        idx, rank = _ranks(h, precision)
        regs = np.zeros((len(uk), m), dtype=np.uint8)
        np.maximum.at(regs, (kinv, idx), rank)
        kh = hash_terms(uk) % np.uint64(num_shards)
        return pa.table({
            "_shard": pa.array(kh.astype(np.int64)),
            key_col: pa.array(uk),
            # loop-free fixed_size_binary straight from the register matrix
            "_regs": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), len(uk), [None, pa.py_buffer(regs.tobytes())]),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        regs = _regs_matrix(g["_regs"], m)
        order = np.argsort(keys, kind="stable")
        keys, regs = keys[order], regs[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], keys[1:] != keys[:-1]]))
        merged = np.maximum.reduceat(regs, starts, axis=0)
        est = np.rint(_estimate(merged)).astype(np.int64)
        return pa.table({key_col: pa.array(keys[starts]),
                         "n_distinct_est": pa.array(est)})

    from poseidon_ray.stages.exchange import shard_exchange

    return shard_exchange(partials, "_shard", merge)


def hll_count_distinct(ds: ray.data.Dataset, val_col: str, *,
                       precision: int = 14) -> int:
    """Approximate global distinct count of ``val_col`` — one m-byte
    register row per block, one driver-side max-merge (m bytes total)."""
    if not 11 <= precision <= 16:
        raise ValueError("precision must be in [11, 16]")
    m = 1 << precision

    def partial(t: pa.Table) -> pa.Table:
        h = hash_terms(t[val_col])
        idx, rank = _ranks(h, precision)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        return pa.table({"_regs": pa.array([regs.tobytes()],
                                           type=pa.binary(m))})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .select_columns(["_regs"]).take_all()
    if not rows:
        return 0
    regs = np.zeros(m, dtype=np.uint8)
    for r in rows:
        regs = np.maximum(regs, np.frombuffer(r["_regs"], dtype=np.uint8))
    return int(np.rint(_estimate(regs[None, :])[0]))


# ------------------------------------------------------------ bloom filter

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(h: np.ndarray, num_hashes: int, m_bits: int
                     ) -> np.ndarray:
    """(n, k) bit positions via double hashing (Kirsch-Mitzenmacher,
    public): pos_i = (h1 + i*h2) mod m — two 64-bit hashes derive all k
    probes, vectorized."""
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * _BLOOM_MIX | np.uint64(1)  # odd
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom(ds: ray.data.Dataset, col: str, *, n_keys_hint: int,
                bits_per_key: int = 10, num_hashes: int = 7,
                num_shards: int = 64):
    """Distributed Bloom filter over ``col`` -> (shard_refs, m_bits,
    num_hashes, num_shards): the bit array is split into ``num_shards``
    contiguous ranges, each built by ONE shard group and ``ray.put`` as
    a packed uint8 bitmap (the drop-set delivery pattern — readers fetch
    a shard lazily, at most once per (actor, shard)).

    Scale shape: the exchange moves <= k set-bit POSITIONS per row
    (block-deduped int64s), never a per-block full bitmap (a 10^10-bit
    filter is 1.2 GB — per-block partial bitmaps cannot ride a shuffle).
    bits_per_key=10 / k=7 gives the classic ~0.8% false-positive rate;
    false negatives are impossible (gated by ``bloom_invariants``).
    Membership filtering at 1.25 bytes/key vs the exact sharded drop
    set's 8 bytes/key — the approximate escape hatch past MAX_DROP_IDS.
    """
    import ray as _ray

    m_bits = max(64, n_keys_hint * bits_per_key)
    shard_bits = -(-m_bits // num_shards)

    def set_rows(t: pa.Table) -> pa.Table:
        h = hash_terms(t[col])
        pos = np.unique(_bloom_positions(h, num_hashes, m_bits).ravel())
        return pa.table({
            "_shard": pa.array(pos // shard_bits),
            "pos": pa.array(pos, type=pa.int64()),
        })

    def build_shard(g: pa.Table) -> pa.Table:
        s = int(g["_shard"][0].as_py())
        local = g["pos"].to_numpy(zero_copy_only=False) - s * shard_bits
        bits = np.zeros((shard_bits + 7) // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, local // 8,
                         np.left_shift(np.uint8(1), (local % 8).astype(np.uint8)))
        return pa.table({"shard": pa.array([s], type=pa.int64()),
                         "bits": pa.array([bits.tobytes()],
                                          type=pa.large_binary())})

    from poseidon_ray.stages.exchange import shard_exchange

    rows = shard_exchange(ds.map_batches(set_rows, batch_format="pyarrow"),
                          "_shard", build_shard)
    empty = np.zeros((shard_bits + 7) // 8, dtype=np.uint8)
    shards: list = [None] * num_shards
    for t in _ray.get(rows.to_arrow_refs()):
        for i in range(t.num_rows):
            s = int(t["shard"][i].as_py())
            shards[s] = _ray.put(np.frombuffer(t["bits"][i].as_py(),
                                               dtype=np.uint8))
    for s in range(num_shards):
        if shards[s] is None:
            shards[s] = _ray.put(empty)
    return shards, m_bits, num_hashes, num_shards


class BloomMember:
    """Actor-pool batch fn: annotate (or filter) rows by Bloom
    membership. Shard bitmaps fetch lazily, at most once per (actor,
    shard) — the ``_DropFilter`` delivery shape."""

    def __init__(self, shard_refs: list, m_bits: int, num_hashes: int,
                 num_shards: int, col: str, *, mode: str = "annotate",
                 out_col: str = "maybe_seen"):
        import ray as _ray

        self._ray = _ray
        self._refs = shard_refs
        self._cache: dict[int, np.ndarray] = {}
        self._m, self._k = m_bits, num_hashes
        self._shard_bits = -(-m_bits // num_shards)
        self._col, self._mode, self._out = col, mode, out_col

    def _shard(self, s: int) -> np.ndarray:
        b = self._cache.get(s)
        if b is None:
            ref = self._refs[s]
            # a str entry is a persisted shard file (load_bloom): read it
            # from disk lazily, at most once per (actor, shard)
            b = (np.fromfile(ref, dtype=np.uint8) if isinstance(ref, str)
                 else self._ray.get(ref))
            self._cache[s] = b
        return b

    def __call__(self, t: pa.Table) -> pa.Table:
        h = hash_terms(t[self._col])
        pos = _bloom_positions(h, self._k, self._m)
        hit = np.ones(pos.shape, dtype=bool)
        sh = pos // self._shard_bits
        for s in np.unique(sh):
            bits = self._shard(int(s))
            m = sh == s
            local = pos[m] - s * self._shard_bits
            hit[m] = (bits[local // 8] >> (local % 8).astype(np.uint8)) & 1
        member = hit.all(axis=1)
        if self._mode == "drop_members":
            return t.filter(pa.array(~member))
        return t.append_column(self._out, pa.array(member))


@ray.remote
def _persist_bloom_shard(out_dir: str, s: int, bits: np.ndarray) -> int:
    import os

    path = os.path.join(out_dir, f"bloom-{s:05d}.bin")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bits.tobytes())
    os.replace(tmp, path)  # atomic on POSIX
    return len(bits)


def save_bloom(bloom, out_dir: str) -> dict:
    """Persist a built Bloom filter: one ``bloom-SSSSS.bin`` per bitmap
    shard (written by parallel tasks, atomic tmp+rename) + a
    ``bloom.json`` params manifest written LAST — its presence certifies
    the set. A persisted seen-set survives across runs/sessions: the
    cross-day URL-dedup move the reference's day-partitioned metadata
    enables (service docformat day buckets), r4 VERDICT 'Next round' #7."""
    import json
    import os

    import ray as _ray

    refs, m_bits, num_hashes, num_shards = bloom
    os.makedirs(out_dir, exist_ok=True)
    _ray.get([_persist_bloom_shard.remote(out_dir, s, refs[s])
              for s in range(num_shards)])
    man = {"format": "bloom-v1", "m_bits": int(m_bits),
           "num_hashes": int(num_hashes), "num_shards": int(num_shards)}
    mpath = os.path.join(out_dir, "bloom.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(man, f)
    os.replace(mpath + ".tmp", mpath)
    return man


def load_bloom(out_dir: str):
    """Handle for a persisted Bloom filter, drop-in for
    ``bloom_annotate``: shard entries are FILE PATHS a ``BloomMember``
    actor reads lazily, at most once each — no bitmap is loaded until a
    batch actually hashes into its shard."""
    import json
    import os

    with open(os.path.join(out_dir, "bloom.json")) as f:
        man = json.load(f)
    if man.get("format") != "bloom-v1":
        raise ValueError(f"unknown bloom manifest format in {out_dir}")
    paths = [os.path.join(out_dir, f"bloom-{s:05d}.bin")
             for s in range(man["num_shards"])]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"bloom store {out_dir} is missing shard files {missing[:3]} "
            "(manifest certifies a complete write — the store is corrupt)")
    return paths, man["m_bits"], man["num_hashes"], man["num_shards"]


def bloom_annotate(ds: ray.data.Dataset, bloom, col: str, *,
                   mode: str = "annotate", out_col: str = "maybe_seen",
                   concurrency: int = 4) -> ray.data.Dataset:
    """Apply a ``build_bloom`` filter to a dataset: ``annotate`` adds a
    boolean membership column; ``drop_members`` anti-filters (the
    seen-URL dedup move). min=1 actor pool (deadlock rule)."""
    refs, m_bits, k, p = bloom
    return ds.map_batches(
        BloomMember, fn_constructor_args=(refs, m_bits, k, p, col),
        fn_constructor_kwargs={"mode": mode, "out_col": out_col},
        batch_format="pyarrow", concurrency=(1, concurrency))


# ------------------------------------------------------------ quantiles

def _combine_equal(means: np.ndarray, weights: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Merge centroids with EQUAL means (input sorted by mean) — lossless,
    so the exact regime survives any number of merge levels."""
    if len(means) == 0:
        return means, weights
    starts = np.flatnonzero(np.concatenate(
        [[True], means[1:] != means[:-1]]))
    return means[starts], np.add.reduceat(weights, starts)


def _compress_centroids(means: np.ndarray, weights: np.ndarray,
                        compression: int) -> tuple[np.ndarray, np.ndarray]:
    """t-digest merge-compression with the uniform (k0) scale function
    (Dunning & Ertl, public algorithm): adjacent sorted centroids group
    into ``compression`` equal-weight buckets by midpoint cumulative
    weight; each bucket becomes one weighted-mean centroid of weight
    <= ~2*total/compression, bounding the within-centroid rank
    uncertainty. LOSSLESS when <= ``compression`` distinct means remain
    after equal-mean combining — the exact regime the `quantiles` oracle
    runs in."""
    means, weights = _combine_equal(means, weights)
    if len(means) <= compression:
        return means, weights
    total = weights.sum()
    mid = np.cumsum(weights) - weights / 2.0
    bucket = np.floor(mid * compression / total).astype(np.int64)
    starts = np.flatnonzero(np.concatenate(
        [[True], bucket[1:] != bucket[:-1]]))
    w = np.add.reduceat(weights, starts)
    m = np.add.reduceat(means * weights, starts) / w
    return m, w.astype(np.int64)


def tdigest_centroids(ds: ray.data.Dataset, col: str, *,
                      compression: int = 256,
                      num_shards: int = 32
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Distributed t-digest over a numeric column -> (means, weights),
    sorted by mean, <= ``compression`` centroids.

    Scale shape (merged coarse-sharded like HLL): every block emits
    <= compression (mean, weight) rows regardless of row count; a coarse
    shard groupby merge-compresses blockwise partials so the driver sees
    <= num_shards x compression rows, never one row per value. Rank error
    after the two merge levels is bounded by a small multiple of
    N/compression (gated by the ``quantile_invariants`` oracle row); with
    <= compression distinct values the sketch is EXACT at every level.
    """
    if compression < 8:
        raise ValueError("compression must be >= 8")

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            raise ValueError(f"column {col} contains NaN")
        v = np.sort(v)
        m, w = _compress_centroids(v, np.ones(len(v), dtype=np.int64),
                                   compression)
        # shard by the block's value fingerprint: deterministic for a
        # given block layout, spreads partials across merge groups
        sh = int(hash_terms(pa.array([f"{len(m)}:{m[0] if len(m) else 0}"]))
                 [0] % np.uint64(num_shards))
        return pa.table({
            "_shard": pa.array(np.full(len(m), sh, dtype=np.int64)),
            "mean": pa.array(m, type=pa.float64()),
            "weight": pa.array(w, type=pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        m = g["mean"].to_numpy(zero_copy_only=False)
        w = g["weight"].to_numpy(zero_copy_only=False)
        order = np.argsort(m, kind="stable")
        m, w = _compress_centroids(m[order], w[order], compression)
        return pa.table({"mean": pa.array(m, type=pa.float64()),
                         "weight": pa.array(w, type=pa.int64())})

    from poseidon_ray.stages.exchange import shard_exchange

    merged = shard_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_shard", merge)
    rows = merged.take_all()
    if not rows:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    m = np.array([r["mean"] for r in rows], dtype=np.float64)
    w = np.array([r["weight"] for r in rows], dtype=np.int64)
    order = np.argsort(m, kind="stable")
    return _compress_centroids(m[order], w[order], compression)


def tdigest_centroids_by(ds: ray.data.Dataset, key_col: str, col: str, *,
                         compression: int = 256,
                         num_shards: int = N_SKETCH_SHARDS
                         ) -> dict[object, tuple[np.ndarray, np.ndarray]]:
    """Per-key t-digest: key -> (means, weights). Same scale shape as
    ``hll_count_distinct_by``: every block emits <= compression centroid
    rows PER KEY IT CONTAINS, the merge is a coarse key-hash groupby with
    one vectorized per-key compression pass per shard, and the driver
    sees <= keys x compression rows. Lossless exact regime per key when
    that key's distinct values fit ``compression``.

    Granularity caveat (same as the per-key-HLL note in df_invariants):
    the per-key compression pass is one Python iteration per key PER
    BLOCK, so this is sized for grouping keys like language/source/split
    (10s-1000s of keys), not per-document keys — a 10^6-key rollup
    belongs in the exact groupby path."""
    if compression < 8:
        raise ValueError("compression must be >= 8")

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((vals, keys))
        keys, vals = keys[order], vals[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], keys[1:] != keys[:-1]]))
        ends = np.append(starts[1:], len(keys))
        out_k, out_m, out_w = [], [], []
        for s, e in zip(starts, ends):     # one pass per key-in-block
            m, wt = _compress_centroids(
                vals[s:e], np.ones(e - s, dtype=np.int64), compression)
            out_k.append(np.repeat(keys[s:s + 1], len(m)))
            out_m.append(m)
            out_w.append(wt)
        uk = np.concatenate(out_k) if out_k else keys[:0]
        kh = hash_terms(uk) % np.uint64(num_shards) if len(uk) else \
            np.array([], dtype=np.uint64)
        return pa.table({
            "_shard": pa.array(kh.astype(np.int64)),
            key_col: pa.array(uk),
            "mean": pa.array(np.concatenate(out_m) if out_m else
                             np.empty(0, np.float64), type=pa.float64()),
            "weight": pa.array(np.concatenate(out_w) if out_w else
                               np.empty(0, np.int64), type=pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        m = g["mean"].to_numpy(zero_copy_only=False)
        wt = g["weight"].to_numpy(zero_copy_only=False)
        order = np.lexsort((m, keys))
        keys, m, wt = keys[order], m[order], wt[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], keys[1:] != keys[:-1]]))
        ends = np.append(starts[1:], len(keys))
        out_k, out_m, out_w = [], [], []
        for s, e in zip(starts, ends):
            mm, ww = _compress_centroids(m[s:e], wt[s:e], compression)
            out_k.append(np.repeat(keys[s:s + 1], len(mm)))
            out_m.append(mm)
            out_w.append(ww)
        return pa.table({
            key_col: pa.array(np.concatenate(out_k) if out_k else keys[:0]),
            "mean": pa.array(np.concatenate(out_m) if out_m else
                             np.empty(0, np.float64), type=pa.float64()),
            "weight": pa.array(np.concatenate(out_w) if out_w else
                               np.empty(0, np.int64), type=pa.int64()),
        })

    from poseidon_ray.stages.exchange import shard_exchange

    merged = shard_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_shard", merge)
    result: dict[object, tuple[np.ndarray, np.ndarray]] = {}
    import ray as _ray

    for t in _ray.get(merged.to_arrow_refs()):
        if not t.num_rows:
            continue
        keys = t[key_col].to_numpy(zero_copy_only=False)
        m = t["mean"].to_numpy(zero_copy_only=False)
        wt = t["weight"].to_numpy(zero_copy_only=False)
        order = np.lexsort((m, keys))
        keys, m, wt = keys[order], m[order], wt[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], keys[1:] != keys[:-1]]))
        ends = np.append(starts[1:], len(keys))
        for s, e in zip(starts, ends):
            result[keys[s]] = _compress_centroids(m[s:e], wt[s:e],
                                                  compression)
    return result


def quantile_at_rank(means: np.ndarray, weights: np.ndarray,
                     ranks) -> np.ndarray:
    """Discrete quantile per target rank (1-based): the first centroid
    whose cumulative weight reaches the rank. In the exact regime
    (singleton centroids) this IS the order statistic; in the compressed
    regime it is the centroid mean covering that rank."""
    cum = np.cumsum(weights)
    r = np.asarray(ranks, dtype=np.int64)
    if len(means) == 0 or (len(weights) and weights.sum() == 0):
        # an empty digest has no order statistics — NaN would round to an
        # undefined int64 sentinel in callers that cast (r4 ADVICE #4)
        raise ValueError(
            "quantile_at_rank on an empty digest (no centroids / zero "
            "total weight) — callers must emit an empty result instead")
    idx = np.minimum(np.searchsorted(cum, np.maximum(r, 1), side="left"),
                     len(means) - 1)
    return means[idx]


def tdigest_quantiles(ds: ray.data.Dataset, col: str, qs, *,
                      compression: int = 256,
                      num_shards: int = 32) -> pa.Table:
    """(q, value) quantile estimates of ``col`` via the distributed
    t-digest; rank = ceil(q * N)."""
    m, w = tdigest_centroids(ds, col, compression=compression,
                             num_shards=num_shards)
    total = int(w.sum()) if len(w) else 0
    ranks = [int(np.ceil(q * total)) for q in qs]
    vals = quantile_at_rank(m, w, ranks)
    return pa.table({"q": pa.array(list(qs), type=pa.float64()),
                     "value": pa.array(vals, type=pa.float64())})


# ------------------------------------------------------------ heavy hitters

def heavy_hitters(ds: ray.data.Dataset, *, k: int = 50,
                  num_counters: int = 4096, text_col: str = "text",
                  num_shards: int = N_SKETCH_SHARDS) -> "pa.Table":
    """Approximate top-k terms by total term frequency without the full
    term shuffle — Misra-Gries / SpaceSaving summaries, merged the
    mergeable-summaries way (Misra & Gries 1982; Agarwal et al. 2013,
    both public):

    - per block: exact (term, cf) counts, then the Misra-Gries reduction
      to ``num_counters`` entries — subtract the (s+1)-th largest count
      ``d_j`` from every kept count, drop <= 0. Every kept count is a
      LOWER bound; the total deduction ``sum d_j`` bounds the global
      undercount for EVERY term (kept or dropped).
    - merge: coarse term-hash groupby, ONE lexsort+reduceat sum per shard,
      then per-shard top-k; the driver merges shards x k candidate rows
      and sum(d_j) — never the full vocabulary.

    Returns a pa.Table (k rows): (term, count_lo, count_hi) with the
    guarantee count_lo <= cf(term) <= count_lo + sum(d_j) = count_hi, and
    every term with cf > k-th count_lo + sum(d_j) is present. With
    ``num_counters`` >= distinct-terms-per-block the deductions are all 0
    and the result is EXACT top-k (the small-scale oracle regime).

    Scale shape: shuffle weight <= num_counters rows per block (16-48 KB)
    regardless of vocabulary size; the exact `top_terms` pipeline by
    contrast moves every distinct (term, block) pair.
    """
    from poseidon_ray.functions.tokenize import tokenize_simple_flat

    def partial(t: pa.Table) -> pa.Table:
        terms, tfs, _, _ = tokenize_simple_flat(
            t[text_col].combine_chunks())
        if len(terms) == 0:
            return pa.table({"_shard": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        ut, inv = np.unique(terms, return_inverse=True)
        cnt = np.bincount(inv, weights=tfs.astype(np.float64)) \
            .astype(np.int64)
        if len(ut) > num_counters:
            order = np.argsort(cnt)[::-1]
            d = cnt[order[num_counters]]
            keep = order[:num_counters]
            ut, cnt = ut[keep], cnt[keep] - d
            pos = cnt > 0
            ut, cnt = ut[pos], cnt[pos]
        else:
            d = np.int64(0)
        sh = (hash_terms(ut) % np.uint64(num_shards)).astype(np.int64) \
            if len(ut) else np.array([], dtype=np.int64)
        # the deduction rides as a sentinel row (term NULL, shard -1)
        return pa.table({
            "_shard": pa.array(np.concatenate([sh, [-1]])),
            "term": pa.array(np.concatenate([ut, [None]]), type=pa.string()),
            "cnt": pa.array(np.concatenate([cnt, [d]]), type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g["_shard"][0].as_py() == -1:  # deduction shard: one sum
            return pa.table({
                "term": pa.array([None], type=pa.string()),
                "cnt": pa.array([pc.sum(g["cnt"]).as_py() or 0],
                                type=pa.int64())})
        terms = g["term"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        terms, cnt = terms[order], cnt[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], terms[1:] != terms[:-1]]))
        sums = np.add.reduceat(cnt, starts)
        ut = terms[starts]
        top = np.lexsort((ut, -sums))[:k]  # (count desc, term asc)
        return pa.table({"term": pa.array(ut[top], type=pa.string()),
                         "cnt": pa.array(sums[top], type=pa.int64())})

    from poseidon_ray.stages.exchange import shard_exchange

    rows = shard_exchange(partials, "_shard", merge).take_all()
    err = sum(r["cnt"] for r in rows if r["term"] is None)
    cand = [(r["term"], r["cnt"]) for r in rows if r["term"] is not None]
    cand.sort(key=lambda x: (-x[1], x[0]))
    cand = cand[:k]
    return pa.table({
        "term": pa.array([c[0] for c in cand], type=pa.string()),
        "count_lo": pa.array([c[1] for c in cand], type=pa.int64()),
        "count_hi": pa.array([c[1] + err for c in cand], type=pa.int64()),
    })


def heavy_hitters_by(ds: ray.data.Dataset, key_col: str, *, k: int = 10,
                     num_counters: int = 4096, text_col: str = "text",
                     num_shards: int = N_SKETCH_SHARDS) -> ray.data.Dataset:
    """Per-key approximate top-k terms by total term frequency — the
    grouped form of ``heavy_hitters`` (top terms per language/domain, the
    training-mix profiling rollup). Misra-Gries summaries are kept per
    (block, key); each key's candidate rows AND its per-block deduction
    sentinels shard on ``hash(key)``, so a key resolves ENTIRELY inside
    one merge group and the final per-key top-k emits straight from the
    shard — no driver-side merge across keys.

    Returns a Dataset of (key, term, count_lo, count_hi), <= k rows per
    key, with the Misra-Gries bound count_lo <= cf(key, term) <=
    count_lo + sum(per-key deductions) = count_hi. With ``num_counters``
    >= distinct terms per (block, key) all deductions are 0 and the
    result is the EXACT per-key top-k (the SQL-oracle regime).

    Granularity note: the per-block Python loop is over the block's
    DISTINCT KEYS (languages/domains — small by design); hot keys cost
    candidate rows, never corpus rows.
    """
    from poseidon_ray.functions.tokenize import tokenize_simple_flat

    empty = pa.table({"_shard": pa.array([], type=pa.int64()),
                      key_col: pa.array([], type=pa.string()),
                      "term": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        terms, tfs, parents, _ = tokenize_simple_flat(
            t[text_col].combine_chunks())
        if len(terms) == 0:
            return empty
        keys = np.asarray(t[key_col].to_numpy(zero_copy_only=False),
                          dtype=object)
        kflat = keys[parents]
        uk, kinv = np.unique(kflat, return_inverse=True)
        ut_all, tinv = np.unique(terms, return_inverse=True)
        comp = kinv.astype(np.int64) * len(ut_all) + tinv
        order = np.argsort(comp, kind="stable")
        comp_s = comp[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], comp_s[1:] != comp_s[:-1]]))
        cnt = np.add.reduceat(tfs[order].astype(np.int64), starts)
        g_comp = comp_s[starts]
        g_k = (g_comp // len(ut_all)).astype(np.int64)
        g_t = (g_comp % len(ut_all)).astype(np.int64)
        out_k, out_t, out_c = [], [], []
        kstarts = np.flatnonzero(np.concatenate(
            [[True], g_k[1:] != g_k[:-1]]))
        kends = np.append(kstarts[1:], len(g_k))
        for s, e in zip(kstarts, kends):  # per distinct KEY in this block
            kc, kt = cnt[s:e], g_t[s:e]
            key_val = uk[g_k[s]]
            if len(kc) > num_counters:
                o = np.argsort(kc)[::-1]
                d = kc[o[num_counters]]
                keep = o[:num_counters]
                kt, kc = kt[keep], kc[keep] - d
                pos = kc > 0
                kt, kc = kt[pos], kc[pos]
            else:
                d = np.int64(0)
            out_k.append(np.full(len(kt) + 1, key_val, dtype=object))
            out_t.append(np.concatenate([ut_all[kt], [None]]))
            out_c.append(np.concatenate([kc, [d]]))
        okeys = np.concatenate(out_k)
        sh = (hash_terms(okeys) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({
            "_shard": pa.array(sh),
            key_col: pa.array(okeys, type=pa.string()),
            "term": pa.array(np.concatenate(out_t), type=pa.string()),
            "cnt": pa.array(np.concatenate(out_c), type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        keys = np.asarray(g[key_col].to_numpy(zero_copy_only=False),
                          dtype=object)
        terms = g["term"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        is_ded = np.array([x is None for x in terms])
        uk = np.unique(keys)
        out = []
        for key_val in uk:  # distinct keys per shard — small by design
            mine = keys == key_val
            d_total = int(cnt[mine & is_ded].sum())
            sel = mine & ~is_ded
            kt, kc = terms[sel], cnt[sel]
            order = np.argsort(kt, kind="stable")
            kt, kc = kt[order], kc[order]
            starts = np.flatnonzero(np.concatenate(
                [[True], kt[1:] != kt[:-1]]))
            sums = np.add.reduceat(kc, starts)
            ut = kt[starts]
            top = np.lexsort((ut, -sums))[:k]  # (count desc, term asc)
            out.append(pa.table({
                key_col: pa.array([key_val] * len(top), type=pa.string()),
                "term": pa.array(ut[top], type=pa.string()),
                "count_lo": pa.array(sums[top], type=pa.int64()),
                "count_hi": pa.array(sums[top] + d_total, type=pa.int64()),
            }))
        if not out:
            return pa.table({key_col: pa.array([], type=pa.string()),
                             "term": pa.array([], type=pa.string()),
                             "count_lo": pa.array([], type=pa.int64()),
                             "count_hi": pa.array([], type=pa.int64())})
        return pa.concat_tables(out)

    from poseidon_ray.stages.exchange import shard_exchange

    return shard_exchange(partials, "_shard", merge)
