"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need samples and train/valid/test splits that are
(a) stable across reruns, resumes and cluster layouts, (b) computable
per-row with no shuffle and no driver state, and (c) auditable by an
external system. Seeded RNG sampling fails (a)/(c) the moment block
structure changes; hash-based sampling — keep a row iff
``uint32(sha256(salt + key)[:4]) < frac * 2^32`` — is the standard public
technique and is exactly reproducible in SQL (DuckDB:
``CAST(('0x' || substr(sha256(v), 1, 8)) AS UINTEGER)``), so both
operators here sit under the driver's hard DuckDB oracle.

Scale shape: a pure per-batch filter/annotate (no exchange at all); the
sha loop is hashlib-per-row C speed, same as the build's per-row content
invariant (functions/hashing.sha256_column).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _bucket_u32(values, salt: str) -> np.ndarray:
    """uint32 from the first 4 sha256 bytes of ``salt + str(value)``.

    The per-row hashlib call IS the contract (DuckDB's sha256 must see the
    identical input), but the int parse is vectorized: all digest prefixes
    land in one buffer and decode in a single big-endian frombuffer view
    (r3 VERDICT #3)."""
    s = salt.encode()
    d = b"".join(hashlib.sha256(s + str(v).encode()).digest()[:4]
                 for v in values)
    return np.frombuffer(d, dtype=">u4").astype(np.uint32)


def deterministic_sample(ds: ray.data.Dataset, frac: float, *,
                         key_col: str = "doc_id",
                         salt: str = "") -> ray.data.Dataset:
    """Keep ~``frac`` of rows, chosen by content hash of ``key_col`` —
    stable under reruns, resume, repartitioning and cluster size; disjoint
    samples come from different ``salt`` values."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    threshold = np.uint32(min(int(frac * (1 << 32)), (1 << 32) - 1))

    def filt(t: pa.Table) -> pa.Table:
        b = _bucket_u32(t[key_col].to_pylist(), salt)
        if frac >= 1.0:
            return t
        return t.filter(pa.array(b < threshold))

    return ds.map_batches(filt, batch_format="pyarrow")


def hash_split(ds: ray.data.Dataset, splits: dict[str, float], *,
               key_col: str = "doc_id", salt: str = "",
               out_col: str = "split") -> ray.data.Dataset:
    """Assign each row to a named split by hash bucket: cumulative
    ``frac``-intervals of the uint32 hash line, in the given dict order.
    Fractions must sum to 1. Per-row, shuffle-free, layout-independent."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    names = list(splits)
    # right edges on the uint32 line; last edge pinned to 2^32 - 1 so
    # float rounding can never leave a row unassigned
    edges = np.cumsum([splits[n] for n in names]) * (1 << 32)
    edges = np.minimum(edges, (1 << 32) - 1).astype(np.uint64)

    def assign(t: pa.Table) -> pa.Table:
        b = _bucket_u32(t[key_col].to_pylist(), salt).astype(np.uint64)
        pos = np.searchsorted(edges, b, side="right")
        pos = np.minimum(pos, len(names) - 1)
        lab = np.asarray(names, dtype=object)[pos]
        return t.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


N_STRATA_SHARDS = 256  # coarse merge-shard count for stratified_sample


def stratified_sample(ds: ray.data.Dataset, group_col: str, k: int, *,
                      key_col: str = "doc_id",
                      salt: str = "",
                      num_shards: int = N_STRATA_SHARDS) -> ray.data.Dataset:
    """Deterministic k-per-group sample (e.g. balance languages in a
    training mix): within each ``group_col`` value keep the k rows with the
    smallest content-hash bucket (ties by ``key_col``) — a uniform
    without-replacement draw that is stable under layout/rerun and
    reproducible in SQL (``QUALIFY row_number() OVER (PARTITION BY g
    ORDER BY bucket, key) <= k``).

    Scale shape: classic top-k combiner — each block forwards at most
    k rows per group it contains (vectorized lexsort + per-group rank),
    the merge is a coarse group-hash groupby doing ONE lexsort + rank per
    shard; the wide exchange carries candidate rows only, never the
    corpus.
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def _rank_select(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t[group_col].to_numpy(zero_copy_only=False)
        b = t["_bucket"].to_numpy(zero_copy_only=False)
        key = t[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, b, g))
        gs = g[order]
        starts = np.concatenate([[True], gs[1:] != gs[:-1]])
        # rank within group = position - start-of-group position
        pos = np.arange(len(gs))
        group_start = np.maximum.accumulate(np.where(starts, pos, 0))
        keep = order[(pos - group_start) < k]
        return t.take(pa.array(np.sort(keep), type=pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        b = _bucket_u32(t[key_col].to_pylist(), salt)
        t = t.append_column("_bucket", pa.array(b.astype(np.int64)))
        t = _rank_select(t)
        gh = _bucket_u32(t[group_col].to_pylist(), "strata-shard")
        return t.append_column(
            "_gshard", pa.array((gh % num_shards).astype(np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        return _rank_select(g).drop_columns(["_bucket", "_gshard"])

    from poseidon_ray.stages.exchange import shard_exchange

    return shard_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), "_gshard", merge)
