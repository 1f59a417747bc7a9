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
    """uint32 from the first 4 sha256 bytes of ``salt + str(value)``."""
    s = salt.encode()
    return np.fromiter(
        (int.from_bytes(hashlib.sha256(s + str(v).encode()).digest()[:4],
                        "big") for v in values),
        dtype=np.uint32, count=len(values))


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
