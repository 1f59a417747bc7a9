"""Sort-free coarse-shard exchange — the generic form of the index build's
manual MR-style shuffle (``pipelines/build.py:_manual_exchange``).

Every keys-only intermediate in this engine (sha rows, band rows, pair
rows, sketch partials) is reduced per COARSE hash shard: the reduce fn
needs hash co-location only, never global order. Ray Data's
``groupby(col).map_groups(fn)`` runs a sort-based all-to-all whose fixed
cost (SortMap + SortReduce machinery, ~1.2 s per exchange on the bench
host regardless of data size) dominates these small exchanges and, at
scale, sorts data that is about to be lexsorted again inside the reduce
fn anyway.

``shard_exchange`` keeps the semantics of ``groupby(shard_col)
.map_groups(reduce_fn)`` for per-shard-pure fns and replaces the sort
machinery with the two-wave exchange the reference's MR index job uses
(builder/index: map spill -> fetch by partition -> reduce), minus the
sort:

    W partitioner tasks   each split their share of the materialized
                          blocks into R reducer slabs by ``shard % R``
                          (``num_returns=R`` object refs — zero driver
                          traffic, spilled by the object store under
                          pressure exactly like MR map spills)
    R reduce tasks        concatenate their W inputs and call
                          ``reduce_fn`` once per distinct shard value

The input dataset is materialized first — in this engine an exchange
input is always the bounded keys/hashes intermediate, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

__all__ = ["shard_exchange", "await_free_cpus"]


def await_free_cpus(timeout: float = 15.0) -> None:
    """Bounded wait until the cluster's CPUs are actually free. An actor
    pool releases its reservations ASYNCHRONOUSLY after ``materialize()``;
    raw tasks launched before that run ~2-wide on leftover slots (measured
    130 s instead of 35 s at 960k rows). gc.collect() first: a dropped
    lazy Dataset only shuts its executor down in ``__del__``."""
    import gc
    import time

    gc.collect()
    want = ray.cluster_resources().get("CPU", 1.0) - 0.5
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if ray.available_resources().get("CPU", 0.0) >= want:
            return
        time.sleep(0.05)


@ray.remote
def _split_blocks(shard_col: str, nred: int, *tables: pa.Table) -> list:
    """One partitioner's share of blocks -> R slab tables (``shard % R``).
    A slab with no rows returns None (the reducer skips it) — an empty
    table would still need a schema this task may not have."""
    outs: list[list[pa.Table]] = [[] for _ in range(nred)]
    for t in tables:
        if t.num_rows == 0:
            continue
        sh = t[shard_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mod = sh % nred
        order = np.argsort(mod, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        mod = mod[order]
        bounds = np.searchsorted(mod, np.arange(nred + 1))
        for r in range(nred):
            if bounds[r + 1] > bounds[r]:
                outs[r].append(t.slice(bounds[r], bounds[r + 1] - bounds[r]))
    return [pa.concat_tables(o).combine_chunks() if o else None
            for o in outs]


@ray.remote(num_returns=2)
def _reduce_slab(reduce_fn, shard_col: str, *tables):
    """Concat one slab's partitioner outputs, call ``reduce_fn`` once per
    distinct shard value (never with an empty group — same contract as
    map_groups). Returns (table | None, num_rows) so the driver can skip
    empty slabs without fetching any table."""
    flat: list = []
    for t in tables:  # num_returns=1 delivers the 1-slab LIST as one ref
        flat.extend(t) if isinstance(t, list) else flat.append(t)
    tabs = [t for t in flat if t is not None and t.num_rows]
    if not tabs:
        return None, 0
    g = pa.concat_tables(tabs).combine_chunks()
    sh = g[shard_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sh, kind="stable")
    g = g.take(pa.array(order, type=pa.int64()))
    sh = sh[order]
    starts = np.flatnonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))
    ends = np.append(starts[1:], len(sh))
    outs = []
    for s, e in zip(starts, ends):
        r = reduce_fn(g.slice(s, e - s))
        if r.num_rows:
            outs.append(r)
    if not outs:
        return None, 0
    out = pa.concat_tables(outs).combine_chunks()
    return out, out.num_rows


_SLAB_TARGET_BYTES = 128 * 1024 * 1024  # reducer-heap bound per slab


def shard_exchange(ds: ray.data.Dataset, shard_col: str, reduce_fn, *,
                   num_reducers: int | None = None,
                   await_cpus: bool = True) -> ray.data.Dataset:
    """``groupby(shard_col).map_groups(reduce_fn)`` for per-shard-pure
    ``reduce_fn``, without the sort-based shuffle. ``reduce_fn`` gets each
    shard's rows as one pyarrow Table (shard column included, arbitrary
    row order — every caller lexsorts internally) and must return a Table.

    Eager: the exchange runs to completion and the result is a
    materialized dataset of the reducer outputs. All call sites exchange
    bounded keys-only intermediates that are consumed immediately.
    """
    from poseidon_ray.stages.docids import _block_refs_and_counts

    mds = ds.materialize()
    if await_cpus:
        await_free_cpus()
    blocks, counts = _block_refs_and_counts(mds)
    blocks = [b for b, c in zip(blocks, counts) if c]
    if not blocks:
        return mds  # empty in, empty out (schema preserved)

    ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
    if num_reducers is None:
        nbytes = mds.size_bytes() or 0
        num_reducers = max(1, min(
            1024, max(ncpu, -(-nbytes // _SLAB_TARGET_BYTES))))
    nred = num_reducers

    num_writers = max(1, min(ncpu, len(blocks)))
    grid = []
    for w in range(num_writers):
        share = blocks[w::num_writers]
        if share:
            grid.append(_split_blocks.options(num_returns=nred)
                        .remote(shard_col, nred, *share))
    grid = [g if isinstance(g, list) else [g] for g in grid]

    out_refs, count_refs = [], []
    for r in range(nred):
        t_ref, n_ref = _reduce_slab.remote(
            reduce_fn, shard_col, *[row[r] for row in grid])
        out_refs.append(t_ref)
        count_refs.append(n_ref)
    nrows = ray.get(count_refs)  # tiny ints; tables never touch the driver
    keep = [t for t, n in zip(out_refs, nrows) if n]
    if not keep:
        # everything reduced away: a 0-block dataset (callers treat empty
        # schema-less results the same as an empty groupby output)
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(keep)
