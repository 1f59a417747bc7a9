"""Relational join operators beyond the reference's KV lookups.

The reference's only joins are the scatter-gather lookups of the query
path (SURVEY §2.4 — token->meta, docId->doc, posting intersection); a
training-data engine additionally needs:

- ``broadcast_hash_join`` — the classic broadcast-small-side equi-join:
  the small side is collected once (bounded, loud ceiling), ``ray.put``
  once, and every batch of the BIG side resolves matches with one
  vectorized searchsorted — the big side never shuffles (the same
  broadcast-delivery shape as ``_filter_to_ids`` / the drop-set filter).
- ``asof_join`` — per-key backward as-of join (each left row matched to
  the latest right row with ``right.on <= left.on`` for the same ``by``
  key): the operator Ray Data lacks for event-stream enrichment
  (attach the most recent prior signal — click before purchase, quote
  before trade). Coarse ``hash(by) % P`` shuffle of BOTH sides as one
  tagged union through ``shard_exchange`` (single consumer), then per
  shard ONE lexsort + maximum.accumulate pass matches every left row —
  no per-key Python, no per-row search loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from poseidon_ray.stages.exchange import shard_exchange

MAX_BROADCAST_JOIN_ROWS = 50_000_000  # ~int64 key + a few cols, driver-held

_MIX = np.uint64(0x9E3779B97F4A7C15)


def broadcast_hash_join(big: ray.data.Dataset, small: pa.Table, *,
                        on: str, small_cols: list[str],
                        how: str = "inner") -> ray.data.Dataset:
    """Join ``big`` (streamed, never shuffled) against ``small`` (driver
    pa.Table, int64 key) — ``ray.put`` once, searchsorted per batch.
    ``how``: "inner" drops unmatched big rows; "left" keeps them with
    nulls. ``small`` must be unique on ``on`` (raises otherwise — a
    fan-out join would silently duplicate big rows)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if small.num_rows > MAX_BROADCAST_JOIN_ROWS:
        raise ValueError(
            f"small side ({small.num_rows} rows) exceeds the broadcast "
            f"ceiling {MAX_BROADCAST_JOIN_ROWS}; shuffle-join instead")
    keys = small[on].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(f"small side is not unique on {on!r}")
    # ship the payload as an Arrow table slice: type-exact null handling
    # via take() with masked indices on the worker side
    small_sorted = small.select(small_cols).take(
        pa.array(order, type=pa.int64()))
    ref = ray.put((keys, small_sorted))

    def join_batch(t: pa.Table) -> pa.Table:
        k, pay = ray.get(ref)
        b = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(b):
            for c in small_cols:
                t = t.append_column(c, pay[c].slice(0, 0))
            return t
        pos = np.minimum(np.searchsorted(k, b), max(len(k) - 1, 0))
        hit = (k[pos] == b) if len(k) else np.zeros(len(b), dtype=bool)
        if how == "inner":
            sel = np.flatnonzero(hit)
            t = t.take(pa.array(sel, type=pa.int64()))
            taken = pay.take(pa.array(pos[sel], type=pa.int64()))
        else:
            taken = pay.take(pa.array(pos, type=pa.int64(), mask=~hit))
        for c in small_cols:
            t = t.append_column(c, taken[c])
        return t

    return big.map_batches(join_batch, batch_format="pyarrow")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: str = "ts", by: str = "user_id",
              left_cols: list[str], right_cols: list[str],
              tiebreak: str | None = None,
              tolerance: int | None = None,
              num_shards: int = 256,
              suffix: str = "_r") -> ray.data.Dataset:
    """Backward as-of LEFT join: every left row gains the right row with
    the greatest ``on`` <= left ``on`` for the same ``by`` key (nulls
    when none). Matches DuckDB ``ASOF LEFT JOIN ... ON l.by = r.by AND
    l.on >= r.on``; the output ``on``/``on + suffix`` columns are int64
    epoch microseconds.

    ``tolerance`` (same units as ``on``; µs for timestamps) bounds the
    lookback — a match older than ``left.on - tolerance`` becomes null
    (the windowed/range-join semantics: "the click within the last
    hour"); SQL twin = ASOF join + a CASE null-out of stale matches.

    ``left_cols`` and ``right_cols`` must be disjoint; right rows tied
    at the same (by, on) are resolved deterministically by ``tiebreak``
    (greatest wins; defaults to the first right col) — SQL's ASOF leaves
    that row choice unspecified, so the twin pins it with an explicit
    per-(by, on) argmax.

    Scale shape: both sides ride ONE tagged-union exchange keyed
    ``hash(by) % num_shards``; inside each shard one lexsort over
    (key, ts, right-first) and one ``maximum.accumulate`` resolve every
    match — O(shards) Python calls, zero per-row loops.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left_cols and right_cols overlap: {overlap}")
    tiebreak = tiebreak or right_cols[0]
    l_schema = left.schema()
    r_schema = right.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def _ts64(col) -> np.ndarray:
        arr = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[us]").astype(np.int64)
        return arr.astype(np.int64)

    def tag(is_left: bool):
        mine = set(left_cols if is_left else right_cols)
        other_types = r_types if is_left else l_types

        def fn(t: pa.Table) -> pa.Table:
            keys = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
            sh = ((keys.astype(np.uint64) * _MIX)
                  % np.uint64(num_shards)).astype(np.int64)
            out = {"_shard": pa.array(sh),
                   by: pa.array(keys, type=pa.int64()),
                   "_on": pa.array(_ts64(t[on]), type=pa.int64()),
                   "_isl": pa.array(np.full(t.num_rows, is_left))}
            # CANONICAL column order (left_cols then right_cols) on both
            # sides — the union concat requires identical schemas
            for c in left_cols + right_cols:
                out[c] = t[c] if c in mine else pa.nulls(
                    t.num_rows, type=other_types[c])
            return pa.table(out)

        return fn

    l_tagged = left.map_batches(tag(True), batch_format="pyarrow")
    r_tagged = right.map_batches(tag(False), batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = g[by].to_numpy(zero_copy_only=False)
        ts = g["_on"].to_numpy(zero_copy_only=False)
        isl = g["_isl"].to_numpy(zero_copy_only=False)
        tb = pc.rank(g[tiebreak], sort_keys="ascending",
                     null_placement="at_start").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # sort: (key, ts, right-before-left, tiebreak rank). At equal
        # (key, ts) every right row precedes every left row (as-of is
        # inclusive); among tied right rows the greatest tiebreak sorts
        # LAST, and maximum.accumulate keeps the last right seen — so
        # the greatest-tiebreak right wins deterministically.
        order = np.lexsort((tb, isl.astype(np.int8), ts, keys))
        keys_s, isl_s = keys[order], isl[order]
        ridx = np.where(~isl_s, np.arange(len(order)), -1)
        last_r = np.maximum.accumulate(ridx)
        lpos = np.flatnonzero(isl_s)
        cand = last_r[lpos]
        valid = cand >= 0
        valid[valid] &= keys_s[cand[valid]] == keys_s[lpos[valid]]
        if tolerance is not None:
            ts_s = ts[order]
            valid[valid] &= (ts_s[lpos[valid]] - ts_s[cand[valid]]
                             <= tolerance)
        l_src = order[lpos]
        r_src = np.where(valid, order[np.maximum(cand, 0)], 0)
        lt = g.take(pa.array(l_src, type=pa.int64()))
        # null indices -> all-null rows, type-exact (no numpy round-trip)
        rt = g.take(pa.array(r_src, type=pa.int64(), mask=~valid))
        out = {by: lt[by], on: lt["_on"]}
        for c in left_cols:
            out[c] = lt[c]
        out[on + suffix] = rt["_on"]
        for c in right_cols:
            out[c] = rt[c]
        return pa.table(out)

    return shard_exchange(l_tagged.union(r_tagged), "_shard", merge)
