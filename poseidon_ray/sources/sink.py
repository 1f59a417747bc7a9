"""Resumable partitioned Parquet sink for operator outputs.

A 100-TB pipeline output (filtered corpus, pair lists, per-key rollups)
must land as many independent shard files so a failed run can skip
finished partitions — never one giant file (the same rule the index build
follows with per-partition segments + manifests, ``state/segments.py``,
mirroring the reference's 1000 bucket files per field,
docs/build_inverted_index.md:54-87).

Layout: ``out_dir/part-PPPPP.parquet`` + ``out_dir/part-PPPPP.json``
(row-count/bytes marker, written AFTER the parquet rename — its presence
certifies the shard). Shard membership is ``hash(key) % P`` and rows are
sorted by key inside each shard, so file contents are deterministic
regardless of input block layout, and a resumed run reproduces the
missing shards bit-identically.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from poseidon_ray.functions.hashing import hash_terms


def write_partitioned(ds: ray.data.Dataset, out_dir: str, *,
                      key_col: str = "doc_id",
                      num_shards: int = 64) -> pa.Table:
    """Write ``ds`` as ``num_shards`` hash-sharded parquet files with
    atomic tmp+rename and per-shard completion markers; a rerun skips
    every shard whose marker exists. Returns the manifest (one row per
    shard: shard, path, rows, skipped)."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        h = hash_terms(t[key_col]) % np.uint64(num_shards)
        return t.append_column("_oshard", pa.array(h.astype(np.int64)))

    def _sort_rows(g: pa.Table) -> pa.Table:
        """Deterministic in-shard order: key first, every other column as
        tiebreak — a repeated key (e.g. several band rows per doc) would
        otherwise keep shuffle-dependent arrival order and break the
        bit-identical-resume contract (r3 ADVICE #5). Columns that don't
        order (nested types) fall back to the stable key-only sort."""
        keys = g[key_col].to_numpy(zero_copy_only=False)
        tiebreak = []
        for c in g.column_names:
            if c == key_col:
                continue
            try:
                arr = g[c].to_numpy(zero_copy_only=False)
                np.less(arr[:1], arr[:1])  # probe orderability
                tiebreak.append(arr)
            except (TypeError, pa.ArrowInvalid):
                continue
        try:
            order = np.lexsort(tuple(reversed(tiebreak)) + (keys,))
        except TypeError:  # e.g. None mixed into an object column
            order = np.argsort(keys, kind="stable")
        return g.take(pa.array(order, type=pa.int64()))

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g["_oshard"][0].as_py())
        final = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        marker = os.path.join(out_dir, f"part-{shard:05d}.json")
        if os.path.exists(marker):
            with open(marker) as f:
                mk = json.load(f)
            # report what is CERTIFIED on disk, not this run's group size;
            # flag the divergence so a resume over changed input is loud
            return pa.table({
                "shard": pa.array([shard], type=pa.int64()),
                "path": pa.array([final], type=pa.string()),
                "rows": pa.array([int(mk["rows"])], type=pa.int64()),
                "skipped": pa.array([True]),
                "input_mismatch": pa.array([int(mk["rows"]) != g.num_rows]),
            })
        g = _sort_rows(g.drop_columns(["_oshard"]))
        tmp = final + ".tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, final)  # atomic on POSIX
        with open(marker + ".tmp", "w") as f:
            json.dump({"shard": shard, "rows": g.num_rows,
                       "bytes": os.path.getsize(final)}, f)
        os.replace(marker + ".tmp", marker)
        return pa.table({
            "shard": pa.array([shard], type=pa.int64()),
            "path": pa.array([final], type=pa.string()),
            "rows": pa.array([g.num_rows], type=pa.int64()),
            "skipped": pa.array([False]),
            "input_mismatch": pa.array([False]),
        })

    from poseidon_ray.stages.exchange import shard_exchange

    out = shard_exchange(ds.map_batches(add_shard, batch_format="pyarrow"),
                         "_oshard", write_shard)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    manifest = pa.concat_tables(tbls).sort_by("shard") if tbls \
        else pa.table({"shard": pa.array([], type=pa.int64()),
                       "path": pa.array([], type=pa.string()),
                       "rows": pa.array([], type=pa.int64()),
                       "skipped": pa.array([], type=pa.bool_()),
                       "input_mismatch": pa.array([], type=pa.bool_())})
    with open(os.path.join(out_dir, "_manifest.json.tmp"), "w") as f:
        json.dump({"num_shards": num_shards, "key_col": key_col,
                   "shards_written": manifest.num_rows}, f)
    os.replace(os.path.join(out_dir, "_manifest.json.tmp"),
               os.path.join(out_dir, "_manifest.json"))
    return manifest
