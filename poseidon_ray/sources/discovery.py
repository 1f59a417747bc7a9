"""Incremental corpus-shard discovery — the DmSrc dir-monitor analog
(``builder/docformat/src/main/dm_src_provider.go``: polls directories for
new files, persists a high-water mark in its ``data_dir``; SURVEY §2.1 S1).

Batch-first reformulation: each call diffs the directory listing against a
persisted manifest of already-processed shards and returns only the new
ones, so an ingest loop is::

    new = discover_new_shards(input_dir, state_path)
    if new:
        extend_index(index_dir, ray.data.read_parquet(new), spec)
        mark_processed(state_path, new)

The state file records (path, size, mtime_ns) per processed shard — a shard
that was rewritten in place (size/mtime changed) is surfaced again.
"""

from __future__ import annotations

import glob
import json
import os


def _listing(input_dir: str, pattern: str) -> dict[str, tuple[int, int]]:
    out = {}
    for p in sorted(glob.glob(os.path.join(input_dir, pattern))):
        st = os.stat(p)
        out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _load_state(state_path: str) -> dict[str, tuple[int, int]]:
    if not os.path.exists(state_path):
        return {}
    with open(state_path) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def discover_new_shards(input_dir: str, state_path: str,
                        pattern: str = "*.parquet") -> list[str]:
    """Paths present in the directory but not yet marked processed (or
    changed since). Deterministic order (sorted)."""
    seen = _load_state(state_path)
    return [p for p, sig in _listing(input_dir, pattern).items()
            if seen.get(p) != sig]


def mark_processed(state_path: str, paths: list[str]) -> None:
    """Advance the high-water mark (atomic write, like every checkpoint)."""
    state = _load_state(state_path)
    for p in paths:
        st = os.stat(p)
        state[p] = (st.st_size, st.st_mtime_ns)
    with open(state_path + ".tmp", "w") as f:
        json.dump(state, f)
    os.replace(state_path + ".tmp", state_path)
