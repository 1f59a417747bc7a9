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

import fcntl
import glob
import json
import os
from contextlib import contextmanager


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


class ShardQueue:
    """Work-list queue source — the RedisSrc/NsqSrc analog (SURVEY §2.1 S2:
    ``redis_src_provider.go`` pops file paths from a Redis list). Batch
    reformulation: a JSON-backed queue of input-shard paths with lease/ack
    semantics, so a fleet of ingest drivers can share one work list:

        q = ShardQueue(state_path)
        q.push(paths)                      # enqueue (idempotent per path)
        batch = q.claim(n, lease_sec=900)  # lease up to n pending shards
        ... extend_index(...) ...
        q.ack(batch)                       # done — never redelivered
        # a crashed driver's lease expires and the shards are re-claimable

    Single-file atomic state (tmp + rename), like every other checkpoint in
    the engine, with an fcntl.flock held around every load-mutate-save so
    concurrent drivers on one host serialize their read-modify-writes
    (tmp+rename alone prevents torn files, not lost updates — two claims
    racing could lease the same shard; ADVICE r2). At real scale this state
    lives in any linearizable KV; the interface is the contract.
    """

    def __init__(self, state_path: str):
        self.state_path = state_path

    @contextmanager
    def _locked(self):
        """Exclusive advisory lock for the load-mutate-save window. A
        separate .lock file (not the state file) so the tmp+rename of the
        state never swaps the locked inode out from under a waiter."""
        with open(self.state_path + ".lock", "a") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self.state_path):
            return {}
        with open(self.state_path) as f:
            return json.load(f)

    def _save(self, state: dict[str, dict]) -> None:
        with open(self.state_path + ".tmp", "w") as f:
            json.dump(state, f)
        os.replace(self.state_path + ".tmp", self.state_path)

    def push(self, paths: list[str]) -> int:
        """Enqueue paths not already known (done paths stay done)."""
        with self._locked():
            state = self._load()
            added = 0
            for p in paths:
                if p not in state:
                    state[p] = {"status": "pending", "lease_until": 0.0,
                                "attempts": 0}
                    added += 1
            self._save(state)
        return added

    def claim(self, n: int, lease_sec: float = 900.0,
              now: float | None = None) -> list[str]:
        """Lease up to n shards: pending ones plus any whose lease expired
        (crashed consumer). Deterministic order (sorted path)."""
        import time as _time

        now = _time.time() if now is None else now
        with self._locked():
            state = self._load()
            out = []
            for p in sorted(state):
                if len(out) >= n:
                    break
                e = state[p]
                if e["status"] == "pending" or (
                        e["status"] == "leased" and e["lease_until"] < now):
                    e["status"] = "leased"
                    e["lease_until"] = now + lease_sec
                    e["attempts"] += 1
                    out.append(p)
            self._save(state)
        return out

    def ack(self, paths: list[str]) -> None:
        with self._locked():
            state = self._load()
            for p in paths:
                if p in state:
                    state[p] = {"status": "done", "lease_until": 0.0,
                                "attempts": state[p]["attempts"]}
            self._save(state)

    def stats(self) -> dict[str, int]:
        out = {"pending": 0, "leased": 0, "done": 0}
        for e in self._load().values():
            out[e["status"]] = out.get(e["status"], 0) + 1
        return out
