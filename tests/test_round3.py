"""Round-3 regression tests: ADVICE r2 closures + the r3 scale work
(generation-compat routing keys, large_string buffer safety, de-replicated
LSH shuffles, coarse-sharded verify/sessionize, IVF partitioned access)."""

import numpy as np
import pyarrow as pa
import pytest

from poseidon_ray.state import segments as seg


class TestGenerationCompatKeys:
    """ADVICE r2 (medium): num_partitions / salt_factor must be
    compat-checked — DistributedSearcher's hash routing assumes every
    generation shares manifests[0]'s values."""

    BASE = {
        "block_size": 128,
        "field_spec": {"content": ["content", "code"]},
        "chains": {},
        "bm25": {"k1": 1.2, "b": 0.75},
        "num_partitions": 8,
        "salt_factor": 8,
    }

    def test_same_config_ok(self):
        seg.check_generation_compat([dict(self.BASE), dict(self.BASE)])

    def test_num_partitions_mismatch_raises(self):
        other = dict(self.BASE, num_partitions=16)
        with pytest.raises(ValueError, match="num_partitions"):
            seg.check_generation_compat([dict(self.BASE), other])

    def test_salt_factor_mismatch_raises(self):
        other = dict(self.BASE, salt_factor=4)
        with pytest.raises(ValueError, match="salt_factor"):
            seg.check_generation_compat([dict(self.BASE), other])

    def test_missing_salt_factor_defaults_to_spec(self):
        # pre-r2 manifests lack salt_factor; they were built with the spec
        # default, so they must stay mergeable with a default-spec build
        from poseidon_ray.schema import IndexSpec

        old = dict(self.BASE)
        del old["salt_factor"]
        new = dict(self.BASE, salt_factor=IndexSpec().salt_factor)
        seg.check_generation_compat([old, new])


def _queue_claim_worker(state_path, out_q):
    from poseidon_ray.sources.discovery import ShardQueue

    qq = ShardQueue(state_path)
    got = []
    for _ in range(4):
        got.extend(qq.claim(5))
    out_q.put(got)


class TestShardQueueLocking:
    """ADVICE r2: claim/ack hold an exclusive flock — two racing claimants
    must never lease the same shard."""

    def test_concurrent_claims_disjoint(self, tmp_path):
        import multiprocessing as mp

        from poseidon_ray.sources.discovery import ShardQueue

        state = str(tmp_path / "queue.json")
        q = ShardQueue(state)
        q.push([f"/data/shard-{i:03d}.parquet" for i in range(40)])

        ctx = mp.get_context("spawn")
        out_q = ctx.Queue()
        procs = [ctx.Process(target=_queue_claim_worker, args=(state, out_q))
                 for _ in range(2)]
        for p in procs:
            p.start()
        results = [out_q.get(timeout=60) for _ in procs]
        for p in procs:
            p.join(timeout=60)
        a, b = results
        assert set(a).isdisjoint(set(b)), "two drivers leased the same shard"
        assert len(a) + len(b) == 40

    def test_lock_reentrant_sequential(self, tmp_path):
        from poseidon_ray.sources.discovery import ShardQueue

        q = ShardQueue(str(tmp_path / "q.json"))
        q.push(["a", "b"])
        got = q.claim(1)
        q.ack(got)
        assert q.stats() == {"pending": 1, "leased": 0, "done": 1}


class TestLargeStringBuffers:
    """VERDICT r2 'What's wrong' #1: Arrow string-buffer reads must branch
    on the offset width — a large_string column (int64 offsets, produced
    when a block's chars exceed 2 GB) read as int32 decodes to silent
    garbage trigrams / fingerprints."""

    TEXTS = ["Hello World, this is a test!", "", "ab", "xyzzy " * 50,
             "the quick brown fox", "Ünïcode façade — naïve"]

    def test_trigram_large_string_identical(self):
        from poseidon_ray.functions.tokenize import tokenize_trigram

        small = pa.array(self.TEXTS, type=pa.string())
        large = pa.array(self.TEXTS, type=pa.large_string())
        ts, fs, ds = tokenize_trigram(small)
        tl, fl, dl = tokenize_trigram(large)
        assert ts == tl
        assert fs == fl
        assert np.array_equal(ds, dl)

    def test_fingerprint_large_string_identical(self):
        from poseidon_ray.functions.textstats import rolling_fingerprint

        small = pa.array(self.TEXTS, type=pa.string())
        large = pa.array(self.TEXTS, type=pa.large_string())
        assert rolling_fingerprint(small).equals(rolling_fingerprint(large))

    def test_sliced_offsets_respected(self):
        # a sliced array has a nonzero .offset — the buffer read must honor
        # it for both offset widths
        from poseidon_ray.functions.tokenize import tokenize_trigram

        for typ in (pa.string(), pa.large_string()):
            full = pa.array(self.TEXTS, type=typ)
            sl = full.slice(2, 3)
            t_sl, _, _ = tokenize_trigram(sl)
            t_direct, _, _ = tokenize_trigram(
                pa.array(self.TEXTS[2:5], type=typ))
            assert t_sl == t_direct

    def test_non_string_raises(self):
        from poseidon_ray.functions.tokenize import string_buffers

        with pytest.raises(TypeError):
            string_buffers(pa.array([1, 2, 3]))
