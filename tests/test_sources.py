"""Shard discovery (S1 dir-monitor analog) + batch query actor pool."""

import os
import time

import pyarrow.parquet as pq

from poseidon_ray.sources.discovery import discover_new_shards, mark_processed
from poseidon_ray.sources.fixtures import corpus_table


class TestDiscovery:
    def test_incremental_discovery(self, tmp_path):
        d = str(tmp_path / "in")
        os.makedirs(d)
        state = str(tmp_path / "state.json")
        pq.write_table(corpus_table(10, seed=1), f"{d}/a.parquet")
        pq.write_table(corpus_table(10, seed=2), f"{d}/b.parquet")
        new = discover_new_shards(d, state)
        assert [os.path.basename(p) for p in new] == ["a.parquet", "b.parquet"]
        mark_processed(state, new)
        assert discover_new_shards(d, state) == []
        # a new shard arrives
        pq.write_table(corpus_table(10, seed=3), f"{d}/c.parquet")
        assert [os.path.basename(p) for p in discover_new_shards(d, state)] == \
            ["c.parquet"]

    def test_rewritten_shard_resurfaces(self, tmp_path):
        d = str(tmp_path / "in")
        os.makedirs(d)
        state = str(tmp_path / "state.json")
        pq.write_table(corpus_table(10, seed=1), f"{d}/a.parquet")
        mark_processed(state, discover_new_shards(d, state))
        time.sleep(0.01)
        pq.write_table(corpus_table(20, seed=9), f"{d}/a.parquet")
        assert len(discover_new_shards(d, state)) == 1

    def test_discovery_feeds_extend(self, ray_session, tmp_path):
        import ray.data

        from poseidon_ray.pipelines.build import build_index, extend_index
        from poseidon_ray.pipelines.query import Searcher
        from poseidon_ray.schema import IndexSpec

        d = str(tmp_path / "in")
        os.makedirs(d)
        state = str(tmp_path / "state.json")
        idx = str(tmp_path / "idx")
        spec = IndexSpec(num_partitions=4)
        pq.write_table(corpus_table(60, seed=4), f"{d}/day1.parquet")
        new = discover_new_shards(d, state)
        build_index(ray.data.read_parquet(new), idx, spec)
        mark_processed(state, new)
        pq.write_table(corpus_table(40, seed=5), f"{d}/day2.parquet")
        new = discover_new_shards(d, state)
        assert len(new) == 1
        extend_index(idx, ray.data.read_parquet(new), spec)
        mark_processed(state, new)
        assert Searcher(idx).num_docs == 100
        assert discover_new_shards(d, state) == []


def test_search_dataset_actor_pool(ray_session, tiny_corpus_path, tmp_path):
    import ray.data

    from poseidon_ray.pipelines.build import build_index
    from poseidon_ray.pipelines.query import Searcher, search_dataset
    from poseidon_ray.schema import IndexSpec

    idx = str(tmp_path / "idx")
    build_index(tiny_corpus_path, idx, IndexSpec(num_partitions=4))
    queries = ray.data.from_items([
        {"name": "a", "field": "content", "mode": "or", "text": "return"},
        {"name": "b", "field": "content", "mode": "and", "text": "return error"},
        {"name": "c", "field": "lang", "mode": "or", "text": "go"},
        {"name": "none", "field": "content", "mode": "or", "text": "zzz_absent"},
    ])
    out = search_dataset(queries, idx, k=5, concurrency=2).to_pandas()
    local = Searcher(idx)
    for name, text, field, mode in [("a", "return", "content", "or"),
                                    ("b", "return error", "content", "and"),
                                    ("c", "go", "lang", "or")]:
        mine = out[out.name == name].sort_values("rank")
        want = local.search(text, field=field, mode=mode, k=5)
        assert list(zip(mine.doc_id, mine.score)) == want, name
    assert (out.name == "none").sum() == 0


class TestShardQueue:
    def test_push_claim_ack_cycle(self, tmp_path):
        from poseidon_ray.sources.discovery import ShardQueue

        q = ShardQueue(str(tmp_path / "q.json"))
        assert q.push(["a", "b", "c"]) == 3
        assert q.push(["b", "d"]) == 1          # idempotent
        got = q.claim(2, lease_sec=100, now=1000.0)
        assert got == ["a", "b"]                # deterministic order
        assert q.claim(10, lease_sec=100, now=1001.0) == ["c", "d"]
        q.ack(["a", "b", "c", "d"])
        assert q.stats() == {"pending": 0, "leased": 0, "done": 4}
        assert q.claim(10, now=2000.0) == []    # done is done

    def test_expired_lease_redelivered(self, tmp_path):
        from poseidon_ray.sources.discovery import ShardQueue

        q = ShardQueue(str(tmp_path / "q.json"))
        q.push(["x", "y"])
        assert q.claim(2, lease_sec=50, now=1000.0) == ["x", "y"]
        # crash: no ack. before expiry nothing is claimable
        assert q.claim(2, lease_sec=50, now=1010.0) == []
        # after expiry both redeliver, attempts increment
        assert q.claim(2, lease_sec=50, now=1100.0) == ["x", "y"]
        q.ack(["x"])
        assert q.stats()["done"] == 1
