"""Round-5 additions: sort-free shard_exchange + call-site parity."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from poseidon_ray.stages.exchange import shard_exchange


def _sorted_pandas(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _mk_rows(n=5000, nshard=37, seed=7):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, 400, n)
    val = rng.integers(0, 10_000, n)
    return pa.table({
        "shard": pa.array((key % nshard).astype(np.int64)),
        "key": pa.array(key.astype(np.int64)),
        "val": pa.array(val.astype(np.int64)),
    })


def _mk_stats_fn():
    # closure (pickled by value): a test-module top-level fn would pickle
    # by reference and fail to import inside Ray workers
    def per_shard_stats(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, val = key[order], val[order]
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        sums = np.add.reduceat(val, starts)
        return pa.table({
            "key": pa.array(key[starts], type=pa.int64()),
            "val_sum": pa.array(sums, type=pa.int64()),
        })
    return per_shard_stats


_per_shard_stats = _mk_stats_fn()


def test_shard_exchange_matches_groupby(ray_session):
    t = _mk_rows()
    ds = ray.data.from_arrow(t).repartition(13)
    via_groupby = ds.groupby("shard").map_groups(
        _per_shard_stats, batch_format="pyarrow")
    via_exchange = shard_exchange(ds, "shard", _per_shard_stats)
    a, b = _sorted_pandas(via_groupby), _sorted_pandas(via_exchange)
    assert a.equals(b)
    assert len(a) == 400  # one row per distinct key


def test_shard_exchange_reducer_counts(ray_session):
    t = _mk_rows(n=2000, nshard=5)
    n_keys = len(np.unique(t["key"].to_numpy()))
    ds = ray.data.from_arrow(t)
    for nred in (1, 3, 64):
        out = shard_exchange(ds, "shard", _per_shard_stats,
                             num_reducers=nred)
        assert len(_sorted_pandas(out)) == n_keys


def test_shard_exchange_empty_input(ray_session):
    empty = pa.table({"shard": pa.array([], type=pa.int64()),
                      "key": pa.array([], type=pa.int64()),
                      "val": pa.array([], type=pa.int64())})
    out = shard_exchange(ray.data.from_arrow(empty), "shard",
                         _per_shard_stats)
    assert out.count() == 0


def test_shard_exchange_reduce_to_nothing(ray_session):
    t = _mk_rows(n=100)

    def drop_all(g: pa.Table) -> pa.Table:
        return g.slice(0, 0)

    out = shard_exchange(ray.data.from_arrow(t), "shard", drop_all)
    assert out.count() == 0


def test_shard_exchange_never_sees_empty_group(ray_session):
    """The map_groups contract: reduce_fn is never called on zero rows."""
    t = _mk_rows(n=500, nshard=3)

    n_keys = len(np.unique(t["key"].to_numpy()))

    def strict(g: pa.Table) -> pa.Table:
        assert g.num_rows > 0
        return _per_shard_stats(g)

    out = shard_exchange(ray.data.from_arrow(t), "shard", strict,
                         num_reducers=16)  # 13 of 16 slabs are empty
    assert len(_sorted_pandas(out)) == n_keys


def test_quantile_empty_digest_raises():
    from poseidon_ray.stages.sketch import quantile_at_rank
    with pytest.raises(ValueError, match="empty digest"):
        quantile_at_rank(np.array([]), np.array([]), [1, 2])
    with pytest.raises(ValueError, match="empty digest"):
        quantile_at_rank(np.array([5.0]), np.array([0.0]), [1])
