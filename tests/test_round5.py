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


class TestCopartitionedAntiJoin:
    """r4 VERDICT 'Next round' #2: past MAX_DROP_IDS the anti-filter
    switches to a co-partitioned sorted-merge (no driver-side drop set);
    results must be identical to the broadcast/sharded regimes."""

    def _docs(self):
        import pyarrow.parquet as pq
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet")

    def test_exact_dedup_identical_across_regimes(self, ray_session,
                                                  monkeypatch):
        from poseidon_ray.stages import dedup

        base = _sorted_pandas(dedup.exact_dedup(self._docs()))
        # force the co-partitioned regime for every nonzero drop set
        monkeypatch.setattr(dedup, "MAX_DROP_IDS", 0)
        copart = _sorted_pandas(dedup.exact_dedup(self._docs()))
        assert base.equals(copart)

    def test_keep_representatives_identical_across_regimes(self, ray_session,
                                                           monkeypatch):
        from poseidon_ray.stages import dedup

        docs = self._docs()
        pairs = dedup.minhash_candidate_pairs(
            docs, min_jaccard=0.5, bands=16).materialize()
        base = _sorted_pandas(dedup.keep_representatives(docs, pairs))
        monkeypatch.setattr(dedup, "MAX_DROP_IDS", 0)
        copart = _sorted_pandas(
            dedup.keep_representatives(self._docs(), pairs))
        assert base.equals(copart)
        assert len(base) > 0

    def test_merge_skips_missing_drop_shard(self, ray_session, tmp_path):
        from poseidon_ray.stages import dedup

        corpus = pa.table({
            "doc_id": pa.array(np.arange(100), type=pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(100)]),
        })
        drops = pa.table({
            "shard": pa.array(np.zeros(3), type=pa.int64()),
            "drop_id": pa.array([5, 50, 95], type=pa.int64()),
        })
        out = dedup._anti_filter_copartitioned(
            ray.data.from_arrow(corpus), ray.data.from_arrow(drops),
            id_col="doc_id", num_shards=8, workdir=str(tmp_path))
        df = _sorted_pandas(out)
        assert len(df) == 97
        assert not set(df["doc_id"]) & {5, 50, 95}


class TestBloomPersistence:
    """r4 VERDICT 'Next round' #7: a Bloom seen-set built in ONE Ray
    session survives to a FRESH session (subprocess owns the build
    session; this pytest session loads + filters)."""

    def test_build_save_load_filter_across_sessions(self, ray_session,
                                                    tmp_path):
        import subprocess
        import sys

        store = str(tmp_path / "bloom_store")
        build_script = f"""
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
from poseidon_ray.stages import sketch
seen = ray.data.from_arrow(pa.table(
    {{"url": pa.array([f"https://example.com/{{i}}" for i in range(2000)])}}))
bloom = sketch.build_bloom(seen, "url", n_keys_hint=2000)
sketch.save_bloom(bloom, {store!r})
ray.shutdown()
print("SAVED")
"""
        r = subprocess.run([sys.executable, "-c", build_script],
                           capture_output=True, text=True, cwd="/root/repo")
        assert "SAVED" in r.stdout, r.stderr[-2000:]

        from poseidon_ray.stages import sketch

        bloom = sketch.load_bloom(store)
        assert bloom[1] >= 2000 * 10  # m_bits
        probe = pa.table({
            "url": pa.array(
                [f"https://example.com/{i}" for i in range(0, 2000, 100)]
                + [f"https://other.org/{i}" for i in range(5000)]),
        })
        out = sketch.bloom_annotate(
            ray.data.from_arrow(probe), bloom, "url").to_pandas()
        seen_mask = out["url"].str.startswith("https://example.com/")
        # no false negatives, ever
        assert out.loc[seen_mask, "maybe_seen"].all()
        # FP rate over 5000 unseen keys stays near the designed ~0.8%
        fp = out.loc[~seen_mask, "maybe_seen"].mean()
        assert fp <= 0.03, fp

    def test_load_refuses_missing_shard(self, ray_session, tmp_path):
        import os

        from poseidon_ray.stages import sketch

        store = str(tmp_path / "bloom_bad")
        seen = ray.data.from_arrow(pa.table(
            {"url": pa.array([f"k{i}" for i in range(100)])}))
        bloom = sketch.build_bloom(seen, "url", n_keys_hint=100,
                                   num_shards=8)
        sketch.save_bloom(bloom, store)
        os.remove(os.path.join(store, "bloom-00003.bin"))
        with pytest.raises(FileNotFoundError, match="missing shard"):
            sketch.load_bloom(store)


class TestHeavyHittersBy:
    def test_approx_regime_bounds_per_key(self, ray_session):
        """Tiny num_counters forces real per-(block, key) deductions; every
        reported (key, term) must satisfy count_lo <= exact cf <= count_hi."""
        import duckdb

        from poseidon_ray.stages import sketch

        sf = "/root/testdata/sf0.001/documents.parquet"
        out = sketch.heavy_hitters_by(
            ray.data.read_parquet(sf, columns=["lang", "text"]),
            "lang", k=5, num_counters=8).to_pandas()
        assert len(out) > 0
        exact = duckdb.sql(f"""
            WITH toks AS (SELECT lang, unnest(regexp_split_to_array(
                lower(text), '[^a-z0-9]+')) AS term
              FROM read_parquet('{sf}'))
            SELECT lang, term, count(*) AS c FROM toks
            WHERE term <> '' GROUP BY lang, term""").df()
        cf = {(r.lang, r.term): r.c for r in exact.itertuples()}
        for r in out.itertuples():
            c = cf.get((r.lang, r.term), 0)
            assert r.count_lo <= c <= r.count_hi, (r, c)

    def test_exact_regime_no_slack(self, ray_session):
        from poseidon_ray.stages import sketch

        out = sketch.heavy_hitters_by(
            ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                  columns=["lang", "text"]),
            "lang", k=5, num_counters=200_000).to_pandas()
        assert (out.count_lo == out.count_hi).all()
        assert (out.groupby("lang").size() <= 5).all()


class TestJpegEdges:
    """r5: DNL (height-after-scan) streams + 16-bit (Pq=1) quant tables."""

    def _img(self, h=37, w=52, seed=5):
        rng = np.random.default_rng(seed)
        base = np.linspace(0, 255, w, dtype=np.float64)[None, :]
        img = np.clip(base + rng.normal(0, 12, (h, w)), 0, 255)
        return img.astype(np.uint8)

    def test_dnl_stream_decodes_identically(self):
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img()
        plain = encode_jpeg(img, quality=85)
        dnl = encode_jpeg(img, quality=85, dnl=True)
        assert plain != dnl
        # SOF height field is 0 in the DNL stream
        sof_at = dnl.find(b"\xff\xc0")
        assert dnl[sof_at + 5:sof_at + 7] == b"\x00\x00"
        assert b"\xff\xdc" in dnl
        a, b = decode_jpeg(plain), decode_jpeg(dnl)
        assert a.shape == b.shape == (37, 52, 1)
        assert (a == b).all()

    def test_dnl_missing_raises(self):
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        blob = bytearray(encode_jpeg(self._img(), quality=85, dnl=True))
        at = blob.find(b"\xff\xdc")
        blob[at + 1] = 0xFE  # turn DNL into a COM marker
        with pytest.raises(ValueError, match="no DNL"):
            decode_jpeg(bytes(blob))

    def test_16bit_quant_roundtrip_same_as_8bit(self):
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img(40, 40)
        # quality high enough that tables fit 8 bits: identical pixel
        # output, only the DQT encoding differs (Pq=1, >u2)
        a = decode_jpeg(encode_jpeg(img, quality=90))
        blob16 = encode_jpeg(img, quality=90, quant_precision=16)
        dqt_at = blob16.find(b"\xff\xdb")
        assert blob16[dqt_at + 4] >> 4 == 1  # Pq=1
        b = decode_jpeg(blob16)
        assert (a == b).all()

    def test_16bit_quant_tables_above_255(self):
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        img = self._img(48, 48)
        # quality 10 pushes base luma steps to ~5x (max 605 > 255): only
        # representable with Pq=1. Decode must succeed and keep the
        # coarse structure (DC step is 80 -> generous tolerance).
        blob = encode_jpeg(img, quality=10, quant_precision=16)
        # the stream genuinely carries >255 entries (the 8-bit path clips)
        dqt_at = blob.find(b"\xff\xdb")
        entries = np.frombuffer(blob, ">u2", 64, dqt_at + 5)
        assert entries.max() > 255
        out = decode_jpeg(blob)
        assert out.shape == (48, 48, 1)
        assert abs(out.astype(float).mean() - img.mean()) < 40
        # a high-contrast checkerboard excites the >255-step coefficients:
        # the 16-bit stream must then differ from the 8-bit-clipped one
        cb = (np.indices((48, 48)).sum(axis=0) % 2 * 255).astype(np.uint8)
        out16 = decode_jpeg(encode_jpeg(cb, quality=10, quant_precision=16))
        out8 = decode_jpeg(encode_jpeg(cb, quality=10))
        assert not (out16 == out8).all()

    def test_dnl_with_restart_and_420(self):
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
        plain = encode_jpeg(img, quality=80, subsampling="420",
                            restart_interval=2)
        dnl = encode_jpeg(img, quality=80, subsampling="420",
                          restart_interval=2, dnl=True)
        a, b = decode_jpeg(plain), decode_jpeg(dnl)
        assert (a == b).all()


class TestManualSort:
    """The docstore's manual range-sort exchange must equal ds.sort."""

    def test_matches_ray_sort(self, ray_session):
        import pyarrow.compute as pc

        from poseidon_ray.stages.docids import SORT_KEYS, _manual_sort

        rng = np.random.default_rng(11)
        n = 3000
        t = pa.table({
            "repo": pa.array([f"r{int(x)}" for x in rng.integers(0, 40, n)]),
            "path": pa.array([f"p/{int(x)}.py" for x in rng.integers(0, 300, n)]),
            "commit": pa.array([f"c{int(x):04d}" for x in rng.integers(0, 9999, n)]),
            "lang": pa.array(["py"] * n),
            "content": pa.array([f"body {i}" for i in range(n)]),
        })
        ds = ray.data.from_arrow(t).repartition(7)
        expect = ds.sort(SORT_KEYS).to_pandas().reset_index(drop=True)
        refs, counts = _manual_sort(ds.materialize())
        got = pa.concat_tables(ray.get(refs)).to_pandas().reset_index(drop=True)
        assert sum(counts) == n
        # identical global order (keys are unique almost surely; compare
        # the key columns exactly, content via the full frame sorted)
        assert expect[SORT_KEYS].equals(got[SORT_KEYS])
        assert expect.sort_values(list(expect.columns)).reset_index(drop=True) \
            .equals(got.sort_values(list(got.columns)).reset_index(drop=True))

    def test_empty_corpus(self, ray_session):
        t = pa.table({"repo": pa.array([], type=pa.string()),
                      "path": pa.array([], type=pa.string()),
                      "commit": pa.array([], type=pa.string()),
                      "lang": pa.array([], type=pa.string()),
                      "content": pa.array([], type=pa.string())})
        from poseidon_ray.stages.docids import _manual_sort

        refs, counts = _manual_sort(ray.data.from_arrow(t).materialize())
        assert refs == [] and counts == []


class TestJoins:
    """r5 join operators: broadcast equi-join + backward as-of join."""

    def test_broadcast_hash_join_inner_and_left(self, ray_session):
        from poseidon_ray.stages.join import broadcast_hash_join

        big = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4, 2], type=pa.int64()),
            "x": pa.array([10, 20, 30, 40, 21], type=pa.int64()),
        }))
        small = pa.table({"k": pa.array([2, 3], type=pa.int64()),
                          "name": pa.array(["b", "c"])})
        inner = broadcast_hash_join(big, small, on="k",
                                    small_cols=["name"]).to_pandas()
        assert sorted(inner["x"]) == [20, 21, 30]
        assert set(inner["name"]) == {"b", "c"}
        left = broadcast_hash_join(big, small, on="k", small_cols=["name"],
                                   how="left").to_pandas()
        assert len(left) == 5
        assert left["name"].isna().sum() == 2

    def test_broadcast_join_rejects_duplicate_small_keys(self, ray_session):
        from poseidon_ray.stages.join import broadcast_hash_join

        big = ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
        small = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                          "v": pa.array([1, 2], type=pa.int64())})
        with pytest.raises(ValueError, match="not unique"):
            broadcast_hash_join(big, small, on="k", small_cols=["v"])

    def test_asof_join_semantics(self, ray_session):
        from poseidon_ray.stages.join import asof_join

        left = ray.data.from_arrow(pa.table({
            "ts": pa.array([10, 20, 5], type=pa.int64()),
            "user_id": pa.array([1, 1, 2], type=pa.int64()),
            "lv": pa.array([100, 200, 300], type=pa.int64()),
        }))
        right = ray.data.from_arrow(pa.table({
            "ts": pa.array([8, 10, 15, 30, 6], type=pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "rv": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        }))
        out = asof_join(left, right, on="ts", by="user_id",
                        left_cols=["lv"], right_cols=["rv"]).to_pandas() \
            .sort_values("lv").reset_index(drop=True)
        # lv=100 @ts10 -> rv=2 (ts 10, inclusive); lv=200 @ts20 -> rv=3;
        # lv=300 @ts5 (user 2) -> no prior click (right ts 6 > 5) -> null
        assert out["rv"].tolist()[:2] == [2, 3]
        assert np.isnan(out["rv"].iloc[2]) or out["rv"].isna().iloc[2]
        assert out["ts_r"].tolist()[:2] == [10, 15]

    def test_asof_join_tiebreak_deterministic(self, ray_session):
        from poseidon_ray.stages.join import asof_join

        left = ray.data.from_arrow(pa.table({
            "ts": pa.array([10], type=pa.int64()),
            "user_id": pa.array([7], type=pa.int64()),
            "lv": pa.array([1], type=pa.int64()),
        }))
        # two right rows at the same (user, ts): greatest tiebreak wins
        right = ray.data.from_arrow(pa.table({
            "ts": pa.array([9, 9], type=pa.int64()),
            "user_id": pa.array([7, 7], type=pa.int64()),
            "rv": pa.array([41, 42], type=pa.int64()),
        })).repartition(2)
        out = asof_join(left, right, on="ts", by="user_id",
                        left_cols=["lv"], right_cols=["rv"]).to_pandas()
        assert out["rv"].tolist() == [42]


def test_asof_join_tolerance(ray_session):
    from poseidon_ray.stages.join import asof_join

    left = ray.data.from_arrow(pa.table({
        "ts": pa.array([100, 100], type=pa.int64()),
        "user_id": pa.array([1, 2], type=pa.int64()),
        "lv": pa.array([1, 2], type=pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "ts": pa.array([95, 10], type=pa.int64()),
        "user_id": pa.array([1, 2], type=pa.int64()),
        "rv": pa.array([10, 20], type=pa.int64()),
    }))
    out = asof_join(left, right, on="ts", by="user_id",
                    left_cols=["lv"], right_cols=["rv"],
                    tolerance=50).to_pandas().sort_values("lv")
    # user 1: right at ts 95 within 50 -> matched; user 2: ts 10 is 90
    # behind -> nulled by the tolerance window
    assert out["rv"].tolist()[0] == 10
    assert out["rv"].isna().iloc[1]


def test_copartitioned_antijoin_resume(ray_session, tmp_path):
    """A re-run over the same workdir hits the sink's completion markers
    (shards skip) and produces identical output."""
    import json
    import os

    from poseidon_ray.stages import dedup

    corpus = pa.table({
        "doc_id": pa.array(np.arange(500), type=pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(500)]),
    })
    drops = pa.table({
        "shard": pa.array(np.zeros(10), type=pa.int64()),
        "drop_id": pa.array(np.arange(0, 500, 50), type=pa.int64()),
    })
    wd = str(tmp_path)
    first = _sorted_pandas(dedup._anti_filter_copartitioned(
        ray.data.from_arrow(corpus), ray.data.from_arrow(drops),
        id_col="doc_id", num_shards=8, workdir=wd))
    again = _sorted_pandas(dedup._anti_filter_copartitioned(
        ray.data.from_arrow(corpus), ray.data.from_arrow(drops),
        id_col="doc_id", num_shards=8, workdir=wd))
    assert first.equals(again)
    assert len(first) == 490
    # every corpus shard is marker-certified after the first run
    markers = [f for f in os.listdir(os.path.join(wd, "corpus"))
               if f.endswith(".json") and f.startswith("part-")]
    assert len(markers) == 8
    rows = sum(json.load(open(os.path.join(wd, "corpus", m)))["rows"]
               for m in markers)
    assert rows == 500


def test_shard_exchange_negative_shard_values(ray_session):
    """pv_uv routes pv sentinels on shard -1; Python-modulo semantics put
    them in a real slab and the reduce still sees them as ONE group."""
    t = pa.table({
        "shard": pa.array([-1, -1, 3, 3, 7], type=pa.int64()),
        "key": pa.array([10, 10, 20, 21, 30], type=pa.int64()),
        "val": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    })

    def reduce_fn(g: pa.Table) -> pa.Table:
        s = g["shard"][0].as_py()
        assert (g["shard"].to_numpy() == s).all()  # shard-pure groups
        return _per_shard_stats(g)

    out = _sorted_pandas(shard_exchange(ray.data.from_arrow(t), "shard",
                                        reduce_fn, num_reducers=4))
    assert out["key"].tolist() == [10, 20, 21, 30]
    assert out["val_sum"].tolist() == [3, 3, 4, 5]
