"""Round-4 additions: vectorized pair-verify kernel, hash-only exact
dedup, zero-copy embedding ingestion, IVF skew guard + content
fingerprint, gated ivf_recall."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_DIR


class TestPairIntersectKernel:
    """dedup._pair_intersect_sizes — the vectorized exact-Jaccard verify
    kernel (r3 VERDICT 'Next round' #1). Property: equal to per-pair
    np.intersect1d on every path (doc-grouped, b-grouped, padded batch),
    including empty sets and a real hash equal to the pad value."""

    def _pack(self, docs):
        lens = np.array([len(d) for d in docs], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        nonempty = [d for d in docs if len(d)]
        buf = np.concatenate(nonempty) if nonempty else np.empty(0, np.uint64)
        return lens, offs, buf

    def test_matches_bruteforce_all_paths(self):
        from poseidon_ray.stages import dedup

        rng = np.random.default_rng(7)
        docs = [np.unique(rng.integers(0, 400, rng.integers(0, 60))
                          .astype(np.uint64)) for _ in range(120)]
        # pad-value collision in both members of pair 0
        docs[3] = np.unique(np.append(docs[3], dedup._PAD))
        docs[4] = np.unique(np.append(docs[4], dedup._PAD))
        lens, offs, buf = self._pack(docs)
        # clustered pairs (doc-grouped path) + isolated pairs (padded path)
        ia = np.concatenate([np.zeros(30, np.int64),
                             rng.integers(0, 120, 200),
                             np.arange(10, 60, 2)]).astype(np.int64)
        ib = np.concatenate([rng.integers(1, 120, 30),
                             rng.integers(0, 120, 200),
                             np.arange(11, 61, 2)]).astype(np.int64)
        ia[0], ib[0] = 3, 4
        got = dedup._pair_intersect_sizes(lens, offs, buf, ia, ib)
        want = np.array([len(np.intersect1d(docs[a], docs[b],
                                            assume_unique=True))
                         for a, b in zip(ia, ib)])
        np.testing.assert_array_equal(got, want)

    def test_chunking_invariance(self):
        from poseidon_ray.stages import dedup

        rng = np.random.default_rng(11)
        docs = [np.unique(rng.integers(0, 100, rng.integers(1, 40))
                          .astype(np.uint64)) for _ in range(50)]
        lens, offs, buf = self._pack(docs)
        ia = rng.integers(0, 50, 500).astype(np.int64)
        ib = rng.integers(0, 50, 500).astype(np.int64)
        base = dedup._pair_intersect_sizes(lens, offs, buf, ia, ib)
        saved = dedup._VERIFY_CHUNK_ELEMS
        try:
            dedup._VERIFY_CHUNK_ELEMS = 64  # force many tiny batches
            tiny = dedup._pair_intersect_sizes(lens, offs, buf, ia, ib)
        finally:
            dedup._VERIFY_CHUNK_ELEMS = saved
        np.testing.assert_array_equal(base, tiny)


class TestVectorsFromArrow:
    def test_list_and_fixed_size_list_and_slices(self):
        from poseidon_ray.functions.vec import vectors_from_arrow

        rng = np.random.default_rng(0)
        mat = rng.standard_normal((64, 8)).astype(np.float32)
        cols = [
            pa.array(list(mat), type=pa.list_(pa.float32())),
            pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), 8),
        ]
        for col in cols:
            np.testing.assert_allclose(vectors_from_arrow(col), mat)
            np.testing.assert_allclose(
                vectors_from_arrow(col.slice(5, 20)), mat[5:25])
            np.testing.assert_allclose(
                vectors_from_arrow(pa.chunked_array([col, col]))[64:], mat)

    def test_rejects_ragged_and_null(self):
        from poseidon_ray.functions.vec import vectors_from_arrow

        with pytest.raises(ValueError):
            vectors_from_arrow(
                pa.array([[1.0], [1.0, 2.0]], type=pa.list_(pa.float64())))
        with pytest.raises(ValueError):
            vectors_from_arrow(
                pa.array([[1.0], None], type=pa.list_(pa.float64())))
        with pytest.raises(TypeError):
            vectors_from_arrow(pa.array([1.0, 2.0]))


class TestExactDedupHashOnly:
    def test_shuffle_equals_broadcast_and_keeps_schema(self, ray_session):
        import ray.data

        from poseidon_ray.stages.dedup import exact_dedup

        t = pa.table({
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": pa.array([f"body {i % 7}" for i in range(40)]),
            "extra": pa.array([i * 2 for i in range(40)]),
        })
        ds = ray.data.from_arrow(t).repartition(5)
        a = exact_dedup(ds, strategy="shuffle").to_pandas()
        b = exact_dedup(ds, strategy="broadcast").to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id) == list(range(7))
        assert set(a.columns) == {"doc_id", "text", "extra"}


class TestProgressiveJpeg:
    """Progressive JPEG (SOF2, T.81 Annex G): spectral selection +
    successive approximation. Progressive and baseline encode the SAME
    quantized coefficients, so the decoded pixels must match the baseline
    decode EXACTLY — a coefficient-level identity, not a perceptual
    check."""

    @staticmethod
    def _cases():
        rng = np.random.default_rng(0)
        return {
            "noise_rgb": rng.integers(0, 256, (24, 33, 3), dtype=np.uint8),
            "gradient": np.linspace(0, 255, 48 * 64 * 3)
            .reshape(48, 64, 3).astype(np.uint8),
            "gray": rng.integers(0, 256, (17, 19), dtype=np.uint8),
            "flat": np.full((40, 40, 3), 130, np.uint8),
        }

    def test_progressive_equals_baseline_decode(self):
        from poseidon_ray.functions.jpegcodec import (decode_jpeg, encode_jpeg,
                                                      encode_jpeg_progressive)

        for q in (50, 90):
            for name, img in self._cases().items():
                base = decode_jpeg(encode_jpeg(img, quality=q))
                blob = encode_jpeg_progressive(img, quality=q)
                assert b"\xff\xc2" in blob[:200]      # really SOF2
                prog = decode_jpeg(blob)
                np.testing.assert_array_equal(prog, base, err_msg=f"{name}/{q}")

    def test_eobrun_spans_blocks(self):
        # mostly-flat image: high-frequency bands are all-zero across many
        # blocks, so the first AC scans must emit EOBRUN > 1 symbols
        from poseidon_ray.functions.jpegcodec import (decode_jpeg,
                                                      encode_jpeg_progressive)

        img = np.full((64, 64), 100, np.uint8)
        img[0, 0] = 120                               # one busy block
        out = decode_jpeg(encode_jpeg_progressive(img, quality=90))
        assert out.shape == (64, 64, 1)

    def test_420_subsampled_matches_numpy_reference(self):
        """4:2:0 fixtures exercise the decoder's interleaved multi-block
        MCU walk + chroma upsample, checked against an independently
        coded numpy model of the same transform (not the encoder)."""
        from poseidon_ray.functions import jpegcodec as J

        rng = np.random.default_rng(2)
        for shape in [(24, 33, 3), (31, 47, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            h, w, _ = shape
            got = J.decode_jpeg(J.encode_jpeg(img, quality=75,
                                              subsampling="420"))
            qlum, qchrom = J._quality_tables(75)
            f = img.astype(np.float64)
            r, g, b = f[..., 0], f[..., 1], f[..., 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            he, we = -(-h // 2) * 2, -(-w // 2) * 2

            def ds(p):
                pe = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
                return pe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))

            mcux, mcuy = -(-w // 16), -(-h // 16)

            def codec(plane, q, gh, gw):
                padded = np.pad(
                    plane - 128.0,
                    ((0, gh * 8 - plane.shape[0]),
                     (0, gw * 8 - plane.shape[1])), mode="edge")
                out = np.zeros((gh * 8, gw * 8))
                for by in range(gh):
                    for bx in range(gw):
                        blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                        out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                            J._idct2(np.rint(J._dct2(blk) / q) * q) + 128.0
                return out

            yq = codec(y, qlum, 2 * mcuy, 2 * mcux)
            cbq = codec(ds(cb), qchrom, mcuy, mcux)
            crq = codec(ds(cr), qchrom, mcuy, mcux)
            yi = np.arange(2 * mcuy * 8) // 2
            xi = np.arange(2 * mcux * 8) // 2
            yc = yq[:h, :w]
            cbc = cbq[yi][:, xi][:h, :w] - 128.0
            crc = crq[yi][:, xi][:h, :w] - 128.0
            want = np.clip(np.rint(np.stack(
                [yc + 1.402 * crc,
                 yc - 0.344136 * cbc - 0.714136 * crc,
                 yc + 1.772 * cbc], axis=-1)), 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, want)

    def test_restart_markers_roundtrip(self):
        """DRI/RSTn streams (byte-aligned boundaries, DC predictor
        resets) must decode identically to the plain stream of the same
        coefficients — the error-resilience feature real web JPEGs carry."""
        from poseidon_ray.functions.jpegcodec import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            plain = decode_jpeg(encode_jpeg(img, quality=80,
                                            subsampling=sub))
            for ri in (1, 2, 5):
                blob = encode_jpeg(img, quality=80, subsampling=sub,
                                   restart_interval=ri)
                assert b"\xff\xdd" in blob
                np.testing.assert_array_equal(decode_jpeg(blob), plain)

    def test_truncated_progressive_raises(self):
        from poseidon_ray.functions.jpegcodec import (decode_jpeg,
                                                      encode_jpeg_progressive)

        blob = encode_jpeg_progressive(
            np.random.default_rng(1).integers(0, 256, (32, 32, 3),
                                              dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_jpeg(blob[:len(blob) // 2] + b"\xff\xd9")


class TestBloomFilter:
    def test_no_false_negatives_and_fp_bound(self, ray_session):
        import ray.data

        from poseidon_ray.stages import sketch

        keys = [f"url-{i}" for i in range(3000)]
        ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})) \
            .repartition(5)
        bloom = sketch.build_bloom(ds, "k", n_keys_hint=3000, num_shards=8)
        ann = sketch.bloom_annotate(ds, bloom, "k").to_pandas()
        assert ann["maybe_seen"].all()                 # Bloom guarantee
        fresh = ray.data.from_arrow(pa.table({
            "k": pa.array([f"other-{i}" for i in range(3000)])}))
        fp = sketch.bloom_annotate(fresh, bloom, "k").to_pandas()
        assert fp["maybe_seen"].mean() < 0.03          # ~0.8% theoretical
        dropped = sketch.bloom_annotate(fresh, bloom, "k",
                                        mode="drop_members").to_pandas()
        assert len(dropped) >= 3000 * 0.97


class TestAdam7Png:
    def test_interlaced_roundtrip_all_shapes(self):
        from poseidon_ray.stages.multimodal import decode_png, encode_png

        rng = np.random.default_rng(0)
        # tiny shapes leave several Adam7 passes empty — the spec says
        # empty passes contribute NO bytes at all
        for shape in [(1, 1, 1), (3, 2, 3), (7, 9, 1), (16, 16, 3),
                      (33, 47, 4), (8, 1, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            got = decode_png(encode_png(img, interlace=True))
            np.testing.assert_array_equal(got, img, err_msg=str(shape))
            # and pixel-identical to the non-interlaced stream
            np.testing.assert_array_equal(
                got, decode_png(encode_png(img)))


class TestCCPointerJumping:
    def test_long_chain_converges(self, ray_session):
        """A 64-link revision chain has diameter 64 — plain min-label
        propagation needs 64 rounds (> the 50-round backstop and the old
        RuntimeError); pointer jumping must close it in O(log n)."""
        import ray.data

        from poseidon_ray.stages.dedup import connected_components

        n = 65
        t = pa.table({
            "doc_a": pa.array(range(n - 1), type=pa.int64()),
            "doc_b": pa.array(range(1, n), type=pa.int64()),
        })
        out = connected_components(
            ray.data.from_arrow(t).repartition(4)).to_pandas()
        assert len(out) == n
        assert (out["cluster_rep"] == 0).all()

    def test_multi_component_unchanged(self, ray_session):
        import ray.data

        from poseidon_ray.stages.dedup import connected_components

        t = pa.table({
            "doc_a": pa.array([1, 2, 10, 11, 20], type=pa.int64()),
            "doc_b": pa.array([2, 3, 11, 12, 21], type=pa.int64()),
        })
        out = connected_components(ray.data.from_arrow(t)).to_pandas() \
            .set_index("node")["cluster_rep"].to_dict()
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                       20: 20, 21: 20}


class TestIncrementalMinhash:
    """dedup.minhash_index_add — persisted band-row generations; the
    union of every run's pairs must equal one full run over the grown
    corpus (the reference's middle/ re-ingest contract)."""

    @staticmethod
    def _mk(ids, texts):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts),
        })).repartition(3)

    @staticmethod
    def _texts(rng, n, base):
        words = [f"w{j}" for j in range(30)]
        out = []
        for i in range(n):
            k = rng.integers(8, 16)
            out.append(" ".join(rng.choice(words, size=k)))
        # salt in exact dup clusters spanning the id range
        for i in range(0, n, 7):
            out[i] = "alpha beta gamma delta epsilon zeta"
        return out

    def test_union_of_runs_equals_full_run(self, ray_session, tmp_path):
        from poseidon_ray.stages import dedup

        rng = np.random.default_rng(9)
        t1 = self._texts(rng, 40, 0)
        t2 = self._texts(rng, 30, 1)
        params = dict(num_perm=64, bands=16, shingle_k=1,
                      min_jaccard=0.5, max_bucket=None)
        full = dedup.minhash_candidate_pairs(
            self._mk(list(range(70)), t1 + t2), **params).to_pandas()
        state = str(tmp_path / "mh_state")
        p1 = dedup.minhash_index_add(
            self._mk(list(range(40)), t1), state, **params).to_pandas()
        p2 = dedup.minhash_index_add(
            self._mk(list(range(40, 70)), t2), state, **params).to_pandas()
        def key(df):
            return {(int(a), int(b), round(float(e), 9))
                    for a, b, e in zip(df.doc_a, df.doc_b, df.est_jaccard)}
        got = key(p1) | key(p2)
        want = key(full)
        assert got == want, (got ^ want)
        # run 2 must only emit pairs touching the new shard
        assert all(a >= 40 or b >= 40 for a, b in zip(p2.doc_a, p2.doc_b))

    def test_param_mismatch_refused(self, ray_session, tmp_path):
        from poseidon_ray.stages import dedup

        state = str(tmp_path / "mh_state2")
        ds = self._mk([0, 1], ["a b c", "a b c"])
        dedup.minhash_index_add(ds, state, num_perm=64, bands=16,
                                shingle_k=1)
        with pytest.raises(ValueError, match="refusing to mix"):
            dedup.minhash_index_add(ds, state, num_perm=128, bands=16,
                                    shingle_k=1)


class TestDistributedPvUv:
    def test_matches_pandas_and_layout_invariant(self, ray_session):
        import pandas as pd
        import ray.data

        from poseidon_ray.stages.events import pv_uv

        rng = np.random.default_rng(5)
        t = pa.table({
            "event_type": pa.array([f"t{i % 4}" for i in
                                    rng.integers(0, 4, 3000)]),
            "user_id": pa.array(rng.integers(0, 200, 3000), type=pa.int64()),
        })
        df = t.to_pandas()
        want = df.groupby("event_type").agg(
            pv=("user_id", "size"), uv=("user_id", "nunique")).reset_index()
        for parts in (2, 13):
            got = pv_uv(ray.data.from_arrow(t).repartition(parts)).to_pandas()
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), want, check_dtype=False)


class TestTDigest:
    """stages/sketch t-digest: lossless exact regime, bounded approximate
    regime, layout invariance of the exact regime."""

    def test_exact_regime_is_order_statistic(self, ray_session):
        import ray.data

        from poseidon_ray.stages import sketch

        rng = np.random.default_rng(2)
        vals = rng.integers(0, 300, 4000).astype(np.int64)
        t = pa.table({"x": pa.array(vals)})
        ds = ray.data.from_arrow(t).repartition(7)
        m, w = sketch.tdigest_centroids(ds, "x", compression=10_000)
        assert int(w.sum()) == 4000
        s = np.sort(vals)
        for pct in (1, 10, 50, 90, 99):
            r = (pct * 4000 + 99) // 100
            got = sketch.quantile_at_rank(m, w, [r])[0]
            assert got == s[r - 1], (pct, got, s[r - 1])

    def test_exact_regime_layout_invariant(self, ray_session):
        import ray.data

        from poseidon_ray.stages import sketch

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 50, 1000).astype(np.int64)
        t = pa.table({"x": pa.array(vals)})
        a = sketch.tdigest_centroids(ray.data.from_arrow(t).repartition(3),
                                     "x", compression=1000)
        b = sketch.tdigest_centroids(ray.data.from_arrow(t).repartition(11),
                                     "x", compression=1000)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_approx_regime_rank_bound(self, ray_session):
        import ray.data

        from poseidon_ray.stages import sketch

        rng = np.random.default_rng(4)
        vals = np.concatenate([rng.standard_normal(5000) * 10,
                               rng.standard_normal(5000) * 100 + 500])
        t = pa.table({"x": pa.array(vals)})
        comp = 64
        m, w = sketch.tdigest_centroids(
            ray.data.from_arrow(t).repartition(9), "x", compression=comp)
        assert len(m) <= comp and int(w.sum()) == 10_000
        s = np.sort(vals)
        n = len(s)
        eps = (6 * n) // comp
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            r = int(np.ceil(q * n))
            v = sketch.quantile_at_rank(m, w, [r])[0]
            lo = np.searchsorted(s, v, side="left")
            hi = np.searchsorted(s, v, side="right")
            assert lo - eps <= r <= hi + eps, (q, r, lo, hi)

    def test_quantile_queries_green(self, ray_session):
        import duckdb

        from poseidon_ray.pipelines.ops import (ORACLE_SQL, q_quantile_invariants,
                                                q_quantiles)

        got = q_quantiles(SF_DIR)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM parquet_scan("
                    f"'{SF_DIR}/documents.parquet')")
        want = con.execute(ORACLE_SQL["quantiles"]).fetch_arrow_table()
        assert got.to_pydict() == want.to_pydict()
        assert q_quantile_invariants(SF_DIR).num_rows == 0


class TestIVFSkewGuard:
    """r3 VERDICT 'Next round' #8: a 90%-one-cluster skew must split into
    bounded files, with probed-read semantics (and full-probe == brute
    force) unchanged."""

    @pytest.fixture()
    def skewed(self, ray_session, tmp_path):
        import ray.data

        rng = np.random.default_rng(3)
        hot = rng.standard_normal(16) * 3
        cold = -hot
        vecs = [hot + rng.standard_normal(16) * 0.05 if i % 10 else
                cold + rng.standard_normal(16) * 0.05 for i in range(1000)]
        t = pa.table({
            "vec_id": pa.array(range(1000), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float64())),
        })
        return ray.data.from_arrow(t), np.stack(vecs), str(tmp_path / "ivf")

    def test_hot_list_splits_and_results_unchanged(self, skewed):
        import pyarrow.parquet as pq

        from poseidon_ray.stages import ann

        ds, vecs, out = skewed
        man = ann.build_ivf(ds, out, n_clusters=2, seed=1,
                            max_rows_per_file=200)
        assert sum(e["rows"] for e in man["lists"].values()) == 1000
        max_file = max(pq.read_metadata(p).num_rows
                       for e in man["lists"].values() for p in e["paths"])
        assert max_file <= 200
        # every oversized list splits into exactly ceil(rows/cap) files
        for e in man["lists"].values():
            assert len(e["paths"]) == -(-e["rows"] // 200)
        assert max(len(e["paths"]) for e in man["lists"].values()) >= 2
        q, qids = vecs[:3], np.arange(3)
        full = ann.ivf_search(out, q, qids, k=5, n_probe=2).to_pandas()
        brute = ann.brute_force_topk(ds, q, qids, k=5).to_pandas()
        import pandas as pd

        pd.testing.assert_frame_equal(full, brute)

    def test_fingerprint_invalidates_stale_manifest(self, skewed):
        import ray.data

        from poseidon_ray.stages import ann

        ds, vecs, out = skewed
        m1 = ann.build_ivf(ds, out, n_clusters=2, seed=1)
        # same row count, same first row, different ids -> must rebuild
        t = pa.table({
            "vec_id": pa.array([0] + [i + 5000 for i in range(1, 1000)],
                               type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float64())),
        })
        mutated = ray.data.from_arrow(t)
        m2 = ann.build_ivf(mutated, out, n_clusters=2, seed=1)
        assert m2["id_fp"] != m1["id_fp"]
        # and an identical dataset is a no-op fast path
        m3 = ann.build_ivf(mutated, out, n_clusters=2, seed=1)
        assert m3 == m2
