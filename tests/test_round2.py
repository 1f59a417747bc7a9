"""Round-2 features: pagination, stale-partition purge, generation compat,
star-edge capped buckets, exact pair verification, exact cosine pairs,
shuffle-strategy exact dedup, multi-generation fetch, CJK queries."""

import numpy as np
import pyarrow as pa
import pytest

from poseidon_ray.pipelines.build import build_index, extend_index
from poseidon_ray.pipelines.query import Searcher
from poseidon_ray.schema import IndexSpec


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus_path, tmp_path_factory):
    out = tmp_path_factory.mktemp("idx_r2")
    spec = IndexSpec(num_partitions=8)
    build_index(tiny_corpus_path, str(out), spec)
    return str(out), spec


# ------------------------------------------------------------- pagination

def test_offset_pages_the_ranked_list(built):
    idx, _ = built
    s = Searcher(idx)
    for mode, algo in [("or", "exhaustive"), ("or", "wand"), ("and", "exhaustive")]:
        full = s.search("return error value", mode=mode, k=10_000,
                        algorithm=algo)
        assert len(full) < 10_000  # complete ranking, not clipped
        for off in (0, 3, 10, len(full) - 2, len(full) + 5):
            page = s.search("return error value", mode=mode, k=5,
                            algorithm=algo, offset=off)
            assert page == full[off:off + 5]


# ------------------------------------------------- stale-partition purge

def test_rebuild_with_fewer_partitions_purges_stale(ray_session,
                                                    tiny_corpus_path,
                                                    tmp_path_factory):
    out = tmp_path_factory.mktemp("idx_shrink")
    build_index(tiny_corpus_path, str(out), IndexSpec(num_partitions=8))
    wide = Searcher(str(out))
    stats_wide = wide.term_stats("content", "return")
    # rebuild IN PLACE with a narrower layout — stale partitions 4..7 must
    # not leak into the directory or the manifest stats
    build_index(tiny_corpus_path, str(out), IndexSpec(num_partitions=4))
    narrow = Searcher(str(out))
    assert narrow.term_stats("content", "return") == stats_wide
    import os
    names = os.listdir(os.path.join(str(out), "directory"))
    assert len([n for n in names if n.endswith(".parquet")]) == 4


# ------------------------------------------------- generation compat

def test_incompatible_generation_refused(ray_session, tiny_corpus_path,
                                         tmp_path_factory):
    out = tmp_path_factory.mktemp("idx_gen")
    spec = IndexSpec(num_partitions=4)
    build_index(tiny_corpus_path, str(out), spec)
    bad = IndexSpec(num_partitions=4, block_size=64)
    with pytest.raises(ValueError, match="incompatible generations"):
        extend_index(str(out), tiny_corpus_path, bad)


# ------------------------------------------------- multi-generation fetch

def test_multigen_docstore_fetch(ray_session, tiny_corpus_path,
                                 tmp_path_factory):
    from poseidon_ray.sources.fixtures import write_corpus
    from poseidon_ray.stages.docids import fetch_docs, load_docstore_manifest

    out = tmp_path_factory.mktemp("idx_mg")
    spec = IndexSpec(num_partitions=4)
    build_index(tiny_corpus_path, str(out), spec)
    extra = tmp_path_factory.mktemp("mg_corpus") / "extra.parquet"
    write_corpus(str(extra), n_rows=50, seed=99)
    extend_index(str(out), str(extra), spec)
    man = load_docstore_manifest(str(out))
    assert man["num_docs"] == 250
    # ids spanning both generations resolve to rows
    docs = fetch_docs(str(out), man, [0, 199, 200, 249],
                      columns=["doc_id", "path"])
    assert sorted(docs["doc_id"].to_pylist()) == [0, 199, 200, 249]


# ------------------------------------------------- capped buckets / star edges

def test_star_edges_keep_giant_cluster_connected(ray_session):
    import ray.data

    from poseidon_ray.stages.dedup import minhash_candidate_pairs

    text = "identical content cluster alpha beta gamma delta " * 4
    rows = [{"doc_id": i, "text": text} for i in range(600)]
    rows += [{"doc_id": 1000 + i,
              "text": f"other doc qq{i}rr ss{i}tt uu{i}vv ww{i}xx yy{i}zz"}
             for i in range(20)]
    ds = ray.data.from_items(rows)
    pairs = minhash_candidate_pairs(ds, min_jaccard=0.9,
                                    max_bucket=64).to_pandas()
    # connectivity: every one of the 600 identical docs must be reachable;
    # with star edges that means >= 599 edges covering all members
    import collections
    parent = list(range(600))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_in_cluster = 0
    seen = set()
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        if a < 600 and b < 600:
            seen.update((a, b))
            parent[find(int(a))] = find(int(b))
    assert seen == set(range(600))
    roots = {find(i) for i in range(600)}
    assert len(roots) == 1, f"cluster split into {len(roots)} components"
    # capped mode must not emit duplicate pair rows
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()


# ------------------------------------------------- exact pair verification

def test_verify_pairs_exact_jaccard(ray_session):
    import ray.data

    from poseidon_ray.functions.tokenize import tokenize_simple
    from poseidon_ray.stages.dedup import verify_pairs_exact_jaccard

    texts = {
        0: "alpha beta gamma delta epsilon",
        1: "alpha beta gamma delta zeta",
        2: "alpha beta gamma delta epsilon",     # exact dup of 0
        3: "completely different words here now",
    }
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()])
    pairs = ray.data.from_items(
        [{"doc_a": 0, "doc_b": 1}, {"doc_a": 0, "doc_b": 2},
         {"doc_a": 0, "doc_b": 3}, {"doc_a": 1, "doc_b": 3}])
    got = verify_pairs_exact_jaccard(ds, pairs, num_shards=4).to_pandas()
    got = got.set_index(["doc_a", "doc_b"])

    def truth(a, b):
        sa = set(tokenize_simple(pa.array([texts[a]]))[0][0])
        sb = set(tokenize_simple(pa.array([texts[b]]))[0][0])
        return len(sa & sb), len(sa | sb)

    for (a, b) in [(0, 1), (0, 2), (0, 3), (1, 3)]:
        i, u = truth(a, b)
        row = got.loc[(a, b)]
        assert (row.n_inter, row.n_union) == (i, u), (a, b)


# ------------------------------------------------- exact cosine pairs

@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[50] = vecs[10] * 2.0
    vecs[51] = vecs[10] + rng.standard_normal(16).astype(np.float32) * 0.01
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    return ray.data.from_items(rows), vecs


def test_cosine_pairs_exact_matches_bruteforce(vec_ds):
    from poseidon_ray.stages.dedup import cosine_pairs_exact

    ds, vecs = vec_ds
    got = cosine_pairs_exact(ds, min_cosine=0.6, n_bands=4).to_pandas()
    v = vecs.astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = unit @ unit.T
    expect = {(a, b) for a in range(60) for b in range(a + 1, 60)
              if cos[a, b] >= 0.6}
    assert {(a, b) for a, b in zip(got.vec_a, got.vec_b)} == expect
    assert not got.duplicated(["vec_a", "vec_b"]).any()
    for a, b, c in zip(got.vec_a, got.vec_b, got.cosine):
        assert abs(c - cos[a, b]) < 1e-12


# ------------------------------------------------- exact dedup strategies

def test_exact_dedup_shuffle_equals_broadcast(ray_session):
    import ray.data

    from poseidon_ray.stages.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"doc {i % 7} body"} for i in range(50)]
    ds = ray.data.from_items(rows)
    a = sorted(exact_dedup(ds, strategy="shuffle").to_pandas().doc_id)
    b = sorted(exact_dedup(ds, strategy="broadcast").to_pandas().doc_id)
    assert a == b == list(range(7))


# ------------------------------------------------- CJK stance

def test_cjk_comment_searchable(ray_session, tmp_path_factory):
    """The reference runs the IK segmenter over CJK (TextFunction.java:
    40-61). This engine keeps contiguous CJK runs as single `code` tokens
    AND indexes char trigrams of the content — so exact-run queries hit via
    the code field and substring queries hit via the trigram field. That is
    the documented public-knowledge answer to CJK segmentation for a code
    corpus (ARCHITECTURE: trigram substring search)."""
    import pyarrow.parquet as pq

    rows = []
    for i in range(30):
        rows.append({
            "repo": "r", "path": f"f{i:03d}.py", "commit": f"c{i}",
            "lang": "python",
            "content": f"def fn_{i}(): pass  # plain body {i}",
        })
    rows[7]["content"] = "def handler():  # 处理用户请求 的函数\n    return 42"
    corpus = tmp_path_factory.mktemp("cjk") / "corpus.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(corpus))
    out = tmp_path_factory.mktemp("cjk_idx")
    build_index(str(corpus), str(out), IndexSpec(num_partitions=4))
    s = Searcher(str(out))
    # whole contiguous run = one code token
    run_hits = s.search("处理用户请求", field="content", mode="and", k=5)
    assert [d for d, _ in run_hits] == [7]
    # substring of the run only exists via the trigram field
    sub_hits = s.search("用户", field="content3", mode="and", k=5)
    assert [d for d, _ in sub_hits] == [7]


# ------------------------------------------------- real multimodal decode

class TestRealMediaDecode:
    def test_pnm_roundtrip(self):
        from poseidon_ray.stages.multimodal import decode_pnm

        px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
        payload = b"P6\n# comment\n7 5\n255\n" + px.tobytes()
        out = decode_pnm(payload)
        np.testing.assert_array_equal(out, px)

    def test_wav_roundtrip(self):
        import io
        import wave

        from poseidon_ray.stages.multimodal import decode_wav_pcm16

        samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(samples.tobytes())
        out = decode_wav_pcm16(buf.getvalue())
        np.testing.assert_array_equal(out.ravel(), samples)

    def test_real_pipeline_end_to_end(self, ray_session):
        import ray.data

        from poseidon_ray.stages.multimodal import (DecodeMedia,
                                                    media_pipeline,
                                                    synthesize_media)

        media = synthesize_media(18, real_formats=True)
        imgaud = media.filter(
            pa.compute.field("media_type") != "video")
        out = media_pipeline(ray.data.from_arrow(imgaud), target=16,
                             feature_dim=8, concurrency=(1, 2), batch_size=6,
                             fake=False).to_pandas()
        assert len(out) == imgaud.num_rows
        assert all(len(e) == 8 for e in out.embedding)
        assert all(abs(sum(e) - 1.0) < 1e-5 for e in out.embedding)
        # real decode verifies dims: a 16-target resize bounds image dims
        dec = DecodeMedia(fake=False)(imgaud)
        assert (dec["width"].to_numpy(zero_copy_only=False) > 0).all()
        # Y4M video decodes for real now (r3) — width from stream header
        video_only = media.filter(pa.compute.field("media_type") == "video")
        vdec = DecodeMedia(fake=False)(video_only)
        assert (vdec["width"].to_numpy(zero_copy_only=False) > 0).all()
        # genuinely-compressed formats still refuse loudly (MP4 box magic)
        opaque = pa.table({
            "media_id": pa.array([0], type=pa.int64()),
            "media_type": pa.array(["video"], type=pa.string()),
            "payload": pa.array(
                [b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64],
                type=pa.large_binary()),
            "meta": pa.array(["{}"], type=pa.string()),
        })
        with pytest.raises(NotImplementedError):
            DecodeMedia(fake=False)(opaque)
