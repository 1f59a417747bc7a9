"""Unit tests for the training-data stages: dedup (exact/minhash/simhash/
embedding), ANN (brute force + IVF), text stats, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from poseidon_ray.functions import minhash as mh
from poseidon_ray.functions import textstats


# ------------------------------------------------------------- pure kernels

class TestTextStats:
    def test_token_count(self):
        out = textstats.token_count(pa.array(["a b  c", "", "  ", "one"]))
        assert out.to_pylist() == [3, 0, 0, 1]

    def test_char_classes(self):
        c = textstats.char_class_counts(pa.array(["ab, 12!"]))
        assert c["n_chars"][0].as_py() == 7
        assert c["n_punct"][0].as_py() == 2   # ',' and '!'
        assert c["n_digits"][0].as_py() == 2
        assert c["n_spaces"][0].as_py() == 1

    def test_langid(self):
        out = textstats.detect_language(pa.array([
            "the cat is in the house and it was fine",
            "der hund ist nicht mit der katze und",
            "xyz qqq zzz",
        ]))
        assert out.to_pylist() == ["en", "de", "und"]

    def test_simhash_similar_texts_close(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a + " extra token"
        c = "completely different words entirely unrelated content here"
        sh = textstats.simhash64(pa.array([a, b, c])).to_numpy(zero_copy_only=False)
        d_ab = textstats.hamming_distance(sh[0:1], sh[1:2])[0]
        d_ac = textstats.hamming_distance(sh[0:1], sh[2:3])[0]
        assert d_ab < d_ac

    def test_fingerprint_deterministic(self):
        a = textstats.rolling_fingerprint(pa.array(["hello world text"]))
        b = textstats.rolling_fingerprint(pa.array(["hello world text"]))
        assert a.to_pylist() == b.to_pylist()

    def test_quality_scores(self):
        q = textstats.quality_scores(pa.array(["the cat!! 99", ""]))
        assert 0 < q["punct_ratio"][0] < 1
        assert q["stopword_ratio"][0] > 0
        assert q["punct_ratio"][1] == 0


class TestMinHash:
    def test_identical_docs_identical_sig(self):
        s1 = mh.minhash_signature(["a b c", "b c d"], 64)
        s2 = mh.minhash_signature(["a b c", "b c d"], 64)
        np.testing.assert_array_equal(s1, s2)

    def test_jaccard_estimate_tracks_truth(self):
        rng = np.random.default_rng(0)
        base = [f"tok{i}" for i in range(200)]
        a = set(base)
        b = set(base[:150]) | {f"other{i}" for i in range(50)}
        true_j = mh.exact_jaccard(a, b)
        est = mh.estimate_jaccard(
            mh.minhash_signature(sorted(a), 256), mh.minhash_signature(sorted(b), 256))
        assert abs(est - true_j) < 0.1

    def test_band_hashes_equal_for_equal_bands(self):
        sig = np.arange(128, dtype=np.uint64)
        b1 = mh.band_hashes(sig, 32)
        b2 = mh.band_hashes(sig.copy(), 32)
        np.testing.assert_array_equal(b1, b2)

    def test_shingles(self):
        assert mh.shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert mh.shingles(["a", "b"], 3) == ["a", "b"]


# ------------------------------------------------------------- Ray stages

@pytest.fixture(scope="module")
def dup_docs(ray_session):
    """Docs with planted exact + near duplicates."""
    import ray.data

    base = ("spark streaming query plan optimizer rule column pruning "
            "predicate pushdown shuffle partition " * 3)
    rows = []
    for i in range(40):
        # wNxM stays ONE token under the simple tokenizer (no separators),
        # so filler vocabulary is disjoint across docs
        rows.append({"doc_id": i, "text": f"unique document number alpha beta "
                     + " ".join(f"w{i}x{j}" for j in range(30))})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})                    # exact dup
    rows.append({"doc_id": 102, "text": base + " tail variation"})  # near dup
    return ray.data.from_items(rows)


def test_exact_dedup(dup_docs):
    from poseidon_ray.stages.dedup import exact_dedup, exact_dedup_groups

    groups = exact_dedup_groups(dup_docs).to_pandas()
    dup_row = groups[groups.n_copies > 1]
    assert len(dup_row) == 1
    assert dup_row.iloc[0].keep_id == 100
    assert dup_row.iloc[0].n_copies == 2
    kept = exact_dedup(dup_docs).to_pandas()
    assert len(kept) == 42  # 43 rows - 1 exact dup
    assert 101 not in set(kept.doc_id)


def test_minhash_finds_near_dups(dup_docs):
    from poseidon_ray.stages.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(dup_docs, min_jaccard=0.5).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (100, 101) in found          # exact dup is trivially a candidate
    assert (100, 102) in found or (101, 102) in found  # near dup caught
    # unrelated docs must not appear
    assert all(a >= 100 and b >= 100 for a, b in found)


def test_simhash_finds_near_dups(dup_docs):
    from poseidon_ray.stages.dedup import simhash_pairs

    pairs = simhash_pairs(dup_docs, max_hamming=3).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (100, 101) in found
    assert all(a >= 100 and b >= 100 for a, b in found)


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[50] = vecs[10] * 2.0          # same direction as 10 => cosine 1
    vecs[51] = vecs[10] + rng.standard_normal(16).astype(np.float32) * 0.01
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    return ray.data.from_items(rows), vecs


def test_embedding_neardup(vec_ds):
    from poseidon_ray.stages.dedup import embedding_neardup_pairs

    ds, _ = vec_ds
    pairs = embedding_neardup_pairs(ds, dim=16, min_cosine=0.95).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.vec_a, pairs.vec_b)}
    assert (10, 50) in found


def test_brute_force_ann_matches_numpy(vec_ds):
    from poseidon_ray.stages.ann import brute_force_topk

    ds, vecs = vec_ds
    v = vecs.astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    queries = v[:3]
    got = brute_force_topk(ds, queries, np.arange(3), k=5).to_pandas()
    for qi in range(3):
        scores = unit[qi] @ unit.T
        expect = np.lexsort((np.arange(60), -scores))[:5]
        mine = got[got.query_id == qi].sort_values("rank").vec_id.to_numpy()
        np.testing.assert_array_equal(mine, expect)


def test_ivf_ann_high_recall(vec_ds):
    from poseidon_ray.stages.ann import brute_force_topk, ivf_topk

    ds, vecs = vec_ds
    queries = vecs[:3].astype(np.float64)
    exact = brute_force_topk(ds, queries, np.arange(3), k=5).to_pandas()
    approx = ivf_topk(ds, queries, np.arange(3), k=5, n_clusters=4,
                      n_probe=2).to_pandas()
    recall = len(set(map(tuple, approx[["query_id", "vec_id"]].values)) &
                 set(map(tuple, exact[["query_id", "vec_id"]].values))) / len(exact)
    assert recall >= 0.6


def test_multimodal_pipeline(ray_session):
    import ray.data

    from poseidon_ray.stages.multimodal import (DecodeMedia, media_pipeline,
                                                synthesize_media)

    media = synthesize_media(30)
    ds = ray.data.from_arrow(media)
    out = media_pipeline(ds, target=64, feature_dim=16,
                         concurrency=(1, 2), batch_size=8).to_pandas()
    assert len(out) == 30
    assert all(len(e) == 16 for e in out.embedding)
    # features are normalized histograms
    assert all(abs(sum(e) - 1.0) < 1e-5 for e in out.embedding)
    # the real-decode path is an explicit stub
    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)(media)


def test_decode_deterministic(ray_session):
    from poseidon_ray.stages.multimodal import DecodeMedia, synthesize_media

    m = synthesize_media(5)
    a = DecodeMedia()(m).to_pydict()
    b = DecodeMedia()(m).to_pydict()
    assert a == b
