"""Directory-sharded scatter-gather searcher: results must be bit-identical
to the local full-directory engine; plus compaction parity."""

import pytest

from poseidon_ray.pipelines.build import build_index, compact_index, extend_index
from poseidon_ray.pipelines.distributed import DistributedSearcher
from poseidon_ray.pipelines.query import Searcher
from poseidon_ray.schema import IndexSpec
from poseidon_ray.sources.fixtures import reference_queries

SPEC = IndexSpec(num_partitions=8, static_hot_terms=("return", "import", "if"))


@pytest.fixture(scope="module")
def idx(ray_session, tiny_corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist") / "idx")
    build_index(tiny_corpus_path, out, SPEC)
    return out


def test_distributed_matches_local(idx):
    local = Searcher(idx)
    dist = DistributedSearcher(idx, num_shards=3)
    assert dist.num_docs == local.num_docs
    for q in reference_queries():
        for algo in (["exhaustive", "wand"] if q["mode"] == "or" else ["exhaustive"]):
            got = dist.search(q["text"], field=q["field"], mode=q["mode"],
                              k=25, algorithm=algo)
            want = local.search(q["text"], field=q["field"], mode=q["mode"],
                                k=25, algorithm=algo)
            assert got == want, (q["name"], algo)


def test_distributed_stats_and_count(idx):
    local = Searcher(idx)
    dist = DistributedSearcher(idx, num_shards=2)
    for term in ["return", "error", "zzznotfound"]:
        assert dist.term_stats("content", term) == local.term_stats("content", term)
    assert dist.count("return error", mode="and") == local.count(
        "return error", mode="and")


def test_distributed_over_generations(ray_session, tiny_corpus_path,
                                      small_corpus_path, tmp_path):
    inc = str(tmp_path / "inc")
    build_index(tiny_corpus_path, inc, SPEC)
    extend_index(inc, small_corpus_path, SPEC)
    local = Searcher(inc)
    dist = DistributedSearcher(inc, num_shards=2)
    assert dist.search("return error", mode="and", k=50) == \
        local.search("return error", mode="and", k=50)


def test_compaction_parity(ray_session, tiny_corpus_path, small_corpus_path,
                           tmp_path):
    inc = str(tmp_path / "inc2")
    build_index(tiny_corpus_path, inc, SPEC)
    extend_index(inc, small_corpus_path, SPEC)
    out = str(tmp_path / "compact")
    manifest = compact_index(inc, out, SPEC)
    s_inc, s_cmp = Searcher(inc), Searcher(out)
    assert s_cmp.num_docs == s_inc.num_docs == manifest["num_docs"]
    for term in ["return", "error", "lucene"]:
        assert s_cmp.term_stats("content", term) == s_inc.term_stats("content", term)
    # scores match by content identity (docIDs are re-assigned)
    import json
    import os

    import pyarrow.parquet as pq

    def shas(d, hits):
        from poseidon_ray.pipelines.build import list_generations

        m = {}
        for g in list_generations(d):
            with open(os.path.join(d, g, "docstore.json")) as f:
                for fi in json.load(f)["files"]:
                    t = pq.read_table(fi["path"], columns=["doc_id", "sha256"])
                    m.update(zip(t["doc_id"].to_pylist(), t["sha256"].to_pylist()))
        return sorted((m[doc], round(sc, 10)) for doc, sc in hits)

    hi = s_inc.search("timeout retry", k=10**6)
    hc = s_cmp.search("timeout retry", k=10**6)
    assert shas(inc, hi) == shas(out, hc)
