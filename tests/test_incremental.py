"""Incremental ingest (extend_index generations — the S9 middle-merge +
multi-day proxy-union analog): scores must equal a monolithic rebuild."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from poseidon_ray.pipelines.build import build_index, extend_index, list_generations
from poseidon_ray.pipelines.query import Searcher
from poseidon_ray.schema import IndexSpec
from poseidon_ray.sources.fixtures import corpus_table

SPEC = IndexSpec(num_partitions=4, static_hot_terms=("return",))


@pytest.fixture(scope="module")
def split_corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("inc")
    full = corpus_table(300, seed=11)
    a, b = full.slice(0, 200), full.slice(200)
    pq.write_table(a, str(d / "a.parquet"))
    pq.write_table(b, str(d / "b.parquet"))
    pq.write_table(full, str(d / "full.parquet"))
    return str(d)


def _by_sha(index_dir: str, hits):
    """Map (doc_id, score) -> (sha256, rounded score): generation-invariant
    identity for cross-index comparison."""
    import json
    import os

    import numpy as np

    from poseidon_ray.pipelines.build import list_generations
    from poseidon_ray.stages.docids import fetch_docs

    sha_of = {}
    for g in list_generations(index_dir):
        gdir = os.path.normpath(os.path.join(index_dir, g))
        with open(os.path.join(gdir, "docstore.json")) as f:
            man = json.load(f)
        for fi in man["files"]:
            t = pq.read_table(fi["path"], columns=["doc_id", "sha256"])
            sha_of.update(zip(t["doc_id"].to_pylist(), t["sha256"].to_pylist()))
    return sorted((sha_of[d], round(s, 10)) for d, s in hits)


def test_extend_matches_monolithic(ray_session, split_corpora, tmp_path):
    inc = str(tmp_path / "inc")
    mono = str(tmp_path / "mono")
    build_index(f"{split_corpora}/a.parquet", inc, SPEC)
    info = extend_index(inc, f"{split_corpora}/b.parquet", SPEC)
    assert info["num_docs_before"] == 200
    assert list_generations(inc) == [".", "gen-00001"]
    build_index(f"{split_corpora}/full.parquet", mono, SPEC)

    si, sm = Searcher(inc), Searcher(mono)
    assert si.num_docs == sm.num_docs == 300
    for field, term in [("content", "return"), ("content", "error"),
                        ("lang", "go")]:
        assert si.term_stats(field, term) == sm.term_stats(field, term)
    for q, mode in [("return error", "and"), ("lucene engine", "or"),
                    ("parse_line", "or"), ("timeout retry buffer", "or")]:
        hi = si.search(q, mode=mode, k=300)
        hm = sm.search(q, mode=mode, k=300)
        assert _by_sha(inc, hi) == _by_sha(mono, hm), q


def test_extend_twice(ray_session, split_corpora, tmp_path):
    inc = str(tmp_path / "inc2")
    build_index(f"{split_corpora}/a.parquet", inc, SPEC)
    extend_index(inc, f"{split_corpora}/b.parquet", SPEC)
    c = corpus_table(50, seed=99)
    p = str(tmp_path / "c.parquet")
    pq.write_table(c, p)
    info = extend_index(inc, p, SPEC)
    assert info["num_docs_before"] == 300
    s = Searcher(inc)
    assert s.num_docs == 350
    assert len(s.search("return", k=350)) > 0
