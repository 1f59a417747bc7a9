"""End-to-end conformance: Ray build + query vs the brute-force oracle.

Covers the three reference-test areas named in BASELINE.json.north_star:
tokenization (via shared kernels + tests/test_tokenize.py), posting
compression round-trip (segments -> decode == oracle postings), and BM25
top-k rank identity (docIDs AND float64 scores) — plus the per-row sha256
invariant and pv/count parity.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from poseidon_ray import reference_impl as ref
from poseidon_ray.pipelines.build import build_index
from poseidon_ray.pipelines.query import Searcher
from poseidon_ray.schema import IndexSpec
from poseidon_ray.sources.fixtures import reference_queries
from poseidon_ray.stages.docids import fetch_docs


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    spec = IndexSpec(num_partitions=8,
                     static_hot_terms=("return", "import", "if"))
    manifest = build_index(tiny_corpus_path, out, spec)
    table = pq.read_table(tiny_corpus_path)
    oracle = ref.build_brute_force(table, spec)
    return out, spec, manifest, oracle, table


def test_num_docs(built):
    out, spec, manifest, oracle, table = built
    assert manifest["num_docs"] == table.num_rows == oracle.num_docs


def test_sha256_invariant(built):
    out, spec, manifest, oracle, table = built
    import json
    import os

    with open(os.path.join(out, "docstore.json")) as f:
        dman = json.load(f)
    docs = fetch_docs(out, dman, list(range(table.num_rows)),
                      columns=["doc_id", "sha256"])
    got = dict(zip(docs["doc_id"].to_pylist(), docs["sha256"].to_pylist()))
    assert got == oracle.sha256


def test_term_stats_parity(built):
    out, spec, manifest, oracle, table = built
    s = Searcher(out)
    for field, term in [("content", "return"), ("content", "import"),
                        ("content", "error"), ("content", "parse_line"),
                        ("lang", "go"), ("path", "core"),
                        ("content", "zzznotfoundzzz")]:
        tp = oracle.postings.get(field, {}).get(term, {})
        df, cf = s.term_stats(field, term)
        assert df == len(tp), (field, term)
        assert cf == sum(tp.values()), (field, term)


def test_postings_roundtrip_vs_oracle(built):
    out, spec, manifest, oracle, table = built
    s = Searcher(out)
    for term in ["return", "error", "parse_line", "if"]:
        tp = oracle.postings["content"].get(term, {})
        ids, tfs, dls = s.postings("content", term)
        assert list(ids) == sorted(tp)
        assert {int(d): int(t) for d, t in zip(ids, tfs)} == tp
        # doc_len carried per posting matches the oracle's doc_len map
        for d, dl in zip(ids, dls):
            assert int(dl) == oracle.doc_lens["content"][int(d)]


@pytest.mark.parametrize("k", [10, 100])
def test_rank_identity(built, k):
    out, spec, manifest, oracle, table = built
    s = Searcher(out)
    for q in reference_queries():
        expected = ref.score_query(oracle, q["text"], q["field"], q["mode"],
                                   k=k, spec=spec)
        got = s.search(q["text"], field=q["field"], mode=q["mode"], k=k)
        assert got == expected, f"{q['name']} k={k}\n{got[:5]}\nvs\n{expected[:5]}"


def test_wand_equals_exhaustive(built):
    out, spec, manifest, oracle, table = built
    s = Searcher(out)
    for q in reference_queries():
        if q["mode"] != "or":
            continue
        for k in (1, 3, 10, 50):
            ex = s.search(q["text"], field=q["field"], mode="or", k=k)
            wd = s.search(q["text"], field=q["field"], mode="or", k=k,
                          algorithm="wand")
            assert wd == ex, f"{q['name']} k={k}"


def test_count_parity(built):
    out, spec, manifest, oracle, table = built
    s = Searcher(out)
    for q in reference_queries():
        hits = ref.score_query(oracle, q["text"], q["field"], q["mode"],
                               k=10**9, spec=spec)
        assert s.count(q["text"], field=q["field"], mode=q["mode"]) == len(hits), q["name"]


def test_content_fetch(built):
    out, spec, manifest, oracle, table = built
    import json
    import os

    s = Searcher(out)
    hits = s.search("return error", field="content", mode="and", k=5)
    assert hits
    with open(os.path.join(out, "docstore.json")) as f:
        dman = json.load(f)
    docs = fetch_docs(out, dman, [d for d, _ in hits])
    assert docs.num_rows == len({d for d, _ in hits})
    for row in docs.to_pylist():
        assert "return" in row["content"].lower()
        assert "error" in row["content"].lower()
