"""Determinism + checkpoint/resume guarantees (north rule):

- docIDs, directory stats and search results must be independent of input
  block structure / parallelism;
- a killed build resumes from per-partition manifests, rebuilding only
  missing partitions, with identical results;
- a config change invalidates checkpoints (lineage).
"""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest
import ray.data

from poseidon_ray.pipelines.build import build_index
from poseidon_ray.pipelines.query import Searcher
from poseidon_ray.schema import IndexSpec

SPEC = IndexSpec(num_partitions=6, static_hot_terms=("return", "if"))


def _fingerprint(index_dir: str) -> dict:
    s = Searcher(index_dir)
    stats = {f"{f}:{t}": (e["df"], e["cf"]) for (f, t), e in s._dir.items()}
    hits = {}
    for q in ["return error", "parse_line", "flushbuffer warning"]:
        hits[q] = s.search(q, k=20)
    return {"stats": stats, "hits": hits, "num_docs": s.num_docs}


def test_block_structure_invariance(ray_session, tiny_corpus_path, tmp_path):
    outs = []
    for i, blocks in enumerate([2, 11]):
        out = str(tmp_path / f"idx{i}")
        corpus = ray.data.read_parquet(tiny_corpus_path,
                                       override_num_blocks=blocks)
        build_index(corpus, out, SPEC)
        outs.append(_fingerprint(out))
    assert outs[0] == outs[1]


def test_docstore_sha_stable_across_runs(ray_session, tiny_corpus_path, tmp_path):
    shas = []
    for i in range(2):
        out = str(tmp_path / f"s{i}")
        build_index(tiny_corpus_path, out, SPEC)
        with open(os.path.join(out, "docstore.json")) as f:
            man = json.load(f)
        rows = {}
        for fi in man["files"]:
            t = pq.read_table(fi["path"], columns=["doc_id", "sha256"])
            rows.update(zip(t["doc_id"].to_pylist(), t["sha256"].to_pylist()))
        shas.append(rows)
    assert shas[0] == shas[1]


def test_resume_rebuilds_only_missing(ray_session, tiny_corpus_path, tmp_path):
    out = str(tmp_path / "r")
    build_index(tiny_corpus_path, out, SPEC)
    before = _fingerprint(out)
    manifests = sorted(os.listdir(os.path.join(out, "segments")))
    # simulate a crash that lost partition 2's outputs + the global manifest
    os.remove(os.path.join(out, "index.json"))
    os.remove(os.path.join(out, "segments", "manifest-00002.json"))
    os.remove(os.path.join(out, "segments", "segment-00002.parquet"))
    kept_mtime = os.path.getmtime(os.path.join(out, "segments",
                                               "segment-00000.parquet"))
    build_index(tiny_corpus_path, out, SPEC)
    # untouched partitions were NOT rewritten
    assert os.path.getmtime(os.path.join(out, "segments",
                                         "segment-00000.parquet")) == kept_mtime
    assert sorted(os.listdir(os.path.join(out, "segments"))) == manifests
    assert _fingerprint(out) == before


def test_config_change_invalidates(ray_session, tiny_corpus_path, tmp_path):
    out = str(tmp_path / "c")
    build_index(tiny_corpus_path, out, SPEC)
    mtime = os.path.getmtime(os.path.join(out, "segments", "segment-00000.parquet"))
    os.remove(os.path.join(out, "index.json"))
    spec2 = IndexSpec(num_partitions=6, static_hot_terms=("return",),
                      salt_factor=4)
    build_index(tiny_corpus_path, out, spec2)
    assert os.path.getmtime(os.path.join(out, "segments",
                                         "segment-00000.parquet")) != mtime


def test_partition_manifest_metrics(ray_session, tiny_corpus_path, tmp_path):
    out = str(tmp_path / "m")
    manifest = build_index(tiny_corpus_path, out, SPEC)
    assert manifest["num_docs"] == 200
    parts = manifest["partitions"]
    assert {p["partition"] for p in parts} == set(range(6))
    for p in parts:
        assert p["terms"] > 0 and p["bytes"] > 0 and "build_ms" in p
        assert p["config_hash"] == SPEC.config_hash()
    # avgdl identity: sum(cf) == sum over docs of doc_len per field
    f = manifest["fields"]["content"]
    assert f["avgdl"] == f["cf_total"] / manifest["num_docs"]
