"""The index-build pipeline — the analog of the reference's 3 chained MR jobs
(docmeta -> index -> indexmeta, builder/index/src/main/bin/start.sh; SURVEY
§3.2), as one Ray Data program:

    read_parquet(corpus)
      -> sort (repo, path, commit) + docID assignment + docstore write
      -> map_batches(TokenizeAndCombine, actor pool)       [map + combine]
      -> filter out checkpointed partitions                [resume]
      -> groupby(part).map_groups(build_segment_partition) [reduce]
      -> directory + per-partition manifests + global manifest

Never calls ray.init (driver contract).
"""

from __future__ import annotations

import json
import os
from functools import partial

import pyarrow as pa
import ray.data

from poseidon_ray.schema import CORPUS_SCHEMA, IndexSpec
from poseidon_ray.sources.fixtures import corpus_table  # noqa: F401 (re-export)
from poseidon_ray.stages.docids import build_docstore, read_docstore
from poseidon_ray.stages.tokenstage import TokenizeAndCombine
from poseidon_ray.state import segments as seg


def read_corpus(path: str) -> ray.data.Dataset:
    """Column-pruned corpus read (only the 5 schema columns leave storage)."""
    return ray.data.read_parquet(path, columns=CORPUS_SCHEMA.names)


def detect_hot_terms(ds_docstore: ray.data.Dataset, spec: IndexSpec,
                     sample_frac: float = 0.05, num_docs: int | None = None) -> set[str]:
    """Estimate which terms exceed the salting threshold from a seeded
    sample (the reference instead hard-truncates hot tokens,
    ReduceGroupData.java:104-157 — salting keeps them exact)."""
    sample = ds_docstore.random_sample(sample_frac, seed=42)
    hot: dict[str, int] = {}
    for batch in sample.map_batches(
        TokenizeAndCombine, fn_constructor_kwargs={"spec": spec},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
    ).iter_batches(batch_format="pyarrow"):
        terms = batch["term"].to_pylist()
        counts = batch["n"].to_numpy(zero_copy_only=False)
        for t, c in zip(terms, counts):
            hot[t] = hot.get(t, 0) + int(c)
    scale = 1.0 / max(sample_frac, 1e-9)
    return {t for t, c in hot.items() if c * scale >= spec.salt_threshold}


def build_index(
    corpus: str | ray.data.Dataset,
    out_dir: str,
    spec: IndexSpec | None = None,
    *,
    tokenize_concurrency: int | tuple[int, int] = (1, 8),
    tokenize_batch_size: int = 512,
    detect_hot: bool = False,
    hot_sample_frac: float = 0.05,
    docid_base: int = 0,
    stage_barrier: bool = True,
    blacklist_path: str | None = None,
) -> dict:
    """Build (or resume) the full index; returns the global manifest."""
    spec = spec or IndexSpec()
    os.makedirs(out_dir, exist_ok=True)

    # fast path: complete index with the same config
    idx_path = os.path.join(out_dir, "index.json")
    if os.path.exists(idx_path):
        manifest = seg.load_index_manifest(out_dir)
        if manifest.get("config_hash") == spec.config_hash():
            return manifest

    if isinstance(corpus, str):
        corpus = read_corpus(corpus)

    # stage 1-2: sorted docIDs + docstore (checkpointed by docstore.json);
    # a fresh build streams its blocks onward in-memory, a resume re-reads
    doc_manifest, ds = build_docstore(corpus, out_dir, docid_base=docid_base)
    if ds is None:
        ds = read_docstore(out_dir)

    # hot-term set: static + (optionally) sampled; persisted so RESUMED runs
    # salt identically (partition contents must be stable across runs)
    hot_path = os.path.join(out_dir, "hot_terms.json")
    if os.path.exists(hot_path):
        with open(hot_path) as f:
            hot = set(json.load(f))
    else:
        hot = set(spec.static_hot_terms)
        if detect_hot:
            hot |= detect_hot_terms(ds, spec, hot_sample_frac)
        with open(hot_path + ".tmp", "w") as f:
            json.dump(sorted(hot), f)
        os.replace(hot_path + ".tmp", hot_path)

    # stopword blacklist (the ST2 token_filter_files analog; file format
    # matches the reference fixtures: one token per line, unterminated last
    # line allowed). Loaded once here, shipped to each actor's __init__.
    blacklist: frozenset[str] = frozenset()
    if blacklist_path:
        with open(blacklist_path) as f:
            blacklist = frozenset(t.strip() for t in f.read().splitlines()
                                  if t.strip())

    # stage 3-4: tokenize + combine (actor pool), skip finished partitions
    chunks = ds.map_batches(
        TokenizeAndCombine,
        fn_constructor_kwargs={"spec": spec, "hot_terms": frozenset(hot),
                               "blacklist": blacklist},
        batch_format="pyarrow",
        batch_size=tokenize_batch_size,
        concurrency=tokenize_concurrency,
    )
    done = seg.completed_partitions(out_dir, spec)
    if done:
        done_arr = pa.array(sorted(done), type=pa.uint32())

        def _drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(t["part"], value_set=done_arr)))

        chunks = chunks.map_batches(_drop_done, batch_format="pyarrow")

    # materialize the (packed, small) chunk set before the shuffle: the MR
    # map-output barrier. Without it the streaming executor runs the actor
    # pool concurrently with the sort and they fight for CPUs (measured
    # 124s -> 72s at 32 cpus on the 480k-row corpus). Chunk data ≈ final
    # index size, so the object store (with spill) holds it comfortably.
    if stage_barrier:
        chunks = chunks.materialize()

    # stage 5-6: the wide step — term-hash shuffle + per-partition reduce
    summaries = chunks.groupby("part").map_groups(
        partial(seg.build_segment_partition, out_dir=out_dir, spec=spec),
        batch_format="pyarrow",
    )
    summaries.materialize()  # tiny: one row per partition

    return seg.write_index_manifest(out_dir, spec, doc_manifest["num_docs"])


# ---------------------------------------------------------------- incremental

def _generations_path(index_dir: str) -> str:
    return os.path.join(index_dir, "generations.json")


def list_generations(index_dir: str) -> list[str]:
    """Generation subdirs, oldest first. A plain single-build index is one
    generation rooted at '.'."""
    p = _generations_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)["generations"]
    return ["."]


def extend_index(index_dir: str, new_corpus: str | ray.data.Dataset,
                 spec: IndexSpec | None = None, **build_kwargs) -> dict:
    """Incremental ingest — the Ray-Data analog of the reference's
    middle-file merge + day partitioning (SURVEY §2.1 S9: reducer dumps
    ``middle/`` postings that the next day's build re-ingests; the proxy
    then unions per-day results, service/proxy/module/proxy.go:79-109).

    New documents become a NEW generation: a self-contained index built
    under ``index_dir/gen-NNNNN`` whose docIDs start after every existing
    generation (doc-disjoint by construction). No existing segment is
    rewritten — queries merge generations exactly like salted shards
    (df/cf summed, postings concatenated), which keeps BM25 stats global
    and exact. Compaction = rebuild from the union corpus when generations
    accumulate.
    """
    spec = spec or IndexSpec()
    gens = list_generations(index_dir)
    total = 0
    for g in gens:
        total += seg.load_index_manifest(os.path.join(index_dir, g))["num_docs"]
    gname = f"gen-{len(gens):05d}"
    build_index(new_corpus, os.path.join(index_dir, gname), spec,
                docid_base=total, **build_kwargs)
    gens = gens + [gname]
    p = _generations_path(index_dir)
    with open(p + ".tmp", "w") as f:
        json.dump({"generations": gens}, f)
    os.replace(p + ".tmp", p)
    return {"generations": gens, "num_docs_before": total}


def compact_index(index_dir: str, out_dir: str, spec: IndexSpec | None = None,
                  **build_kwargs) -> dict:
    """Rebuild N generations into one fresh index (the daily re-index
    analog). The union corpus is read from the generations' own docstores
    (column-pruned back to the corpus shape), so compaction never touches
    the original inputs; docIDs are re-assigned by the standard sort."""
    spec = spec or IndexSpec()
    gens = list_generations(index_dir)
    paths = []
    for g in gens:
        gdir = os.path.normpath(os.path.join(index_dir, g))
        with open(os.path.join(gdir, "docstore.json")) as f:
            paths.extend(fi["path"] for fi in json.load(f)["files"])
    corpus = ray.data.read_parquet(paths, columns=CORPUS_SCHEMA.names)
    return build_index(corpus, out_dir, spec, **build_kwargs)
