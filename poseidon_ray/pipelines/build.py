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

import numpy as np
import pyarrow as pa
import ray
import ray.data

from poseidon_ray.schema import CHUNK_SCHEMA, CORPUS_SCHEMA, IndexSpec
from poseidon_ray.sources.fixtures import corpus_table  # noqa: F401 (re-export)
from poseidon_ray.stages.docids import (_block_refs_and_counts, build_docstore,
                                        finalize_docstore, read_docstore)
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
    shuffle: str = "manual",
) -> dict:
    """Build (or resume) the full index; returns the global manifest.

    ``shuffle``: "manual" (default) = sort-free two-wave hash exchange via
    raw tasks (W partitioners x P reducers — see ``_manual_exchange``);
    "ray" = Dataset groupby(part) (sort-based, kept for comparison)."""
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
    # drop artifacts from a different spec / wider layout in this out_dir:
    # they would otherwise leak into the manifest stats and directory loads
    seg.purge_stale_partitions(out_dir, spec)
    done = seg.completed_partitions(out_dir, spec)
    if done:
        done_arr = pa.array(sorted(done), type=pa.uint32())

        def _drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(t["part"], value_set=done_arr)))

        chunks = chunks.map_batches(_drop_done, batch_format="pyarrow")

    # stage 5-6: the wide step — term-hash exchange + per-partition reduce
    if shuffle != "ray":
        chunks = chunks.materialize()
        # the sorted-corpus blocks are no longer needed once the chunk set
        # is materialized — drop the reference so plasma can evict them
        # before the exchange doubles the resident bytes
        del ds
        # docstore file writes ran in the background, overlapped with
        # tokenize; land the docstore.json checkpoint BEFORE the wide step
        # so a mid-exchange kill never redoes the corpus sort
        doc_manifest = finalize_docstore(doc_manifest)
        _manual_exchange(chunks, out_dir, spec)
    else:
        # Dataset-native path: global sort-based groupby. Kept as the
        # reference implementation; measured super-linear at ~1M rows on
        # this host (sort machinery + object churn), hence not the default.
        if stage_barrier:
            chunks = chunks.materialize()
        doc_manifest = finalize_docstore(doc_manifest)
        summaries = chunks.groupby("part").map_groups(
            partial(seg.build_segment_partition, out_dir=out_dir, spec=spec),
            batch_format="pyarrow",
        )
        summaries.materialize()  # tiny: one row per partition

    return seg.write_index_manifest(out_dir, spec, doc_manifest["num_docs"])


# -------------------------------------------------------- manual exchange

@ray.remote
def _partition_blocks(nparts: int, *tables: pa.Table) -> list[pa.Table]:
    """Split a slab of chunk blocks into one table per term partition.
    Hash partitioning only — NO sort: the segment reducer lexsorts its
    partition anyway, so the global sort a Dataset groupby would run here
    is pure overhead (this is the MR map-output spill, kept in the object
    store; Ray spills it to disk under pressure exactly like MR does).

    Chunk blocks arrive part-sorted (TokenizeAndCombine guarantees), so
    per-block partitioning is zero-copy searchsorted slices; the only copy
    is the final per-partition concat."""
    outs: list[list[pa.Table]] = [[] for _ in range(nparts)]
    for t in tables:
        if t.num_rows == 0:
            continue
        parts = t["part"].to_numpy(zero_copy_only=False)
        if len(parts) > 1 and (parts[1:] < parts[:-1]).any():
            order = np.argsort(parts, kind="stable")  # defensive fallback
            t = t.take(pa.array(order, type=pa.int64()))
            parts = parts[order]
        bounds = np.searchsorted(parts, np.arange(nparts + 1))
        for p in range(nparts):
            if bounds[p + 1] > bounds[p]:
                outs[p].append(t.slice(bounds[p], bounds[p + 1] - bounds[p]))
    return [pa.concat_tables(o).combine_chunks() if o
            else CHUNK_SCHEMA.empty_table() for o in outs]


@ray.remote
def _reduce_partition(out_dir: str, spec: IndexSpec, *tables: pa.Table):
    g = pa.concat_tables([x for x in tables if x.num_rows])
    if g.num_rows == 0:
        return None
    return seg.build_segment_partition(g, out_dir=out_dir, spec=spec)


def _await_free_cpus(timeout: float = 15.0) -> None:
    """Wait (bounded) until the cluster's CPUs are actually free. The
    tokenize actor pool releases its reservations asynchronously after
    ``materialize()``; launching the exchange before that leaves the raw
    reduce tasks running ~2-wide on leftover slots (measured: 130 s instead
    of 35 s at 960k rows). gc.collect() first: a dropped lazy Dataset only
    shuts its executor down in ``__del__``."""
    import gc
    import time

    gc.collect()
    want = ray.cluster_resources().get("CPU", 1.0) - 0.5
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if ray.available_resources().get("CPU", 0.0) >= want:
            return
        time.sleep(0.2)


def _manual_exchange(chunks_mds, out_dir: str, spec: IndexSpec,
                     num_writers: int | None = None) -> None:
    """Two-wave external-style shuffle (the MR exchange the reference's
    index job uses, without the sort): W partitioner tasks each split their
    share of the materialized chunk blocks into P per-partition tables
    (num_returns=P refs, zero driver traffic), then one reduce task per
    partition concatenates its W inputs and writes segment + directory +
    manifest. Resume-skipped partitions simply launch no reduce task."""
    _await_free_cpus()
    blocks, _counts = _block_refs_and_counts(chunks_mds)
    if not blocks:
        return
    if num_writers is None:
        # total CPUs, not available: right after the tokenize actor pool the
        # available count is transiently ~0 and would serialize the exchange
        num_writers = max(1, min(
            int(ray.cluster_resources().get("CPU", 8)), len(blocks)))
    nparts = spec.num_partitions
    grid = []
    for w in range(num_writers):
        share = blocks[w::num_writers]
        if not share:
            continue
        grid.append(_partition_blocks.options(
            num_returns=nparts).remote(nparts, *share))
    # normalize: with nparts == 1, num_returns=1 yields a single ref
    grid = [g if isinstance(g, list) else [g] for g in grid]
    done = seg.completed_partitions(out_dir, spec)
    futs = [
        _reduce_partition.remote(out_dir, spec, *[row[p] for row in grid])
        for p in range(nparts) if p not in done
    ]
    ray.get(futs)


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
    prior = []
    for g in gens:
        m = seg.load_index_manifest(os.path.join(index_dir, g))
        prior.append(m)
        total += m["num_docs"]
    # the new generation must be mergeable with every existing one — check
    # BEFORE building, against the spec we are about to build with
    seg.check_generation_compat(prior + [{
        "block_size": spec.block_size,
        "field_spec": {f: list(sc) for f, sc in spec.fields.items()},
        "chains": dict(spec.chains),
        "bm25": {"k1": spec.bm25.k1, "b": spec.bm25.b},
        "num_partitions": spec.num_partitions,
        "salt_factor": spec.salt_factor,
    }])
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
