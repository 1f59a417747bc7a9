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
        import pyarrow.compute as pc

        terms = batch["term"].to_pylist()
        counts = pc.list_value_length(batch["doc_ids"]).to_numpy(zero_copy_only=False)
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
    tokenize_batch_size: int = 256,
    detect_hot: bool = False,
    hot_sample_frac: float = 0.05,
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

    # stage 1-2: sorted docIDs + docstore (checkpointed by docstore.json)
    doc_manifest = build_docstore(corpus, out_dir)
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

    # stage 3-4: tokenize + combine (actor pool), skip finished partitions
    chunks = ds.map_batches(
        TokenizeAndCombine,
        fn_constructor_kwargs={"spec": spec, "hot_terms": frozenset(hot)},
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

    # stage 5-6: the wide step — term-hash shuffle + per-partition reduce
    summaries = chunks.groupby("part").map_groups(
        partial(seg.build_segment_partition, out_dir=out_dir, spec=spec),
        batch_format="pyarrow",
    )
    summaries.materialize()  # tiny: one row per partition

    return seg.write_index_manifest(out_dir, spec, doc_manifest["num_docs"])
