"""Deterministic global docID assignment + docstore write.

The reference hands out dense docId ranges from a Redis ``INCRBY`` service
(service/idgenerator/module/idgenerator.go:80-87) and derives per-line ids
with a per-file first-docId table (InvertedIndexGenerateMapper.java:74-119,
172-173) — arrival-order-dependent and service-coupled. Here docIDs come
from the data itself (north rule): sort the corpus by (repo, path, commit)
— a Ray Data range shuffle — then doc_id = global rank. Reproducible across
runs and partition counts, no external service.

The rank is attached with one tiny driver-side reduce (per-block row counts
-> exclusive prefix sum, the analog of the reference's
``fname_begin_docid.txt`` table ST3) followed by one raw Ray task per block;
the Dataset API has no zip-with-index, and per-block base offsets are exactly
the semantics the task layer exists for. The same task writes the block as a
docstore Parquet file, so content fetch at query time is pure arithmetic:
file i covers [base_i, base_i + rows_i) — the DocGzMeta + hdfsreader-ranged-
read analog (poseidon_if.proto:13-17, Reader.java:112-115).

Driver memory stays O(#blocks), not O(rows).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from poseidon_ray.functions.hashing import sha256_column

SORT_KEYS = ["repo", "path", "commit"]

_KEY_SEP = "\x00"  # below any key character -> concatenated order ==
                   # lexicographic (repo, path, commit) tuple order


def _composite_keys(t: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc

    arr = pc.binary_join_element_wise(
        *(pc.cast(t[k], pa.string()) for k in SORT_KEYS), _KEY_SEP)
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=object)


@ray.remote
def _key_sample(block: pa.Table, max_sample: int = 512) -> np.ndarray:
    """Evenly-strided key sample of one block (drives splitter choice —
    O(blocks * max_sample) driver strings, never the key column)."""
    if block.num_rows == 0:
        return np.empty(0, dtype=object)
    step = max(1, block.num_rows // max_sample)
    return _composite_keys(block)[::step]


@ray.remote
def _split_by_ranges(splitters: np.ndarray, nred: int,
                     *tables: pa.Table) -> list:
    """One splitter's share of blocks -> nred range slabs (rows with key
    in [splitter[r-1], splitter[r])). Slab with no rows -> None."""
    outs: list[list[pa.Table]] = [[] for _ in range(nred)]
    for t in tables:
        if t.num_rows == 0:
            continue
        keys = _composite_keys(t)
        slab = np.searchsorted(splitters, keys, side="right")
        order = np.argsort(slab, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        slab = slab[order]
        bounds = np.searchsorted(slab, np.arange(nred + 1))
        for r in range(nred):
            if bounds[r + 1] > bounds[r]:
                outs[r].append(t.slice(bounds[r], bounds[r + 1] - bounds[r]))
    return [pa.concat_tables(o).combine_chunks() if o else None
            for o in outs]


@ray.remote(num_returns=2)
def _merge_sorted_slab(*tables):
    """Concat one range slab and sort it by the composite key. Returns
    (table | None, num_rows)."""
    flat: list = []
    for t in tables:
        flat.extend(t) if isinstance(t, list) else flat.append(t)
    tabs = [t for t in flat if t is not None and t.num_rows]
    if not tabs:
        return None, 0
    g = pa.concat_tables(tabs).combine_chunks()
    order = np.argsort(_composite_keys(g), kind="stable")
    g = g.take(pa.array(order, type=pa.int64()))
    return g, g.num_rows


def _manual_sort(mds, nred: int | None = None) -> tuple[list, list[int]]:
    """Globally sort a materialized corpus by SORT_KEYS with the same
    two-wave raw-task exchange the index shuffle uses (sample -> range
    split -> per-slab sort) instead of Ray's Sort operator, whose fixed
    SortMap/SortReduce machinery dominates small inputs (~1.5 s at 5k
    rows) and re-sorts what the slab merge sorts anyway. Returns
    (sorted_block_refs, counts) in global key order — exactly what docID
    rank assignment consumes. Global order is identical to ``ds.sort``;
    tie order among fully-equal keys is arrival-dependent in both."""
    blocks, counts = _block_refs_and_counts(mds)
    blocks = [b for b, c in zip(blocks, counts) if c]
    if not blocks:
        return [], []
    total = sum(counts)
    ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
    if nred is None:
        # slab count = downstream parallelism: each slab is one sort
        # task, one docstore file, AND one tokenize input block — too few
        # slabs starves the tokenize actor pool (measured 27 s -> 83 s at
        # 480k rows when 8 slabs fed 8 actors with no work splitting).
        # Target ~16k rows / <=256 MB per slab, floor 4 per CPU.
        nbytes = mds.size_bytes() or 0
        nred = max(1, min(65_536, max(ncpu * 4, total // 16_384 + 1,
                                      nbytes // (256 << 20) + 1)))
    samples = np.concatenate(ray.get([_key_sample.remote(b)
                                      for b in blocks]))
    samples.sort(kind="stable")
    if len(samples) and nred > 1:
        pos = (np.arange(1, nred) * len(samples)) // nred
        splitters = samples[pos]
    else:
        splitters = np.empty(0, dtype=object)
    num_writers = max(1, min(ncpu, len(blocks)))
    grid = []
    for w in range(num_writers):
        share = blocks[w::num_writers]
        if share:
            grid.append(_split_by_ranges.options(num_returns=nred)
                        .remote(splitters, nred, *share))
    grid = [g if isinstance(g, list) else [g] for g in grid]
    out_refs, count_refs = [], []
    for r in range(nred):
        t_ref, n_ref = _merge_sorted_slab.remote(*[row[r] for row in grid])
        out_refs.append(t_ref)
        count_refs.append(n_ref)
    nrows = ray.get(count_refs)
    refs = [t for t, n in zip(out_refs, nrows) if n]
    cnts = [n for n in nrows if n]
    return refs, cnts


@ray.remote(num_cpus=1, num_returns=2)
def _attach_ids(block: pa.Table, base: int, path: str):
    """Attach doc_id + sha256 to one sorted block. Returns (info, table) —
    the table ref feeds the next pipeline stage directly from the object
    store; the parquet write happens in a separate background task so
    tokenize starts without waiting on zstd encoding."""
    n = block.num_rows
    doc_id = pa.array(np.arange(base, base + n, dtype=np.uint64))
    sha = pa.array(sha256_column(block["content"]))
    out = block.append_column("doc_id", doc_id).append_column("sha256", sha)
    return {"path": path, "first_doc_id": base, "num_rows": n}, out


@ray.remote(num_cpus=0.5)
def _write_docstore_file(table: pa.Table, path: str) -> str:
    """Idempotent docstore file write (atomic rename); runs concurrently
    with the tokenize stage (half-CPU tasks fill scheduling gaps)."""
    tmp = f"{path}.tmp"
    pq.write_table(table, tmp, row_group_size=4096, compression="zstd")
    os.replace(tmp, path)
    return path


def build_docstore(corpus: ray.data.Dataset, out_dir: str,
                   docid_base: int = 0) -> dict:
    """Sort-shuffle the corpus, assign dense docIDs (starting at
    ``docid_base`` — nonzero for incremental generations), write the
    docstore.

    Returns the docstore manifest: {"files": [{path, first_doc_id,
    num_rows}...], "num_docs": N, "docid_base": B}. Written to
    ``out_dir/docstore.json`` atomically (checkpoint: a re-run with the
    manifest present is a no-op upstream of this stage).
    """
    manifest_path = os.path.join(out_dir, "docstore.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f), None

    os.makedirs(os.path.join(out_dir, "docstore"), exist_ok=True)
    # manual range-sort exchange (sample -> split -> per-slab sort): same
    # global order as corpus.sort(SORT_KEYS) without the Sort operator's
    # fixed cost; block refs stay in the object store (zero-copy), only
    # counts reach the driver
    mds = corpus.materialize()
    blocks, counts = _manual_sort(mds)
    bases = docid_base + np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    info_refs, table_refs, write_refs = [], [], []
    for i, (ref, base) in enumerate(zip(blocks, bases)):
        path = os.path.join(out_dir, "docstore", f"part-{i:06d}.parquet")
        info, tbl = _attach_ids.remote(ref, int(base), path)
        info_refs.append(info)
        table_refs.append(tbl)
        write_refs.append(_write_docstore_file.remote(tbl, path))
    # the manifest stays PENDING: num_docs is known from block metadata, but
    # the file writes run in the background, overlapped with tokenize —
    # call finalize_docstore() before trusting docstore.json on disk
    manifest = {"files": None, "num_docs": int(sum(counts)),
                "docid_base": int(docid_base),
                "_pending": {"info_refs": info_refs, "write_refs": write_refs,
                             "manifest_path": manifest_path}}
    docstore_ds = ray.data.from_arrow_refs(table_refs) if table_refs else None
    return manifest, docstore_ds


def finalize_docstore(manifest: dict) -> dict:
    """Resolve a pending docstore manifest: wait for the background file
    writes, then write docstore.json atomically (the checkpoint gate). A
    manifest loaded from disk passes through unchanged."""
    pend = manifest.pop("_pending", None)
    if pend is None:
        return manifest
    files = ray.get(pend["info_refs"])
    ray.get(pend["write_refs"])
    manifest["files"] = [f for f in files if f["num_rows"] > 0]
    tmp = pend["manifest_path"] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, pend["manifest_path"])
    return manifest


@ray.remote(num_cpus=0.25)
def _nrows(block: pa.Table) -> int:
    return block.num_rows


def _block_refs_and_counts(mds) -> tuple[list, list[int]]:
    """Block refs + row counts of a materialized dataset. Row counts come
    from block METADATA when available (no task wave, no data movement);
    falls back to tiny counting tasks if the internal iterator changes."""
    try:
        refs, counts = [], []
        for bundle in mds.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                if meta.num_rows is None:
                    raise ValueError("metadata missing num_rows")
                refs.append(ref)
                counts.append(int(meta.num_rows))
        return refs, counts
    except Exception:
        refs = mds.to_arrow_refs()
        return refs, list(ray.get([_nrows.remote(b) for b in refs]))


def load_docstore_manifest(index_dir: str) -> dict:
    """Docstore manifest merged across generations (first_doc_id is already
    globally dense — each generation was built with its docid_base), so
    multi-generation content fetch is the same (file, row) arithmetic."""
    from poseidon_ray.pipelines.build import list_generations

    files: list[dict] = []
    total = 0
    for g in list_generations(index_dir):
        gdir = os.path.normpath(os.path.join(index_dir, g))
        with open(os.path.join(gdir, "docstore.json")) as f:
            m = json.load(f)
        files.extend(m["files"])
        total += m["num_docs"]
    files.sort(key=lambda fi: fi["first_doc_id"])
    return {"files": files, "num_docs": total}


def read_docstore(out_dir: str) -> ray.data.Dataset:
    """Read exactly the manifest's files (never stray .tmp from a crash)."""
    with open(os.path.join(out_dir, "docstore.json")) as f:
        manifest = json.load(f)
    return ray.data.read_parquet([fi["path"] for fi in manifest["files"]])


def fetch_docs(out_dir: str, manifest: dict, doc_ids: list[int],
               columns: list[str] | None = None) -> pa.Table:
    """Batched content fetch by docID — (file, row) arithmetic against the
    docstore manifest, then row-group-pruned Parquet reads (the J3/J4 doc
    fetch path, doc_gz_client.go:118-169). Driver-side; callers batch ids
    (the reference caps in-flight doc fetches at 64, module/poseidon.go:146)."""
    files = manifest["files"]
    firsts = np.array([f["first_doc_id"] for f in files], dtype=np.int64)
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    file_idx = np.searchsorted(firsts, ids, side="right") - 1
    out = []
    for fi in np.unique(file_idx):
        info = files[fi]
        local = ids[file_idx == fi] - info["first_doc_id"]
        pf = pq.ParquetFile(info["path"], memory_map=True)
        rgs = pf.metadata
        # map local row -> row group via cumulative row-group sizes
        rg_rows = np.array([rgs.row_group(i).num_rows for i in range(rgs.num_row_groups)])
        rg_first = np.concatenate([[0], np.cumsum(rg_rows)[:-1]])
        rg_idx = np.searchsorted(rg_first, local, side="right") - 1
        for rg in np.unique(rg_idx):
            tbl = pf.read_row_group(int(rg), columns=columns)
            rows = local[rg_idx == rg] - rg_first[rg]
            out.append(tbl.take(pa.array(rows)))
    if not out:
        schema = pq.read_schema(files[0]["path"]) if files else None
        return pa.table({}) if schema is None else schema.empty_table()
    return pa.concat_tables(out)
