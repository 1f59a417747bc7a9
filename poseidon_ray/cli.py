"""CLI entry points (the ``ray job submit`` surface).

    python -m poseidon_ray.cli build --corpus C.parquet --out /idx \\
        [--partitions 32] [--detect-hot]
    python -m poseidon_ray.cli query --index /idx --text "return error" \\
        [--field content] [--mode and|or] [--k 10] [--algorithm wand] [--fetch]
    python -m poseidon_ray.cli stats --index /idx

The CLI owns the Ray session (guarded init — fine under ``ray job submit``
where a session already exists); library code never inits.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)


def cmd_build(args) -> None:
    from poseidon_ray.pipelines.build import build_index
    from poseidon_ray.schema import IndexSpec

    _ensure_ray(args.num_cpus)
    spec = IndexSpec(num_partitions=args.partitions)
    manifest = build_index(args.corpus, args.out, spec,
                           detect_hot=args.detect_hot)
    print(json.dumps({
        "num_docs": manifest["num_docs"],
        "partitions": len(manifest["partitions"]),
        "terms": sum(p["terms"] for p in manifest["partitions"]),
        "fields": manifest["fields"],
    }, indent=1))


def cmd_query(args) -> None:
    from poseidon_ray.pipelines.query import Searcher
    from poseidon_ray.stages.docids import fetch_docs, load_docstore_manifest

    s = Searcher(args.index)
    hits = s.search(args.text, field=args.field, mode=args.mode, k=args.k,
                    algorithm=args.algorithm)
    out = [{"doc_id": d, "score": sc} for d, sc in hits]
    if args.fetch and hits:
        # merged across generations — a plain single build is the
        # one-generation special case
        dman = load_docstore_manifest(args.index)
        docs = fetch_docs(args.index, dman, [d for d, _ in hits],
                          columns=["doc_id", "repo", "path", "commit"])
        meta = {r["doc_id"]: r for r in docs.to_pylist()}
        for o in out:
            o.update({k: v for k, v in meta.get(o["doc_id"], {}).items()
                      if k != "doc_id"})
    print(json.dumps(out, indent=1))


def cmd_stats(args) -> None:
    from poseidon_ray.state.segments import load_index_manifest

    m = load_index_manifest(args.index)
    m.pop("partitions", None)
    print(json.dumps(m, indent=1))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="poseidon_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--detect-hot", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--field", default="content")
    q.add_argument("--mode", default="or", choices=["and", "or"])
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--algorithm", default="auto",
                   choices=["auto", "exhaustive", "wand"])
    q.add_argument("--fetch", action="store_true")
    q.set_defaults(fn=cmd_query)

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
