"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in poseidon_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship pipeline on sf0.001: build the inverted index
                     over the documents corpus (full spec: code + trigram +
                     keyword fields) and run the BM25 query set; returns the
                     ranked-hits table.
- ``queries()``    — one callable per operator pipeline (SURVEY.md §2 +
                     training-data ops); each takes sf_dir.
- ``oracle_sql()`` — DuckDB twins for the SQL-expressible subset.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow as pa

    from poseidon_ray.pipelines.build import build_index
    from poseidon_ray.pipelines.ops import docs_as_corpus
    from poseidon_ray.pipelines.query import Searcher
    from poseidon_ray.schema import IndexSpec

    sf_dir = "/root/testdata/sf0.001"
    spec = IndexSpec(num_partitions=8,
                     static_hot_terms=("the", "a", "and", "value", "table"))
    tag = hashlib.sha1(f"entry:{sf_dir}".encode()).hexdigest()[:10]
    out = f"/tmp/poseidon_ray_entry_{tag}"
    build_index(docs_as_corpus(sf_dir), out, spec)
    s = Searcher(out)
    rows = []
    for qname, text, field, mode in [
        ("hot", "table value", "content", "or"),
        ("and2", "table window", "content", "and"),
        ("trigram", "windo", "content3", "and"),
        ("lang", "en", "lang", "or"),
    ]:
        for rank, (doc, score) in enumerate(
            s.search(text, field=field, mode=mode, k=10)
        ):
            rows.append({"query": qname, "rank": rank, "doc_id": int(doc),
                         "score": float(score)})
    return pa.Table.from_pylist(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    from poseidon_ray.pipelines.ops import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from poseidon_ray.pipelines.ops import ORACLE_SQL

    return dict(ORACLE_SQL)
