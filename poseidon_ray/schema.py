"""Arrow schemas + index configuration.

The data model re-expresses the reference's protobuf layer
(``common/proto/poseidon_if.proto``) in Arrow/Parquet:

- corpus row        <-> Doc (poseidon_if.proto:10-11 packs 128 log lines per
                        Doc; here one source file IS the document)
- posting binary    <-> DocIdList delta-varint (poseidon_if.proto:26-40)
- segment parquet   <-> InvertedIndexGzHDFSFile bucket files
                        (docs/build_inverted_index.md:54-87)
- directory parquet <-> InvertedIndexGzMeta in NoSQL (poseidon_if.proto:78-83)
- docmeta parquet   <-> DocGzMeta KV (poseidon_if.proto:13-17)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict

import pyarrow as pa

# ---------------------------------------------------------------- schemas

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# docstore = corpus rows after docID assignment (written back partitioned so a
# doc fetch is (file, row) arithmetic — the DocGzMeta/hdfsreader analog).
DOCSTORE_EXTRA_COLUMNS = ["doc_id", "sha256"]

# doc metadata (the docmeta job analog, builder/docmeta/.../DocMetaMapper.java)
DOCMETA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("sha256", pa.string()),    # per-row invariant (BASELINE input_hint)
    ]
)

# partial-aggregated posting chunks (the MR combiner output analog,
# InvertedIndexGenerateCombiner.java:41-109): one row per (term, field) per
# input block; doc_ids sorted ascending within the chunk. doc_lens ride along
# so BM25 norms need no query-time doc-length join. Lists are packed as
# delta+varint bytes already at the combiner — the term shuffle (the widest
# exchange in the whole engine) moves ~1-2 bytes per posting instead of 16
# (the combiner's reason to exist in the reference, docs/build_inverted_index.md).
CHUNK_SCHEMA = pa.schema(
    [
        ("part", pa.uint32()),          # salted term partition
        ("term", pa.string()),
        ("field", pa.string()),
        ("n", pa.uint32()),             # postings in this chunk
        ("doc_bytes", pa.large_binary()),   # varint deltas, absolute first
        ("tf_bytes", pa.large_binary()),    # varint tfs
        ("dl_bytes", pa.large_binary()),    # varint doc_lens
    ]
)

# one segment row per (term, field) per partition — the InvertedIndexGz analog
SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("field", pa.string()),
        ("df", pa.uint32()),            # docs containing term (this shard)
        ("cf", pa.uint64()),            # total occurrences (the PV sentinel
                                        # analog, InvertedIndexGenerateReducer.java:390-395)
        ("cf_truncated", pa.bool_()),   # posting cap applied (ReduceGroupData.java:130-157)
        ("postings", pa.large_binary()),   # delta+varint doc_ids
        ("tf_bytes", pa.large_binary()),   # varint tfs, same order
        ("dl_bytes", pa.large_binary()),   # varint doc_lens, same order
        ("blockmax", pa.large_binary()),   # (last_docid, tf_max, dl_min) skip table
    ]
)

# term directory — the InvertedIndexGzMeta analog; loaded by query actors
DIRECTORY_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("field", pa.string()),
        ("part", pa.uint32()),
        ("segment_path", pa.string()),
        ("row_index", pa.uint32()),     # row inside the segment file
        ("df", pa.uint32()),
        ("cf", pa.uint64()),
        ("cf_truncated", pa.bool_()),
    ]
)

POSTING_BLOCK_SIZE = 128  # postings per block-max block (docs 128 lines/Doc)


# ---------------------------------------------------------------- config

@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 (Robertson & Spärck Jones); idf = ln(1+(N-df+.5)/(df+.5))."""

    k1: float = 1.2
    b: float = 0.75


@dataclass
class IndexSpec:
    """The analog of the reference's index config json (docs/config.md:22-67,
    builder/index/src/main/etc/test.json): which fields are indexed, with
    which tokenizer chain, plus physical layout knobs."""

    # index field -> (source column, tokenizer name registered in
    # functions/tokenize.py). "code" = identifier+literal word tokens;
    # "trigram" = char 3-grams of normalized content; "keyword" = whole
    # lowercased value; "path" = component expansion (Util.ParsePath analog).
    fields: dict[str, tuple[str, str]] = field(
        default_factory=lambda: {
            "content": ("content", "code"),
            "content3": ("content", "trigram"),
            "path": ("path", "path"),
            "repo": ("repo", "keyword"),
            "lang": ("lang", "keyword"),
        }
    )
    # custom tokenizer chains (the index.json tokenizer-config analog,
    # docs/config.md:35-67): name -> "step|step:param|..." spec, resolvable
    # by name in `fields`. Carried IN the spec (not a process-global
    # registry) so tokenize actors and query processes compile identical
    # chains.
    chains: dict[str, str] = field(default_factory=dict)
    num_partitions: int = 32          # term-hash partitions (1000 buckets analog)
    # hot-term salting (north rule; replaces the reference's hard truncation
    # ReduceGroupData.java:104-157): a term whose corpus cf exceeds the
    # threshold is split into `salt_factor` shuffle keys.
    salt_threshold: int = 200_000
    salt_factor: int = 8
    # optional posting cap with explicit accounting (A6); None = exact/off
    # (conformance mode must keep it off for rank identity).
    posting_cap: int | None = None
    # static always-hot terms (code stopwords) salted without a stats pass
    static_hot_terms: tuple[str, ...] = ()
    bm25: BM25Params = field(default_factory=BM25Params)
    block_size: int = POSTING_BLOCK_SIZE

    def config_hash(self) -> str:
        """Stable hash of everything that invalidates built segments
        (checkpoint lineage — resume after a config change must rebuild)."""
        d = asdict(self)
        d["static_hot_terms"] = sorted(d["static_hot_terms"])
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
