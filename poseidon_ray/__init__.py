"""poseidon_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch reimplementation of the capabilities of Qihoo360/poseidon
(reference at /root/reference: Hadoop-MR index builder + Go query engine;
see SURVEY.md) expressed as ray.data.Dataset pipelines:

- corpus: Parquet table (repo, path, commit, lang, content)
- build: read_parquet -> deterministic docID assignment (sort shuffle)
  -> code-aware tokenizer (actor-pool map_batches over zero-copy Arrow)
  -> per-block partial aggregation (the MR combiner analog)
  -> term-hash shuffle with hot-term salting -> per-partition segment
  build (delta+varint postings + block-max metadata) with per-partition
  checkpoint manifests
- query: BM25 top-k (conjunctive intersection + block-max WAND
  disjunction), scatter-gather over searcher actors

Layout:
  functions/ pure vectorized kernels (codec, tokenize, hashing, textstats)
  sources/   corpus readers + deterministic fixture generator
  stages/    Dataset stage builders (docids, dedup, ann, multimodal)
  state/     segment/directory/manifest persistence
  pipelines/ end-to-end build + query drivers
"""

from poseidon_ray.schema import IndexSpec, BM25Params

__all__ = ["IndexSpec", "BM25Params"]
__version__ = "0.1.0"
