"""Ray Data stage builders: docID assignment, dedup, similarity search,
multimodal plumbing. Each function takes and returns ``ray.data.Dataset``
(or writes partitioned output) — none calls ``ray.init``."""
