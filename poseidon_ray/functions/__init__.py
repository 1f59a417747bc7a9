"""Pure vectorized kernels (no Ray): hashing, posting codec, tokenizers,
text-analysis functions. Everything here is deterministic and unit-tested
without a Ray session."""
