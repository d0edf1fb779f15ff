"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing.

The exact/minhash/jaccard dedup and langid/quality/token/fingerprint ops are
exposed (with DuckDB oracles) in ``__spark_entry__``; this package holds the
operators that need more than single-statement SQL: simhash (band-blocked
near-dups), the ANN stack (distributed brute-force baseline, hyperplane-LSH
and IVF top-k with per-bucket numpy kernels, LSH-bucketed cosine near-dup
dedup), and the multimodal decode plumbing (real PNG/WAV header parsers,
stubbed pixel codecs). Every operator still carries a DuckDB oracle via
shared deterministic literals (seeded planes / md5-sampled centroids).
"""
