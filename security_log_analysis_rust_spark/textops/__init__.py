"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing.

The exact/minhash/jaccard dedup and langid/quality/token/fingerprint ops are
exposed (with DuckDB oracles) in ``__spark_entry__``; this package holds the
operators that need more than SQL-expressible logic: simhash, hyperplane-LSH
ANN, numpy-batched brute-force top-k, and the multimodal decode plumbing.
"""
