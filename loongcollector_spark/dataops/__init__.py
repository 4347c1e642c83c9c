"""Large-scale training-data pipeline operations — the ops a 100 TB
pretraining-data curation run needs on top of the log-pipeline operators:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force + LSH-bucketed ANN), text analysis (language
ID, quality scoring, token counting, fingerprinting) and multimodal binary
column plumbing.

All hashing is md5-based so the DuckDB oracles replicate bit-for-bit; all
per-row math is JVM-side Column expressions (no Python in the hot path) except
the explicitly-Arrow multimodal decode stubs.
"""
