"""Corpus-level training-data operators over the driver's parquet tables.

These are the large-scale data-pipeline companions of the document engine
(SURVEY.md §2 covers the per-document operators; this package covers the
cross-document ones): deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting) and multimodal column plumbing.

Every operator is expressed as JVM-side DataFrame expressions (no Python
row loops); each has a DuckDB oracle built from the SAME constants so the
driver's correctness gate can verify values bit-for-bit.
"""
