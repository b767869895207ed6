"""Large-scale training-data pipeline operators (SURVEY.md §2.12).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search (brute-force + LSH + IVF), text analysis, and
multimodal column plumbing — the extension surface a 100 TB
LLM-data pipeline needs on top of the reference's relational core.
"""
