"""Large-scale training-data pipeline operators beyond the reference's scope:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), approximate similarity search, text analysis, and multimodal column
plumbing. All Spark-first: built-in expressions in the hot path, Arrow-batched
pandas UDFs only where expressions can't say it.
"""
