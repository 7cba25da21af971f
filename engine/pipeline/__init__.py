"""Large-scale training-data pipeline operators built on the same
Spark-first principles as the core engine: deduplication, similarity
search, text analysis, multimodal column plumbing.
"""
