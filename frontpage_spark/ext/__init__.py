"""Extension operators beyond the reference's surface: the operations a
large-scale training-data pipeline needs (dedup, similarity search, text
analysis, multimodal plumbing). All designed for the 100 TB framing:
no driver-side row collection, bounded broadcast, capped LSH buckets,
shuffle only on the keys that define the operator.
"""
