"""Similarity search over the embeddings table (north-star
extension): brute-force cosine top-k baseline + LSH-bucketed ANN.
Populated incrementally; heavy lifting in operators/similarity_ops.py."""

from __future__ import annotations

from citybikedatawarehouse_spark.plans.catalog import register  # noqa: F401
