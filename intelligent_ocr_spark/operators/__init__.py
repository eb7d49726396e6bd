"""Operators: extraction engine, dedup family, similarity search, multimodal."""
