"""Vectorized column functions: analysis, quantization, text statistics."""
