"""Query AST, normalization rewrites, and physical-path planning."""
