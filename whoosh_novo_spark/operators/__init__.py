"""Engine operators: build, merge, query, WAND, dedup, similarity."""
