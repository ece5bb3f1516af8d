"""Core operators: analysis, posting codec, BM25 scoring, index build,
search evaluation, merge execution."""
