"""Reusable large-scale corpus functions: dedup family, ANN search,
text analysis, multimodal plumbing."""
