"""Dataflow operators: preprocess, blocking, pairwise scoring, clustering,
dedup, ANN, text stats, imputation, multimodal plumbing."""
