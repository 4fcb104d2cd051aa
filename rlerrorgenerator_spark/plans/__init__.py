"""Composite plans: dedup strategies, ANN search, TPC-H-style analytics."""
