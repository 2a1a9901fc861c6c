"""Reusable large-scale operators (dedup, similarity, text, multimodal).

These are the beyond-reference components (BASELINE.json north star):
training-data pipeline operators built from Spark primitives, designed
shuffle-aware for the 100 TB case. ``queries/`` wraps them into
oracle-checked QuerySpecs over the driver corpus.
"""
