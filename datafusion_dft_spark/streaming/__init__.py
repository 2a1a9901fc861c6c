"""Structured Streaming variants of the events analytics."""
