"""Tooling: data generation."""
