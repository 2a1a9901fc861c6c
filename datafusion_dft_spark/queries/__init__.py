"""Operator inventory — each module registers QuerySpecs via registry.query."""
