"""Plan-level tooling: bench/analyze harness, explain helpers."""
