"""Cross-cutting utilities: observability and checkpoint/resume."""
