"""Relational-core operators: span-tree joins/windows, sampling, stats,
sessionization, dedup, similarity — composable DataFrame transformations."""
