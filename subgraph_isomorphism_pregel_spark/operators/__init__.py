"""Operators: BSP kernel, link-graph algorithms, matcher, dedup, similarity, text."""
