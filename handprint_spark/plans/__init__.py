"""Partitioning / skew / plan-shape helpers."""
