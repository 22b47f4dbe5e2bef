"""Registered judge-facing queries, grouped by domain."""
