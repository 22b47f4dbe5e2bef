"""Operator library: the engine's judge-facing surface (SURVEY.md §2)."""
