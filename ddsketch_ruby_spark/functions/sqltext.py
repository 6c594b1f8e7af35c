"""Tiny shared helpers for building oracle SQL text."""

from __future__ import annotations

__all__ = ["sql_quote"]


def sql_quote(s: str) -> str:
    """Standard-SQL single-quoted literal (no backslash escaping —
    DuckDB standard strings keep backslashes literal, which is exactly
    what the shared regex pattern constants need)."""
    return "'" + s.replace("'", "''") + "'"
