"""Shared utilities: terminal colors, logging conventions, small helpers."""

from .term import (
    DEFAULT, BLUE, YELLOW, RED, GREEN, MAGENTA,
    status, info, value, warn, error, ok, command_echo,
)

__all__ = [
    "DEFAULT", "BLUE", "YELLOW", "RED", "GREEN", "MAGENTA",
    "status", "info", "value", "warn", "error", "ok", "command_echo",
]
