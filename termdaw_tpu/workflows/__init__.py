"""Frontends: the manual/TUI command workflow and the stream workflow."""
