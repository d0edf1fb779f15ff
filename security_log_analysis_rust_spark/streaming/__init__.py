"""Structured Streaming surfaces (the journald tail-follow daemon analog)."""
