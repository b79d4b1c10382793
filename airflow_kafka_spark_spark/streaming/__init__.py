"""Structured Streaming shell: triggers, checkpoints, graceful shutdown."""
