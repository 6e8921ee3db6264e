"""Structured Streaming extraction + stateful operators (see stream.py)."""
