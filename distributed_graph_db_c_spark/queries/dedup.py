"""Placeholder — populated in later milestone."""
