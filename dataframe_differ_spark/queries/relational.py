"""Placeholder — populated in later stages."""
