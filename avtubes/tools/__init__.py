"""Offline data acquisition & curation tooling (reference §2.7 equivalents)."""
