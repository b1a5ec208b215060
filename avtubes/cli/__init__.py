"""CLI entry points mirroring the reference's driver scripts."""
