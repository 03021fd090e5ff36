"""CLI entry points mirroring the reference entry scripts."""
