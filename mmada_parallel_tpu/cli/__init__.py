"""Command-line entry points (inference + training for both variants)."""
