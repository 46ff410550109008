"""Data pipeline: prompting, item processing, datasets, samplers."""
