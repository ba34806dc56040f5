"""Column-set algebra + path/validation helpers (reference helpers.py)."""
