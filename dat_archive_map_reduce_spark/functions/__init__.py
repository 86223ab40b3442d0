"""Column-level helper functions (keys, folds, vector math, text)."""
