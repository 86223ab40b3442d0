"""Physical operators: map/reduce adapters, maintenance, extensions."""
