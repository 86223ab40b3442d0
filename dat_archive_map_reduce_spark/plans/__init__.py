"""Logical plans: view definitions and the storage catalog."""
