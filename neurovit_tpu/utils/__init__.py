"""Utilities: profiling, seeding."""
