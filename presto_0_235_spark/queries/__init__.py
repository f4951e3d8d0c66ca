"""Verified query inventory (drives __spark_entry__ and tests)."""
