"""Command-line interfaces: align, repeat-search, calc (p-value backfill)."""
