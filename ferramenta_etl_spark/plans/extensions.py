"""Extension operator queries (filled in incrementally)."""
QUERIES = {}
ORACLES = {}
