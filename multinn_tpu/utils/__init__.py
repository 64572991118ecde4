"""Cross-cutting utilities: typed configs (C17), logging/metrics ledger (C19,
§5.5), profiling hooks (§5.1)."""
