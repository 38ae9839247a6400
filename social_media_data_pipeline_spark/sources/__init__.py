"""Sources: schema-ful JSON ingest + flattening, binary-file scans, and
incremental REST-shaped sources with checkpointed state (offline stubs
for tests — network never required)."""
