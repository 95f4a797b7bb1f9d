"""Table sources/sinks: Iceberg-style storage behind one module."""
