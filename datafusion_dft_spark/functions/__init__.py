"""Function extensions: JSON shims, parquet metadata, information_schema."""
