"""Sources: deterministic synthetic fixture generation (FIXTURES.md) and
Parquet/text readers with column pruning."""
