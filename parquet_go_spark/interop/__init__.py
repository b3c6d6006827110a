"""Cross-implementation interop: write real .parquet files from our
codec payloads so third-party readers (pyarrow, DuckDB, Spark's
parquet-mr) validate the engine's encoded bytes in the WRITE direction
— the mirror of tests/test_golden_decode.py, which proves the READ
direction against reference-written pages."""
