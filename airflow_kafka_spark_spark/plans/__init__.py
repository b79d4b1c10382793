"""Query catalog: every implemented operator as a (PySpark callable,
DuckDB oracle SQL) pair consumed by __spark_entry__ and bench.py."""
