"""Query plans: one registered entry per operator from SURVEY.md §2.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string — the driver's t2 correctness contract
(BASELINE.md §3). Import :mod:`registry` and call :func:`registry.load` to
populate the tables.
"""
