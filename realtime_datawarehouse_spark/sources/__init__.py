"""Input-surface layer (SURVEY.md §2.1): schemas + parsers for the
reference's wire formats, and source builders for each connector family.

- ``log_events.py``  tracking-log JSON (topic_log): nested schema, tolerant
  parse with dirty routing (P1/P2), 5-way demultiplex (R1/R2)
- ``maxwell.py``     Maxwell CDC envelope (topic_db, S3): schema, ETL filter
  (P3), map-access projection + old-map change detection (P4/P6)
- ``debezium.py``    Debezium envelope (S4) + table_process config rows
- ``kafka.py``       Kafka batch/stream source builders (S1/S2/K1/K2)
- ``jdbc.py``        JDBC lookup-dim reader (S5)
- ``literal.py``     in-memory literal source (S7) and socket source (S6)
"""
