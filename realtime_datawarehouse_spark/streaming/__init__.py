"""Structured Streaming formulations (SURVEY.md §2.7-§2.9, §7.2 step 7).

Every stateful/windowed operator in ``plans/`` has its oracle-exact batch
form; this package holds the streaming twins:

- ``jobs.py``    watermarked tumble windows (A1-A3/W1-W6), first-per-key
  distinct (ST2/ST5 via dropDuplicates with watermark-scoped state),
  keep-latest (ST7 via applyInPandasWithState), daily-UV stateful op (ST2
  exact form with per-key date state ≈ 1-day TTL W7)
- ``pipelines.py`` end-to-end streaming jobs wiring sources → operators →
  sinks (the reference's job mains, recomposed)

Batch-parity is the test contract: each streaming form, run with
``availableNow`` over file inputs split into multiple micro-batches, must
produce the batch operator's exact result (tests/test_streaming.py).
"""
