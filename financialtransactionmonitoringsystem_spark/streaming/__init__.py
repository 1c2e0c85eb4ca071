"""Structured Streaming: the "monitoring" path of the reference.

The reference's ingest endpoint (``POST /transactions``,
``monitoring-service/src/main.rs:79-89``) is an unbounded append-only
table; Structured Streaming is its Spark-native restatement
(SURVEY.md §3 E2).  ``pipeline`` holds the streaming forms (watermarks,
windows, dedup, alerting, foreachBatch serving); ``batch_twins`` holds
the oracle-checkable batch equivalents registered in ``queries()``.
"""
