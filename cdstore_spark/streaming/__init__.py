"""Structured Streaming surface (SURVEY.md §2.B row 30, §2.C optional).

The reference's uploads are batch sessions; the graft adds the incremental-
ingest mode a production dedup service needs: new clips arrive as files,
are featurized in micro-batches, matched against the persisted band index,
and appended — exactly-once via checkpointed foreachBatch.
"""
