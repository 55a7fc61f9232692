"""cdstore_spark — a from-scratch, PySpark-native near-duplicate detection
and clustering engine over audio-clip + transcript tables.

Recasts the capabilities of the reference `chintran27/CDStore` (convergent
chunk-fingerprint deduplication; see SURVEY.md §0 for provenance — the
reference tree is empty in this sandbox, so parity citations refer to the
published design: Li, Qin, Lee, "CDStore: Toward Reliable and Secure Cloud
Storage via Convergent Dispersal", USENIX ATC 2015) as a Spark DataFrame
pipeline:

    ingest → decode (Arrow batches) → CDC shingling → MinHash/SimHash →
    LSH bands → salted candidate join (explicit skew split) →
    suffix-array span verify → connected-components clustering →
    checkpointed snapshots with per-partition lineage (resume).

Layout:
    config.py    frozen pipeline configuration (shared oracle/engine)
    kernels/     pure-NumPy vectorized kernels (no Spark imports)
    datagen.py   deterministic synthetic audio_clips generator (FIXTURES.md)
    oracle.py    single-node reference pipeline (golden truth)
    engine/      distributed Spark stages S1..S10
    functions/   training-data-pipeline ops (text dedup, ANN, quality, ...)
"""

__version__ = "0.1.0"
