"""Training-data-pipeline operators over the driver's generic tables
(documents, embeddings) — the large-scale curation toolkit a 100 TB corpus
needs alongside the audio dedup pipeline: exact/MinHash/SimHash/n-gram
dedup, ANN similarity search, text quality analysis, multimodal plumbing.

Everything is expressed Spark-first (built-in pyspark.sql.functions on the
hot path, JVM-side and codegen-friendly); Pandas UDFs only where sketches
genuinely need NumPy.
"""
