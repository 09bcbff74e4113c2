"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash+LSH, n-gram Jaccard,
SimHash), similarity search, text analysis, and multimodal binary-column
plumbing. Everything stays JVM-side (pyspark.sql.functions) except the
clearly-marked multimodal decode stubs."""
