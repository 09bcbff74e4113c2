"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash+LSH, n-gram Jaccard,
SimHash), similarity search, text analysis, and multimodal binary-column
operators (real numpy PPM/BMP raster kernels behind Arrow-batched
mapInPandas). Everything else stays JVM-side (pyspark.sql.functions)."""
