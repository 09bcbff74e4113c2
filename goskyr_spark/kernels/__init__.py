"""Pure-Python extraction kernels (no Spark imports here).

These implement the per-page semantics of the reference scraper
(/root/reference/internal/scraper/scraper.go) so they can run both in
plain pytest (fast, parity vs the reference's own test tables) and
inside Arrow-vectorized Spark UDFs (goskyr_spark.spark.udfs).
"""
