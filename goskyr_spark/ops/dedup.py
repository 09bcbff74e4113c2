"""Deduplication operators.

Design for 100 TB: every operator here is expressed in Spark built-ins
(whole-stage codegen, map-side partial aggregation); the only shuffles
are the unavoidable group-bys/joins on content keys. MinHash+LSH is the
scale path for near-dup (candidate pairs only within LSH buckets — no
quadratic self-join); the n-gram Jaccard operator verifies candidates
exactly and is intended to run AFTER banding at scale (here also exposed
standalone for the oracle gate).

Hash choice: md5 (hex) — identical in Spark and DuckDB, so the driver's
value-hash oracle can check these operators exactly. MinHash signatures
minimize md5(shingle || '#k') as STRINGS, which is a valid uniform-ish
permutation for dedup purposes and is reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _words(col):
    return F.split(F.trim(col), r"\s+")


def shingles_expr(text_col="text", n=3):
    """Distinct word n-gram shingles as an array column (JVM-side).

    Documents with fewer than n words yield ZERO shingles (not one
    truncated shingle) — this matches the DuckDB oracle's comprehension
    `range(1, greatest(len(w)-(n-1),0)+1)` so the value-hash gate holds
    on corpora containing short documents."""
    words = _words(F.col(text_col))
    full = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return F.array_distinct(
        F.when(F.size(words) >= n, full)
        .otherwise(F.array().cast("array<string>")))


def exact_dedup(documents, text_col="text", id_col="doc_id"):
    """Exact duplicate groups by content hash; keeper = min id.

    Scale: one hash-groupBy shuffle with map-side combine; the md5 is
    computed in codegen."""
    return (documents
            .select(F.md5(F.col(text_col).cast("binary")).alias("content_hash"),
                    F.col(id_col))
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("n_copies"))
            .orderBy("content_hash"))


def minhash_signatures(documents, text_col="text", id_col="doc_id",
                       num_perm=8, shingle_n=3):
    """MinHash signature per doc: sig_k = min(md5(shingle || '#k'))."""
    sh = documents.select(F.col(id_col),
                          F.explode(shingles_expr(text_col, shingle_n))
                          .alias("shingle"))
    aggs = [F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{k}"))
                        .cast("binary"))).alias(f"sig_{k}")
            for k in range(num_perm)]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_buckets(documents, text_col="text", id_col="doc_id",
                        num_perm=8, band_size=2, shingle_n=3):
    """LSH banding: docs sharing a band signature are near-dup candidates.

    Output one row per (band_id, band_sig) bucket with ≥2 docs — at scale
    the candidate-pair join happens per bucket, never across the corpus."""
    sigs = minhash_signatures(documents, text_col, id_col, num_perm,
                              shingle_n)
    bands = []
    for b in range(num_perm // band_size):
        cols = [F.col(f"sig_{k}")
                for k in range(b * band_size, (b + 1) * band_size)]
        bands.append(sigs.select(
            F.col(id_col), F.lit(b).alias("band_id"),
            F.concat_ws("|", *cols).alias("band_sig")))
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionByName(b)
    return (allb.groupBy("band_id", "band_sig")
            .agg(F.sort_array(F.collect_list(id_col)).alias("candidates"),
                 F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
            .orderBy("band_id", "band_sig"))


def ngram_jaccard_pairs(documents, text_col="text", id_col="doc_id",
                        threshold=0.5, shingle_n=3):
    """Exact Jaccard over word n-gram shingle SETS for pairs sharing at
    least one shingle (inverted-index join, not a cartesian product).

    Scale: explode → self-join on shingle → pair-count aggregation; skewed
    shingles (stopword-only n-grams) are the known hazard — AQE skew join
    handles moderate skew, and a DF-frequency cap can drop ubiquitous
    shingles before the join."""
    sh = documents.select(
        F.col(id_col), F.explode(shingles_expr(text_col, shingle_n))
        .alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.col("n_inter") /
                        (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b",
                    F.round("jaccard", 6).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def simhash16(documents, text_col="text", id_col="doc_id"):
    """16-bit SimHash over word tokens (bit b of md5(word), majority vote).

    16 bits keeps the operator fully expressible in both Spark SQL and the
    DuckDB oracle (hex-nibble arithmetic); the production variant is the
    same plan with 64 bits."""
    words = documents.select(
        F.col(id_col), F.explode(F.array_distinct(_words(F.col(text_col))))
        .alias("w")).filter(F.col("w") != "")
    words = words.withColumn("h", F.md5(F.col("w").cast("binary")))
    # nibble value of hex char i (1-based) of the md5
    def nib(i):
        return (F.when(F.substring("h", i, 1) >= "a",
                       F.ascii(F.substring("h", i, 1)) - 87)
                .otherwise(F.ascii(F.substring("h", i, 1)) - 48))

    cols = []
    for b in range(16):
        nibble = nib(b // 4 + 1)
        bit = F.floor(nibble / (2 ** (b % 4))) % 2
        cols.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    votes = words.groupBy(id_col).agg(*cols)
    sim = F.lit(0)
    for b in range(16):
        sim = sim + F.when(F.col(f"v{b}") > 0, 2 ** b).otherwise(0)
    return votes.select(F.col(id_col), sim.cast("long").alias("simhash")) \
        .orderBy(id_col)
