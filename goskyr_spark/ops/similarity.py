"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the LSH/IVF
variants are the scale path — both prune the candidate set so the
exact dot products run on a fraction of the corpus.

All dot products run JVM-side (zip_with + aggregate over the array,
cast to double first so Spark and the DuckDB oracle do the identical
IEEE-754 left-fold)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(embeddings, query_vec_id=0, k=10, id_col="vec_id",
                vec_col="embedding"):
    """Exact top-k by cosine similarity against one stored vector.

    Scale: one broadcast of the query vector (scalar subquery via
    crossJoin of a 1-row df), a full scan with codegen'd dot products,
    and a k-row total sort — no shuffle of the corpus itself."""
    q = embeddings.filter(F.col(id_col) == query_vec_id) \
        .select(F.col(vec_col).alias("_q"))
    scored = (embeddings.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != query_vec_id)
              .select(
                  F.col(id_col),
                  F.round(_dot(F.col(vec_col), F.col("_q")) /
                          (_norm(F.col(vec_col)) * _norm(F.col("_q"))),
                          6).alias("cosine")))
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def srp_lsh_buckets(embeddings, n_planes=4, id_col="vec_id",
                    vec_col="embedding"):
    """Sign-random-projection LSH: bucket = sign bits of dot products
    against n_planes reference vectors. Deterministic and oracle-checkable
    because the 'planes' are the first n_planes stored vectors (by id) —
    at production scale they'd be seeded Gaussians broadcast to executors;
    the plan shape is identical."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes).collect()]
    bucket = F.lit(0)
    for p, vec in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in vec])
        bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0,
                                 2 ** p).otherwise(0)
    return (embeddings
            .select(F.col(id_col), bucket.cast("long").alias("bucket"))
            .orderBy(id_col))


def ivf_assign(embeddings, n_centroids=4, id_col="vec_id",
               vec_col="embedding"):
    """IVF coarse quantization: assign every vector to the centroid with
    the highest cosine (ties → lowest centroid id). Centroids here are
    the first n_centroids stored vectors — deterministic and
    oracle-checkable; a production deployment plugs k-means centroids
    into the same broadcast + argmax-over-columns plan. At 10^10 vectors
    the table is written partitioned by `centroid`, so an ANN probe
    scans ~1/n_centroids of the corpus (partition pruning)."""
    cents = [r[0] for r in embeddings.orderBy(id_col)
             .select(vec_col).limit(n_centroids).collect()]
    v = F.col(vec_col)
    sims = []
    for c in cents:
        arr = F.array(*[F.lit(float(x)) for x in c])
        sims.append(_dot(v, arr) / (_norm(v) * _norm(arr)))
    best, best_s = F.lit(0), sims[0]
    for i in range(1, len(sims)):
        gt = sims[i] > best_s
        best = F.when(gt, i).otherwise(best)
        best_s = F.when(gt, sims[i]).otherwise(best_s)
    return (embeddings
            .select(F.col(id_col), best.cast("long").alias("centroid"))
            .orderBy(id_col))


def ann_topk_ivf(embeddings, query_vec_id=0, k=10, n_centroids=4,
                 id_col="vec_id", vec_col="embedding"):
    """ANN via IVF: exact cosine top-k restricted to the query's
    centroid cell (n_probe=1). Same pruning contract as ann_topk_lsh
    with a different candidate generator."""
    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col)
    with_c = embeddings.join(assign, id_col)
    qc = with_c.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("centroid").alias("_qc"))
    cand = with_c.join(F.broadcast(qc), F.col("centroid") == F.col("_qc")) \
        .drop("_qc", "centroid")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def embed_near_dup_pairs(embeddings, threshold=0.3, n_planes=4,
                         id_col="vec_id", vec_col="embedding",
                         max_bucket=None):
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: candidate
    pairs only form WITHIN an SRP bucket (expected corpus/2^n_planes of
    the corpus each — never an all-pairs join), then exact cosine
    verifies. The scale story is identical to MinHash-LSH banding: the
    bucket join is the candidate generator, the dot product the
    verifier.

    ``max_bucket`` is the skew guard (the max_df analog): one skewed SRP
    bucket — near-identical embeddings, e.g. boilerplate pages — would
    otherwise pay d² inside the bucket join. Buckets with more than
    max_bucket members leave the candidate universe (they ARE a dup
    class; enumerating every pair inside one is the quadratic blow-up,
    not new information — handle such classes by keeper-election per
    bucket instead)."""
    buckets = srp_lsh_buckets(embeddings, n_planes, id_col, vec_col)
    if max_bucket is not None:
        keep = (buckets.groupBy("bucket")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") <= max_bucket).select("bucket"))
        buckets = buckets.join(keep, "bucket")
    e = embeddings.join(buckets, id_col)
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
                 "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
                 "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(_dot(F.col("_va"), F.col("_vb")) /
                            (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                            6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .orderBy("id_a", "id_b"))


def ann_topk_lsh(embeddings, query_vec_id=0, k=10, n_planes=4,
                 id_col="vec_id", vec_col="embedding"):
    """ANN: restrict the exact cosine scan to the query's LSH bucket.

    At 10^10 vectors the bucket column is precomputed + partitioned-by,
    so the scan prunes to ~corpus/2^n_planes."""
    buckets = srp_lsh_buckets(embeddings, n_planes, id_col, vec_col)
    with_b = embeddings.join(buckets, id_col)
    qb = with_b.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("bucket").alias("_qb"))
    cand = with_b.join(F.broadcast(qb), F.col("bucket") == F.col("_qb")) \
        .drop("_qb", "bucket")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)
