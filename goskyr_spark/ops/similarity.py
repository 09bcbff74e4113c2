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


def cosine_topk_batch(embeddings, query_ids, k=10, id_col="vec_id",
                      vec_col="embedding"):
    """BATCHED exact top-k: one corpus scan amortized over a whole
    query batch — the shape a production retrieval/dedup pass actually
    runs (Q queries against the corpus, not one).

    Plan: the Q query vectors broadcast; scores are codegen'd in the
    scan stage (corpus × Q fixed-width (query_id, vec_id, cosine)
    rows, pipelined — never materialized); a mapInPandas stage keeps a
    BOUNDED per-task candidate set (Q×k rows, trimmed per Arrow batch)
    so each input partition emits at most Q×k rows; the global
    per-query top-k then ranks only partitions×Q×k rows — a naive
    Window over the full corpus×Q score set would shuffle 10^13 rows
    at 10^10 vectors × Q=1000, this shuffles ~Q×k×partitions.

    Determinism: scores are round-6 BEFORE ranking and ties break to
    the lowest vec_id, so the result is engine-independent (DuckDB
    oracle ranks the identical rounded doubles).

    Output: (query_id, vec_id, cosine) — k rows per query, ordered."""
    import pandas as pd
    from pyspark.sql import Window

    q = (embeddings.filter(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("_q")))
    scored = (embeddings.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != F.col("query_id"))
              .select(F.col("query_id"), F.col(id_col),
                      F.round(_dot(F.col(vec_col), F.col("_q")) /
                              (_norm(F.col(vec_col)) *
                               _norm(F.col("_q"))), 6).alias("cosine")))

    n_q = len(list(query_ids))

    def partial_topk(batches):
        # bounded state: at most Q×k candidate rows carried between
        # Arrow batches; sort is (cosine desc, vec_id asc) — the same
        # tie-break the final ranking uses
        best = None
        for pdf in batches:
            cand = pdf if best is None else pd.concat((best, pdf))
            best = (cand.sort_values(["query_id", "cosine", id_col],
                                     ascending=[True, False, True])
                    .groupby("query_id", sort=False).head(k))
            if len(best) > n_q * k:  # defensive; head(k) already bounds
                best = best.head(n_q * k)
        if best is not None and len(best):
            yield best

    # id column type follows the input schema (string ids work too);
    # query_id carries the same type by construction
    id_type = embeddings.schema[id_col].dataType.simpleString()
    partial = scored.mapInPandas(
        partial_topk,
        f"query_id {id_type}, {id_col} {id_type}, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.col(id_col))
    return (partial.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .orderBy("query_id", F.desc("cosine"), id_col))


def srp_lsh_buckets(embeddings, n_planes=4, id_col="vec_id",
                    vec_col="embedding"):
    """Sign-random-projection LSH: bucket = sign bits of dot products
    against n_planes reference vectors. Deterministic and oracle-checkable
    because the 'planes' are the first n_planes stored vectors (by id) —
    at production scale they'd be seeded Gaussians broadcast to executors;
    the plan shape is identical."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes).collect()]
    return (embeddings
            .select(F.col(id_col),
                    _srp_bucket_expr(planes, vec_col).alias("bucket"))
            .orderBy(id_col))


def _srp_bucket_expr(planes, vec_col):
    """SRP bucket id as a bare Column (sign bits against the given
    plane vectors) — lets ANN candidate generators attach the bucket as
    a projection instead of joining the corpus back to a projection of
    itself (which costs two exchanges and a sort-merge join for rows
    the scan already has)."""
    bucket = F.lit(0)
    for p, vec in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in vec])
        bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0,
                                 2 ** p).otherwise(0)
    return bucket.cast("long")


def ivf_assign(embeddings, n_centroids=4, id_col="vec_id",
               vec_col="embedding"):
    """IVF coarse quantization: assign every vector to the centroid with
    the highest cosine (ties → lowest centroid id). Centroids here are
    the first n_centroids stored vectors — deterministic and
    oracle-checkable; a production deployment plugs k-means centroids
    into the same broadcast + argmax-over-columns plan. At 10^10 vectors
    the table is written partitioned by `centroid`, so an ANN probe
    scans ~1/n_centroids of the corpus (partition pruning)."""
    cents = [list(r[0]) for r in embeddings.orderBy(id_col)
             .select(vec_col).limit(n_centroids).collect()]
    return _assign_to(embeddings, cents, id_col, vec_col).orderBy(id_col)


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
    # the (id, bucket) table is tiny but feeds three consumers (the
    # keep-list and both self-join sides) — materialize it once so the
    # SRP projection over the corpus runs a single time instead of per
    # consumer (exchange reuse does not fire across the branches)
    buckets = srp_lsh_buckets(embeddings, n_planes, id_col,
                              vec_col).localCheckpoint()
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
    so the scan prunes to ~corpus/2^n_planes. A single bucket probe
    loses recall; ``ann_topk_lsh_multi`` is the production variant (L
    independent tables, union of buckets)."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes).collect()]
    with_b = embeddings.withColumn(
        "bucket", _srp_bucket_expr(planes, vec_col))
    qb = with_b.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("bucket").alias("_qb"))
    cand = with_b.join(F.broadcast(qb), F.col("bucket") == F.col("_qb")) \
        .drop("_qb", "bucket")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def srp_multi_buckets(embeddings, n_planes=4, n_tables=3, id_col="vec_id",
                      vec_col="embedding"):
    """L independent SRP tables in ONE scan: table l's planes are stored
    vectors [l·n_planes, (l+1)·n_planes) — deterministic and
    oracle-checkable; production swaps seeded Gaussians into the same
    broadcast + sign-fold plan. Output: (id, bucket_0 … bucket_{L-1})."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes * n_tables).collect()]
    cols = [F.col(id_col)]
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(x))
                            for x in planes[t * n_planes + p]])
            bucket = bucket + F.when(_dot(F.col(vec_col), arr) > 0,
                                     2 ** p).otherwise(0)
        cols.append(bucket.cast("long").alias(f"bucket_{t}"))
    return embeddings.select(*cols).orderBy(id_col)


def ann_topk_lsh_multi(embeddings, query_vec_id=0, k=10, n_planes=4,
                       n_tables=3, id_col="vec_id", vec_col="embedding"):
    """Multi-table LSH ANN: a vector is a candidate if it shares a
    bucket with the query in ANY of the L tables — recall rises with L
    (each table is an independent chance to co-bucket true neighbours)
    while the scan still prunes to ~L/2^n_planes of the corpus. All L
    bucket tests evaluate in one pass over one scan (OR filter against
    the broadcast query row)."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes * n_tables).collect()]
    with_b = embeddings
    for t in range(n_tables):
        with_b = with_b.withColumn(
            f"bucket_{t}",
            _srp_bucket_expr(planes[t * n_planes:(t + 1) * n_planes],
                             vec_col))
    q = with_b.filter(F.col(id_col) == query_vec_id).select(
        *[F.col(f"bucket_{t}").alias(f"_qb{t}") for t in range(n_tables)])
    cond = F.lit(False)
    for t in range(n_tables):
        cond = cond | (F.col(f"bucket_{t}") == F.col(f"_qb{t}"))
    cand = (with_b.crossJoin(F.broadcast(q)).filter(cond)
            .select(id_col, vec_col))
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def ann_topk_lsh_probed(embeddings, query_vec_id=0, k=10, n_planes=4,
                        hamming=1, id_col="vec_id", vec_col="embedding"):
    """Single-table MULTI-PROBE LSH: scan every bucket within the given
    Hamming distance of the query's bucket (a near-boundary vector
    differs from the query by a few plane signs — the standard
    multi-probe recall lever, complementary to multi-table). Candidate
    fraction ≈ Σ C(n_planes, d≤hamming) / 2^n_planes of the corpus; the
    probe set is a bit_count filter on the precomputed bucket column —
    partition-prunable when the table is written partitioned by
    bucket."""
    planes = [r[0] for r in embeddings.orderBy(id_col)
              .select(vec_col).limit(n_planes).collect()]
    with_b = embeddings.withColumn(
        "bucket", _srp_bucket_expr(planes, vec_col))
    qb = with_b.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("bucket").alias("_qb"))
    cand = (with_b.crossJoin(F.broadcast(qb))
            .filter(F.bit_count(F.col("bucket").bitwiseXOR(F.col("_qb")))
                    <= hamming)
            .select(id_col, vec_col))
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def ann_topk_ivf_probed(embeddings, query_vec_id=0, k=10, n_centroids=4,
                        n_probe=2, id_col="vec_id", vec_col="embedding",
                        centroids=None):
    """Multi-probe IVF ANN: scan the n_probe cells whose centroids are
    closest to the query (by cosine, ties → lowest centroid id), not
    just the query's own cell — the standard recall lever (n_probe/
    n_centroids of the corpus scanned). ``centroids`` takes trained
    vectors from ``ivf_train``; default is the first-k seed."""
    if centroids is None:
        centroids = [list(r[0]) for r in embeddings.orderBy(id_col)
                     .select(vec_col).limit(n_centroids).collect()]
    assign = _assign_to(embeddings, centroids, id_col, vec_col)
    with_c = embeddings.join(assign, id_col)
    # probe-cell selection runs the SAME left-fold cosine as the oracle
    # (a 1-row job + n_centroids-row collect — tiny by construction)
    qv = embeddings.filter(F.col(id_col) == query_vec_id)
    sims = []
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        sims.append(
            (_dot(F.col(vec_col), arr) /
             (_norm(F.col(vec_col)) * _norm(arr))).alias(f"_s{c}"))
    row = qv.select(*sims).collect()[0]
    ranked = sorted(range(len(centroids)), key=lambda c: (-row[f"_s{c}"], c))
    cells = ranked[:n_probe]
    cand = with_c.filter(F.col("centroid").isin(cells)).drop("centroid")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def _assign_to(embeddings, centroids, id_col="vec_id",
               vec_col="embedding", out_col="centroid"):
    """argmax-cosine assignment against an explicit centroid list
    (broadcast as literal arrays; ties → lowest centroid id)."""
    return embeddings.select(
        F.col(id_col),
        _argmax_cosine_expr(F.col(vec_col), centroids).alias(out_col))


def quantized(embeddings, id_col="vec_id", vec_col="embedding",
              scale=1000):
    """Integer-quantized copy of the vectors (round(v·scale) as
    integer-valued doubles). Sums of integers are EXACT in any
    aggregation order, which is what makes distributed k-means
    bit-reproducible — and lets the DuckDB oracle replay the training
    exactly."""
    return embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * scale, 0))
        .alias("qv"))


def ivf_train(embeddings, n_centroids=4, n_iter=2, id_col="vec_id",
              vec_col="embedding", scale=1000):
    """Seeded Lloyd's k-means over quantized vectors: init = first
    n_centroids stored vectors, then n_iter rounds of (argmax-cosine
    assign → per-dimension mean). Deterministic end to end: quantized
    inputs make every sum exact (order-independent), ties break to the
    lowest centroid id, empty clusters keep their previous centroid.

    Returns (centroid_vectors, stats_df) where stats_df has one row per
    (centroid, dim) with the EXACT integer sum and member count of the
    final iteration — integers, so the oracle gate is float-risk-free.
    Scale: each iteration is one argmax scan + one (k·dim)-group
    aggregation; only k·dim tiny rows ever reach the driver."""
    q = quantized(embeddings, id_col, vec_col, scale)
    cents = [list(r[0]) for r in q.orderBy(id_col)
             .select("qv").limit(n_centroids).collect()]
    stats = None
    for _ in range(n_iter):
        # assignment is a pure projection of q — attach it inline
        # instead of joining q back to a projection of itself. Two
        # select steps: a generator's sibling expressions land in the
        # Project ABOVE the Generate, so a one-step select would
        # re-evaluate the argmax once per EXPLODED row (dim× the work)
        exploded = (q.select(
            _argmax_cosine_expr(F.col("qv"), cents).alias("centroid"),
            "qv")
            .select("centroid", F.posexplode("qv").alias("i", "v")))
        stats = (exploded.groupBy("centroid", "i")
                 .agg(F.sum("v").cast("long").alias("sum_v"),
                      F.count("*").alias("n_members"))
                 .orderBy("centroid", "i"))
        rows = stats.collect()
        new = {}
        for r in rows:
            new.setdefault(int(r["centroid"]), {})[int(r["i"])] = \
                r["sum_v"] / r["n_members"]
        cents = [
            [new[c][i] for i in range(len(cents[c]))] if c in new
            else cents[c]
            for c in range(n_centroids)]
    return cents, stats


def _argmax_cosine_expr(v, centroids):
    """argmax-cosine of expression ``v`` against a literal centroid
    list, as a bare Column. array_position of the array max finds the
    FIRST maximum — ties to the lowest centroid id, identical to a
    strictly-greater scan, but the expression stays LINEAR in the
    number of centroids (a when-chain duplicates the running max
    exponentially and overflows the JVM expression tree past ~8)."""
    sims = []
    for cent in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cent])
        sims.append(_dot(v, arr) / (_norm(v) * _norm(arr)))
    sarr = F.array(*sims)
    return (F.array_position(sarr, F.array_max(sarr)) - 1).cast("long")


def pq_train(embeddings, m=2, n_centroids=4, n_iter=2, id_col="vec_id",
             vec_col="embedding", scale=1000):
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces and a seeded Lloyd's k-means (ivf_train —
    quantized inputs, bit-reproducible) runs per subspace. Returns
    (codebooks, stats_df): codebooks[s] = n_centroids centroid
    subvectors; stats_df = one row per (subspace, centroid, dim) with
    the final iteration's EXACT integer sum + member count — the
    float-risk-free oracle gate, same contract as sim_ivf_train.

    Scale: all m subspaces train JOINTLY — each Lloyd's iteration is
    ONE scan that computes every subspace's argmax assignment and ONE
    (m·k·d_sub)-group aggregation/collect, instead of m independent
    per-subspace training loops (m× fewer jobs, identical math: the
    per-subspace sums are exact integers and the assignments are the
    same expressions on the same slices — quantization commutes with
    slicing elementwise)."""
    dim = len(embeddings.orderBy(id_col).select(vec_col).first()[0])
    d_sub = dim // m
    q = quantized(embeddings, id_col, vec_col, scale)
    seed_rows = [list(r[0]) for r in q.orderBy(id_col)
                 .select("qv").limit(n_centroids).collect()]
    books = [[row[s * d_sub:(s + 1) * d_sub] for row in seed_rows]
             for s in range(m)]
    stats = None
    for _ in range(n_iter):
        parts = F.array(*[
            F.struct(
                F.lit(s).cast("long").alias("subspace"),
                _argmax_cosine_expr(
                    F.slice(F.col("qv"), s * d_sub + 1, d_sub),
                    books[s]).alias("centroid"),
                F.slice(F.col("qv"), s * d_sub + 1, d_sub).alias("v"))
            for s in range(m)])
        exploded = (q.select(F.explode(parts).alias("p"))
                    .select("p.subspace", "p.centroid",
                            F.posexplode("p.v").alias("i", "v")))
        stats = (exploded.groupBy("subspace", "centroid", "i")
                 .agg(F.sum("v").cast("long").alias("sum_v"),
                      F.count("*").alias("n_members"))
                 .orderBy("subspace", "centroid", "i"))
        new = {}
        for r in stats.collect():
            new.setdefault(
                (int(r["subspace"]), int(r["centroid"])), {})[
                int(r["i"])] = r["sum_v"] / r["n_members"]
        books = [
            [[new[(s, c)][i] for i in range(d_sub)]
             if (s, c) in new else books[s][c]
             for c in range(n_centroids)]
            for s in range(m)]
    return books, stats


def ann_topk_pq(embeddings, books, query_vec_id=0, k=10,
                id_col="vec_id", vec_col="embedding"):
    """PQ asymmetric-distance ANN: each vector is represented by its
    per-subspace nearest-centroid code (computed in ONE projection —
    cosine is scale-invariant, so assigning the original subvectors
    against the quantized-space codebooks is exact), and the score is
    the sum of the query's precomputed per-(subspace, centroid)
    cosines looked up by code — the classic ADC table scan: per row
    O(m) work instead of O(dim), and the codes column is all a scan
    needs at 100 TB (8 bits per subspace instead of 4·dim bytes).

    Determinism contract with the oracle: each table entry is the
    round-6 cosine (same ascending fold both engines), the final score
    is round-6 of the sum, ties break to the lowest vec_id."""
    import math

    d_sub = len(books[0][0])
    qvec = embeddings.filter(F.col(id_col) == query_vec_id) \
        .select(vec_col).first()[0]

    def pycos(a, b):
        # mirrors the SQL/Spark fold: ascending product sum from 0.0
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    v = F.col(vec_col)
    score = F.lit(0.0)
    for s, book in enumerate(books):
        sub = F.slice(v, s * d_sub + 1, d_sub)
        code = _argmax_cosine_expr(sub, book)
        qsub = list(qvec)[s * d_sub:(s + 1) * d_sub]
        sims = [pycos(qsub, c) for c in book]
        # ADC table lookup via element_at on a LITERAL sims array — the
        # expression stays constant-size in the codebook width (a
        # when-chain is O(n_centroids) nodes per subspace, which at the
        # production k=256 × m codebooks bloats the JVM expression
        # tree; same trick as _argmax_cosine_expr). code is always in
        # [0, len(book)) by construction (array_position >= 1).
        sims_arr = F.array(*[F.lit(float(x)) for x in sims])
        score = score + F.element_at(sims_arr,
                                     (code + 1).cast("int"))
    return (embeddings.filter(F.col(id_col) != query_vec_id)
            .select(F.col(id_col), F.round(score, 6).alias("adc_score"))
            .orderBy(F.desc("adc_score"), id_col).limit(k))


def ann_topk_pq_rerank(embeddings, books, query_vec_id=0, k=10,
                       shortlist=100, id_col="vec_id",
                       vec_col="embedding"):
    """Production PQ search: ADC shortlist then EXACT cosine re-rank.
    The code-table scan (O(m) per row) prunes the corpus to
    ``shortlist`` candidates; only those pay the exact O(dim) cosine —
    at 100 TB that is the difference between scanning codes (bytes per
    vector) and scanning vectors. On the synthetic corpus this lifts
    recall@10 from 1-4 (pure ADC — the corpus has no cluster structure,
    the worst case for PQ) to 7-9 of 10."""
    cand = ann_topk_pq(embeddings, books, query_vec_id, k=shortlist,
                       id_col=id_col, vec_col=vec_col) \
        .select(id_col)
    qvec = embeddings.filter(F.col(id_col) == query_vec_id) \
        .select(vec_col).first()[0]
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    v = F.col(vec_col)
    cosine = F.round(_dot(v, qarr) / (_norm(v) * _norm(qarr)), 6)
    return (embeddings.join(F.broadcast(cand), id_col)
            .select(F.col(id_col), cosine.alias("cosine"))
            .orderBy(F.desc("cosine"), id_col).limit(k))


def pq_index(embeddings, books, id_col="vec_id", vec_col="embedding"):
    """Materializable PQ code table: one row per vector with its
    per-subspace nearest-centroid code — (vec_id, code_0..code_{m-1}).

    This is the build-once half of indexed PQ search (mirrors
    dedup.minhash_index): codes are computed from the full vectors in a
    single map-only projection and persisted; every subsequent query
    scans ONLY this table (m bytes of codes per vector instead of
    4·dim), which is the whole point of PQ at 100 TB. ann_topk_pq by
    contrast recomputes codes from full vectors on every query — fine
    as a demo, wrong as a production plan."""
    d_sub = len(books[0][0])
    v = F.col(vec_col)
    cols = [F.col(id_col)]
    for s, book in enumerate(books):
        sub = F.slice(v, s * d_sub + 1, d_sub)
        cols.append(_argmax_cosine_expr(sub, book).alias(f"code_{s}"))
    return embeddings.select(*cols)


def ann_topk_pq_indexed(codes, books, qvec, query_vec_id=0, k=10,
                        id_col="vec_id"):
    """ADC top-k over a persisted PQ code table (from ``pq_index``):
    the scan touches only the integer code columns — the embeddings
    column never appears in the plan (plan-asserted in
    tests/test_plans.py). ``qvec`` is the raw query vector (a 1-row
    driver-side lookup by the caller — the one place the full vector
    is still needed).

    Same determinism contract as ann_topk_pq: per-(subspace, centroid)
    cosines are round-6, the final score is round-6 of their sum, ties
    break to the lowest vec_id — so the indexed and unindexed paths
    return identical rows."""
    import math

    d_sub = len(books[0][0])

    def pycos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    score = F.lit(0.0)
    for s, book in enumerate(books):
        qsub = list(qvec)[s * d_sub:(s + 1) * d_sub]
        sims = [pycos(qsub, c) for c in book]
        sims_arr = F.array(*[F.lit(float(x)) for x in sims])
        score = score + F.element_at(
            sims_arr, (F.col(f"code_{s}") + 1).cast("int"))
    return (codes.filter(F.col(id_col) != query_vec_id)
            .select(F.col(id_col), F.round(score, 6).alias("adc_score"))
            .orderBy(F.desc("adc_score"), id_col).limit(k))


def ivfpq_index(embeddings, centroids, books, id_col="vec_id",
                vec_col="embedding"):
    """The IVF-PQ composite index — the actual 100 TB ANN shape: ONE
    persisted table with a row per vector carrying its coarse IVF cell
    AND its per-subspace PQ codes, (vec_id, centroid, code_0..code_m-1).
    Built in a single map-only projection over the embeddings scan
    (argmax-cosine coarse assign + per-subspace argmax-cosine codes);
    at scale it is written PARTITIONED BY centroid, so a probe reads
    only the probed cells' files and only integer code columns —
    m + ~1 bytes per vector instead of 4·dim.
    """
    d_sub = len(books[0][0])
    v = F.col(vec_col)
    cols = [F.col(id_col),
            _argmax_cosine_expr(v, centroids).alias("centroid")]
    for s, book in enumerate(books):
        sub = F.slice(v, s * d_sub + 1, d_sub)
        cols.append(_argmax_cosine_expr(sub, book).alias(f"code_{s}"))
    return embeddings.select(*cols)


def ivfpq_probe_cells(embeddings, centroids, query_vec_id=0, n_probe=2,
                      id_col="vec_id", vec_col="embedding"):
    """Top-``n_probe`` coarse cells by query-centroid cosine (ties →
    lowest centroid id) — a 1-row job + n_centroids-row driver sort,
    tiny by construction (the same probe-selection contract as
    ann_topk_ivf_probed)."""
    qv = embeddings.filter(F.col(id_col) == query_vec_id)
    sims = []
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        sims.append(
            (_dot(F.col(vec_col), arr) /
             (_norm(F.col(vec_col)) * _norm(arr))).alias(f"_s{c}"))
    row = qv.select(*sims).collect()[0]
    ranked = sorted(range(len(centroids)),
                    key=lambda c: (-row[f"_s{c}"], c))
    return ranked[:n_probe]


def ann_topk_ivfpq_indexed(index, books, qvec, cells, embeddings,
                           query_vec_id=0, k=10, shortlist=100,
                           id_col="vec_id", vec_col="embedding"):
    """ANN over the persisted IVF-PQ index: the probe plan is

      1. scan ONLY the probed cells' index rows (``centroid IN cells``
         — a partition-pruning predicate when the index is written
         partitioned by centroid) — integer codes only, the embeddings
         column never appears in this scan (plan-asserted in
         tests/test_plans.py);
      2. ADC-score those rows by code-table lookup (O(m) per row,
         round-6 per-(subspace, centroid) cosines, same determinism
         contract as ann_topk_pq_indexed) and keep the top
         ``shortlist``;
      3. exact cosine re-rank of only the shortlist against the full
         vectors (a broadcast semi-join fetch of ``shortlist`` rows).

    This composes the three persisted-index pieces (ivf cells, pq
    codes, rerank) into the one table + one probe a production
    deployment ships."""
    import math

    d_sub = len(books[0][0])

    def pycos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    score = F.lit(0.0)
    for s, book in enumerate(books):
        qsub = list(qvec)[s * d_sub:(s + 1) * d_sub]
        sims = [pycos(qsub, c) for c in book]
        sims_arr = F.array(*[F.lit(float(x)) for x in sims])
        score = score + F.element_at(
            sims_arr, (F.col(f"code_{s}") + 1).cast("int"))
    short = (index
             .filter(F.col("centroid").isin(list(cells)))
             .filter(F.col(id_col) != query_vec_id)
             .select(F.col(id_col), F.round(score, 6).alias("adc_score"))
             .orderBy(F.desc("adc_score"), id_col).limit(shortlist)
             .select(id_col))
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    v = F.col(vec_col)
    cosine = F.round(_dot(v, qarr) / (_norm(v) * _norm(qarr)), 6)
    return (embeddings.join(F.broadcast(short), id_col)
            .select(F.col(id_col), cosine.alias("cosine"))
            .orderBy(F.desc("cosine"), id_col).limit(k))


def ann_topk_lsh_indexed(embeddings, buckets, query_vec_id=0, k=10,
                         id_col="vec_id", vec_col="embedding"):
    """ANN over a PERSISTED SRP bucket table (from ``srp_lsh_buckets``,
    stored once like dedup's minhash_index / pq_index): the per-query
    plan never recomputes bucket assignments — it looks up the query's
    bucket in the index, semi-joins the index down to that bucket's
    ids, and only then touches the embeddings of those candidates. At
    10^10 vectors the bucket table is partitioned by ``bucket``, so the
    probe is a partition-pruned scan of corpus/2^n_planes ids; the
    recompute variant (``ann_topk_lsh``) re-dots every stored vector
    against every plane on every query. Rows are identical to the
    recompute path (same bucket function, same tie-breaks)."""
    qb = buckets.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("bucket").alias("_qb"))
    cand_ids = (buckets.join(F.broadcast(qb),
                             F.col("bucket") == F.col("_qb"))
                .select(id_col))
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)


def ann_topk_ivf_indexed(embeddings, assign, query_vec_id=0, k=10,
                         id_col="vec_id", vec_col="embedding"):
    """ANN over a PERSISTED IVF assignment table (from ``ivf_assign``):
    same contract as ``ann_topk_lsh_indexed`` — the per-query plan
    reads the assignment index (partition-pruned by ``centroid`` at
    scale) and fetches only the probed cell's vectors, instead of
    re-quantizing the whole corpus per query like ``ann_topk_ivf``.
    Row-identical to the recompute path."""
    qc = assign.filter(F.col(id_col) == query_vec_id) \
        .select(F.col("centroid").alias("_qc"))
    cand_ids = (assign.join(F.broadcast(qc),
                            F.col("centroid") == F.col("_qc"))
                .select(id_col))
    cand = embeddings.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)
