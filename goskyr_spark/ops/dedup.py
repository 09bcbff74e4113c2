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


def _bind(col, fn):
    """Evaluate ``col`` once per row and feed the VALUE to ``fn``
    (higher-order-function variable binding): an expression referenced
    inside a Spark lambda is re-evaluated per array element — no
    common-subexpression elimination crosses the lambda boundary — so
    e.g. slicing a split() inside a per-shingle lambda re-tokenizes the
    whole document for every shingle (measured 6.5x on the sf0.1
    corpus). Binding via a single-element transform materializes the
    value once."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _words(col):
    return F.split(F.trim(col), r"\s+")


def shingles_expr(text_col="text", n=3):
    """Distinct word n-gram shingles as an array column (JVM-side).

    Documents with fewer than n words yield ZERO shingles (not one
    truncated shingle) — this matches the DuckDB oracle's comprehension
    `range(1, greatest(len(w)-(n-1),0)+1)` so the value-hash gate holds
    on corpora containing short documents.

    The word split is BOUND ONCE via a single-element transform: a
    naive `slice(split(text), i, n)` inside the per-shingle lambda
    re-tokenizes the whole document for every shingle (no common-
    subexpression elimination across a lambda boundary) — measured
    6.5x slower on the sf0.1 corpus, identical output."""
    def build(w):
        full = F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
        return F.array_distinct(
            F.when(F.size(w) >= n, full)
            .otherwise(F.array().cast("array<string>")))

    return _bind(_words(F.col(text_col)), build)


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


# Universal affine permutation family over a 48-bit base hash:
# sig_k(S) = min over shingles of (A[k]*base + B[k]) mod P, with
# base = first 48 bits of md5(shingle). Exact in 64-bit integer math:
# A < 2^15 and base < 2^48 keep A*base+B below 2^63 — no overflow in
# either Spark or the DuckDB oracle. ONE md5 per shingle; the
# permutations are codegen'd multiply-adds.
#
# MINHASH_A/B are the FROZEN first-8 constants (the 8-perm catalog
# oracle replays them verbatim — they must never change);
# ``minhash_params`` extends the family to ANY width deterministically
# for production-width signatures (~128 perms at web scale).
MINHASH_P = 281474976710597          # largest prime < 2^48
MINHASH_A = [24593, 12289, 5279, 30011, 18913, 7151, 4793, 28411]
MINHASH_B = [(k + 1) * 2654435761 for k in range(8)]

_M64 = (1 << 64) - 1


def _splitmix64(x):
    """SplitMix64 finalizer — the standard seed-expansion mixer."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def minhash_params(num_perm, seed=0x6D696E68):
    """(A, B) lists of length ``num_perm`` for the affine family.

    The first 8 entries ARE the frozen MINHASH_A/B constants (so every
    8-perm signature — and its pinned DuckDB oracle — is unchanged at
    any width); entries beyond 8 are derived with SplitMix64 from
    (seed, k): A[k] in [1, 2^15) keeps A·base+B < 2^63 (the documented
    overflow-proof bound — max A·(2^48−1)+B < 2^63 since A ≤ 32767 and
    B < P), B[k] in [0, P). Deterministic: same seed → same family on
    every run, every machine."""
    A, B = list(MINHASH_A[:num_perm]), list(MINHASH_B[:num_perm])
    for k in range(8, num_perm):
        A.append(int(_splitmix64((seed << 32) | (2 * k))) % 32747 + 1)
        B.append(int(_splitmix64((seed << 32) | (2 * k + 1))) % MINHASH_P)
    assert len(set(zip(A, B))) == len(A), "degenerate affine family"
    return A, B


def minhash_signatures(documents, text_col="text", id_col="doc_id",
                       num_perm=8, shingle_n=3):
    """MinHash signature per doc: sig_k = min((A[k]*base+B[k]) mod P),
    base = conv(substr(md5(shingle),1,12),16,10).

    Any ``num_perm`` is supported (affine family from minhash_params);
    the per-perm mins are map-side-combined fixed-width longs, so a
    128-perm signature shuffle carries 1 KB/doc regardless of text
    size. ONE md5 per shingle at any width."""
    A, B = minhash_params(num_perm)
    sh = documents.select(F.col(id_col),
                          F.explode(shingles_expr(text_col, shingle_n))
                          .alias("shingle"))
    base = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 12),
                  16, 10).cast("long")
    sh = sh.select(id_col, base.alias("h"))
    aggs = [F.min((F.lit(A[k]) * F.col("h") + F.lit(B[k]))
                  % F.lit(MINHASH_P)).alias(f"sig_{k}")
            for k in range(num_perm)]
    return sh.groupBy(id_col).agg(*aggs)


def _banded(documents, text_col, id_col, num_perm, band_size, shingle_n):
    """(id, band_id, band_sig) rows — single-pass banding: ONE select
    emits all bands as an array of structs + explode, so the signature
    aggregation (shingle explode + num_perm-way min) runs exactly once,
    instead of once per band as a union of re-derived branches would."""
    sigs = minhash_signatures(documents, text_col, id_col, num_perm,
                              shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("|", *[F.col(f"sig_{k}")
                               for k in range(b * band_size,
                                              (b + 1) * band_size)])
            .alias("band_sig"))
        for b in range(num_perm // band_size)])
    return (sigs.select(F.col(id_col), F.explode(band_structs).alias("bs"))
            .select(id_col, F.col("bs.band_id").alias("band_id"),
                    F.col("bs.band_sig").alias("band_sig")))


def minhash_lsh_buckets(documents, text_col="text", id_col="doc_id",
                        num_perm=8, band_size=2, shingle_n=3):
    """LSH banding: docs sharing a band signature are near-dup candidates.

    Output one row per (band_id, band_sig) bucket with ≥2 docs — at scale
    the candidate-pair join happens per bucket, never across the corpus.

    Memory note: ``candidates`` is a collect_list — unbounded per key. A
    degenerate corpus (one giant dup class) concentrates the whole class
    in one aggregation buffer; ``minhash_lsh_buckets_capped`` is the
    production guard (count-gated collect, NULL list above the cap)."""
    allb = _banded(documents, text_col, id_col, num_perm, band_size,
                   shingle_n)
    return (allb.groupBy("band_id", "band_sig")
            .agg(F.sort_array(F.collect_list(id_col)).alias("candidates"),
                 F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
            .orderBy("band_id", "band_sig"))


def minhash_lsh_buckets_capped(documents, text_col="text", id_col="doc_id",
                               num_perm=8, band_size=2, shingle_n=3,
                               max_bucket=64):
    """LSH banding with a bucket-size guard (the max_df analog for
    candidate lists): buckets with more than ``max_bucket`` members
    report (band_id, band_sig, '', n_docs) instead of materializing
    the member list — a degenerate all-dups corpus can no longer OOM the
    collect_list task; downstream treats '' as "dup class, handle via
    its own partition-parallel pass". ('' not NULL so the value-hash
    oracle gate stays NULL-free.)

    Plan: ONE pass — a bucket-count window over the banded exchange
    gates a conditional collect_list (null above the cap, and
    collect_list skips nulls, so a degenerate bucket's aggregation
    buffer stays EMPTY — the memory guard is unchanged). The window and
    the aggregation share one (band_id, band_sig) exchange, so the
    shingle+signature aggregation runs exactly once. (The previous
    three-branch count/join/union form re-computed the full signature
    pass per branch: ReuseExchange does not fire across the branches —
    measured 3 parquet scans and 3 signature aggregations per run.)"""
    from pyspark.sql import Window

    allb = _banded(documents, text_col, id_col, num_perm, band_size,
                   shingle_n)
    w = Window.partitionBy("band_id", "band_sig")
    return (allb
            .withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") >= 2)
            .groupBy("band_id", "band_sig")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list(
                F.when(F.col("_n") <= max_bucket, F.col(id_col)))))
                .alias("candidates"),
                F.count("*").alias("n_docs"))
            .orderBy("band_id", "band_sig"))


def minhash_index(documents, text_col="text", id_col="doc_id",
                  num_perm=8, band_size=2, shingle_n=3):
    """Persistable LSH index of a corpus: (doc_id, band_id, band_sig)
    rows — write this once per corpus generation, then dedup every new
    ingest batch against it with ``dedup_incremental`` WITHOUT
    re-scanning corpus text. At scale, store it bucketed/partitioned by
    band_sig so the incremental join is co-located."""
    return _banded(documents, text_col, id_col, num_perm, band_size,
                   shingle_n)


def dedup_incremental(new_docs, index, text_col="text", id_col="doc_id",
                      num_perm=8, band_size=2, shingle_n=3,
                      max_bucket=None):
    """Rolling-ingest near-dup detection: flag documents in a NEW batch
    that LSH-collide with an EXISTING corpus, using only the corpus's
    ``minhash_index`` — the corpus text is never touched. This is the
    operation a continuous crawl needs every cycle (dedup this week's
    pages against everything already kept).

    Scale: one banding pass over the new batch (small), one join on
    (band_id, band_sig) against the persisted index. With the index
    partitioned by band_sig the shuffle moves only the batch side; AQE
    broadcasts it outright when it fits. ``max_bucket`` drops degenerate
    index band-sigs (stopword-class bands whose bucket holds a large
    fraction of the corpus) so one new row cannot fan out into millions
    of index rows.

    Returns (doc_id, n_corpus_matches, best_bands): distinct corpus docs
    collided with, and the max per-corpus-doc band agreement (out of
    num_perm // band_size — a monotone proxy for estimated Jaccard).
    Docs with no collision are absent; for the exact-verify production
    step, semi-join corpus text down to the listed corpus ids and run
    ngram_jaccard_pairs on that pruned slice."""
    newb = _banded(new_docs, text_col, id_col, num_perm, band_size,
                   shingle_n)
    idx = index.select(F.col(id_col).alias("_corpus_id"),
                       "band_id", "band_sig")
    if max_bucket is not None:
        keep = (idx.groupBy("band_id", "band_sig")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") <= max_bucket)
                .drop("_n"))
        idx = idx.join(keep, ["band_id", "band_sig"])
    hits = (newb.join(idx, ["band_id", "band_sig"])
            .groupBy(id_col, "_corpus_id")
            .agg(F.count_distinct("band_id").alias("n_bands")))
    return (hits.groupBy(id_col)
            .agg(F.count("*").alias("n_corpus_matches"),
                 F.max("n_bands").alias("best_bands"))
            .orderBy(id_col))


def dedup_incremental_verified(new_docs, corpus_docs, index=None,
                               text_col="text", id_col="doc_id",
                               num_perm=8, band_size=2, shingle_n=3,
                               threshold=0.5, max_bucket=None):
    """The exact-verify production step after ``dedup_incremental``:
    LSH candidates → exact n-gram Jaccard per (new, corpus) pair.

    Scale: the candidate pair set is SMALL (LSH collisions only), so
    joining it first prunes the corpus text scan to just collided docs
    (broadcast/DPP-prunable) — the full corpus text is never shingled,
    only candidates are. Per pair, Jaccard is a codegen'd
    array_intersect over the two shingle arrays: no explode, no
    shuffle beyond the two pruned joins.

    Returns (doc_id, corpus_id, jaccard) for pairs ≥ threshold."""
    if index is None:
        index = minhash_index(corpus_docs, text_col, id_col, num_perm,
                              band_size, shingle_n)
    newb = _banded(new_docs, text_col, id_col, num_perm, band_size,
                   shingle_n)
    idx = index.select(F.col(id_col).alias("_corpus_id"),
                       "band_id", "band_sig")
    if max_bucket is not None:
        keep = (idx.groupBy("band_id", "band_sig")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") <= max_bucket)
                .drop("_n"))
        idx = idx.join(keep, ["band_id", "band_sig"])
    pairs = (newb.join(idx, ["band_id", "band_sig"])
             .select(id_col, "_corpus_id").distinct())
    a = new_docs.select(F.col(id_col),
                        shingles_expr(text_col, shingle_n).alias("_sh_a"))
    b = corpus_docs.select(F.col(id_col).alias("_corpus_id"),
                           shingles_expr(text_col, shingle_n)
                           .alias("_sh_b"))
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    uni = F.size("_sh_a") + F.size("_sh_b") - inter
    return (pairs.join(a, id_col).join(b, "_corpus_id")
            .select(F.col(id_col),
                    F.col("_corpus_id").alias("corpus_id"),
                    F.round(inter / uni, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy(id_col, "corpus_id"))


def ngram_jaccard_pairs(documents, text_col="text", id_col="doc_id",
                        threshold=0.5, shingle_n=3, max_df=None):
    """Exact Jaccard over word n-gram shingle SETS for pairs sharing at
    least one shingle (inverted-index join, not a cartesian product).

    Scale: explode → self-join on shingle → pair-count aggregation.
    Skewed shingles (stopword-only n-grams) are the hazard: a shingle
    appearing in d documents contributes d² join rows. ``max_df`` caps
    the document frequency — shingles with df > max_df are removed from
    the shingle UNIVERSE (both the intersection join and the set sizes),
    so the result is the exact Jaccard over the reduced universe and the
    join cost is bounded by max_df² per shingle. At web scale a cap of
    a few hundred drops only stopword-class shingles."""
    sh = documents.select(
        F.col(id_col), F.explode(shingles_expr(text_col, shingle_n))
        .alias("shingle"))
    # inverted index: one groupBy(shingle) builds per-shingle posting
    # lists; pairs are GENERATED from each list (i<j combinations via
    # two pipelined explodes — see below) instead of a self-join — one
    # shuffle of the postings replaces the sort-merge join of two full
    # explode branches. AQE reuses the groupBy exchange for the sizes
    # branch. Ubiquitous shingles (posting list > max_df) leave the
    # universe with a plain filter — the skew guard costs nothing.
    buckets = (sh.groupBy("shingle")
               .agg(F.sort_array(F.collect_list(id_col)).alias("ids")))
    if max_df is not None:
        # the kept posting lists feed BOTH the pair generator and the
        # reduced-universe set sizes (which the final join consumes
        # twice, as n_a and n_b) — materialize them once: without it
        # each consumer re-runs the full shingle explode + index
        # aggregation (measured: 3 corpus scans per run; exchange
        # reuse does not fire across the branches)
        buckets = buckets.filter(F.size("ids") <= max_df) \
            .localCheckpoint()
        sizes = (buckets.select(F.explode("ids").alias(id_col))
                 .groupBy(id_col).agg(F.count("*").alias("n_sh")))
    else:
        # uncapped: the set size is a per-doc column expression — no
        # second pass over the postings at all
        sizes = documents.select(
            F.col(id_col),
            F.size(shingles_expr(text_col, shingle_n)).alias("n_sh"))
    # pair generation is CHUNKED: posexplode the posting list first
    # (one row per left element), then explode that row's right-side
    # slice. Both explodes pipeline through codegen into the partial
    # aggregation, so peak memory per task is O(|posting list|), not the
    # O(d²) a single flattened pair array would materialize in one row —
    # a stopword-class shingle with df in the tens of thousands streams
    # ~10^8 pairs through the hash aggregate (spillable) instead of
    # building billions of structs in a single row.
    lefts = (buckets.filter(F.size("ids") >= 2)
             .select(F.col("ids"),
                     F.posexplode("ids").alias("i", "id_a")))
    inter = (lefts
             .select(F.col("id_a"),
                     F.explode(F.slice(
                         F.col("ids"), F.col("i") + 2,
                         F.greatest(F.size("ids") - F.col("i") - 1,
                                    F.lit(0)))).alias("id_b"))
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


def dup_components(pairs, id_a="id_a", id_b="id_b", max_iter=50):
    """Connected components over near-dup pairs → (doc_id, component)
    with component = min doc id in the class (the keeper). This is the
    step that turns pairwise near-dup evidence into an actionable
    keep/drop list.

    Algorithm: iterative min-label propagation — each round every node
    takes min(own label, neighbours' labels); converges in O(component
    diameter) rounds (dup classes are near-cliques from LSH banding, so
    diameters are tiny in practice). Each iteration is one join + one
    groupBy on the edge list — no driver-side graph. Deterministic:
    labels are integer mins."""
    edges = pairs.select(F.col(id_a).alias("src"),
                         F.col(id_b).alias("dst"))
    # localCheckpoint (not cache): an iterative plan that only CACHES
    # still nests the full upstream plan into every iteration's logical
    # tree — the tree doubles per round and a few rounds after a heavy
    # pair generator the driver OOMs just RENDERING it. Checkpointing
    # truncates the lineage so each round's plan is O(one iteration).
    # (On a real cluster prefer spark.sparkContext.setCheckpointDir +
    # .checkpoint() for executor-loss resilience; same semantics.)
    # pre-partition the (bigger) edge side by its join key ONCE: the
    # per-iteration propagate join then reuses sym's partitioning and
    # only the (small) label table moves; the single per-iteration
    # exchange left is the groupBy(src) aggregation
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst"))) \
        .repartition("dst").localCheckpoint()
    labels = (sym.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))).localCheckpoint()
    changed = None
    for it in range(max_iter):
        prop = (sym.join(labels, sym["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("component").alias("nbr_min")))
        # the convergence flag rides along in the SAME join that builds
        # the new labels (nbr_min < old component ⇔ the label moved), so
        # detecting a fixpoint is a filter-count over the checkpointed
        # result instead of a separate old-vs-new join job
        new_labels = (labels.join(prop, labels["node"] == prop["src"],
                                  "left")
                      .select(F.col("node"),
                              F.least(F.col("component"),
                                      F.coalesce(F.col("nbr_min"),
                                                 F.col("component")))
                              .alias("component"),
                              (F.col("nbr_min") < F.col("component"))
                              .alias("_moved")).localCheckpoint())
        # round 1 always changes a label on a non-empty edge set (for
        # any edge (a,b) with a<b, node b's neighbour-min is <= a < b),
        # so its convergence count is skipped outright
        changed = (1 if it == 0
                   else new_labels.filter("_moved").count())
        labels = new_labels.drop("_moved")
        if changed == 0:
            break
    else:
        # a dup chain with diameter > max_iter is plausible at web
        # scale; silently returning partially-converged labels would
        # corrupt keeper election with no signal
        import warnings

        warnings.warn(
            f"dup_components: min-label propagation did not converge "
            f"within max_iter={max_iter} rounds ({changed} labels still "
            f"changing) — component ids are NOT a fixpoint; raise "
            f"max_iter or pre-split giant components",
            RuntimeWarning, stacklevel=2)
    return labels.select(F.col("node").alias("doc_id"), "component") \
        .orderBy("doc_id")


def _simhash_votes(documents, text_col, id_col, nbits):
    """Per-doc bit votes: bit b of md5(word) hex (nibble arithmetic),
    summed as ±1 over distinct words — all codegen'd column math."""
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
    for b in range(nbits):
        nibble = nib(b // 4 + 1)
        bit = F.floor(nibble / (2 ** (b % 4))) % 2
        cols.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    return words.groupBy(id_col).agg(*cols)


def _bits_value(lo, hi):
    sim = F.lit(0)
    for b in range(lo, hi):
        sim = sim + F.when(F.col(f"v{b}") > 0, 2 ** (b - lo)).otherwise(0)
    return sim.cast("long")


def simhash16(documents, text_col="text", id_col="doc_id"):
    """16-bit SimHash over word tokens (bit b of md5(word), majority
    vote) — the compact oracle-friendly variant; simhash64 is the
    production width."""
    votes = _simhash_votes(documents, text_col, id_col, 16)
    return votes.select(F.col(id_col),
                        _bits_value(0, 16).alias("simhash")) \
        .orderBy(id_col)


def simhash64(documents, text_col="text", id_col="doc_id"):
    """64-bit SimHash (production width), emitted as two 32-bit halves
    (simhash_hi = bits 32-63, simhash_lo = bits 0-31) so every value
    stays exact, positive BIGINT arithmetic in both Spark and the DuckDB
    oracle (a single 64-bit value would overflow the sign bit)."""
    votes = _simhash_votes(documents, text_col, id_col, 64)
    return votes.select(F.col(id_col),
                        _bits_value(32, 64).alias("simhash_hi"),
                        _bits_value(0, 32).alias("simhash_lo")) \
        .orderBy(id_col)


def dedup_lines(documents, max_docs=2, text_col="text", id_col="doc_id",
                sep="\n"):
    """Line-level corpus dedup (the C4/CCNet boilerplate-removal shape):
    a trimmed line that appears in more than ``max_docs`` DISTINCT
    documents is boilerplate (nav menus, cookie banners, footers) and
    is removed from every document; empty lines drop too; documents
    whose every line drops disappear from the output.

    Scale: posexplode is map-only; the frequency count groups on
    md5(line) so the counting shuffle carries a fixed-width hash + id,
    never line text; the drop set is only the OVER-threshold lines —
    tiny next to the line universe (boilerplate is by definition few
    distinct strings), so AQE broadcasts the anti-join; reassembly is
    the single shuffle that moves text, grouped by doc and re-ordered
    by original line position. No self-joins, no driver collects.
    """
    lines = (documents
             .select(F.col(id_col),
                     F.posexplode(F.split(F.col(text_col), sep))
                     .alias("pos", "line"))
             .withColumn("line", F.trim("line"))
             .filter(F.col("line") != "")
             .withColumn("_lh", F.md5("line")))
    drop = (lines.groupBy("_lh")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") > max_docs)
            .select("_lh"))
    kept = lines.join(drop, "_lh", "left_anti")
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "line"))),
                         lambda s: s["line"]),
                     sep).alias("text_clean"),
                 F.count("*").alias("n_kept"))
            .orderBy(id_col))


def substring_dedup_cut(documents, k=8, text_col="text", id_col="doc_id"):
    """Exact-substring REMOVAL (the output of "Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2021 §4 — their
    suffix-array span dedup approximated with fixed-k token windows,
    the Spark-friendly shape): every ≥k-token span that appears more
    than once in the corpus is CUT from every occurrence except the
    corpus-wide first one (min (doc_id, position)); adjacent duplicated
    windows merge naturally, because a token is removed iff ANY
    duplicated window covers it.

    Contract (replayed verbatim by the DuckDB oracle and the
    pure-Python randomized oracle in tests/test_round6_fixes.py):
    tokens = split(lower(trim(text)), r"\\s+") (1-based positions);
    window occurrence (doc, i) for i in 1..n-k+1 with hash
    md5(join(tokens[i:i+k], ' ')); an occurrence is a duplicate iff its
    hash occurs >1 times corpus-wide AND (doc, i) is not the
    lexicographically-first occurrence; token p of a doc is removed iff
    some duplicate occurrence (doc, s) has s ≤ p ≤ s+k-1. Output one
    row per input doc: (doc_id, text_cut, n_kept, n_removed), docs
    shorter than k tokens pass through uncut.

    Scale: window hashes are computed IN-ROW (transform over a
    sequence — map-only, one md5 per window); the occurrence shuffle
    carries (hash, doc_id, start) only — never text; the canonical-
    occurrence aggregation is a map-side-combinable min-struct + count;
    duplicate starts fold back to one small array per affected doc, so
    the single text-bearing step is the final join of that array onto
    the documents scan (AQE broadcasts it — dup spans are the minority)
    and the token filtering runs in-row. No self-joins, no collects."""
    w = _words(F.lower(F.col(text_col)))
    occ = window_occurrences(documents, k, w, id_col)
    canon = (occ.groupBy("_g")
             .agg(F.min(F.struct(F.col(id_col).alias("d"),
                                 F.col("start").alias("s"))).alias("_first"),
                  F.count("*").alias("_cnt")))
    dup = (occ.join(canon, "_g")
           .filter((F.col("_cnt") > 1)
                   & ~((F.col(id_col) == F.col("_first.d"))
                       & (F.col("start") == F.col("_first.s"))))
           .select(id_col, "start"))
    return cut_marked_windows(documents, dup, k, w, text_col, id_col)


def window_occurrences(documents, k, words_expr, id_col="doc_id"):
    """(id, start 1-based, _g=md5 of the k-token window) — one row per
    window OCCURRENCE. Hashes are computed in-row (transform over a
    sequence, map-only, one md5 per window); docs shorter than k yield
    no rows."""
    gram_hashes = _bind(words_expr, lambda w: F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, k)))))
        .otherwise(F.array().cast("array<string>")))
    return (documents
            .select(F.col(id_col),
                    F.posexplode(gram_hashes).alias("_i", "_g"))
            .select(id_col, (F.col("_i") + 1).alias("start"), "_g"))


def cut_marked_windows(documents, marked, k, words_expr, text_col,
                       id_col="doc_id"):
    """Remove every token covered by a MARKED window occurrence.

    ``marked`` is a small (id, start) df (duplicate or contaminated
    window starts); it folds to one array per affected doc, joins onto
    the documents scan (AQE broadcasts — marked docs are the minority),
    and the token filtering runs in-row. Output one row per input doc:
    (id, text_cut, n_kept, n_removed)."""
    cuts = (marked.groupBy(id_col)
            .agg(F.collect_set("start").alias("_cuts")))
    joined = documents.select(F.col(id_col), F.col(text_col)) \
        .join(cuts, id_col, "left")
    cut_arr = F.coalesce(F.col("_cuts"), F.array().cast("array<int>"))

    def out(wds):
        kept_e = F.filter(
            F.sequence(F.lit(1), F.size(wds)),
            lambda p: ~F.exists(cut_arr,
                                lambda s: (s <= p) & (s >= p - (k - 1))))
        # bind the kept-index array too: it feeds the projection, the
        # kept count AND the removed count
        return _bind(kept_e, lambda kept: F.struct(
            F.concat_ws(" ", F.transform(
                kept, lambda p: F.element_at(wds, p))).alias("text_cut"),
            F.size(kept).cast("long").alias("n_kept"),
            (F.size(wds) - F.size(kept)).cast("long").alias("n_removed")))

    return (joined
            .select(F.col(id_col), _bind(words_expr, out).alias("_o"))
            .select(F.col(id_col), "_o.text_cut", "_o.n_kept",
                    "_o.n_removed")
            .orderBy(id_col))


def substring_dup_stats(documents, k=8, text_col="text", id_col="doc_id"):
    """Per-doc verbatim-overlap statistics: the fraction of a document's
    DISTINCT k-token windows that also appear verbatim in another
    document — the curation signal behind exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2021; their suffix-array dedup is approximated here with
    fixed-k windows, which is the Spark-friendly shape: no global
    sort, no cross-doc state).

    Scale: the window hashes are computed in-row (transform over a
    sequence — map-only, one md5 per window); the doc-frequency shuffle
    carries (16-byte hash, doc_id) only, never text; the duplicated-
    window set (df > 1) is the minority anti-join side. Output:
    (doc_id, n_kgrams, n_dup_kgrams, dup_frac) for EVERY doc (short
    docs get 0 / 0.0).
    """
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # sequence(1, 0) DESCENDS in Spark, so short docs need the guard
    gram_hashes = _bind(w, lambda wb: F.when(
        F.size(wb) >= k,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(wb) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(wb, i, k)))))
    ).otherwise(F.array().cast("array<string>")))
    grams = (documents
             .select(F.col(id_col), F.explode(gram_hashes).alias("_g")))
    dup = (grams.groupBy("_g")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .filter(F.col("_nd") > 1).select("_g"))
    per_doc = grams.groupBy(id_col).agg(F.count("*").alias("n_kgrams"))
    dup_doc = (grams.join(dup, "_g", "left_semi")
               .groupBy(id_col).agg(F.count("*").alias("n_dup_kgrams")))
    return (documents.select(id_col)
            .join(per_doc, id_col, "left")
            .join(dup_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_kgrams", F.lit(0)).alias("n_kgrams"),
                    F.coalesce("n_dup_kgrams", F.lit(0))
                    .alias("n_dup_kgrams"),
                    F.round(F.coalesce("n_dup_kgrams", F.lit(0)) /
                            F.greatest(F.coalesce("n_kgrams", F.lit(0)),
                                       F.lit(1)), 6).alias("dup_frac"))
            .orderBy(id_col))
