"""The driver-facing query catalog: every entry is one operator family
from SURVEY.md §2 or a training-data-pipeline op, implemented Spark-first,
with a DuckDB-runnable ANSI-SQL oracle where the semantics are
SQL-expressible (the driver compares row count + schema + value hash at
sf=0.01).

Extraction queries synthesize HTML pages deterministically FROM the
documents table inside the query (html escape → parse → extract is an
exact round trip), so goskyr's real extraction kernels (CSS selection,
regex, URL join, Go-layout dates, filters) are value-checked against
plain SQL over the same rows.
"""

from __future__ import annotations

import html as html_mod

import pyarrow as pa

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType,
)

from .config import loads_config
from .spark.pipeline import extract_stage1, finalize_items_df


def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- deterministic doc→page synthesis (inside the query) ---------------------

_PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("html", BinaryType()),
])

_PAGE_ARROW = pa.schema([pa.field("url", pa.string()),
                         pa.field("html", pa.binary())])


def _render_doc_page(doc_id, text, lang, source, n_chars):
    d = 1 + doc_id % 28
    m = 1 + (doc_id // 28) % 12
    hh = doc_id % 24
    mm = doc_id % 60
    body = html_mod.escape(text, quote=False)
    items = "\n".join(
        f'<div class="it"><span class="t">item {doc_id}-{k}</span></div>'
        for k in range(3))
    page = (
        "<html><body>\n"
        f'<div class="doc">\n'
        f'<h1 class="doc-title">doc {doc_id}</h1>\n'
        f'<p class="body">{body}</p>\n'
        f'<a class="link" href="../detail/{doc_id}">detail</a>\n'
        f'<span class="meta">{n_chars} chars lang {lang}</span>\n'
        f'<div class="items">\n{items}\n</div>\n'
        f'<div class="when">{d}.{m}.2024 {hh:02d}:{mm:02d}</div>\n'
        "</div></body></html>")
    return f"https://{source}.test/docs/list/{doc_id}", page.encode()


def doc_pages(spark, sf_dir):
    docs = documents(spark, sf_dir)

    def gen(batches):
        for b in batches:
            d = b.to_pydict()
            urls, htmls = [], []
            for i in range(b.num_rows):
                u, h = _render_doc_page(d["doc_id"][i], d["text"][i],
                                        d["lang"][i], d["source"][i],
                                        d["n_chars"][i])
                urls.append(u)
                htmls.append(h)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(htmls, pa.binary())],
                schema=_PAGE_ARROW)

    return docs.select("doc_id", "text", "lang", "source", "n_chars") \
        .mapInArrow(gen, _PAGE_SCHEMA)


def _extract(spark, sf_dir, scraper_yaml, columns):
    scraper = loads_config(scraper_yaml).scrapers[0]
    pages = doc_pages(spark, sf_dir)
    raw = extract_stage1(pages, scraper)
    items = finalize_items_df(raw, scraper)
    sel = [F.regexp_extract(F.col("page_url"), r"/docs/list/(\d+)", 1)
           .cast("long").alias("doc_id")]
    sel.extend(columns)
    return items.select(*sel).orderBy("doc_id")


# --- extraction query family --------------------------------------------------

def q_ex_text_css(spark, sf_dir):
    """P1+P3: CSS select one item per page, extract trimmed text."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: body
        location: {selector: p.body}
""", [F.col("body")])


def q_ex_attr(spark, sf_dir):
    """P3d: attribute extraction (first matched node)."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: href
        location: {selector: a.link, attr: href}
""", [F.col("href")])


def q_ex_regex(spark, sf_dir):
    """P4: regex extract (first match; no match → '' via ignore_errors)."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: first_num
        can_be_empty: true
        location:
          selector: p.body
          regex_extract: {exp: "[0-9]+", ignore_errors: true}
""", [F.col("first_num")])


def q_ex_transform(spark, sf_dir):
    """P5: regex-replace transform on extracted text."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: meta_x
        location: {selector: span.meta}
        transform:
          - {type: regex-replace, regex: "[0-9]+", replace: "N"}
""", [F.col("meta_x")])


def q_ex_urljoin(spark, sf_dir):
    """P7: goskyr URL join ('..' branch) during url-field extraction."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: link
        type: url
        location: {selector: a.link}
""", [F.col("link")])


def q_ex_items_explode(spark, sf_dir):
    """P1: multiple item nodes per page → one row each (posexplode)."""
    scraper = loads_config("""
scrapers:
  - name: ex
    url: x
    item: div.it
    fields:
      - name: t
        location: {selector: span.t}
""").scrapers[0]
    pages = doc_pages(spark, sf_dir)
    raw = extract_stage1(pages, scraper)
    items = finalize_items_df(raw, scraper)
    return items.select(
        F.regexp_extract("page_url", r"/docs/list/(\d+)", 1)
        .cast("long").alias("doc_id"),
        F.col("item_idx"), F.col("t")).orderBy("doc_id", "item_idx")


def q_ex_date(spark, sf_dir):
    """P8: Go-layout date parsing ('2.1.2006 15:04')."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: ts
        type: date
        components:
          - covers: {day: true, month: true, year: true, time: true}
            location: {selector: div.when}
            layout: ["2.1.2006 15:04"]
""", [F.col("ts")])


def q_ex_filter(spark, sf_dir):
    """F2/F3: regex filters (match:true keep + match:false drop)."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: body
        location: {selector: p.body}
    filters:
      - {field: body, exp: "join", match: true}
      - {field: body, exp: "window", match: false}
""", [F.col("body")])


def q_ex_static_hide(spark, sf_dir):
    """P2 static fields + P11 hidden-field drop (hidden col used by a
    filter but absent from output)."""
    return _extract(spark, sf_dir, """
scrapers:
  - name: ex
    url: x
    item: div.doc
    fields:
      - name: kind
        value: doc
      - name: body
        hide: true
        location: {selector: p.body}
      - name: title
        location: {selector: h1.doc-title}
    filters:
      - {field: body, exp: "scan", match: true}
""", [F.col("kind"), F.col("title")])


ORACLES_EXTRACT = {
    "ex_text_css": """
        SELECT doc_id, text AS body FROM documents ORDER BY doc_id""",
    "ex_attr": """
        SELECT doc_id, '../detail/' || CAST(doc_id AS VARCHAR) AS href
        FROM documents ORDER BY doc_id""",
    "ex_regex": """
        SELECT doc_id, regexp_extract(text, '[0-9]+') AS first_num
        FROM documents ORDER BY doc_id""",
    "ex_transform": """
        SELECT doc_id,
               'N chars lang ' || lang AS meta_x
        FROM documents ORDER BY doc_id""",
    "ex_urljoin": """
        SELECT doc_id, 'https://' || source || '.test/docs/detail/' ||
               CAST(doc_id AS VARCHAR) AS link
        FROM documents ORDER BY doc_id""",
    "ex_items_explode": """
        SELECT doc_id, k AS item_idx,
               'item ' || CAST(doc_id AS VARCHAR) || '-' ||
               CAST(k AS VARCHAR) AS t
        FROM documents, unnest([0, 1, 2]) AS u(k)
        ORDER BY doc_id, item_idx""",
    "ex_date": """
        SELECT doc_id,
               make_timestamp(2024,
                              1 + CAST(doc_id // 28 AS INT) % 12,
                              1 + CAST(doc_id AS INT) % 28,
                              CAST(doc_id AS INT) % 24,
                              CAST(doc_id AS INT) % 60, 0) AS ts
        FROM documents ORDER BY doc_id""",
    "ex_filter": """
        SELECT doc_id, text AS body FROM documents
        WHERE regexp_matches(text, 'join')
          AND NOT regexp_matches(text, 'window')
        ORDER BY doc_id""",
    "ex_static_hide": """
        SELECT doc_id, 'doc' AS kind,
               'doc ' || CAST(doc_id AS VARCHAR) AS title
        FROM documents WHERE regexp_matches(text, 'scan')
        ORDER BY doc_id""",
}


# --- dedup / text / similarity / multimodal families ---------------------------

def q_dedup_exact(spark, sf_dir):
    from .ops.dedup import exact_dedup

    return exact_dedup(documents(spark, sf_dir))


def q_dedup_minhash_lsh(spark, sf_dir):
    from .ops.dedup import minhash_lsh_buckets

    return minhash_lsh_buckets(documents(spark, sf_dir)) \
        .withColumn("candidates", F.concat_ws(",", "candidates"))


def q_dedup_minhash_lsh_capped(spark, sf_dir):
    """LSH banding with the bucket-size guard: buckets over max_bucket
    members report NULL('')-candidates + count instead of materializing
    the member list (collect_list memory bound for degenerate dup
    classes)."""
    from .ops.dedup import minhash_lsh_buckets_capped

    return minhash_lsh_buckets_capped(documents(spark, sf_dir),
                                      max_bucket=2)


def q_dedup_minhash128(spark, sf_dir):
    """Production-WIDTH MinHash banding: 128 permutations as 16 bands ×
    8 rows — the (r, b) shape web-scale near-dup actually ships (an
    8-perm signature's S-curve is far too shallow at billions of docs).
    Same single-pass banding plan as the catalog's 8-perm variant: ONE
    md5 per shingle, 128 map-side-combined min aggregates (1 KB/doc
    fixed-width shuffle), bucket cap 64. The affine family beyond the
    frozen first 8 comes from minhash_params (seeded SplitMix64);
    tests/test_minhash_width.py pins the family's S-curve against
    1-(1-J^r)^b on similarity-controlled synthetic pairs."""
    from .ops.dedup import minhash_lsh_buckets_capped

    return minhash_lsh_buckets_capped(documents(spark, sf_dir),
                                      num_perm=128, band_size=8,
                                      max_bucket=64)


def q_dedup_incremental(spark, sf_dir):
    """Rolling-ingest near-dup detection (beyond-reference LLM-pipeline
    op): the batch (doc_id % 4 == 0) is deduped against the LSH index
    of the existing corpus (doc_id % 4 != 0) WITHOUT touching corpus
    text — the every-cycle operation of a continuous crawl."""
    from .ops.dedup import dedup_incremental, minhash_index

    docs = documents(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return dedup_incremental(batch, minhash_index(corpus))


def q_dedup_incremental_verified(spark, sf_dir):
    """LSH candidates from the corpus index, exact-Jaccard-verified per
    (new, corpus) pair — the production two-phase rolling-ingest dedup
    (candidates prune the corpus text scan; no full-corpus shingling)."""
    from .ops.dedup import dedup_incremental_verified

    docs = documents(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return dedup_incremental_verified(batch, corpus, threshold=0.5)


def q_dedup_jaccard(spark, sf_dir):
    from .ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(documents(spark, sf_dir), threshold=0.2)


def q_dedup_components(spark, sf_dir):
    """Keeper election: connected components over the exact-Jaccard
    near-dup pairs (component id = min doc id = the keeper) — the step
    that turns pairwise dup evidence into a keep/drop list."""
    from .ops.dedup import dup_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(documents(spark, sf_dir), threshold=0.2)
    return dup_components(pairs)


def q_dedup_components_capped(spark, sf_dir):
    """Keeper election over the df-CAPPED jaccard pair generator — the
    production path at web scale (the cap bounds the per-shingle join
    cost; see dedup_jaccard_capped). Same label-propagation components."""
    from .ops.dedup import dup_components, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(documents(spark, sf_dir), threshold=0.2,
                                max_df=3)
    return dup_components(pairs)


def q_dedup_lines(spark, sf_dir):
    """Line-level boilerplate removal (C4/CCNet shape): lines appearing
    in >2 distinct docs are dropped everywhere. The synthetic documents
    carry no newlines, so the query synthesizes deterministic line
    boundaries first (every ' the ' token becomes a line break —
    identical string replace in the oracle), which makes near-dup docs
    share real lines."""
    from .ops.dedup import dedup_lines

    docs = documents(spark, sf_dir).withColumn(
        "text", F.replace(F.col("text"), F.lit(" the "), F.lit("\n")))
    return dedup_lines(docs, max_docs=2)


def q_dedup_substring(spark, sf_dir):
    """Exact-substring overlap statistics (Lee et al. 2021 shape,
    fixed-k-window approximation): fraction of each doc's distinct
    8-token windows appearing verbatim in another doc."""
    from .ops.dedup import substring_dup_stats

    return substring_dup_stats(documents(spark, sf_dir), k=8)


def q_dedup_substring_cut(spark, sf_dir):
    """Exact-substring REMOVAL (Lee et al. 2021 §4 output shape): every
    duplicated ≥8-token window is cut from all but its corpus-wide
    first occurrence, adjacent duplicated windows merging into spans.
    The synthetic corpus's near-dup docs share real verbatim spans, so
    the cut path has signal at every sf."""
    from .ops.dedup import substring_dedup_cut

    return substring_dedup_cut(documents(spark, sf_dir), k=8)


def q_txt_pii(spark, sf_dir):
    """PII scrubbing (emails first, then IPv4). The synthetic corpus
    carries no PII, so the query injects it deterministically (same
    string replaces in the oracle): every ' data ' token becomes an
    email, every ' key ' an IP."""
    from .ops.text import pii_scrub

    docs = documents(spark, sf_dir).withColumn(
        "text", F.replace(F.col("text"), F.lit(" data "),
                          F.lit(" bob.smith+x@mail-host.example.com ")))
    docs = docs.withColumn(
        "text", F.replace(F.col("text"), F.lit(" key "),
                          F.lit(" 10.42.0.250 ")))
    return pii_scrub(docs)


def q_dedup_simhash(spark, sf_dir):
    from .ops.dedup import simhash16

    return simhash16(documents(spark, sf_dir))


def q_dedup_simhash64(spark, sf_dir):
    from .ops.dedup import simhash64

    return simhash64(documents(spark, sf_dir))


def q_dedup_jaccard_capped(spark, sf_dir):
    """Jaccard with the document-frequency cap: shingles with df > 3 are
    dropped from the universe (bounds the self-join at max_df² rows per
    shingle — the skew guard for stopword shingles at web scale)."""
    from .ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(documents(spark, sf_dir), threshold=0.2,
                               max_df=3)


def q_txt_tokens(spark, sf_dir):
    from .ops.text import token_stats

    return token_stats(documents(spark, sf_dir))


def q_txt_quality(spark, sf_dir):
    from .ops.text import quality_score

    return quality_score(documents(spark, sf_dir))


def q_txt_langid(spark, sf_dir):
    from .ops.text import lang_id

    return lang_id(documents(spark, sf_dir))


def q_txt_fingerprint(spark, sf_dir):
    from .ops.text import fingerprint

    return fingerprint(documents(spark, sf_dir))


def q_sim_topk(spark, sf_dir):
    from .ops.similarity import cosine_topk

    return cosine_topk(embeddings(spark, sf_dir), query_vec_id=0, k=10)


def q_sim_topk_batch(spark, sf_dir):
    """Batched exact top-k (4 queries × k=5): one corpus scan amortized
    over the query batch, bounded per-task Q×k candidate state, global
    ranking over partitions×Q×k rows only (ops/similarity.py
    cosine_topk_batch)."""
    from .ops.similarity import cosine_topk_batch

    return cosine_topk_batch(embeddings(spark, sf_dir),
                             query_ids=[0, 1, 2, 3], k=5)


def q_sim_lsh_buckets(spark, sf_dir):
    from .ops.similarity import srp_lsh_buckets

    return srp_lsh_buckets(embeddings(spark, sf_dir), n_planes=4)


def q_sim_ann_lsh(spark, sf_dir):
    """ANN: exact cosine top-k restricted to the query's SRP-LSH bucket
    (the scan prunes to ~corpus/2^n_planes at scale)."""
    from .ops.similarity import ann_topk_lsh

    return ann_topk_lsh(embeddings(spark, sf_dir), query_vec_id=0, k=10,
                        n_planes=4)


def q_dedup_embed(spark, sf_dir):
    """Embedding-cosine near-dup pairs, SRP-bucket candidates + exact
    cosine verify."""
    from .ops.similarity import embed_near_dup_pairs

    return embed_near_dup_pairs(embeddings(spark, sf_dir), threshold=0.3,
                                n_planes=4)


def q_dedup_embed_capped(spark, sf_dir):
    """Embedding near-dup with the SRP bucket-size guard: buckets above
    max_bucket members leave the candidate universe (skew guard — the
    max_df analog for embedding dup classes)."""
    from .ops.similarity import embed_near_dup_pairs

    return embed_near_dup_pairs(embeddings(spark, sf_dir), threshold=0.3,
                                n_planes=4, max_bucket=35)


def q_txt_bpe(spark, sf_dir):
    from .ops.text import bpe_token_count

    return bpe_token_count(documents(spark, sf_dir))


def q_txt_bpe_real(spark, sf_dir):
    """TRUE BPE token count: pretokenizer + the fixed merges table
    replayed in rank order (ops/text.py:BPE_MERGES). The oracle replays
    the identical merge sequence as nested replace() calls."""
    from .ops.text import bpe_token_count_real

    return bpe_token_count_real(documents(spark, sf_dir))


def q_sim_ivf_assign(spark, sf_dir):
    """IVF coarse quantization (centroid per vector)."""
    from .ops.similarity import ivf_assign

    return ivf_assign(embeddings(spark, sf_dir), n_centroids=4)


def q_sim_ann_ivf(spark, sf_dir):
    """ANN via IVF cell probe (n_probe=1)."""
    from .ops.similarity import ann_topk_ivf

    return ann_topk_ivf(embeddings(spark, sf_dir), query_vec_id=0, k=10,
                        n_centroids=4)


def q_sim_ann_lsh_multi(spark, sf_dir):
    """Multi-table LSH ANN (3 independent plane sets, union of buckets,
    exact verify) — the recall lever over single-probe sim_ann_lsh."""
    from .ops.similarity import ann_topk_lsh_multi

    return ann_topk_lsh_multi(embeddings(spark, sf_dir), query_vec_id=0,
                              k=10, n_planes=4, n_tables=3)


def q_sim_ann_lsh_probed(spark, sf_dir):
    """Single-table multi-probe LSH ANN (Hamming≤1 buckets scanned)."""
    from .ops.similarity import ann_topk_lsh_probed

    return ann_topk_lsh_probed(embeddings(spark, sf_dir), query_vec_id=0,
                               k=10, n_planes=4, hamming=1)


def q_sim_ann_ivf_probed(spark, sf_dir):
    """Multi-probe IVF ANN (n_probe=2 nearest cells scanned)."""
    from .ops.similarity import ann_topk_ivf_probed

    return ann_topk_ivf_probed(embeddings(spark, sf_dir), query_vec_id=0,
                               k=10, n_centroids=4, n_probe=2)


def q_sim_ivf_train(spark, sf_dir):
    """Seeded Lloyd's k-means (2 iterations, 4 centroids, quantized
    inputs): final-iteration per-(centroid, dim) exact integer sums and
    member counts — the trained-centroid table, float-risk-free."""
    from .ops.similarity import ivf_train

    _, stats = ivf_train(embeddings(spark, sf_dir), n_centroids=4,
                         n_iter=2)
    return stats


def q_sim_ann_ivf_trained(spark, sf_dir):
    """ANN over TRAINED centroids (ivf_train) with n_probe=2."""
    from .ops.similarity import ann_topk_ivf_probed, ivf_train

    emb = embeddings(spark, sf_dir)
    cents, _ = ivf_train(emb, n_centroids=4, n_iter=2)
    return ann_topk_ivf_probed(emb, query_vec_id=0, k=10, n_centroids=4,
                               n_probe=2, centroids=cents)


def q_sim_pq_train(spark, sf_dir):
    """Product-quantization codebook training: seeded Lloyd's per
    subspace (m=2 × 32 dims, k=4, 2 iterations) over quantized
    subvectors — final-iteration exact integer sums/counts per
    (subspace, centroid, dim), the float-risk-free gate."""
    from .ops.similarity import pq_train

    _, stats = pq_train(embeddings(spark, sf_dir), m=2, n_centroids=4,
                        n_iter=2)
    return stats


def q_sim_ann_pq(spark, sf_dir):
    """PQ asymmetric-distance ANN (ADC): per-subspace codes in one
    projection + code-indexed lookup of the query's precomputed
    centroid cosines — O(m) per row instead of O(dim)."""
    from .ops.similarity import ann_topk_pq, pq_train

    emb = embeddings(spark, sf_dir)
    books, _ = pq_train(emb, m=2, n_centroids=4, n_iter=2)
    return ann_topk_pq(emb, books, query_vec_id=0, k=10)


def q_sim_ann_pq_rerank(spark, sf_dir):
    """Production PQ search: ADC shortlist of 100 then exact cosine
    re-rank — only the shortlist pays the O(dim) cosine. The catalog
    variant uses m=4/k=4 (recall@10 7/10 here) to keep the k-means
    replay oracle fast at the driver's sf0.01; the richer m=8/k=8
    codebook (recall 9/10) is pytest-gated Spark-side
    (test_ann_recall.py) where no SQL replay is needed."""
    from .ops.similarity import ann_topk_pq_rerank, pq_train

    emb = embeddings(spark, sf_dir)
    books, _ = pq_train(emb, m=4, n_centroids=4, n_iter=2)
    return ann_topk_pq_rerank(emb, books, query_vec_id=0, k=10,
                              shortlist=100)


# Persisted-index build cache: the *_indexed queries model a
# build-once / query-many index, so the parquet index is built ONCE per
# (kind, sf_dir) per process and reused by every subsequent invocation
# (bench warm-up + best-of-2 now re-measures only the query path, which
# is what the row is documented to mean). Dirs are removed at exit.
_INDEX_CACHE: dict = {}


def _index_path(spark, kind, sf_dir, build):
    """Return the parquet path of a cached index, building it on first
    use. ``build(path)`` writes the index; the temp dir is registered
    for atexit cleanup (no per-invocation leak)."""
    key = (kind, sf_dir)
    if key not in _INDEX_CACHE:
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix=f"{kind}_idx_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        path = f"{d}/index.parquet"
        build(path)
        _INDEX_CACHE[key] = path
    return _INDEX_CACHE[key]


def _cached_books(emb, kind, sf_dir, m, n_centroids=4, n_iter=2):
    """PQ codebooks cached per (kind, sf_dir): the codebook is part of
    the build-once index (a deployment trains it when it writes the
    code table, not per query), so the per-process cache keeps repeat
    invocations on the probe path only. Deterministic training — the
    cached books are bit-identical to a fresh pq_train."""
    from .ops.similarity import pq_train

    key = (f"{kind}_books", sf_dir)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = pq_train(emb, m=m, n_centroids=n_centroids,
                                     n_iter=n_iter)[0]
    return _INDEX_CACHE[key]


def q_sim_ann_pq_indexed(spark, sf_dir):
    """Production-shape PQ search: codes are built ONCE (pq_index →
    parquet, the minhash_index pattern; cached per process — see
    _index_path) and the ADC query scans ONLY the persisted integer
    code table — the embeddings column never appears in the query plan
    (plan-asserted in tests/test_plans.py). Same rows as sim_ann_pq:
    identical codebooks, identical round-6 ADC scores, so the unindexed
    oracle gates both."""
    from .ops.similarity import ann_topk_pq_indexed, pq_index

    emb = embeddings(spark, sf_dir)
    books = _cached_books(emb, "pq", sf_dir, m=2)
    path = _index_path(
        spark, "pq", sf_dir,
        lambda p: pq_index(emb, books).write.mode("overwrite").parquet(p))
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    codes = spark.read.parquet(path)
    return ann_topk_pq_indexed(codes, books, qvec, query_vec_id=0, k=10)


def q_sim_ann_ivfpq_indexed(spark, sf_dir):
    """The IVF-PQ COMPOSITE index — the actual 100 TB ANN shape: one
    persisted table carries each vector's coarse IVF cell AND its PQ
    codes (ivfpq_index → parquet PARTITIONED BY centroid, cached per
    process). The probe plan reads ONLY the probed cells' partitions
    (partition-pruning predicate) and ONLY integer code columns (the
    embeddings column is absent from the ADC scan — both
    plan-asserted in tests/test_plans.py), ADC-scores them, and
    exact-re-ranks the 100-row shortlist. Coarse = first-4 seed
    centroids (n_probe=2), PQ = trained m=4/k=4 codebooks — the same
    pieces the standalone oracles already replay, composed. Recall@10
    on the test corpus: 10/10 vs the full-corpus rerank baseline's
    9/10 (pytest-gated in tests/test_ann_recall.py)."""
    from .ops.similarity import (ann_topk_ivfpq_indexed, ivfpq_index,
                                 ivfpq_probe_cells)

    emb = embeddings(spark, sf_dir)
    books = _cached_books(emb, "ivfpq", sf_dir, m=4)
    cents = [list(r[0]) for r in emb.orderBy("vec_id")
             .select("embedding").limit(4).collect()]
    path = _index_path(
        spark, "ivfpq", sf_dir,
        lambda p: ivfpq_index(emb, cents, books).write
        .mode("overwrite").partitionBy("centroid").parquet(p))
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cells = ivfpq_probe_cells(emb, cents, query_vec_id=0, n_probe=2)
    idx = spark.read.parquet(path)
    return ann_topk_ivfpq_indexed(idx, books, qvec, cells, emb,
                                  query_vec_id=0, k=10, shortlist=100)


def q_sim_ann_lsh_indexed(spark, sf_dir):
    """Production-shape SRP-LSH probe: the bucket table is built once
    (srp_lsh_buckets → parquet, cached per process) and the query plan
    reads the index + only the probed bucket's vectors — no per-query
    re-hash of the corpus. Row-identical to sim_ann_lsh, so its oracle
    gates both."""
    from .ops.similarity import ann_topk_lsh_indexed, srp_lsh_buckets

    emb = embeddings(spark, sf_dir)
    path = _index_path(
        spark, "srp", sf_dir,
        lambda p: srp_lsh_buckets(emb).write.mode("overwrite").parquet(p))
    return ann_topk_lsh_indexed(emb, spark.read.parquet(path),
                                query_vec_id=0, k=10)


def q_sim_ann_ivf_indexed(spark, sf_dir):
    """Production-shape IVF probe over a persisted assignment table
    (ivf_assign → parquet, cached per process; partition-pruned by
    centroid at scale). Row-identical to sim_ann_ivf — shared oracle."""
    from .ops.similarity import ann_topk_ivf_indexed, ivf_assign

    emb = embeddings(spark, sf_dir)
    path = _index_path(
        spark, "ivf", sf_dir,
        lambda p: ivf_assign(emb).write.mode("overwrite").parquet(p))
    return ann_topk_ivf_indexed(emb, spark.read.parquet(path),
                                query_vec_id=0, k=10)


def q_mm_decode(spark, sf_dir):
    """Real raster decode (PPM even ids / BMP odd ids) — metadata and
    pixel statistics computed from the DECODED bytes; the oracle
    recomputes them from the closed-form pixel formula."""
    from .ops.multimodal import decode_metadata, raster_table

    return decode_metadata(raster_table(documents(spark, sf_dir)))


def q_mm_resize(spark, sf_dir):
    """Decode + nearest-neighbor resize to 20×10."""
    from .ops.multimodal import raster_table, resize_payloads

    return resize_payloads(raster_table(documents(spark, sf_dir)),
                           width=20, height=10)


def q_mm_frames(spark, sf_dir):
    """RAWV container frame sampling (every 3rd frame, decoded)."""
    from .ops.multimodal import sample_frames, video_table

    return sample_frames(video_table(documents(spark, sf_dir)),
                         every_k=3)


def q_mm_audio(spark, sf_dir):
    """16-bit PCM WAV decode (RIFF chunk walk) → exact loudness stats."""
    from .ops.multimodal import audio_table, decode_audio_metadata

    return decode_audio_metadata(audio_table(documents(spark, sf_dir)))


def q_curate_keep(spark, sf_dir):
    """End-to-end curation keep-list: quality + language + near-dup
    keeper election composed into one declarative plan. Runs the
    PRODUCTION path: df-capped jaccard pair generation (max_df=3 binds
    at test scale so the oracle exercises the cap) and a plain keeper
    join (AQE broadcasts at runtime when the component table fits)."""
    from .ops.curate import keep_list

    return keep_list(documents(spark, sf_dir), min_quality=0.5,
                     lang="en", threshold=0.2, max_df=3)


def q_curate_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing ≥2 shingles with
    the 'benchmark' slice (every 50th doc) get flagged — broadcast
    semi-join, no corpus shuffle."""
    from .ops.curate import contamination_flags

    docs = documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return contamination_flags(docs, bench, shingle_n=3, min_overlap=2)


def q_curate_decontaminate_cut(spark, sf_dir):
    """13-gram benchmark decontamination with SPAN REMOVAL: corpus docs
    (doc_id % 5 != 0) lose every 13-token window appearing verbatim in
    the benchmark slice (doc_id % 5 == 0) — the removal counterpart of
    the 3-gram flag variant (extras). The denser benchmark slice gives
    the 13-gram rule real signal on the synthetic corpus (13 cut docs
    at sf0.01)."""
    from .ops.curate import decontaminate_cut

    docs = documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return decontaminate_cut(corpus, bench, n=13)


def q_curate_split(spark, sf_dir):
    """Deterministic train/val/test assignment (md5 id-hash buckets)."""
    from .ops.curate import split_assign

    return split_assign(documents(spark, sf_dir))


def q_curate_token_budget(spark, sf_dir):
    """TRUE-BPE token budget per source slice (one scan + map-side
    partial agg)."""
    from .ops.curate import token_budget

    return token_budget(documents(spark, sf_dir), group_col="source")


def q_txt_repetition(spark, sf_dir):
    """Gopher repetition statistics (dup lines, top-2/3-gram char
    fraction, dup-5-gram char fraction) — in-row run-length pass over
    sorted n-gram arrays; one scan, zero shuffle (ops/gopher.py)."""
    from .ops.gopher import repetition_stats

    return repetition_stats(documents(spark, sf_dir))


def q_txt_gopher_quality(spark, sf_dir):
    """Gopher quality-rule metrics + keep flag (word-count bound
    lowered to the synthetic corpus's 20-60-word scale so the gate has
    mixed outcomes)."""
    from .ops.gopher import gopher_quality

    return gopher_quality(documents(spark, sf_dir), min_words=40,
                          min_stop_hits=1)


def q_curate_gopher(spark, sf_dir):
    """The full Gopher document gate (repetition + quality) in ONE
    documents scan."""
    from .ops.gopher import curate_gopher

    return curate_gopher(documents(spark, sf_dir), min_words=40,
                         max_top2_frac=0.10, max_top3_frac=0.06,
                         min_stop_hits=1)


def _paginated_docs(spark, sf_dir):
    """documents with a deterministic multi-line wrapper: 8-word lines,
    a '.' appended where (doc_id + line_idx) is even — the synthetic
    harness that gives the LINE-level C4 rules real signal on the
    newline-free test corpus (identically expressed in the oracle)."""
    words = F.split(F.trim(F.col("text")), r"\s+")

    # the word array is bound once (single-element transform): slicing
    # the split inside the per-line lambda would re-tokenize the doc
    # per line (no CSE across a lambda boundary — see ops/dedup._bind)
    def build(w):
        line = lambda s: F.concat(  # noqa: E731
            F.array_join(F.slice(w, s, 8), " "),
            F.when(((F.col("doc_id")
                     + F.floor((s - F.lit(1)) / 8).cast("long")) % 2) == 0,
                   F.lit(".")).otherwise(F.lit("")))
        starts = F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)),
                            F.lit(8))
        return F.array_join(F.transform(starts, line), "\n")

    return documents(spark, sf_dir).select(
        "doc_id",
        F.element_at(F.transform(F.array(words), build), 1).alias("text"))


def q_txt_c4_clean(spark, sf_dir):
    """C4 line-level cleaning over the paginated wrapper: keep
    terminal-punctuated >=3-word lines; page_keep needs >=2 survivors."""
    from .ops.gopher import c4_line_clean

    return c4_line_clean(_paginated_docs(spark, sf_dir),
                         min_kept_lines=2)


def q_curate_mixture(spark, sf_dir):
    """Temperature (sqrt) domain-mixing weights + per-source token
    quotas for a 1M-token budget — the data-mixing step of a training
    pipeline (ops/curate.py:mixture_weights)."""
    from .ops.curate import mixture_weights

    return mixture_weights(documents(spark, sf_dir))


def q_url_canonicalize(spark, sf_dir):
    """RFC 3986 syntax-based URL normalization (ops/urlnorm.py) over
    messy URLs synthesized deterministically from doc_id — uppercase
    scheme/host, default ports, dot segments, fragments. The oracle
    builds the IDENTICAL messy strings and applies the identical
    normalization pass sequence."""
    from .ops.urlnorm import url_normalize_expr

    d = F.col("doc_id")
    scheme = F.when(d % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.concat(F.lit("WWW.Example"), (d % 7).cast("string"),
                    F.lit(".COM"))
    port = F.when(d % 4 == 0, F.lit(":80")) \
        .when(d % 4 == 1, F.lit(":443")) \
        .when(d % 4 == 2, F.lit(":8080")).otherwise(F.lit(""))
    path = F.when(d % 5 == 0, F.lit("/x/./y/../z")) \
        .when(d % 5 == 1, F.lit("/a/b/../../c/")) \
        .when(d % 5 == 2, F.lit("")) \
        .when(d % 5 == 3, F.lit("/p/q")).otherwise(F.lit("/./../x"))
    tail = F.when(d % 2 == 0, F.lit("?B=1&a=2#frag")) \
        .otherwise(F.lit("#sec"))
    url = F.concat(scheme, F.lit("://"), host, port, path, tail)
    return (documents(spark, sf_dir)
            .select(d.alias("doc_id"), url.alias("url"))
            .withColumn("url_norm", url_normalize_expr(F.col("url")))
            .orderBy("doc_id"))


def q_url_canonicalize_full(spark, sf_dir):
    """FULL URL normalization: the syntax passes PLUS the RFC 3986
    §6.2.2.2 percent-encoding pass (Arrow-vectorized kernel —
    uppercase retained triplets, decode unreserved, single-pass so no
    double-decode). The oracle does NOT replay the regexes: it states
    the expected output per input family directly — an independent
    computation of the same contract."""
    from .ops.urlnorm import url_normalize_full_expr

    d = F.col("doc_id")
    seg = F.when(d % 6 == 0, F.lit("%7e")) \
        .when(d % 6 == 1, F.lit("%7E")) \
        .when(d % 6 == 2, F.lit("%41%2f")) \
        .when(d % 6 == 3, F.lit("%zz")) \
        .when(d % 6 == 4, F.lit("a%3ab")) \
        .otherwise(F.lit("%2e"))
    url = F.concat(F.lit("HTTPS://EX"), (d % 5).cast("string"),
                   F.lit(".Test/"), seg, F.lit("/x?q=%54est%2f"))
    return (documents(spark, sf_dir)
            .select(d.alias("doc_id"), url.alias("url"))
            .withColumn("url_norm", url_normalize_full_expr(F.col("url")))
            .orderBy("doc_id"))


def q_warc_roundtrip(spark, sf_dir):
    """WARC container round trip (io/warc.py — the Common Crawl page
    format): documents → HTTP response records → WARC blobs (8 files,
    built per-group in applyInPandas) → parsed back by the same kernel
    the binaryFile source uses (mapInPandas). The oracle states the
    expected parse output directly from documents."""
    import pandas as pd

    from .io.warc import build_http_response, parse_warc, write_warc

    docs = (documents(spark, sf_dir).select("doc_id", "text")
            .withColumn("_g", F.col("doc_id") % 8))

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        recs = [(f"https://doc{int(d)}.test/",
                 build_http_response(str(t).encode("utf-8")))
                for d, t in sorted(zip(pdf["doc_id"], pdf["text"]))]
        return pd.DataFrame({"blob": [write_warc(recs)]})

    warcs = docs.groupBy("_g").applyInPandas(build, "blob binary")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["blob"]:
                for uri, status, body in parse_warc(bytes(blob)):
                    rows.append((uri, status,
                                 len(body.decode("utf-8", "replace"))))
            yield pd.DataFrame(
                rows, columns=["url", "http_status", "n_chars"])

    return (warcs.mapInPandas(
                parse, "url string, http_status long, n_chars long")
            .orderBy("url"))


def q_curate_corpus(spark, sf_dir):
    """The full corpus-curation pipeline a training-data team ships,
    end to end in one query: Gopher repetition+quality gate (in-scan
    column expressions) AND benchmark decontamination (broadcast
    semi-join) AND near-dup keeper election (plain join — AQE
    broadcasts the component table at runtime when it fits; at
    web-data dup rates it can be a large corpus fraction, so no forced
    hint) AND deterministic split assignment (pure column
    expression). `selected` is the final keep decision."""
    return _curate_corpus(spark, sf_dir, max_df=None)


def q_curate_corpus_capped(spark, sf_dir):
    """The PRODUCTION corpus-curation pipeline: identical composition
    to ``curate_corpus`` but the near-dup keeper election runs the
    df-CAPPED jaccard pair generator end to end (max_df bounds the
    per-shingle join cost at web scale — stopword-class shingles leave
    the universe instead of generating df² pair rows). max_df=3 binds
    at test scale so the oracle actually exercises the cap."""
    return _curate_corpus(spark, sf_dir, max_df=3)


def _curate_corpus(spark, sf_dir, max_df):
    from .ops.curate import contamination_flags, split_assign
    from .ops.dedup import dup_components, ngram_jaccard_pairs
    from .ops.gopher import curate_gopher

    docs = documents(spark, sf_dir)
    g = curate_gopher(docs, min_words=40, max_top2_frac=0.10,
                      max_top3_frac=0.06, min_stop_hits=1) \
        .select("doc_id", F.col("keep").alias("gopher_keep"))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    decon = contamination_flags(docs, bench) \
        .select("doc_id", "contaminated")
    comp = dup_components(ngram_jaccard_pairs(docs, threshold=0.2,
                                              max_df=max_df))
    spl = split_assign(docs).select("doc_id", "split")
    return (docs.select("doc_id")
            .join(g, "doc_id").join(decon, "doc_id").join(spl, "doc_id")
            .join(comp, "doc_id", "left")
            .withColumn("is_keeper",
                        (F.col("component").isNull()
                         | (F.col("component") == F.col("doc_id")))
                        .cast("long"))
            .withColumn("selected",
                        ((F.col("gopher_keep") == 1)
                         & (F.col("contaminated") == 0)
                         & (F.col("is_keeper") == 1)).cast("long"))
            .select("doc_id", "gopher_keep", "contaminated", "is_keeper",
                    "split", "selected")
            .orderBy("doc_id"))


_STOP_RX = {
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "en": r"\b(the|and|is|of|to|in|that|it|for|with)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "nl": r"\b(de|het|een|en|van|is|dat|op|te|met)\b",
    "sk": r"\b(a|je|na|sa|v|to|som|ako|ale|tak)\b",
}

ORACLES_OPS = {
    "dedup_exact": """
        SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY content_hash""",
    "dedup_substring": """
        WITH g AS (
          SELECT doc_id, unnest(list_distinct(
            [md5(array_to_string(w[i:i+7], ' '))
             for i in range(1, greatest(len(w) - 7, 0) + 1)])) AS gh
          FROM (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents)),
        freq AS (SELECT gh FROM (
                   SELECT gh, count(DISTINCT doc_id) AS nd
                   FROM g GROUP BY 1) WHERE nd > 1),
        per_doc AS (SELECT doc_id, count(*) AS n_kgrams FROM g GROUP BY 1),
        dup_doc AS (SELECT g.doc_id, count(*) AS n_dup_kgrams
                    FROM g JOIN freq USING (gh) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(p.n_kgrams, 0) AS n_kgrams,
               coalesce(x.n_dup_kgrams, 0) AS n_dup_kgrams,
               round(coalesce(x.n_dup_kgrams, 0) /
                     greatest(coalesce(p.n_kgrams, 0), 1), 6) AS dup_frac
        FROM documents d
        LEFT JOIN per_doc p USING (doc_id)
        LEFT JOIN dup_doc x USING (doc_id)
        ORDER BY d.doc_id""",
    # exact-substring REMOVAL: independent relational statement of the
    # substring_dedup_cut contract — window occurrences ranked per hash
    # (rn=1 is the corpus-wide first by (doc_id, start)), duplicate
    # occurrences expand to covered token positions, kept tokens
    # reassemble in order
    "dedup_substring_cut": """
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents),
        occ AS (
          SELECT doc_id, i AS start,
                 md5(array_to_string(w[i:i+7], ' ')) AS g
          FROM (SELECT doc_id, w,
                       unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS i
                FROM t)),
        r AS (
          SELECT doc_id, start,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY doc_id, start) AS rn,
                 count(*) OVER (PARTITION BY g) AS cnt
          FROM occ),
        dup AS (SELECT doc_id, start FROM r WHERE cnt > 1 AND rn > 1),
        cutp AS (SELECT DISTINCT doc_id, p
                 FROM (SELECT doc_id, unnest(range(start, start + 8)) AS p
                       FROM dup)),
        toks AS (SELECT doc_id, p, w[p] AS tok
                 FROM (SELECT doc_id, w,
                              unnest(range(1, len(w) + 1)) AS p
                       FROM t)),
        kept AS (SELECT doc_id, p, tok
                 FROM toks ANTI JOIN cutp USING (doc_id, p)),
        agg AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY p) AS text_cut,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id),
        n AS (SELECT doc_id, len(w) AS n_tok FROM t)
        SELECT d.doc_id,
               coalesce(a.text_cut, '') AS text_cut,
               CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(n.n_tok - coalesce(a.n_kept, 0) AS BIGINT)
                   AS n_removed
        FROM documents d
        JOIN n USING (doc_id)
        LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id""",
    "txt_pii": """
        WITH injected AS (
          SELECT doc_id,
                 replace(replace(text, ' data ',
                         ' bob.smith+x@mail-host.example.com '),
                         ' key ', ' 10.42.0.250 ') AS text
          FROM documents),
        emails AS (
          SELECT doc_id,
                 len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))
                 AS n_emails,
                 regexp_replace(text,
                     '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g') AS t1
          FROM injected)
        SELECT doc_id,
               regexp_replace(t1,
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '<IP>', 'g') AS text_scrubbed,
               n_emails,
               len(regexp_extract_all(t1,
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
               AS n_ips
        FROM emails ORDER BY doc_id""",
    "dedup_lines": """
        WITH raw AS (
          SELECT doc_id,
                 string_split(replace(text, ' the ', chr(10)), chr(10))
                 AS ls
          FROM documents),
        lines AS (
          SELECT doc_id, pos, trim(ls[pos]) AS line
          FROM raw, UNNEST(range(1, len(ls) + 1)) AS t(pos)
          WHERE trim(ls[pos]) <> ''),
        freq AS (
          SELECT line FROM (
            SELECT line, count(DISTINCT doc_id) AS nd
            FROM lines GROUP BY 1)
          WHERE nd > 2)
        SELECT l.doc_id,
               string_agg(l.line, chr(10) ORDER BY l.pos) AS text_clean,
               count(*) AS n_kept
        FROM lines l LEFT JOIN freq f USING (line)
        WHERE f.line IS NULL
        GROUP BY l.doc_id ORDER BY l.doc_id""",
    "dedup_jaccard": """
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents))),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
        ORDER BY id_a, id_b""",
    "dedup_jaccard_capped": """
        WITH sh0 AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents))),
        keep AS (
          SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 3),
        sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
        ORDER BY id_a, id_b""",
    "dedup_minhash_lsh": """
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents))),
        sig AS (
          SELECT doc_id,
                 {sig_cols}
          FROM sh GROUP BY doc_id),
        bands AS (
          {bands_union}
        )
        SELECT band_id, band_sig,
               {candidates_expr} AS candidates,
               count(*) AS n_docs
        FROM bands GROUP BY band_id, band_sig
        HAVING count(*) >= 2
        ORDER BY band_id, band_sig""",
    "dedup_simhash": None,  # assembled below (long but mechanical)
    "txt_tokens": """
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               length(trim(text)) AS n_chars,
               CAST(ceil(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                         / 4.0) AS BIGINT) AS n_subwords_est
        FROM documents ORDER BY doc_id""",
    "txt_quality": """
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_words,
               round(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                     * 1.0 / len(string_split_regex(trim(text), '\\s+')), 4)
                   AS mean_word_len,
               round(len(regexp_extract_all(lower(trim(text)),
                   '\\b(the|a|an|and|or|of|to|in|on|for|with|is|are|was|be)\\b'))
                     * 1.0 / len(string_split_regex(trim(text), '\\s+')), 4)
                   AS stopword_ratio,
               len(regexp_extract_all(trim(text), '[.,;:!?]')) AS n_punct,
               len(regexp_extract_all(trim(text), '[0-9]')) AS n_digit,
               round(1.0
                 - least(1.0, len(regexp_extract_all(trim(text), '[.,;:!?]'))
                     * 1.0 / greatest(len(string_split_regex(trim(text),
                                                             '\\s+')), 1))
                 - least(0.5, len(regexp_extract_all(trim(text), '[0-9]'))
                     * 1.0 / greatest(length(trim(text)), 1)), 4) AS quality
        FROM documents ORDER BY doc_id""",
    "txt_langid": None,  # assembled below
    "txt_fingerprint": """
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   [CAST(ascii(t[i]) AS BIGINT)
                    for i in range(1, length(t) + 1)]),
                 (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        FROM (SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents)
        ORDER BY doc_id""",
    "sim_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(
                 list_reduce(list_prepend(0.0,
                   [CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                    for i in range(1, len(embedding) + 1)]),
                   (acc, v) -> acc + v)
                 / (sqrt(list_reduce(list_prepend(0.0,
                      [CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                       for i in range(1, len(embedding) + 1)]),
                      (acc, v) -> acc + v))
                    * sqrt(list_reduce(list_prepend(0.0,
                      [CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)
                       for i in range(1, len(qv) + 1)]),
                      (acc, v) -> acc + v))), 6) AS cosine
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY cosine DESC, vec_id LIMIT 10""",
}


# --- multimodal oracles: recompute the decoded statistics from the
# closed-form pixel formula pix(i) = (31·doc_id + 7 + 13·frame + i) % 256
# (the Spark side round-trips real PPM/BMP bytes; any encoder/decoder
# bug — stride padding, BGR order, bottom-up rows — breaks this gate).
# Dims: w = 8 + doc_id%9, h = 6 + doc_id%7 (ops/multimodal.py:_doc_dims).

_MM_DIMS_CTE = """p AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h,
                 31 * doc_id + 7 AS s, 1 + doc_id % 10 AS nf
          FROM documents)"""


def _mm_sums(value_expr, n_expr):
    """(pixel_sum, checksum) SQL over flat index i in [0, n_expr)."""
    psum = (f"CAST(list_sum([({value_expr}) % 256 "
            f"for i in range(0, {n_expr})]) AS BIGINT)")
    csum = (f"CAST(list_sum([(i + 1) * (({value_expr}) % 256) "
            f"for i in range(0, {n_expr})]) % 2147483648 AS BIGINT)")
    return psum, csum


_MM_DEC_PSUM, _MM_DEC_CSUM = _mm_sums("s + i", "w * h * 3")
ORACLES_OPS["mm_decode"] = f"""
        WITH {_MM_DIMS_CTE}
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END
                   AS format,
               CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               CAST(w * h AS BIGINT) AS n_pixels,
               {_MM_DEC_PSUM} AS pixel_sum,
               {_MM_DEC_CSUM} AS checksum
        FROM p ORDER BY doc_id"""

# nearest-neighbor source index for output pixel i of a 20×10×3 raster:
# y2 = i // 60, x2 = (i % 60) // 3, c = i % 3; src = (y2·h//10)·w + x2·w//20
_MM_RS_VAL = ("s + ((((i // 60) * h) // 10) * w "
              "+ (((i % 60) // 3) * w) // 20) * 3 + (i % 3)")
_MM_RS_PSUM, _MM_RS_CSUM = _mm_sums(_MM_RS_VAL, "600")
ORACLES_OPS["mm_resize"] = f"""
        WITH {_MM_DIMS_CTE}
        SELECT doc_id,
               CAST(20 AS BIGINT) AS out_width,
               CAST(10 AS BIGINT) AS out_height,
               {_MM_RS_PSUM} AS pixel_sum,
               {_MM_RS_CSUM} AS checksum
        FROM p ORDER BY doc_id"""

ORACLES_OPS["mm_audio"] = """
        WITH p AS (SELECT doc_id, 256 + 64 * (doc_id % 7) AS n
                   FROM documents)
        SELECT doc_id,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
               CAST(list_max([abs((17 * doc_id + 3 * i) % 4096 - 2048)
                              for i in range(0, n)]) AS BIGINT) AS peak,
               CAST(list_sum([abs((17 * doc_id + 3 * i) % 4096 - 2048)
                              for i in range(0, n)]) AS BIGINT) AS sum_abs
        FROM p ORDER BY doc_id"""

_MM_FR_PSUM, _ = _mm_sums("s + 13 * f + i", "w * h * 3")
ORACLES_OPS["mm_frames"] = f"""
        WITH {_MM_DIMS_CTE}
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               {_MM_FR_PSUM} AS pixel_sum
        FROM (SELECT doc_id, w, h, s, unnest(range(0, nf, 3)) AS f
              FROM p)
        ORDER BY doc_id, frame_idx"""


def _minhash_oracle(num_perm=8, band_size=2, max_bucket=None):
    from .ops.dedup import MINHASH_P, minhash_params

    A, B = minhash_params(num_perm)
    base = "(('0x' || substr(md5(shingle), 1, 12))::BIGINT)"
    sig_cols = ",\n                 ".join(
        f"min(({A[k]} * {base} + {B[k]}) % {MINHASH_P}) "
        f"AS sig_{k}" for k in range(num_perm))
    bands = []
    for b in range(num_perm // band_size):
        cols = " || '|' || ".join(
            f"CAST(sig_{k} AS VARCHAR)"
            for k in range(b * band_size, (b + 1) * band_size))
        bands.append(f"SELECT doc_id, {b} AS band_id, {cols} AS band_sig "
                     "FROM sig")
    cand = "array_to_string(list_sort(list(doc_id)), ',')"
    if max_bucket is not None:
        cand = (f"CASE WHEN count(*) <= {max_bucket} THEN {cand} "
                "ELSE '' END")
    tmpl = _MINHASH_ORACLE_TMPL
    return tmpl.replace("{sig_cols}", sig_cols) \
               .replace("{candidates_expr}", cand) \
               .replace("{bands_union}", "\n          UNION ALL\n          "
                        .join(bands))


_MINHASH_ORACLE_TMPL = ORACLES_OPS["dedup_minhash_lsh"]
ORACLES_OPS["dedup_minhash_lsh"] = _minhash_oracle()
ORACLES_OPS["dedup_minhash_lsh_capped"] = _minhash_oracle(max_bucket=2)
ORACLES_OPS["dedup_minhash128"] = _minhash_oracle(num_perm=128,
                                                  band_size=8,
                                                  max_bucket=64)


def _incremental_oracle(num_perm=8, band_size=2):
    """Independent DuckDB computation of dedup_incremental: band ALL
    docs once (banding is per-doc, so splitting before or after banding
    is equivalent), then batch-vs-corpus collisions in the join filter."""
    from .ops.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = "(('0x' || substr(md5(shingle), 1, 12))::BIGINT)"
    sig_cols = ",\n                 ".join(
        f"min(({MINHASH_A[k]} * {base} + {MINHASH_B[k]}) % {MINHASH_P}) "
        f"AS sig_{k}" for k in range(num_perm))
    bands = []
    for b in range(num_perm // band_size):
        cols = " || '|' || ".join(
            f"CAST(sig_{k} AS VARCHAR)"
            for k in range(b * band_size, (b + 1) * band_size))
        bands.append(f"SELECT doc_id, {b} AS band_id, {cols} AS band_sig "
                     "FROM sig")
    bands_union = "\n          UNION ALL\n          ".join(bands)
    return f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents))),
        sig AS (
          SELECT doc_id,
                 {sig_cols}
          FROM sh GROUP BY doc_id),
        bands AS (
          {bands_union}
        ),
        hits AS (
          SELECT n.doc_id AS doc_id, c.doc_id AS corpus_id,
                 count(DISTINCT n.band_id) AS n_bands
          FROM bands n
          JOIN bands c USING (band_id, band_sig)
          WHERE n.doc_id % 4 = 0 AND c.doc_id % 4 != 0
          GROUP BY 1, 2)
        SELECT doc_id, count(*) AS n_corpus_matches,
               max(n_bands) AS best_bands
        FROM hits GROUP BY doc_id ORDER BY doc_id"""


ORACLES_OPS["dedup_incremental"] = _incremental_oracle()


def _incremental_verified_oracle(num_perm=8, band_size=2, threshold=0.5):
    """Independent DuckDB computation of dedup_incremental_verified:
    banding-collision pairs, then exact Jaccard via list_intersect on
    the per-doc shingle lists."""
    from .ops.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = "(('0x' || substr(md5(shingle), 1, 12))::BIGINT)"
    sig_cols = ",\n                 ".join(
        f"min(({MINHASH_A[k]} * {base} + {MINHASH_B[k]}) % {MINHASH_P}) "
        f"AS sig_{k}" for k in range(num_perm))
    bands = []
    for b in range(num_perm // band_size):
        cols = " || '|' || ".join(
            f"CAST(sig_{k} AS VARCHAR)"
            for k in range(b * band_size, (b + 1) * band_size))
        bands.append(f"SELECT doc_id, {b} AS band_id, {cols} AS band_sig "
                     "FROM sig")
    bands_union = "\n          UNION ALL\n          ".join(bands)
    jac = ("len(list_intersect(a.s, b.s)) * 1.0 / "
           "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))")
    return f"""
        WITH shl AS (
          SELECT doc_id, list_distinct(sh) AS s FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents))),
        sh AS (SELECT doc_id, unnest(s) AS shingle FROM shl),
        sig AS (
          SELECT doc_id,
                 {sig_cols}
          FROM sh GROUP BY doc_id),
        bands AS (
          {bands_union}
        ),
        hits AS (
          SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id
          FROM bands n
          JOIN bands c USING (band_id, band_sig)
          WHERE n.doc_id % 4 = 0 AND c.doc_id % 4 != 0)
        SELECT h.doc_id, h.corpus_id, round({jac}, 6) AS jaccard
        FROM hits h
        JOIN shl a ON a.doc_id = h.doc_id
        JOIN shl b ON b.doc_id = h.corpus_id
        WHERE {jac} >= {threshold}
        ORDER BY h.doc_id, h.corpus_id"""


ORACLES_OPS["dedup_incremental_verified"] = _incremental_verified_oracle()

# connected components over the jaccard pairs: transitive closure via a
# recursive CTE (UNION dedups, so the closure terminates), component =
# min reachable id — exactly the min-label fixpoint the Spark op
# converges to
ORACLES_OPS["dedup_components"] = f"""
    WITH RECURSIVE pairs AS ({ORACLES_OPS['dedup_jaccard']}),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT a, a FROM e
      UNION
      SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m)
    SELECT n AS doc_id, min(m) AS component
    FROM reach GROUP BY n ORDER BY doc_id"""


ORACLES_OPS["dedup_components_capped"] = f"""
    WITH RECURSIVE pairs AS ({ORACLES_OPS['dedup_jaccard_capped']}),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT a, a FROM e
      UNION
      SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m)
    SELECT n AS doc_id, min(m) AS component
    FROM reach GROUP BY n ORDER BY doc_id"""


def _simhash_oracle(nbits=16, halves=False):
    # bit b of md5(word): nibble = hex digit (b//4 + 1); bit = nibble>>(b%4)&1
    votes = []
    for b in range(nbits):
        pos = b // 4 + 1
        shift = 2 ** (b % 4)
        nib = (f"(CASE WHEN substr(h, {pos}, 1) >= 'a' "
               f"THEN ascii(substr(h, {pos}, 1)) - 87 "
               f"ELSE ascii(substr(h, {pos}, 1)) - 48 END)")
        votes.append(f"sum((({nib} // {shift}) % 2) * 2 - 1) AS v{b}")

    def bits(lo, hi):
        return " + ".join(
            f"(CASE WHEN v{b} > 0 THEN {2 ** (b - lo)} ELSE 0 END)"
            for b in range(lo, hi))

    if halves:
        sel = (f"CAST({bits(nbits // 2, nbits)} AS BIGINT) AS simhash_hi, "
               f"CAST({bits(0, nbits // 2)} AS BIGINT) AS simhash_lo")
    else:
        sel = f"CAST({bits(0, nbits)} AS BIGINT) AS simhash"
    return f"""
        WITH words AS (
          SELECT doc_id, md5(w) AS h FROM (
            SELECT doc_id,
                   unnest(list_distinct(
                     string_split_regex(trim(text), '\\s+'))) AS w
            FROM documents) WHERE w != ''),
        votes AS (
          SELECT doc_id, {', '.join(votes)} FROM words GROUP BY doc_id)
        SELECT doc_id, {sel}
        FROM votes ORDER BY doc_id"""


ORACLES_OPS["dedup_simhash"] = _simhash_oracle()
ORACLES_OPS["dedup_simhash64"] = _simhash_oracle(64, halves=True)


def _langid_oracle():
    langs = sorted(_STOP_RX)
    counts = ", ".join(
        f"len(regexp_extract_all(lower(trim(text)), '{_STOP_RX[l]}')) AS c_{l}"
        for l in langs)
    best = f"'{langs[0]}'"
    best_c = f"c_{langs[0]}"
    for l in langs[1:]:
        best = f"(CASE WHEN c_{l} > {best_c} THEN '{l}' ELSE {best} END)"
        best_c = f"(CASE WHEN c_{l} > {best_c} THEN c_{l} ELSE {best_c} END)"
    return f"""
        WITH c AS (SELECT doc_id, {counts} FROM documents)
        SELECT doc_id, {best} AS lang_pred,
               CAST({best_c} AS BIGINT) AS marker_hits
        FROM c ORDER BY doc_id"""


ORACLES_OPS["txt_langid"] = _langid_oracle()


def _srp_lsh_oracle(n_planes=4):
    """SRP-LSH bucket oracle: the planes are the first n_planes stored
    vectors (by vec_id) — fully SQL-expressible; the dot product is the
    same left fold as sim_topk so the sign test is bit-exact."""
    return f"""
        WITH dotp AS (
          SELECT e.vec_id, p.vec_id AS pid,
                 list_reduce(list_prepend(0.0,
                   [CAST(e.embedding[i] AS DOUBLE) *
                    CAST(p.embedding[i] AS DOUBLE)
                    for i in range(1, len(e.embedding) + 1)]),
                   (acc, v) -> acc + v) AS d
          FROM embeddings e JOIN embeddings p ON p.vec_id < {n_planes})
        SELECT vec_id,
               CAST(sum(CASE WHEN d > 0
                             THEN CAST(1 << pid AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM dotp GROUP BY vec_id ORDER BY vec_id"""


ORACLES_OPS["sim_lsh_buckets"] = _srp_lsh_oracle()

_DOT_FOLD = """list_reduce(list_prepend(0.0,
                   [CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                    for i in range(1, len({a}) + 1)]),
                   (acc, v) -> acc + v)"""


def _cosine_sql(a, b):
    num = _DOT_FOLD.format(a=a, b=b)
    na = _DOT_FOLD.format(a=a, b=a)
    nb = _DOT_FOLD.format(a=b, b=b)
    return f"round({num} / (sqrt({na}) * sqrt({nb})), 6)"


def _bucket_cte(n_planes=4, offset=0, name="buckets"):
    """SRP bucket CTE; ``offset`` selects which stored vectors act as
    planes (table l of the multi-table variant uses offset l·n_planes)."""
    return f"""{name} AS (
          SELECT e.vec_id,
                 CAST(sum(CASE WHEN
                   {_DOT_FOLD.format(a='e.embedding', b='p.embedding')} > 0
                   THEN CAST(1 << (p.vec_id - {offset}) AS BIGINT)
                   ELSE 0 END)
                   AS BIGINT) AS bucket
          FROM embeddings e JOIN embeddings p
            ON p.vec_id >= {offset} AND p.vec_id < {offset + n_planes}
          GROUP BY e.vec_id)"""


ORACLES_OPS["sim_ann_lsh"] = f"""
        WITH {_bucket_cte()},
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'q.qv')} AS cosine
        FROM embeddings e
        JOIN buckets be ON be.vec_id = e.vec_id, qb, q
        WHERE be.bucket = qb.bucket AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT 10"""

ORACLES_OPS["sim_topk_batch"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 {_cosine_sql('e.embedding', 'q.qv')} AS cosine
          FROM embeddings e, q
          WHERE e.vec_id != q.query_id),
        r AS (SELECT *, row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, vec_id) AS rn
              FROM scored)
        SELECT query_id, vec_id, cosine FROM r WHERE rn <= 5
        ORDER BY query_id, cosine DESC, vec_id"""

ORACLES_OPS["dedup_embed"] = f"""
        WITH {_bucket_cte()},
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ea.embedding AS va, eb.embedding AS vb
          FROM buckets a JOIN buckets b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id)
        SELECT id_a, id_b, {_cosine_sql('va', 'vb')} AS cosine
        FROM cand
        WHERE {_cosine_sql('va', 'vb')} >= 0.3
        ORDER BY id_a, id_b"""

ORACLES_OPS["dedup_embed_capped"] = f"""
        WITH {_bucket_cte()},
        keep AS (SELECT bucket FROM buckets GROUP BY bucket
                 HAVING count(*) <= 35),
        kb AS (SELECT b.* FROM buckets b JOIN keep USING (bucket)),
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ea.embedding AS va, eb.embedding AS vb
          FROM kb a JOIN kb b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id)
        SELECT id_a, id_b, {_cosine_sql('va', 'vb')} AS cosine
        FROM cand
        WHERE {_cosine_sql('va', 'vb')} >= 0.3
        ORDER BY id_a, id_b"""


def _ivf_cte(n_centroids=4):
    """Per-vector centroid assignment: argmax cosine over the first
    n_centroids stored vectors, ties to the lowest centroid id — the
    same strict-> when-chain as the Spark expression."""
    sims = []
    for c in range(n_centroids):
        num = _DOT_FOLD.format(a="e.embedding", b=f"c{c}.v")
        na = _DOT_FOLD.format(a="e.embedding", b="e.embedding")
        nb = _DOT_FOLD.format(a=f"c{c}.v", b=f"c{c}.v")
        sims.append(f"({num} / (sqrt({na}) * sqrt({nb})))")
    best, best_s = "0", sims[0]
    for i in range(1, n_centroids):
        best = f"(CASE WHEN {sims[i]} > {best_s} THEN {i} ELSE {best} END)"
        best_s = (f"(CASE WHEN {sims[i]} > {best_s} THEN {sims[i]} "
                  f"ELSE {best_s} END)")
    froms = ", ".join(
        f"(SELECT embedding AS v FROM embeddings WHERE vec_id = {c}) c{c}"
        for c in range(n_centroids))
    return (f"assign AS (SELECT e.vec_id, CAST({best} AS BIGINT) AS "
            f"centroid FROM embeddings e, {froms})")


ORACLES_OPS["sim_ivf_assign"] = f"""
        WITH {_ivf_cte()}
        SELECT vec_id, centroid FROM assign ORDER BY vec_id"""

ORACLES_OPS["sim_ann_ivf"] = f"""
        WITH {_ivf_cte()},
        qc AS (SELECT centroid FROM assign WHERE vec_id = 0),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'q.qv')} AS cosine
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id, qc, q
        WHERE a.centroid = qc.centroid AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT 10"""

ORACLES_OPS["txt_bpe"] = r"""
        SELECT doc_id,
               len(regexp_extract_all(lower(trim(text)),
                   '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+'))
               AS n_bpe_tokens
        FROM documents ORDER BY doc_id"""

def _bpe_real_oracle():
    """Replay the BPE merges table in DuckDB: same symbol-stream
    encoding ('|sym|' wrapping, '||' boundaries, chr(2) between
    pretokens), same leftmost non-overlapping replace per merge."""
    from .ops.text import BPE_MERGES, BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    stream = ("'|' || array_to_string("
              "[regexp_replace(tok, '(?s)(.)', '|\\1|', 'g') "
              "for tok in toks], '|' || chr(2) || '|') || '|'")
    merged = "stream"
    for a, b in BPE_MERGES:
        sa = a.replace("'", "''")
        sb = b.replace("'", "''")
        merged = (f"replace({merged}, '|{sa}||{sb}|', "
                  f"'|{sa}{sb}|')")
    return f"""
        WITH s AS (
          SELECT doc_id,
                 regexp_extract_all(
                   replace(replace(lower(trim(text)), '|', ' '),
                           chr(2), ' '),
                   '{pat}') AS toks
          FROM documents),
        enc AS (
          SELECT doc_id, toks, {stream} AS stream FROM s)
        SELECT doc_id,
               CAST(CASE WHEN len(toks) = 0 THEN 0
                    ELSE len(string_split({merged}, '||')) - 2
                         - (len(toks) - 1) END AS BIGINT) AS n_bpe_tokens
        FROM enc ORDER BY doc_id"""


ORACLES_OPS["txt_bpe_real"] = _bpe_real_oracle()


# --- multi-table LSH ANN oracle ---------------------------------------------

def _lsh_multi_oracle(n_planes=4, n_tables=3, k=10):
    ctes = ",\n        ".join(
        _bucket_cte(n_planes, offset=t * n_planes, name=f"b{t}")
        for t in range(n_tables))
    joins = "\n        ".join(
        f"JOIN b{t} e{t} ON e{t}.vec_id = e.vec_id" for t in range(n_tables))
    qcols = ", ".join(
        f"(SELECT bucket FROM b{t} WHERE vec_id = 0) AS qb{t}"
        for t in range(n_tables))
    cond = " OR ".join(f"e{t}.bucket = q.qb{t}" for t in range(n_tables))
    return f"""
        WITH {ctes},
        q AS (SELECT {qcols}),
        qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'qv.v')} AS cosine
        FROM embeddings e
        {joins}, q, qv
        WHERE ({cond}) AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT {k}"""


ORACLES_OPS["sim_ann_lsh_multi"] = _lsh_multi_oracle()


# --- multi-probe IVF + trained-k-means oracles --------------------------------

def _ivf_cells_sql(n_centroids=4, n_probe=2):
    """Top-n_probe centroid ids by cosine to the query (ties → lowest
    id), over the first-k seed centroids c0..c{k-1}."""
    sims = "\n          UNION ALL ".join(
        f"SELECT {c} AS centroid, "
        f"{_cosine_sql('q.qv', f'c{c}.v')} AS s FROM q, c{c}"
        for c in range(n_centroids))
    return (f"sims AS ({sims}),\n        cells AS "
            f"(SELECT centroid FROM sims ORDER BY s DESC, centroid "
            f"LIMIT {n_probe})")


def _ivf_probed_oracle(n_centroids=4, n_probe=2, k=10):
    cents = ",\n        ".join(
        f"c{c} AS (SELECT embedding AS v FROM embeddings "
        f"WHERE vec_id = {c})" for c in range(n_centroids))
    return f"""
        WITH {cents},
        {_ivf_cte(n_centroids)},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        {_ivf_cells_sql(n_centroids, n_probe)}
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'q.qv')} AS cosine
        FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id, q
        WHERE a.centroid IN (SELECT centroid FROM cells)
          AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT {k}"""


ORACLES_OPS["sim_ann_ivf_probed"] = _ivf_probed_oracle()

# multi-probe LSH: buckets within Hamming distance 1 of the query's —
# for 4 planes the admissible XOR values are {0, 1, 2, 4, 8}
ORACLES_OPS["sim_ann_lsh_probed"] = f"""
        WITH {_bucket_cte()},
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'q.qv')} AS cosine
        FROM embeddings e
        JOIN buckets be ON be.vec_id = e.vec_id, qb, q
        WHERE xor(be.bucket, qb.bucket) IN (0, 1, 2, 4, 8)
          AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT 10"""


# --- seeded k-means (ivf_train) oracle: replay the training exactly.
# Quantized inputs (round(v·1000)) make every sum exact, so the
# (centroid, dim) → (sum, count) stats of the final iteration are
# integers — no float risk in the gate; the inter-iteration centroid is
# the same IEEE double division s/n on both engines, and every cosine is
# the same ascending left fold, so assignments match bit-for-bit.

def _kmeans_ctes(n_centroids=4, n_iter=2, suffix="", lo=None, hi=None):
    """Seeded-k-means replay CTEs. ``suffix`` namespaces the CTE chain
    (q{suffix}, a{suffix}{it}, m{suffix}{it}, c{suffix}{it}) so several
    trainings can coexist in one statement (PQ subspaces); lo/hi
    (1-based, inclusive) restrict training to a vector slice."""
    cos = _cosine_sql("q.qv", "c.cv")
    rng = ("range(1, len(embedding) + 1)" if lo is None
           else f"range({lo}, {hi} + 1)")
    qn = f"q{suffix}"
    parts = [f"""{qn} AS MATERIALIZED (
          SELECT vec_id,
                 [round(CAST(embedding[j] AS DOUBLE) * 1000, 0)
                  for j in {rng}] AS qv
          FROM embeddings),
        c{suffix}0 AS MATERIALIZED (SELECT vec_id AS centroid, qv AS cv FROM {qn}
               WHERE vec_id < {n_centroids})"""]
    for it in range(1, n_iter + 1):
        parts.append(f"""a{suffix}{it} AS MATERIALIZED (
          SELECT vec_id, centroid FROM (
            SELECT q.vec_id, c.centroid,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {cos} DESC, c.centroid)
                       AS rn
            FROM {qn} q, c{suffix}{it - 1} c) WHERE rn = 1)""")
        parts.append(f"""m{suffix}{it} AS MATERIALIZED (
          SELECT centroid, i, CAST(sum(qv[i]) AS BIGINT) AS s,
                 count(*) AS n
          FROM (SELECT a.centroid, q.qv,
                       unnest(range(1, len(q.qv) + 1)) AS i
                FROM {qn} q JOIN a{suffix}{it} a USING (vec_id))
          GROUP BY centroid, i)""")
        parts.append(f"""c{suffix}{it} AS MATERIALIZED (
          SELECT centroid, list(s / n ORDER BY i) AS cv
          FROM m{suffix}{it} GROUP BY centroid
          UNION ALL
          SELECT centroid, cv FROM c{suffix}{it - 1}
          WHERE centroid NOT IN (SELECT centroid FROM m{suffix}{it}))""")
    return ",\n        ".join(parts)


def _ivf_train_oracle(n_centroids=4, n_iter=2):
    return f"""
        WITH {_kmeans_ctes(n_centroids, n_iter)}
        SELECT centroid, i - 1 AS i, s AS sum_v, n AS n_members
        FROM m{n_iter} ORDER BY centroid, i"""


ORACLES_OPS["sim_ivf_train"] = _ivf_train_oracle()


def _ivf_trained_ann_oracle(n_centroids=4, n_iter=2, n_probe=2, k=10):
    """ANN over the TRAINED centroids: original vectors assigned to
    c{n_iter} centroids (cosine is scale-invariant, so assigning
    unquantized vectors against quantized-space centroids is exact),
    top-n_probe cells by query-centroid cosine, exact verify."""
    cos_assign = _cosine_sql("e.embedding", "c.cv")
    cos_q = _cosine_sql("q.qv", "c.cv")
    return f"""
        WITH {_kmeans_ctes(n_centroids, n_iter)},
        fa AS (
          SELECT vec_id, centroid FROM (
            SELECT e.vec_id, c.centroid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos_assign} DESC,
                                               c.centroid) AS rn
            FROM embeddings e, c{n_iter} c) WHERE rn = 1),
        cells AS (
          SELECT centroid FROM (
            SELECT c.centroid, {cos_q} AS s
            FROM (SELECT embedding AS qv FROM embeddings
                  WHERE vec_id = 0) q, c{n_iter} c)
          ORDER BY s DESC, centroid LIMIT {n_probe})
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'qq.qv')} AS cosine
        FROM embeddings e JOIN fa ON fa.vec_id = e.vec_id,
             (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) qq
        WHERE fa.centroid IN (SELECT centroid FROM cells)
          AND e.vec_id != 0
        ORDER BY cosine DESC, e.vec_id LIMIT {k}"""


ORACLES_OPS["sim_ann_ivf_trained"] = _ivf_trained_ann_oracle()


# --- product quantization: per-subspace k-means replay + ADC scan -------------

_PQ_SLICES = [(1, 32), (33, 64)]     # m=2 subspaces of the 64-dim space


def _pq_assign_sql(slice_sql, cent_tables):
    """argmax-cosine of a sliced vector against per-centroid one-row
    CTEs — list_position of the list max finds the FIRST maximum (ties
    to lowest centroid id), mirroring _argmax_cosine_expr; linear in
    the centroid count."""
    sims = []
    for ct in cent_tables:
        num = _DOT_FOLD.format(a=slice_sql, b=f"{ct}.cv")
        na = _DOT_FOLD.format(a=slice_sql, b=slice_sql)
        nb = _DOT_FOLD.format(a=f"{ct}.cv", b=f"{ct}.cv")
        sims.append(f"({num} / (sqrt({na}) * sqrt({nb})))")
    lv = f"list_value({', '.join(sims)})"
    return f"(list_position({lv}, list_aggregate({lv}, 'max')) - 1)"


def _pq_ctes(slices, k=4, n_iter=2):
    parts = [_kmeans_ctes(k, n_iter, suffix=f"p{s}", lo=lo, hi=hi)
             for s, (lo, hi) in enumerate(slices)]
    for s, (lo, hi) in enumerate(slices):
        for c in range(k):
            parts.append(f"pc{s}_{c} AS MATERIALIZED (SELECT cv FROM cp{s}{n_iter} "
                         f"WHERE centroid = {c})")
        parts.append(f"pq{s} AS MATERIALIZED (SELECT embedding[{lo}:{hi}] AS qv "
                     f"FROM embeddings WHERE vec_id = 0)")
    return ",\n        ".join(parts)


def _pq_train_oracle(slices, k=4, n_iter=2):
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT {s} AS subspace, centroid, i - 1 AS i, "
        f"m.s AS sum_v, m.n AS n_members FROM mp{s}{n_iter} m"
        for s in range(len(slices)))
    return f"""
        WITH {_pq_ctes(slices, k, n_iter)}
        SELECT * FROM (
          {unions})
        ORDER BY subspace, centroid, i"""


ORACLES_OPS["sim_pq_train"] = _pq_train_oracle(_PQ_SLICES)


def _pq_adc_select(slices, k_cent):
    """(froms, score_sql): the per-row ADC score of table alias e."""
    froms, parts = [], []
    for s, (lo, hi) in enumerate(slices):
        tables = [f"pc{s}_{c}" for c in range(k_cent)]
        froms += tables + [f"pq{s}"]
        code = _pq_assign_sql(f"e.embedding[{lo}:{hi}]", tables)
        whens = " ".join(
            f"WHEN {c} THEN {_cosine_sql(f'pq{s}.qv', f'pc{s}_{c}.cv')}"
            for c in range(k_cent))
        parts.append(f"(CASE {code} {whens} ELSE 0.0 END)")
    return froms, " + ".join(parts)


def _pq_ann_oracle(slices, k_cent=4, n_iter=2, topk=10):
    froms, score = _pq_adc_select(slices, k_cent)
    return f"""
        WITH {_pq_ctes(slices, k_cent, n_iter)}
        SELECT vec_id, round({score}, 6) AS adc_score
        FROM embeddings e, {', '.join(froms)}
        WHERE e.vec_id != 0
        ORDER BY adc_score DESC, vec_id LIMIT {topk}"""


ORACLES_OPS["sim_ann_pq"] = _pq_ann_oracle(_PQ_SLICES)
# the indexed variant is row-identical by construction (same books,
# same round-6 ADC contract) — the same oracle gates both
ORACLES_OPS["sim_ann_pq_indexed"] = _pq_ann_oracle(_PQ_SLICES)
# the indexed LSH/IVF probes are row-identical to their recompute
# twins (same bucket/assignment function, same tie-breaks)
ORACLES_OPS["sim_ann_lsh_indexed"] = ORACLES_OPS["sim_ann_lsh"]
ORACLES_OPS["sim_ann_ivf_indexed"] = ORACLES_OPS["sim_ann_ivf"]

# the re-rank variant: m=4 x 16-dim subspaces, k=4, ADC shortlist of
# 100 then EXACT cosine re-rank of only the shortlist (m=8/k=8 is
# pytest-gated — its 64-centroid replay is too slow as an inlined
# DuckDB oracle)
_PQ4_SLICES = [(1 + 16 * s, 16 + 16 * s) for s in range(4)]


def _pq_rerank_oracle(slices, k_cent=4, n_iter=2, shortlist=100, topk=10):
    froms, score = _pq_adc_select(slices, k_cent)
    return f"""
        WITH {_pq_ctes(slices, k_cent, n_iter)},
        short AS (
          SELECT vec_id, round({score}, 6) AS adc_score
          FROM embeddings e, {', '.join(froms)}
          WHERE e.vec_id != 0
          ORDER BY adc_score DESC, vec_id LIMIT {shortlist})
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'qq.qv')} AS cosine
        FROM embeddings e JOIN short USING (vec_id),
             (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) qq
        ORDER BY cosine DESC, e.vec_id LIMIT {topk}"""


ORACLES_OPS["sim_ann_pq_rerank"] = _pq_rerank_oracle(_PQ4_SLICES)


def _ivfpq_oracle(slices, n_centroids=4, n_probe=2, k_cent=4, n_iter=2,
                  shortlist=100, topk=10):
    """IVF-PQ composite probe, composed from the already-gated pieces:
    seed-centroid coarse assignment (_ivf_cte) + top-n_probe cell
    selection (_ivf_cells_sql) + per-subspace k-means replay + ADC
    (_pq_ctes/_pq_adc_select) restricted to the probed cells + exact
    re-rank of the shortlist."""
    cents = ",\n        ".join(
        f"c{c} AS (SELECT embedding AS v FROM embeddings "
        f"WHERE vec_id = {c})" for c in range(n_centroids))
    froms, score = _pq_adc_select(slices, k_cent)
    return f"""
        WITH {cents},
        {_ivf_cte(n_centroids)},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        {_ivf_cells_sql(n_centroids, n_probe)},
        {_pq_ctes(slices, k_cent, n_iter)},
        short AS (
          SELECT e.vec_id, round({score}, 6) AS adc_score
          FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id,
               {', '.join(froms)}
          WHERE a.centroid IN (SELECT centroid FROM cells)
            AND e.vec_id != 0
          ORDER BY adc_score DESC, e.vec_id LIMIT {shortlist})
        SELECT e.vec_id,
               {_cosine_sql('e.embedding', 'qq.qv')} AS cosine
        FROM embeddings e JOIN short USING (vec_id),
             (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) qq
        ORDER BY cosine DESC, e.vec_id LIMIT {topk}"""


ORACLES_OPS["sim_ann_ivfpq_indexed"] = _ivfpq_oracle(_PQ4_SLICES)


# curation keep-list: compose the quality, langid and components
# oracles (derived tables; the components one carries its own WITH
# RECURSIVE) — keep = quality gate AND language gate AND (no dup class
# OR elected keeper). Components come from the CAPPED jaccard path
# (the production generator q_curate_keep now runs, max_df=3).
ORACLES_OPS["curate_keep"] = f"""
    SELECT d.doc_id, q.quality, l.lang_pred
    FROM documents d
    JOIN ({ORACLES_OPS['txt_quality']}) q USING (doc_id)
    JOIN ({ORACLES_OPS['txt_langid']}) l USING (doc_id)
    LEFT JOIN ({ORACLES_OPS['dedup_components_capped']}) c USING (doc_id)
    WHERE q.quality >= 0.5 AND l.lang_pred = 'en'
      AND (c.component IS NULL OR c.component = d.doc_id)
    ORDER BY d.doc_id"""


_SHINGLES3 = """SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
            SELECT doc_id,
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, greatest(len(w) - 2, 0) + 1)] AS sh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\\s+') AS w
                  FROM documents{where}))"""

ORACLES_OPS["curate_decontaminate"] = f"""
    WITH bs AS (SELECT DISTINCT shingle FROM (
          {_SHINGLES3.format(where=' WHERE doc_id % 50 = 0')})),
    ds AS ({_SHINGLES3.format(where='')}),
    hits AS (SELECT doc_id, count(*) AS n
             FROM ds JOIN bs USING (shingle) GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN coalesce(h.n, 0) >= 2 THEN 1 ELSE 0 END
                AS BIGINT) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id"""

# 13-gram decontamination with span removal: independent relational
# statement of decontaminate_cut — benchmark window set (mod-5 slice),
# corpus window occurrences matched by hash, covered positions cut,
# kept tokens reassembled in order
ORACLES_OPS["curate_decontaminate_cut"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents),
    occ AS (
      SELECT doc_id, i AS start,
             md5(array_to_string(w[i:i+12], ' ')) AS g
      FROM (SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 12, 0) + 1)) AS i
            FROM t)),
    bset AS (SELECT DISTINCT g FROM occ WHERE doc_id % 5 = 0),
    corp AS (SELECT doc_id, w FROM t WHERE doc_id % 5 != 0),
    marked AS (SELECT o.doc_id, o.start
               FROM occ o JOIN bset USING (g)
               WHERE o.doc_id % 5 != 0),
    cutp AS (SELECT DISTINCT doc_id, p
             FROM (SELECT doc_id,
                          unnest(range(start, start + 13)) AS p
                   FROM marked)),
    toks AS (SELECT doc_id, p, w[p] AS tok
             FROM (SELECT doc_id, w,
                          unnest(range(1, len(w) + 1)) AS p
                   FROM corp)),
    kept AS (SELECT doc_id, p, tok
             FROM toks ANTI JOIN cutp USING (doc_id, p)),
    agg AS (SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY p) AS text_cut,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id),
    n AS (SELECT doc_id, len(w) AS n_tok FROM corp)
    SELECT n.doc_id,
           coalesce(a.text_cut, '') AS text_cut,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(n.n_tok - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           CAST(CASE WHEN n.n_tok - coalesce(a.n_kept, 0) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS contaminated
    FROM n LEFT JOIN agg a USING (doc_id)
    ORDER BY n.doc_id"""

ORACLES_OPS["curate_split"] = """
    SELECT doc_id, CAST(b AS BIGINT) AS bucket,
           CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                     ::BIGINT % 100 AS b
          FROM documents)
    ORDER BY doc_id"""

ORACLES_OPS["curate_token_budget"] = f"""
    SELECT d.source AS source, count(*) AS n_docs,
           CAST(sum(t.n_bpe_tokens) AS BIGINT) AS n_tokens
    FROM documents d JOIN ({ORACLES_OPS['txt_bpe_real']}) t
      USING (doc_id)
    GROUP BY 1 ORDER BY source"""


# --- Gopher/C4 curation oracles ------------------------------------------------
# The Spark side computes the n-gram mode IN-ROW (run-length over the
# sorted gram array, ties to lex-smallest); the oracle reproduces the
# same choice relationally: row_number() ORDER BY count DESC, gram ASC.

def _gram_cte(n):
    """doc_id, gram, count CTE body for word n-grams (DuckDB)."""
    return f"""SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest([array_to_string(w[i:i+{n - 1}], ' ')
              for i in range(1, greatest(len(w) - {n - 1}, 0) + 1)]) AS g
            FROM base) GROUP BY 1, 2"""


_REP_BASE = r"""base AS (
      SELECT doc_id, trim(text) AS t,
             string_split_regex(trim(text), '\s+') AS w,
             length(trim(text)) AS n_chars,
             [trim(x) for x in string_split(trim(text), chr(10))] AS ls
      FROM documents)"""

_REP_FRAC = ("round(least(1.0, coalesce({num}, 0) * 1.0"
             " / greatest(n_chars, 1)), 6)")

ORACLES_OPS["txt_repetition"] = f"""
    WITH {_REP_BASE},
    lc AS (SELECT doc_id, l, count(*) AS c
           FROM (SELECT doc_id, unnest(ls) AS l FROM base) GROUP BY 1, 2),
    ldup AS (SELECT doc_id, sum((c - 1) * length(l)) AS chars
             FROM lc WHERE c > 1 GROUP BY 1),
    g2 AS ({_gram_cte(2)}),
    t2 AS (SELECT doc_id, c * length(g) AS chars FROM (
            SELECT doc_id, g, c, row_number() OVER
              (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM g2)
           WHERE rn = 1),
    g3 AS ({_gram_cte(3)}),
    t3 AS (SELECT doc_id, c * length(g) AS chars FROM (
            SELECT doc_id, g, c, row_number() OVER
              (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn FROM g3)
           WHERE rn = 1),
    g5 AS ({_gram_cte(5)}),
    d5 AS (SELECT doc_id, sum(c * length(g)) AS chars
           FROM g5 WHERE c > 1 GROUP BY 1)
    SELECT b.doc_id,
      round(least(1.0, (len(ls) - len(list_distinct(ls))) * 1.0
            / greatest(len(ls), 1)), 6) AS dup_line_frac,
      {_REP_FRAC.format(num='ldup.chars')} AS dup_line_char_frac,
      {_REP_FRAC.format(num='t2.chars')} AS top_2gram_char_frac,
      {_REP_FRAC.format(num='t3.chars')} AS top_3gram_char_frac,
      {_REP_FRAC.format(num='d5.chars')} AS dup_5gram_char_frac
    FROM base b LEFT JOIN ldup USING (doc_id) LEFT JOIN t2 USING (doc_id)
    LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
    ORDER BY doc_id"""

# inner metric projection shared by the quality + composed gates
_QUAL_METRICS = r"""
    SELECT doc_id,
      len(w) AS n_words,
      round(length(regexp_replace(t, '\s+', '', 'g')) * 1.0
            / greatest(len(w), 1), 4) AS mean_word_len,
      round((len(regexp_extract_all(t, '#'))
             + len(regexp_extract_all(t, '\.\.\.|…'))) * 1.0
            / greatest(len(w), 1), 6) AS symbol_word_ratio,
      round(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
            / greatest(len(w), 1), 6) AS alpha_word_frac,
      CAST(len(list_distinct(regexp_extract_all(lower(t),
           '\b(the|be|to|of|and|that|have|with)\b'))) AS BIGINT)
          AS n_stop_hits,
      round(len(list_filter(ls, x -> regexp_matches(x, '^[-*•]'))) * 1.0
            / greatest(len(ls), 1), 6) AS bullet_line_frac,
      round(len(list_filter(ls, x -> regexp_matches(x, '(\.\.\.|…)$')))
            * 1.0 / greatest(len(ls), 1), 6) AS ellipsis_line_frac
    FROM base"""

_QUAL_KEEP = """(n_words BETWEEN {minw} AND 100000
      AND mean_word_len BETWEEN 3.0 AND 10.0
      AND symbol_word_ratio <= 0.1 AND alpha_word_frac >= 0.8
      AND n_stop_hits >= {minstop} AND bullet_line_frac <= 0.9
      AND ellipsis_line_frac <= 0.3)"""

ORACLES_OPS["txt_gopher_quality"] = f"""
    WITH {_REP_BASE},
    m AS ({_QUAL_METRICS})
    SELECT *, CAST(CASE WHEN {_QUAL_KEEP.format(minw=40, minstop=1)}
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM m ORDER BY doc_id"""

ORACLES_OPS["curate_gopher"] = f"""
    WITH rep AS ({ORACLES_OPS['txt_repetition']}),
    {_REP_BASE},
    q AS ({_QUAL_METRICS})
    SELECT rep.doc_id, rep.dup_line_frac, rep.top_2gram_char_frac,
           rep.top_3gram_char_frac, rep.dup_5gram_char_frac,
           q.n_words, q.n_stop_hits,
           CAST(CASE WHEN rep.dup_line_frac <= 0.30
                  AND rep.top_2gram_char_frac <= 0.10
                  AND rep.top_3gram_char_frac <= 0.06
                  AND rep.dup_5gram_char_frac <= 0.15
                  AND {_QUAL_KEEP.format(minw=40, minstop=1)}
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM rep JOIN q USING (doc_id) ORDER BY doc_id"""

def _url_canonicalize_oracle():
    from .ops.urlnorm import oracle_sql_expr

    messy = """(
      (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END)
      || '://' || 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
      || (CASE WHEN doc_id % 4 = 0 THEN ':80'
               WHEN doc_id % 4 = 1 THEN ':443'
               WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
      || (CASE WHEN doc_id % 5 = 0 THEN '/x/./y/../z'
               WHEN doc_id % 5 = 1 THEN '/a/b/../../c/'
               WHEN doc_id % 5 = 2 THEN ''
               WHEN doc_id % 5 = 3 THEN '/p/q' ELSE '/./../x' END)
      || (CASE WHEN doc_id % 2 = 0 THEN '?B=1&a=2#frag'
               ELSE '#sec' END))"""
    return f"""
    SELECT doc_id, url, {oracle_sql_expr('url')} AS url_norm
    FROM (SELECT doc_id, {messy} AS url FROM documents)
    ORDER BY doc_id"""


ORACLES_OPS["url_canonicalize"] = _url_canonicalize_oracle()

# full normalization: expected outputs stated DIRECTLY per input family
# (independent of the engine's kernel — a true oracle, not a replay):
# %7e/%7E decode to ~ (unreserved), %41 -> A but %2f stays (reserved,
# hex uppercased), invalid %zz untouched, %3a uppercased, %2e -> '.'
# which then collapses as a dot segment
ORACLES_OPS["url_canonicalize_full"] = """
    SELECT doc_id,
      'HTTPS://EX' || CAST(doc_id % 5 AS VARCHAR) || '.Test/' ||
      (CASE WHEN doc_id % 6 = 0 THEN '%7e'
            WHEN doc_id % 6 = 1 THEN '%7E'
            WHEN doc_id % 6 = 2 THEN '%41%2f'
            WHEN doc_id % 6 = 3 THEN '%zz'
            WHEN doc_id % 6 = 4 THEN 'a%3ab'
            ELSE '%2e' END) || '/x?q=%54est%2f' AS url,
      'https://ex' || CAST(doc_id % 5 AS VARCHAR) || '.test' ||
      (CASE WHEN doc_id % 6 IN (0, 1) THEN '/~/x'
            WHEN doc_id % 6 = 2 THEN '/A%2F/x'
            WHEN doc_id % 6 = 3 THEN '/%zz/x'
            WHEN doc_id % 6 = 4 THEN '/a%3Ab/x'
            ELSE '/x' END) || '?q=Test%2F' AS url_norm
    FROM documents ORDER BY doc_id"""

ORACLES_OPS["warc_roundtrip"] = """
    SELECT 'https://doc' || CAST(doc_id AS VARCHAR) || '.test/' AS url,
           CAST(200 AS BIGINT) AS http_status,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents ORDER BY url"""

ORACLES_OPS["curate_mixture"] = f"""
    WITH per AS (
      SELECT d.source AS source, count(*) AS n_docs,
             CAST(sum(t.n_bpe_tokens) AS BIGINT) AS n_tokens
      FROM documents d JOIN ({ORACLES_OPS['txt_bpe_real']}) t
        USING (doc_id)
      GROUP BY 1),
    z AS (SELECT sum(sqrt(n_tokens)) AS z FROM per)
    SELECT source, n_docs, n_tokens,
           round(sqrt(n_tokens) / z, 6) AS weight,
           CAST(round(sqrt(n_tokens) / z * 1000000.0) AS BIGINT)
               AS quota_tokens
    FROM per, z ORDER BY source"""

ORACLES_OPS["curate_corpus"] = f"""
    WITH g AS ({ORACLES_OPS['curate_gopher']}),
    d AS ({ORACLES_OPS['curate_decontaminate']}),
    c AS ({ORACLES_OPS['dedup_components']}),
    s AS ({ORACLES_OPS['curate_split']})
    SELECT g.doc_id, g.keep AS gopher_keep, d.contaminated,
      CAST(CASE WHEN c.component IS NULL OR c.component = g.doc_id
           THEN 1 ELSE 0 END AS BIGINT) AS is_keeper,
      s.split,
      CAST(CASE WHEN g.keep = 1 AND d.contaminated = 0
             AND (c.component IS NULL OR c.component = g.doc_id)
           THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM g JOIN d USING (doc_id) JOIN s USING (doc_id)
    LEFT JOIN c USING (doc_id)
    ORDER BY doc_id"""

# production variant: keeper election over the df-capped jaccard pairs
ORACLES_OPS["curate_corpus_capped"] = f"""
    WITH g AS ({ORACLES_OPS['curate_gopher']}),
    d AS ({ORACLES_OPS['curate_decontaminate']}),
    c AS ({ORACLES_OPS['dedup_components_capped']}),
    s AS ({ORACLES_OPS['curate_split']})
    SELECT g.doc_id, g.keep AS gopher_keep, d.contaminated,
      CAST(CASE WHEN c.component IS NULL OR c.component = g.doc_id
           THEN 1 ELSE 0 END AS BIGINT) AS is_keeper,
      s.split,
      CAST(CASE WHEN g.keep = 1 AND d.contaminated = 0
             AND (c.component IS NULL OR c.component = g.doc_id)
           THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM g JOIN d USING (doc_id) JOIN s USING (doc_id)
    LEFT JOIN c USING (doc_id)
    ORDER BY doc_id"""

# the paginate wrapper (8-word lines, '.' where doc_id+line_idx is
# even) is part of the query on BOTH sides — see _paginated_docs
ORACLES_OPS["txt_c4_clean"] = r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents),
    wrapped AS (
      SELECT doc_id,
        array_to_string([array_to_string(w[s:s+7], ' ') ||
           (CASE WHEN (doc_id + (s-1)//8) % 2 = 0 THEN '.' ELSE '' END)
           for s in range(1, greatest(len(w), 1) + 1, 8)],
          chr(10)) AS text
      FROM w),
    base AS (SELECT doc_id, trim(text) AS t,
                    [trim(x) for x in string_split(trim(text), chr(10))]
                        AS ls
             FROM wrapped),
    res AS (SELECT doc_id, ls, t,
             list_filter(ls, x -> regexp_matches(x, '[.!?"”]$')
                 AND len(string_split_regex(x, '\s+')) >= 3
                 AND NOT contains(lower(x), 'javascript')) AS kept
            FROM base)
    SELECT doc_id, len(ls) AS n_lines, len(kept) AS n_kept,
      coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
      CAST(CASE WHEN len(kept) >= 2
                 AND NOT contains(lower(t), 'lorem ipsum')
                 AND NOT contains(t, '{') THEN 1 ELSE 0 END AS BIGINT)
          AS page_keep
    FROM res ORDER BY doc_id"""


# The mock page's three expected items are a FIXED row set — the
# reference's own e2e expectation (config-mock.yaml + scraper_test
# fixtures), also byte-parity-asserted in tests/test_mock_e2e.py. A
# literal VALUES oracle closes the driver's hash gate on them.
_MOCK_STATIC = ("'https://mock.url', 'MockVenue', 'Zurich', 'Switzerland', "
                "'concert', 'https://mock.url'")
ORACLES_OPS["crawl_mock_items"] = f"""
    SELECT * FROM (VALUES
      ('https://mock.url', CAST(0 AS BIGINT), {_MOCK_STATIC},
       'Final Story', TIMESTAMP '2025-08-20 20:00:00'),
      ('https://mock.url', CAST(1 AS BIGINT), {_MOCK_STATIC},
       'Moment Of Madness', TIMESTAMP '2025-08-21 21:00:00'),
      ('https://mock.url', CAST(2 AS BIGINT), {_MOCK_STATIC},
       'Irony of Fate', TIMESTAMP '2025-08-22 20:30:00'))
    AS t(page_url, item_idx, "sourceUrl", location, city, country,
         type, url, title, date)"""

# crawl_round runs a deterministic bounded synthetic web (fixed
# SynthSpec, fixed seeds, fixed virtual clock — independent of sf_dir
# and parallelism; invariance is pytest-asserted). Its per-round
# summaries are therefore a fixed row set, oracle-able as literals.
ORACLES_OPS["crawl_round"] = """
    SELECT CAST(round AS BIGINT) AS round,
           CAST(n_dequeued AS BIGINT) AS n_dequeued,
           CAST(n_fetched_ok AS BIGINT) AS n_fetched_ok,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(n_new_urls AS BIGINT) AS n_new_urls
    FROM (VALUES
      (-1, 0, 0, 0, 3), (0, 3, 3, 6, 9), (1, 9, 9, 6, 7),
      (2, 7, 7, 2, 3), (3, 3, 3, 2, 2), (4, 2, 2, 0, 0),
      (5, 0, 0, 0, 0))
    AS t(round, n_dequeued, n_fetched_ok, n_items, n_new_urls)
    ORDER BY round"""


# --- catalog -------------------------------------------------------------------

def all_queries():
    # Stable TOPICAL order, capped at 50 entries: the external
    # correctness driver verifies the first 50, so keeping the catalog
    # under that bound means EVERY operator family lands a driver row
    # EVERY round — coverage is structural, not positional. Each
    # family keeps its PRODUCTION-SHAPE variant here (capped /
    # verified / indexed / full); the demo and uncapped twins moved to
    # extra_queries() and stay oracle-gated by tests/test_oracle_parity
    # (which parametrizes over the UNION of both dicts).
    qs = {
        # --- goskyr extraction parity (reference scraper semantics) ---
        "ex_items_explode": q_ex_items_explode,
        "ex_text_css": q_ex_text_css,
        "ex_attr": q_ex_attr,
        "ex_regex": q_ex_regex,
        "ex_transform": q_ex_transform,
        "ex_urljoin": q_ex_urljoin,
        "ex_date": q_ex_date,
        "ex_filter": q_ex_filter,
        "ex_static_hide": q_ex_static_hide,
        # --- crawl (frontier, dedup, politeness, pagination) ---
        "crawl_mock_items": q_crawl_mock_items,
        "crawl_round": q_crawl_round,
        # --- WARC source + URL normalization ---
        "warc_roundtrip": q_warc_roundtrip,
        "url_canonicalize_full": q_url_canonicalize_full,
        # --- deduplication ---
        "dedup_exact": q_dedup_exact,
        "dedup_lines": q_dedup_lines,
        "dedup_substring_cut": q_dedup_substring_cut,
        "dedup_minhash_lsh_capped": q_dedup_minhash_lsh_capped,
        "dedup_incremental_verified": q_dedup_incremental_verified,
        "dedup_jaccard_capped": q_dedup_jaccard_capped,
        "dedup_components_capped": q_dedup_components_capped,
        "dedup_simhash64": q_dedup_simhash64,
        "dedup_embed_capped": q_dedup_embed_capped,
        # --- text analysis ---
        "txt_tokens": q_txt_tokens,
        "txt_quality": q_txt_quality,
        "txt_langid": q_txt_langid,
        "txt_fingerprint": q_txt_fingerprint,
        "txt_bpe_real": q_txt_bpe_real,
        "txt_repetition": q_txt_repetition,
        "txt_gopher_quality": q_txt_gopher_quality,
        "txt_c4_clean": q_txt_c4_clean,
        # --- similarity search ---
        "sim_topk": q_sim_topk,
        "sim_ivf_assign": q_sim_ivf_assign,
        "sim_ann_lsh_multi": q_sim_ann_lsh_multi,
        "sim_ann_ivfpq_indexed": q_sim_ann_ivfpq_indexed,
        "sim_ivf_train": q_sim_ivf_train,
        "sim_ann_ivf_trained": q_sim_ann_ivf_trained,
        "sim_pq_train": q_sim_pq_train,
        "sim_ann_pq_rerank": q_sim_ann_pq_rerank,
        "sim_ann_pq_indexed": q_sim_ann_pq_indexed,
        # --- multimodal ---
        "mm_decode": q_mm_decode,
        "mm_resize": q_mm_resize,
        "mm_frames": q_mm_frames,
        "mm_audio": q_mm_audio,
        # --- curation ---
        "curate_gopher": q_curate_gopher,
        "curate_keep": q_curate_keep,
        "curate_decontaminate_cut": q_curate_decontaminate_cut,
        "curate_split": q_curate_split,
        "curate_token_budget": q_curate_token_budget,
        "curate_mixture": q_curate_mixture,
        "curate_corpus_capped": q_curate_corpus_capped,
    }
    assert len(qs) <= 50, "catalog must fit the driver's 50-row window"
    return qs


def extra_queries():
    # Demo / uncapped twins of catalog entries: same operators, the
    # pedagogical or pre-skew-guard variants. Retired from the driver
    # window (see all_queries) but still fully oracle-gated by
    # tests/test_oracle_parity.py, which runs catalog + extras.
    return {
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_minhash128": q_dedup_minhash128,
        "dedup_incremental": q_dedup_incremental,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_components": q_dedup_components,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embed": q_dedup_embed,
        "txt_bpe": q_txt_bpe,
        "url_canonicalize": q_url_canonicalize,
        "sim_lsh_buckets": q_sim_lsh_buckets,
        "sim_topk_batch": q_sim_topk_batch,
        "sim_ann_lsh": q_sim_ann_lsh,
        "sim_ann_lsh_probed": q_sim_ann_lsh_probed,
        "sim_ann_ivf_probed": q_sim_ann_ivf_probed,
        "sim_ann_ivf": q_sim_ann_ivf,
        "dedup_substring": q_dedup_substring,
        "txt_pii": q_txt_pii,
        "sim_ann_lsh_indexed": q_sim_ann_lsh_indexed,
        "sim_ann_ivf_indexed": q_sim_ann_ivf_indexed,
        "sim_ann_pq": q_sim_ann_pq,
        "curate_corpus": q_curate_corpus,
        "curate_decontaminate": q_curate_decontaminate,
    }


def _oracle_pool():
    # EVERY query has an oracle: the stateful ones (crawl rounds, mock
    # items) are deterministic fixed row sets gated as literal VALUES
    out = dict(ORACLES_EXTRACT)
    out.update({k: v for k, v in ORACLES_OPS.items() if v})
    return out


def all_oracles():
    pool = _oracle_pool()
    return {k: pool[k] for k in all_queries() if k in pool}


def extra_oracles():
    pool = _oracle_pool()
    return {k: pool[k] for k in extra_queries() if k in pool}


# --- crawl queries ---------------------------------------------------------------

def q_crawl_mock_items(spark, sf_dir):
    """The reference's config-mock.yaml through the Spark pipeline
    (W3 shape; byte parity asserted in tests)."""
    from .fixtures_html import MOCK_CONFIG
    from .synth import fixture_pages_df

    scraper = loads_config(MOCK_CONFIG).scrapers[0]
    pages = fixture_pages_df(spark).filter(
        F.col("url") == "https://mock.url")
    raw = extract_stage1(pages, scraper)
    return finalize_items_df(raw, scraper)


def q_crawl_round(spark, sf_dir):
    """One full crawl (bounded synthetic web) → per-round summary rows.
    Exercises frontier, seen-set, politeness, robots, checkpointing."""
    import tempfile

    from .spark.crawl import CrawlEngine
    from .synth import SynthSpec, event_scraper, host_name, synth_pages_df
    from datetime import datetime, timezone

    spec = SynthSpec(n_hosts=3, pages_per_host=2, items_per_page=2,
                     hot_hosts=1, hot_factor=2)
    pages = synth_pages_df(spark, spec, include_fixtures=False)
    wd = tempfile.mkdtemp(prefix="goskyr-crawlq-")
    eng = CrawlEngine(spark, wd, pages, event_scraper,
                      [f"https://{host_name(h)}/list/1"
                       for h in range(spec.n_hosts)],
                      now=datetime(2026, 3, 1, tzinfo=timezone.utc))
    eng.run(max_rounds=10)
    from .spark.crawl import ROUNDS_SCHEMA

    return eng.t_rounds.read(spark, schema=ROUNDS_SCHEMA) \
        .select("round", "n_dequeued", "n_fetched_ok", "n_items",
                "n_new_urls").orderBy("round")
