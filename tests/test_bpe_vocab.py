"""Production-vocab BPE (ops/bpe.py): trainer determinism, encoder
parity vs an independent naive reference at >=1k merges, and the
mapInPandas distributed count vs driver-side encoding."""

import random

import pytest

from goskyr_spark.ops.bpe import (BPEEncoder, bpe_token_count_vocab,
                                  encode_pretoken_slow, pretoken_counts,
                                  pretokenize, train_bpe, train_bpe_df)

# deterministic synthetic corpus: Zipf-ish English-like words
_WORDS = ("the of and to in is it on at or a for with as by this that "
          "from are was were be been has have had not but all can will "
          "would there their which when what where who how why more "
          "some time data spark table query merge token corpus train "
          "model scale shuffle partition column vector stream batch "
          "crawl fetch parse index bucket").split()


_SYL = ("ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu "
        "ga ge gi go gu la le li lo lu ma me mi mo mu na ne ni no nu "
        "pa pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu "
        "va ve vi vo vu za ze zi zo zu sh ch th ng st").split()


def _corpus(n_docs=200, seed=7):
    """Zipf-ish mix of a common-word head and a long tail of generated
    syllable words — enough distinct pretokens to support >1k merges."""
    rng = random.Random(seed)
    tail = ["".join(rng.choice(_SYL)
                    for _ in range(rng.randint(2, 5)))
            for _ in range(3000)]
    docs = []
    for i in range(n_docs):
        n = rng.randint(20, 120)
        words = []
        for _ in range(n):
            if rng.random() < 0.5:
                words.append(rng.choice(_WORDS))
            else:
                words.append(tail[min(int(rng.paretovariate(0.7)),
                                      len(tail) - 1)])
        if i % 7 == 0:
            words.append(str(rng.randint(1900, 2099)))
        if i % 11 == 0:
            words.append("naïve-ünïcode's")
        docs.append(" ".join(words))
    return docs


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="bpe-vocab-tests", master="local[2]",
                     shuffle_partitions=2)


@pytest.fixture(scope="module")
def merges_1k():
    counts = {}
    for d in _corpus():
        for t in pretokenize(d):
            counts[t] = counts.get(t, 0) + 1
    m = train_bpe(counts, 1200)
    assert len(m) >= 1000, f"corpus too small: only {len(m)} merges"
    return m


def test_trainer_deterministic(merges_1k):
    counts = {}
    for d in _corpus():
        for t in pretokenize(d):
            counts[t] = counts.get(t, 0) + 1
    assert train_bpe(counts, 1200) == merges_1k


def test_trainer_greedy_order():
    # most frequent pair first; ties broken lexicographically —
    # (a,b) counts 5+3=8 across both words, tying (z,z)=8 and
    # winning the lexicographic tie-break
    merges = train_bpe({"ab": 5, "abc": 3, "zz": 8}, 3)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("z", "z")
    assert merges[2] == ("ab", "c")


def test_encoder_parity_vs_naive_1k_merges(merges_1k):
    """The cached GPT-2-style encoder == the independent O(n^2)
    rescan-every-round reference, over every pretoken of the corpus,
    at a production-shaped (>=1k) merges table."""
    enc = BPEEncoder(merges_1k)
    ranks = enc.ranks
    seen = set()
    for d in _corpus():
        for tok in pretokenize(d):
            if tok in seen:
                continue
            seen.add(tok)
            assert list(enc.encode_pretoken(tok)) == \
                encode_pretoken_slow(tok, ranks), tok
    assert len(seen) > 50


def test_encoder_parity_adversarial_overlaps():
    """Overlapping same-symbol pairs ((x,x) runs) are where
    merge-all-occurrences could diverge from merge-one-at-a-time."""
    merges = [("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"),
              ("a", "b"), ("ab", "ab")]
    enc = BPEEncoder(merges)
    rng = random.Random(3)
    for _ in range(500):
        tok = "".join(rng.choice("ab") for _ in range(rng.randint(1, 14)))
        assert list(enc.encode_pretoken(tok)) == \
            encode_pretoken_slow(tok, enc.ranks), tok


def test_encoder_basics(merges_1k):
    enc = BPEEncoder(merges_1k)
    assert enc.count("") == 0
    assert enc.count("   ") == 0 or enc.count("   ") >= 0
    # compression: common text uses far fewer tokens than chars
    text = "the data and the model train on the spark table"
    assert 0 < enc.count(text) < len(text) / 2
    # unknown script falls back to characters, never crashes
    assert enc.count("日本語テキスト") > 0


def test_mapinpandas_count_matches_driver_encoding(spark, merges_1k):
    docs = _corpus(40)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count_vocab(df, merges_1k).collect()}
    enc = BPEEncoder(merges_1k)
    want = {i: enc.count(d) for i, d in enumerate(docs)}
    assert got == want


def test_mapinpandas_plan_is_map_only(spark, merges_1k):
    df = spark.createDataFrame([(0, "the data")],
                               "doc_id long, text string")
    plan = bpe_token_count_vocab(df, merges_1k) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scan -> mapInPandas


def test_train_bpe_df_matches_local(spark):
    docs = _corpus(40)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    counts = {}
    for d in docs:
        for t in pretokenize(d):
            counts[t] = counts.get(t, 0) + 1
    hist = {r["pretoken"]: r["cnt"]
            for r in pretoken_counts(df).collect()}
    assert hist == counts
    assert train_bpe_df(df, 200) == train_bpe(counts, 200)


def test_pretokenize_whitespace_only_strips_spaces():
    """ADVICE round-5: pretokenize strips ONLY ASCII spaces (parity
    with the column path's F.trim); tab/newline padding is kept and
    pretokenized as whitespace tokens on BOTH paths."""
    assert pretokenize("\nHello world\n") == \
        pretokenize(" \nHello world\n ")
    assert "\n" in pretokenize("\nabc")[0]


def test_trainer_heap_matches_full_scan():
    """Round-6: the lazy-heap best-pair selection must reproduce the
    round-5 full-scan min() merge sequence EXACTLY (the heap key is
    the scan's tie-break key). Reference implementation inlined."""

    def train_full_scan(word_counts, n_merges):
        words = [(tuple(w), c) for w, c in sorted(word_counts.items())]
        pair_counts = {}
        pair_words = {}
        for i, (syms, c) in enumerate(words):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(i)
        merges = []
        for _ in range(n_merges):
            if not pair_counts:
                break
            best = min(pair_counts.items(),
                       key=lambda kv: (-kv[1], kv[0]))
            (a, b), cnt = best
            if cnt <= 0:
                break
            merges.append((a, b))
            ab = a + b
            for i in list(pair_words.get((a, b), ())):
                syms, c = words[i]
                for p in zip(syms, syms[1:]):
                    pair_counts[p] -= c
                    if pair_counts[p] <= 0:
                        pair_counts.pop(p, None)
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(i)
                        if not ws:
                            pair_words.pop(p, None)
                out = []
                j = 0
                while j < len(syms):
                    if (j < len(syms) - 1 and syms[j] == a
                            and syms[j + 1] == b):
                        out.append(ab)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = tuple(out)
                words[i] = (syms, c)
                for p in zip(syms, syms[1:]):
                    pair_counts[p] = pair_counts.get(p, 0) + c
                    pair_words.setdefault(p, set()).add(i)
        return merges

    counts = {}
    for d in _corpus(n_docs=120, seed=3):
        for t in pretokenize(d):
            counts[t] = counts.get(t, 0) + 1
    want = train_full_scan(dict(counts), 800)
    got = train_bpe(dict(counts), 800)
    assert got == want
    assert len(got) == 800


@pytest.fixture(scope="module")
def merges_32k(spark):
    from goskyr_spark.synth import charrich_docs_df

    docs = charrich_docs_df(spark, n_docs=8000, words_per_doc=60)
    m = train_bpe_df(docs, 34_000)
    assert len(m) >= 32_768, f"char-rich corpus too small: {len(m)}"
    return m


def test_encoder_parity_at_32k_merges(spark, merges_32k):
    """Round-6 done-gate: encoder parity vs the independent naive
    encode_pretoken_slow at a >=32k-merge PRODUCTION vocabulary, on a
    sample of real corpus pretokens."""
    from goskyr_spark.synth import charrich_docs_df

    enc = BPEEncoder(merges_32k)
    ranks = enc.ranks
    sample_docs = [r["text"] for r in
                   charrich_docs_df(spark, n_docs=8000, words_per_doc=60)
                   .filter("doc_id % 97 = 0").collect()]
    assert sample_docs
    n_toks = 0
    for d in sample_docs:
        for tok in pretokenize(d):
            assert enc.encode_pretoken(tok) == \
                tuple(encode_pretoken_slow(tok, ranks))
            n_toks += 1
    assert n_toks > 2000
    # cache telemetry is live
    assert enc.hits + enc.misses == n_toks and enc.misses > 0
