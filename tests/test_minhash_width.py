"""Production-width MinHash (ops/dedup.py minhash_params).

- the first 8 (A, B) pairs are FROZEN (the pinned 8-perm DuckDB
  oracles replay them verbatim);
- the generated family is overflow-proof at any width (A·base+B < 2^63);
- Spark signatures at width 16 match an independent pure-Python
  replication of the affine formula;
- banding collision rates over the generated 128-perm family follow
  the (r, b) S-curve 1-(1-J^r)^b on similarity-controlled synthetic
  pairs — the property that makes 16×8 banding a near-dup detector.
"""

import hashlib
import random
import re

import numpy as np
import pytest

from goskyr_spark.ops.dedup import (MINHASH_A, MINHASH_B, MINHASH_P,
                                    minhash_params, minhash_signatures)


def test_first8_frozen_and_deterministic():
    A8, B8 = minhash_params(8)
    assert A8 == MINHASH_A and B8 == MINHASH_B
    A, B = minhash_params(128)
    assert A[:8] == MINHASH_A and B[:8] == MINHASH_B
    A2, B2 = minhash_params(128)
    assert (A, B) == (A2, B2)  # same seed -> same family
    A3, _ = minhash_params(128, seed=1)
    assert A3[8:] != A[8:]  # seed actually parameterizes the tail


def test_overflow_bound_any_width():
    A, B = minhash_params(256)
    assert len(A) == len(B) == 256
    worst = max(a * (2 ** 48 - 1) + b for a, b in zip(A, B))
    assert worst < 2 ** 63
    assert all(1 <= a < 2 ** 15 for a in A)
    assert all(0 <= b < MINHASH_P for b in B)


def _py_base(shingle):
    return int(hashlib.md5(shingle.encode()).hexdigest()[:12], 16)


def _py_sigs(shingles, A, B):
    bases = [_py_base(s) for s in shingles]
    return [min((a * h + b) % MINHASH_P for h in bases)
            for a, b in zip(A, B)]


@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="minhash-width-tests", master="local[4]",
                     shuffle_partitions=4)


def test_spark_parity_at_width16(spark):
    rng = random.Random(11)
    docs = []
    for i in range(20):
        docs.append((i, " ".join(f"w{rng.randint(0, 40)}"
                                 for _ in range(rng.randint(5, 30)))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: [r[f"sig_{k}"] for k in range(16)]
           for r in minhash_signatures(df, num_perm=16).collect()}
    A, B = minhash_params(16)
    for i, text in docs:
        words = re.split(r"\s+", text.strip())
        sh = list(dict.fromkeys(
            " ".join(words[j:j + 3]) for j in range(len(words) - 2)))
        if not sh:
            assert i not in got  # zero shingles -> no signature row
            continue
        assert got[i] == _py_sigs(sh, A, B), f"doc {i} mismatch"


def test_banding_s_curve_128_perm():
    """Empirical band-collision rate of the GENERATED family vs the
    theoretical S-curve P(collide) = 1-(1-J^r)^b at r=8, b=16.

    Pairs are built with controlled shingle overlap (two m-shingle sets
    sharing c => J = c/(2m-c)); everything is seeded, so the observed
    rates are deterministic — the tolerance covers binomial sampling
    width at n_pairs, not run-to-run noise."""
    num_perm, r = 128, 8
    b = num_perm // r
    A, B = minhash_params(num_perm)
    An = np.array(A, dtype=np.int64)[:, None]
    Bn = np.array(B, dtype=np.int64)[:, None]
    rng = random.Random(0)
    n_pairs, m = 250, 60

    for j_target in (0.3, 0.55, 0.7, 0.85):
        c = round(j_target * 2 * m / (1 + j_target))
        j_actual = c / (2 * m - c)
        hits = 0
        for p in range(n_pairs):
            shared = [f"s{j_target}_{p}_{i}" for i in range(c)]
            only1 = [f"a{j_target}_{p}_{i}" for i in range(m - c)]
            only2 = [f"b{j_target}_{p}_{i}" for i in range(m - c)]
            # shuffle so min-selection isn't order-biased (it isn't
            # anyway — mins are order-free — but keep the universe honest)
            rng.shuffle(shared)
            b1 = np.array([_py_base(s) for s in shared + only1],
                          dtype=np.int64)[None, :]
            b2 = np.array([_py_base(s) for s in shared + only2],
                          dtype=np.int64)[None, :]
            s1 = ((An * b1 + Bn) % MINHASH_P).min(axis=1)
            s2 = ((An * b2 + Bn) % MINHASH_P).min(axis=1)
            eq = (s1 == s2).reshape(b, r)
            if eq.all(axis=1).any():
                hits += 1
        emp = hits / n_pairs
        theo = 1 - (1 - j_actual ** r) ** b
        sigma = (theo * (1 - theo) / n_pairs) ** 0.5
        tol = max(0.03, 4 * sigma)
        assert abs(emp - theo) <= tol, (
            f"J={j_actual:.3f}: empirical {emp:.3f} vs theoretical "
            f"{theo:.3f} (tol {tol:.3f}) — family is not behaving like "
            f"random permutations")
