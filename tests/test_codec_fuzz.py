"""Property-based codec tests (hypothesis): encode↔decode must be the
identity for ANY raster/sample content, not just the formula-generated
payloads — catches stride/alignment/sign bugs the fixed corpus misses.
Plus a batched randomized BPE parity check (one Spark job for all
samples)."""

import os
import random
import string
import sys

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(__file__))

from goskyr_spark.ops.multimodal import (
    decode_bmp, decode_ppm, decode_video, decode_wav, encode_bmp,
    encode_ppm, encode_video, encode_wav, resize_nn,
)


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30),
       seed=st.integers(0, 2**31 - 1))
def test_raster_roundtrip_any_content(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 2000), seed=st.integers(0, 2**31 - 1),
       rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_samples(n, seed, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int64)
    got_rate, out = decode_wav(encode_wav(s, rate=rate))
    assert got_rate == rate
    assert np.array_equal(out.astype(np.int64), s)


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 25), h=st.integers(1, 20),
       ow=st.integers(1, 30), oh=st.integers(1, 30),
       seed=st.integers(0, 2**31 - 1))
def test_resize_preserves_corner_and_dims(w, h, ow, oh, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nn(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # NN maps dst (0,0) to src (0,0) always
    assert np.array_equal(out[0, 0], img[0, 0])
    # every output pixel exists somewhere in the source row it samples
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    assert np.array_equal(out, img[ys][:, xs])


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=0,
                max_size=8))
def test_video_container_any_frames(frames):
    got = list(decode_video(encode_video(frames)))
    assert [i for i, _ in got] == list(range(len(frames)))
    assert [b for _, b in got] == frames


# --- batched randomized BPE parity ------------------------------------------

def _random_text(rng):
    alphabet = (string.ascii_letters + string.digits +
                " \t\n'|.,;:!?-_()[]" + "\x02éßñ漢字")
    n = rng.randint(0, 120)
    return "".join(rng.choice(alphabet) for _ in range(n))


def test_bpe_fuzz_batch():
    from goskyr_spark.ops.text import bpe_token_count_real
    from goskyr_spark.spark.session import get_spark
    from test_text_bpe import ref_bpe_count

    rng = random.Random(20260816)
    texts = [_random_text(rng) for _ in range(80)]
    spark = get_spark(app="bpe-fuzz", master="local[2]",
                      shuffle_partitions=2)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count_real(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_bpe_count(t), (i, repr(t))


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 9), st.integers(0, 10**6), st.integers(1, 400))
def test_warc_stream_chunking_invariance(n_rec, seed, chunk):
    """Streaming WARC parse is chunk-boundary-insensitive: any chunking
    of any archive (plain or gzip members, arbitrary binary bodies)
    yields exactly the whole-blob parse."""
    from goskyr_spark.io.warc import (build_http_response, gunzip_members,
                                      iter_gunzip_stream,
                                      iter_warc_stream, parse_warc,
                                      write_warc, write_warc_gz)

    rng = random.Random(seed)
    recs = [(f"https://h{rng.randrange(5)}.test/p{i}",
             build_http_response(
                 bytes(rng.randrange(256)
                       for _ in range(rng.randrange(0, 200))),
                 status=rng.choice([200, 404, 503])))
            for i in range(n_rec)]
    blob = write_warc(recs)
    want = list(parse_warc(blob))
    assert len(want) == n_rec
    chunks = [blob[i:i + chunk] for i in range(0, len(blob), chunk)]
    assert list(iter_warc_stream(chunks)) == want

    gz = write_warc_gz(recs)
    gchunks = [gz[i:i + chunk] for i in range(0, len(gz), chunk)]
    assert list(iter_warc_stream(iter_gunzip_stream(gchunks))) == want
    assert gunzip_members(gz) == blob


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 97))
def test_warc_gz_corrupt_member_resync_fuzz(seed, chunk):
    """Flipping bytes inside ONE gzip member of a multi-member archive
    never loses more than that member and its immediate successor, at
    any chunking."""
    from goskyr_spark.io.warc import (build_http_response,
                                      iter_gunzip_stream,
                                      iter_warc_stream, write_warc_gz)

    rng = random.Random(seed)
    recs = [(f"https://h.test/p{i}",
             build_http_response(f"body {i} {'x' * rng.randrange(50)}"
                                 .encode()))
            for i in range(6)]
    members = [write_warc_gz(recs[i:i + 1]) for i in range(6)]
    bad = rng.randrange(1, 5)
    mb = bytearray(members[bad])
    for _ in range(rng.randrange(1, 6)):
        mb[rng.randrange(8, len(mb))] ^= rng.randrange(1, 256)
    members[bad] = bytes(mb)
    gz = b"".join(members)
    chunks = [gz[i:i + chunk] for i in range(0, len(gz), chunk)]
    got = [u for u, *_ in iter_warc_stream(iter_gunzip_stream(chunks))]
    want_urls = [u for u, _ in recs]
    # contract: every record except the corrupt one (and possibly its
    # successor) survives, exactly once, in order. The corrupt member
    # itself may legitimately emit SOMETHING — a header-byte flip
    # (mtime) is harmless, and a payload flip streams a corrupted
    # record before zlib notices at the CRC (streaming decompression
    # cannot withhold output until checksum without buffering the
    # whole member) — so only the healthy records are pinned.
    healthy = set(want_urls) - {want_urls[bad], want_urls[bad + 1]}
    assert set(got) >= healthy
    healthy_got = [u for u in got if u in healthy]
    assert healthy_got == [u for u in want_urls if u in healthy]
