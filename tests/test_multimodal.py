"""Real raster kernels: PPM/BMP encode↔decode round-trips, BMP stride
padding + BGR + bottom-up handling, nearest-neighbor resize vs a naive
reference, RAWV container framing — pure-numpy, no Spark needed except
the op-level tests at the bottom."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from goskyr_spark.ops.multimodal import (
    _doc_dims, _doc_seed, _pixels, decode_bmp, decode_image, decode_ppm,
    decode_video, encode_bmp, encode_ppm, encode_video, make_image,
    make_video, resize_nn,
)


@pytest.mark.parametrize("w,h", [(8, 6), (9, 7), (10, 5), (16, 12), (1, 1)])
def test_ppm_round_trip(w, h):
    img = _pixels(seed=42, w=w, h=h)
    out = decode_ppm(encode_ppm(img))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("w,h", [(8, 6), (9, 7), (10, 5), (11, 3), (16, 12)])
def test_bmp_round_trip_all_paddings(w, h):
    """w = 8..11 covers every stride pad (0-3 bytes); the decoder must
    undo bottom-up row order AND BGR channel order."""
    img = _pixels(seed=201, w=w, h=h)
    buf = encode_bmp(img)
    # stride really is padded to 4 bytes
    stride = (w * 3 + 3) // 4 * 4
    assert len(buf) == 54 + stride * h
    out = decode_bmp(buf)
    assert np.array_equal(out, img)


def test_ppm_header_comments_and_whitespace():
    img = _pixels(seed=7, w=4, h=2)
    buf = b"P6 # a comment\n# another\n  4\t2 # dims\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(buf), img)


def test_decode_image_sniffs_format():
    img = _pixels(seed=9, w=5, h=4)
    assert decode_image(encode_ppm(img))[0] == "ppm"
    assert decode_image(encode_bmp(img))[0] == "bmp"
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")


def test_resize_nn_matches_naive_reference():
    img = _pixels(seed=33, w=10, h=7)
    for ow, oh in [(20, 10), (5, 3), (10, 7), (1, 1)]:
        out = resize_nn(img, ow, oh)
        ref = np.zeros((oh, ow, 3), dtype=np.uint8)
        for y in range(oh):
            for x in range(ow):
                ref[y, x] = img[(y * 7) // oh, (x * 10) // ow]
        assert np.array_equal(out, ref), (ow, oh)


def test_video_container_round_trip():
    frames = [encode_ppm(_pixels(s, 6, 4)) for s in (1, 14, 27)]
    buf = encode_video(frames)
    got = list(decode_video(buf))
    assert [i for i, _ in got] == [0, 1, 2]
    assert [b for _, b in got] == frames


def test_make_image_formula():
    """Decoded pixel (y,x,c) equals the closed form the oracle uses."""
    for doc_id in (0, 1, 7, 42, 255, 499):
        fmt, img = decode_image(make_image(doc_id))
        assert fmt == ("ppm" if doc_id % 2 == 0 else "bmp")
        w, h = _doc_dims(doc_id)
        assert img.shape == (h, w, 3)
        i = np.arange(w * h * 3)
        expected = (31 * doc_id + 7 + i) % 256
        assert np.array_equal(img.reshape(-1), expected.astype(np.uint8))


def test_make_video_frames():
    doc_id = 13
    w, h = _doc_dims(doc_id)
    frames = list(decode_video(make_video(doc_id)))
    assert len(frames) == 1 + doc_id % 10
    for f, fb in frames:
        img = decode_ppm(fb)
        i = np.arange(w * h * 3)
        expected = (_doc_seed(doc_id) + 13 * f + i) % 256
        assert np.array_equal(img.reshape(-1), expected.astype(np.uint8))


# --- op-level (Spark) --------------------------------------------------------

@pytest.fixture(scope="module")
def spark():
    from goskyr_spark.spark.session import get_spark

    return get_spark(app="mm-tests", master="local[2]",
                     shuffle_partitions=2)


def test_ops_end_to_end(spark):
    from goskyr_spark.ops.multimodal import (
        decode_metadata, raster_table, resize_payloads, sample_frames,
        video_table,
    )

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    dec = {r["doc_id"]: r for r in
           decode_metadata(raster_table(docs)).collect()}
    assert dec[0]["format"] == "ppm" and dec[1]["format"] == "bmp"
    for d in range(20):
        w, h = _doc_dims(d)
        assert (dec[d]["width"], dec[d]["height"]) == (w, h)
        img = _pixels(_doc_seed(d), w, h)
        assert dec[d]["pixel_sum"] == int(img.reshape(-1).astype(int).sum())

    rs = {r["doc_id"]: r for r in
          resize_payloads(raster_table(docs), 20, 10).collect()}
    for d in (0, 1, 5):
        w, h = _doc_dims(d)
        out = resize_nn(_pixels(_doc_seed(d), w, h), 20, 10)
        assert rs[d]["pixel_sum"] == int(out.reshape(-1).astype(int).sum())

    fr = sample_frames(video_table(docs), every_k=3).collect()
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for d in range(20):
        assert by_doc[d] == list(range(0, 1 + d % 10, 3))


def test_wav_round_trip():
    from goskyr_spark.ops.multimodal import decode_wav, encode_wav

    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
    rate, out = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(out.astype(np.int64), s)


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real RIFF files carry LIST/INFO chunks before data — the decoder
    must walk chunks (with word alignment), not assume fixed offsets."""
    import struct

    from goskyr_spark.ops.multimodal import decode_wav, encode_wav

    s = np.array([1, -2, 3], dtype=np.int64)
    base = encode_wav(s)
    fmt_and_data = base[12:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    patched = b"RIFF" + struct.pack(
        "<I", 4 + len(junk) + len(fmt_and_data)) + b"WAVE" + junk \
        + fmt_and_data
    rate, out = decode_wav(patched)
    assert rate == 8000 and np.array_equal(out.astype(np.int64), s)


def test_make_audio_formula():
    from goskyr_spark.ops.multimodal import decode_wav, make_audio

    for d in (0, 3, 6, 13, 499):
        rate, s = decode_wav(make_audio(d))
        n = 256 + 64 * (d % 7)
        assert rate == 8000 and len(s) == n
        i = np.arange(n)
        assert np.array_equal(s.astype(np.int64),
                              (17 * d + 3 * i) % 4096 - 2048)
