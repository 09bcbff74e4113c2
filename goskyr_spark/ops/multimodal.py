"""Multimodal binary-column operators — real raster kernels.

Images/audio/video are opaque ``binary`` columns plus typed metadata.
No imaging library exists in this container (PIL/cv2/ffmpeg absent),
but none is needed for UNCOMPRESSED raster formats: the kernels below
parse PPM (P6) and BMP (24-bit BITMAPINFOHEADER) headers and pixel data
with numpy, decode to an (h, w, 3) RGB array, resize with
nearest-neighbor index math, and sample frames from a length-prefixed
raw-video container — all inside Arrow-batched ``mapInPandas`` kernels
(batch in, batch out; no per-row Python UDF at the API level).
Compressed formats (JPEG/PNG/H.264) would slot behind the same
``decode_image`` seam via PIL/ffmpeg where those libraries exist.

The reference (goskyr) has no media pipeline; these are the
training-data-pipeline extensions. Payload synthesis
(``raster_table``/``video_table``) is deterministic from doc_id with a
closed-form pixel formula — pix(i) = (31·doc_id + 7 + 13·frame + i)
mod 256 over the row-major RGB index i — so the DuckDB oracle can
recompute every decoded statistic from the formula while the Spark side
genuinely round-trips the bytes: any encoder/decoder bug (stride
padding, BGR order, bottom-up rows, header parse) breaks the value-hash
gate.

Scale design: payloads never shuffle — decode/resize/frame-sample are
map-only over the binary column, so the operators parallelize per input
partition with zero exchange, and the metadata outputs are tiny
relative to the payload bytes they summarize.
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

# --- encoders (synthesis side; also the test oracle for the decoders) ---------


def _pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Closed-form raster: pix[y, x, c] = (seed + (y·w + x)·3 + c) % 256."""
    n = w * h * 3
    return ((seed + np.arange(n, dtype=np.int64)) % 256) \
        .astype(np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, BGR channel order, rows padded to 4 bytes — the
    details a decoder must actually get right."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = np.ascontiguousarray(
        img[::-1, :, ::-1]).reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                     2835, 2835, 0, 0)
    return fh + ih + data


VIDEO_MAGIC = b"RAWV"


def encode_video(frames) -> bytes:
    """Length-prefixed concatenation of encoded frames:
    b'RAWV' + u32 n_frames + n × (u32 byte_len + frame bytes)."""
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fb in frames:
        parts.append(struct.pack("<I", len(fb)))
        parts.append(fb)
    return b"".join(parts)


# --- decoders ------------------------------------------------------------------


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 parse: magic, width, height, maxval tokens (whitespace- and
    #-comment-separated), single whitespace byte, then the raster."""
    pos = 0

    def token():
        nonlocal pos
        while pos < len(buf):
            ch = buf[pos:pos + 1]
            if ch == b"#":
                nl = buf.find(b"\n", pos)
                pos = nl + 1 if nl >= 0 else len(buf)
            elif ch.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        return buf[start:pos]

    if token() != b"P6":
        raise ValueError("not a P6 PPM")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    pos += 1  # exactly one whitespace byte separates header and raster
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", buf, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", buf, 14)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if hsz < 40 or bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(buf, np.uint8, stride * h, off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


def decode_image(buf: bytes):
    """(format, rgb array) — magic sniffing; the seam where PIL-backed
    JPEG/PNG decoders would register."""
    if buf[:2] == b"P6":
        return "ppm", decode_ppm(buf)
    if buf[:2] == b"BM":
        return "bmp", decode_bmp(buf)
    raise ValueError("unknown image format")


def decode_video(buf: bytes):
    """Yield (frame_idx, frame_bytes) from the RAWV container."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not a RAWV container")
    n = struct.unpack_from("<I", buf, 4)[0]
    pos = 8
    for idx in range(n):
        ln = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        yield idx, buf[pos:pos + ln]
        pos += ln


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize: src index = floor(dst · src/dst) — pure
    numpy fancy indexing, up- and down-scaling alike."""
    h, w, _ = img.shape
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


def _stats(img: np.ndarray):
    """(pixel_sum, checksum): checksum is position-weighted —
    Σ (i+1)·v[i] mod 2³¹ over the row-major RGB flat index — so any
    pixel TRANSPOSITION (not just value change) breaks it."""
    flat = img.reshape(-1).astype(np.int64)
    psum = int(flat.sum())
    csum = int(((np.arange(flat.size, dtype=np.int64) + 1) * flat).sum()
               % (1 << 31))
    return psum, csum


# --- payload synthesis (deterministic from doc_id) ------------------------------

PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])


def _doc_dims(doc_id: int):
    return 8 + doc_id % 9, 6 + doc_id % 7  # w ∈ 8..16, h ∈ 6..12


def _doc_seed(doc_id: int) -> int:
    return (31 * doc_id + 7) % 256


def make_image(doc_id: int) -> bytes:
    """Even ids PPM, odd ids BMP — both code paths exercised; widths
    8..16 include strides needing 0-3 pad bytes."""
    w, h = _doc_dims(doc_id)
    img = _pixels(_doc_seed(doc_id), w, h)
    return encode_ppm(img) if doc_id % 2 == 0 else encode_bmp(img)


def make_video(doc_id: int) -> bytes:
    """1 + doc_id % 10 PPM frames; frame f's seed is shifted by 13·f."""
    w, h = _doc_dims(doc_id)
    seed = _doc_seed(doc_id)
    n_frames = 1 + doc_id % 10
    return encode_video([
        encode_ppm(_pixels((seed + 13 * f) % 256, w, h))
        for f in range(n_frames)])


def _payload_df(documents, make, id_col):
    import pyarrow as pa

    arrow = pa.schema([pa.field("doc_id", pa.int64()),
                       pa.field("payload", pa.binary())])

    def gen(batches):
        for b in batches:
            ids = b.column(0).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array([make(i) for i in ids], pa.binary())],
                schema=arrow)

    return documents.select(F.col(id_col).alias("doc_id")) \
        .mapInArrow(gen, PAYLOAD_SCHEMA)


def raster_table(documents, id_col="doc_id"):
    """(doc_id, payload): one encoded image per document. In production
    this column comes straight off the lake; the deterministic generator
    stands in for it (and makes the decode oracle-checkable)."""
    return _payload_df(documents, make_image, id_col)


def video_table(documents, id_col="doc_id"):
    """(doc_id, payload): one RAWV multi-frame container per document."""
    return _payload_df(documents, make_video, id_col)


# --- audio (16-bit PCM WAV) -----------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Canonical RIFF/WAVE container: fmt chunk (PCM, mono, 16-bit) +
    data chunk of little-endian int16 samples."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(buf: bytes):
    """(sample_rate, int16 sample array) — real RIFF chunk walk (fmt
    may not be the first chunk; chunks are word-aligned)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        ln = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            afmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH",
                                                            body, 0)
            if afmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def make_audio(doc_id: int) -> bytes:
    """Deterministic PCM: n = 256 + 64·(doc_id%7) samples at 8 kHz,
    sample i = (17·doc_id + 3·i) mod 4096 − 2048 (closed form, so the
    oracle recomputes every decoded statistic)."""
    n = 256 + 64 * (doc_id % 7)
    i = np.arange(n, dtype=np.int64)
    return encode_wav(((17 * doc_id + 3 * i) % 4096 - 2048))


def audio_table(documents, id_col="doc_id"):
    """(doc_id, payload): one WAV clip per document."""
    return _payload_df(documents, make_audio, id_col)


AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", LongType()),
    StructField("peak", LongType()),
    StructField("sum_abs", LongType()),
])


def decode_audio_metadata(payloads, id_col="doc_id"):
    """Decode WAV payloads → typed metadata + exact integer loudness
    statistics from the DECODED samples (proves the chunk walk and
    sample byte order)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                a = np.abs(s.astype(np.int64))
                recs.append({id_col: int(did), "sample_rate": rate,
                             "n_samples": len(s),
                             "duration_ms": len(s) * 1000 // rate,
                             "peak": int(a.max()) if len(s) else 0,
                             "sum_abs": int(a.sum())})
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in AUDIO_SCHEMA.fields])

    return payloads.mapInPandas(run, AUDIO_SCHEMA).orderBy(id_col)


# --- operators -------------------------------------------------------------------

DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_pixels", LongType()),
    StructField("pixel_sum", LongType()),
    StructField("checksum", LongType()),
])

RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_width", LongType()),
    StructField("out_height", LongType()),
    StructField("pixel_sum", LongType()),
    StructField("checksum", LongType()),
])

FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("pixel_sum", LongType()),
])


def decode_metadata(payloads, id_col="doc_id"):
    """Decode every payload and emit typed metadata + content statistics
    computed from the DECODED pixels (not the raw bytes) — proves the
    header parse, stride handling, channel order, and row order."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                fmt, img = decode_image(bytes(payload))
                h, w, _ = img.shape
                psum, csum = _stats(img)
                recs.append({id_col: int(did), "format": fmt,
                             "width": w, "height": h, "n_pixels": w * h,
                             "pixel_sum": psum, "checksum": csum})
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in DECODE_SCHEMA.fields])

    return payloads.mapInPandas(run, DECODE_SCHEMA).orderBy(id_col)


def resize_payloads(payloads, width=20, height=10, id_col="doc_id"):
    """Decode → nearest-neighbor resize to width×height → statistics of
    the RESIZED raster (position-weighted, so wrong source-index math
    shows up even when the pixel multiset is right)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                _, img = decode_image(bytes(payload))
                out = resize_nn(img, width, height)
                psum, csum = _stats(out)
                recs.append({id_col: int(did), "out_width": width,
                             "out_height": height, "pixel_sum": psum,
                             "checksum": csum})
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in RESIZE_SCHEMA.fields])

    return payloads.mapInPandas(run, RESIZE_SCHEMA).orderBy(id_col)


def sample_frames(payloads, every_k=3, id_col="doc_id"):
    """Frame sampling over the RAWV container: every k-th frame decoded
    to its own output row — the FAN-OUT batch shape (one input row →
    many output rows inside one Arrow batch) a real ffmpeg sampler
    produces."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                for idx, fb in decode_video(bytes(payload)):
                    if idx % every_k:
                        continue
                    _, img = decode_image(fb)
                    h, w, _ = img.shape
                    psum, _ = _stats(img)
                    recs.append({id_col: int(did), "frame_idx": idx,
                                 "width": w, "height": h,
                                 "pixel_sum": psum})
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in FRAMES_SCHEMA.fields])

    return payloads.mapInPandas(run, FRAMES_SCHEMA) \
        .orderBy(id_col, "frame_idx")
