"""Multimodal binary-column plumbing.

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The decode/resize/frame-sample steps are STUBS in this container (no
imaging/audio libraries are installed) — they run a deterministic fake
behind the same Arrow-batched ``mapInPandas`` signature, schema, and
batch shape the real implementation would use, so the Spark-side
plumbing (partitioning, UDF boundaries, output schema) is real and
tested. Swap ``_fake_decode`` for a PIL/ffmpeg call to go live.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_id", StringType()),   # md5 prefix of the payload
    StructField("fake_width", LongType()),     # stub "decoded" metadata
    StructField("fake_height", LongType()),
    StructField("fake_frames", LongType()),
])


def _fake_decode(payload: bytes):
    """Deterministic stand-in for an image/video decoder.

    A real decoder is NOT available here (no PIL/ffmpeg); raise early if
    someone flips the flag expecting real decoding."""
    digest = hashlib.md5(payload).hexdigest()
    n = len(payload)
    return {
        "n_bytes": n,
        "content_id": digest[:8],
        "fake_width": 160 + n % 480,
        "fake_height": 90 + n % 270,
        "fake_frames": 1 + n % 24,
    }


def real_decode(payload: bytes):  # pragma: no cover — documented stub
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this "
        "environment; _fake_decode provides the deterministic stand-in")


def payload_table(documents, text_col="text", id_col="doc_id"):
    """Model documents as binary payloads (utf-8 bytes of text) — the
    schema shape of a real image/audio table: (id, payload binary)."""
    return documents.select(F.col(id_col),
                            F.encode(F.col(text_col), "UTF-8")
                            .alias("payload"))


def decode_metadata(payloads, id_col="doc_id"):
    """Arrow-batched 'decode' over the binary column via mapInPandas —
    the exact plumbing a real decoder uses (batch in, batch out, no
    per-row Python UDF at the API level)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                m = _fake_decode(bytes(payload))
                m[id_col] = int(did)
                recs.append(m)
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in DECODE_SCHEMA.fields])

    return payloads.mapInPandas(run, DECODE_SCHEMA).orderBy(id_col)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_width", LongType()),
    StructField("out_height", LongType()),
    StructField("n_out_bytes", LongType()),
    StructField("resized_id", StringType()),  # content id of the output
])

FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_id", StringType()),
])


def resize_payloads(payloads, width=64, height=36, id_col="doc_id"):
    """'Resize' every binary payload to width×height via mapInPandas —
    the real Arrow plumbing (batch in/out, typed schema); the pixel math
    is the deterministic stand-in (content id re-keyed by the target
    dims, output size = w*h/256 bytes capped at the input size), swapped
    for PIL.Image.resize when an imaging lib exists."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                digest = hashlib.md5(b).hexdigest()
                recs.append({
                    id_col: int(did),
                    "out_width": width,
                    "out_height": height,
                    "n_out_bytes": max(1, min(len(b),
                                              (width * height) // 256)),
                    "resized_id": hashlib.md5(
                        f"{digest}|{width}x{height}".encode())
                    .hexdigest()[:8],
                })
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in RESIZE_SCHEMA.fields])

    return payloads.mapInPandas(run, RESIZE_SCHEMA).orderBy(id_col)


def sample_frames(payloads, every_k=7, id_col="doc_id"):
    """Frame sampling: each payload is a fake 'video' with 1 + n%24
    frames (same arithmetic as decode_metadata); every k-th frame is
    emitted as its own row — the FAN-OUT batch shape (one input row →
    many output rows inside one Arrow batch) a real ffmpeg sampler
    produces. frame_id is the deterministic stand-in for frame bytes."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                digest = hashlib.md5(b).hexdigest()
                n_frames = 1 + len(b) % 24
                for idx in range(0, n_frames, every_k):
                    recs.append({
                        id_col: int(did),
                        "frame_idx": idx,
                        "frame_id": hashlib.md5(
                            f"{digest}#{idx}".encode()).hexdigest()[:8],
                    })
            yield pd.DataFrame(recs, columns=[f.name
                                              for f in FRAMES_SCHEMA.fields])

    return payloads.mapInPandas(run, FRAMES_SCHEMA) \
        .orderBy(id_col, "frame_idx")
