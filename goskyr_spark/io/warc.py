"""WARC (ISO 28500 / WARC/1.0) reading and writing — the container
format Common Crawl ships web pages in, and therefore the natural
page SOURCE for this engine at the 10^10-URL design point.

Format implemented from the public spec (iipc/warc-specifications):
a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

``response`` records carry an HTTP response message (status line +
headers + body) as their block. ``.warc.gz`` inputs are the Common
Crawl shipping form — one gzip MEMBER per record, concatenated;
``gunzip_members`` walks the members with zlib so the stream splits
without any record-boundary guessing.

Scale design: parsing is pure per-blob Python driven by
``mapInPandas`` over Spark's ``binaryFile`` source — one task per WARC
file (Common Crawl files are ~1 GB: a natural partition), no shuffle;
the result is the engine's standard (url, html) pages table feeding
extract_stage1 unchanged.
"""

from __future__ import annotations

CRLF = b"\r\n"


def build_http_response(body: bytes, status=200,
                        content_type="text/html") -> bytes:
    reason = {200: "OK", 404: "Not Found", 503: "Service Unavailable"} \
        .get(status, "OK")
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body


def write_warc(records) -> bytes:
    """records: iterable of (target_uri, http_bytes) → WARC/1.0 bytes
    (response records). Deterministic: no timestamps or UUIDs beyond
    what the caller supplies in the URI order."""
    out = []
    for uri, http in records:
        hdr = (b"WARC/1.0" + CRLF
               + b"WARC-Type: response" + CRLF
               + b"WARC-Target-URI: " + uri.encode("utf-8") + CRLF
               + b"Content-Type: application/http;msgtype=response"
               + CRLF
               + b"Content-Length: " + str(len(http)).encode("ascii")
               + CRLF + CRLF)
        out.append(hdr + http + CRLF + CRLF)
    return b"".join(out)


def _parse_http(block: bytes):
    """(status:int, body:bytes) from an HTTP response message; a block
    without a valid status line comes back as (0, whole block)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return 0, block
    head, body = block[:sep], block[sep + 4:]
    line = head.split(CRLF, 1)[0]
    parts = line.split(b" ")
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return 0, block
    try:
        return int(parts[1]), body
    except ValueError:
        return 0, block


def parse_warc(data: bytes):
    """Yield (target_uri, http_status, body_bytes) for each well-formed
    ``response`` record; malformed records are SKIPPED, not fatal (a
    100 TB crawl archive always contains some — one bad record must
    never kill the task). Non-response record types are ignored."""
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            # resync: find the next record marker
            nxt = data.find(b"\r\n\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 4
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = {}
        for line in data[pos:hdr_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = hdr_end + 4
            continue
        block = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4      # trailing CRLFCRLF
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri")
        if not uri or len(block) != length:
            continue
        status, body = _parse_http(block)
        yield uri.decode("utf-8", "replace"), status, body


def gunzip_members(data: bytes) -> bytes:
    """Decompress CONCATENATED gzip members (the .warc.gz layout: one
    member per record) into one plain byte stream. A truncated or
    corrupt trailing member yields what decompressed cleanly before it
    — same never-fatal stance as parse_warc."""
    import zlib

    out = []
    while data:
        d = zlib.decompressobj(wbits=31)      # 31 = gzip wrapper
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break
        if not d.eof:                          # truncated member
            break
        data = d.unused_data
    return b"".join(out)


def write_warc_gz(records) -> bytes:
    """records → .warc.gz bytes, one gzip member per record (the
    Common Crawl layout: members are independently seekable)."""
    import gzip

    return b"".join(
        gzip.compress(write_warc([rec]), mtime=0) for rec in records)


def read_warc_pages(spark, path, encoding="utf-8"):
    """Spark source: directory/glob of .warc / .warc.gz files → pages
    DataFrame (warc_file, url, http_status, html). One task per file
    via the binaryFile source; the parse (and per-member gunzip for
    .gz) runs Arrow-batched in mapInPandas."""
    from pyspark.sql import functions as F

    raw = (spark.read.format("binaryFile")
           .load(path)
           .select(F.col("path").alias("warc_file"), "content"))

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, blob in zip(pdf["warc_file"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":    # gzip magic
                    data = gunzip_members(data)
                for uri, status, body in parse_warc(data):
                    rows.append((path_, uri, status,
                                 body.decode(encoding, "replace")))
            yield pd.DataFrame(
                rows, columns=["warc_file", "url", "http_status",
                               "html"])

    return raw.mapInPandas(
        parse,
        "warc_file string, url string, http_status long, html string")
