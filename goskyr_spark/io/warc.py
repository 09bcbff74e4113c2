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

Scale design: one task per WARC file (Common Crawl files are ~1 GB: a
natural partition), no shuffle; the file list is discovered
distributedly (``binaryFile`` source with ONLY the path column
projected — no blob read), and each task STREAMS its file in chunks
through ``iter_gunzip_stream`` → ``iter_warc_stream``, yielding record
batches every ``batch_rows`` pages. Peak task memory is
O(chunk + largest single record), NOT O(archive): a 1 GB .warc.gz that
decompresses 4-5× never materializes either the blob or the plain
stream, and the 2 GB ``binaryFile`` content ceiling does not apply.
The result is the engine's standard (url, html) pages table feeding
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


def iter_warc_stream(chunks):
    """Incremental WARC parse over an iterable of byte chunks: yield
    (target_uri, http_status, body_bytes) for each well-formed
    ``response`` record. Buffered bytes never exceed
    O(largest record + one chunk) — this is the streaming core that
    lets a task read a multi-GB archive without materializing it.
    Malformed records are SKIPPED, not fatal (a 100 TB crawl archive
    always contains some — one bad record must never kill the task);
    non-response record types are ignored."""
    it = iter(chunks)
    # bytearray, not bytes: ``buf += chunk`` is an in-place extend
    # (amortized O(chunk)) and ``del buf[:n]`` moves only the surviving
    # tail — with bytes concatenation each 1 MB chunk re-copied the
    # whole accumulated buffer, O(R^2/chunk) memcpy for a record of
    # size R (multi-GB of copying for a few-hundred-MB record even
    # though peak MEMORY was bounded). Per-record work is now linear.
    buf = bytearray()
    eof = False

    def more():
        nonlocal buf, eof
        try:
            buf += next(it)
            return True
        except StopIteration:
            eof = True
            return False

    while True:
        # align on a record start (resync past garbage between records)
        while not buf.startswith(b"WARC/"):
            nxt = buf.find(b"\r\n\r\nWARC/")
            if nxt >= 0:
                del buf[:nxt + 4]
                continue
            # marker may straddle a chunk boundary: keep a small tail
            if len(buf) > 16:
                del buf[:-16]
            if not more():
                return
        hdr_end = buf.find(b"\r\n\r\n")
        while hdr_end < 0:
            if not more():
                return
            hdr_end = buf.find(b"\r\n\r\n")
        headers = {}
        for line in bytes(buf[:hdr_end]).split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            del buf[:hdr_end + 4]
            continue
        need = hdr_end + 4 + length + 4     # block + trailing CRLFCRLF
        while len(buf) < need and not eof:
            more()
        block = bytes(buf[hdr_end + 4:hdr_end + 4 + length])
        del buf[:need]
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri")
        if not uri or len(block) != length:   # truncated final record
            continue
        status, body = _parse_http(block)
        yield uri.decode("utf-8", "replace"), status, body


def parse_warc(data: bytes):
    """Yield (target_uri, http_status, body_bytes) from in-memory WARC
    bytes — the whole-blob convenience form of ``iter_warc_stream``."""
    return iter_warc_stream([data])


def iter_gunzip_stream(chunks):
    """Streaming decompressor for CONCATENATED gzip members (the
    .warc.gz layout: one member per record): an iterable of compressed
    chunks in, an iterable of plain chunks out, holding only one
    compressed chunk + the zlib window in memory at a time.

    Never-fatal stance: a corrupt member causes a scan forward for the
    next plausible member start (gzip magic ``1f 8b 08``) and resumes
    there, so only the bad member — at worst plus the one immediately
    after it in a pathological truncation — is lost, not the rest of
    the archive. A truncated FINAL member yields what decompressed
    cleanly before the cut."""
    import zlib

    it = iter(chunks)
    d = zlib.decompressobj(wbits=31)          # 31 = gzip wrapper
    fed = b""       # bytes fed to d since the CURRENT member began —
    #                 kept because a corrupted deflate stream can
    #                 silently consume bytes of FOLLOWING members
    #                 before the corruption surfaces (often only at the
    #                 CRC check), and those bytes must be rescannable
    #                 for the next member's magic. Reset at every
    #                 member boundary, so memory is O(compressed
    #                 member), never O(archive).
    pending = b""
    while True:
        if not pending:
            nxt = next(it, None)
            if nxt is None:
                return
            pending = bytes(nxt)
            continue
        try:
            out = d.decompress(pending)
        except zlib.error:
            # corrupt member: rescan EVERYTHING fed since this member
            # began (incl. bytes zlib already consumed) plus the unfed
            # remainder; restart at the next plausible member header.
            # find() from index 1 guarantees progress past a corrupt
            # or false-positive start.
            buf = fed + pending
            i = buf.find(b"\x1f\x8b\x08", 1)
            d = zlib.decompressobj(wbits=31)
            fed = b""
            if i >= 0:
                pending = buf[i:]
            else:
                # next member not seen yet: keep a short tail (magic
                # may straddle the chunk boundary) and pull the next
                # chunk — one chunk consumed per pass guarantees
                # progress. A straddled genuine header parses on the
                # fresh decompressor; a garbage tail errors again and
                # re-enters this handler with the magic in pending.
                tail = buf[-2:] if len(buf) > 2 else buf
                nxt = next(it, None)
                if nxt is None:
                    return
                pending = tail + bytes(nxt)
            continue
        fed += pending
        if out:
            yield out
        if d.eof:                              # member boundary
            pending = d.unused_data
            d = zlib.decompressobj(wbits=31)
            fed = b""
        else:
            pending = b""


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members held in memory — the
    whole-blob convenience form of ``iter_gunzip_stream`` (same
    corrupt-member resync)."""
    return b"".join(iter_gunzip_stream([data]))


def write_warc_gz(records) -> bytes:
    """records → .warc.gz bytes, one gzip member per record (the
    Common Crawl layout: members are independently seekable)."""
    import gzip

    return b"".join(
        gzip.compress(write_warc([rec]), mtime=0) for rec in records)


def _open_chunks(path, chunk_bytes=1 << 20):
    """Yield byte chunks from a file path/URI. ``file:`` URIs (and bare
    paths) use plain ``open``; any other scheme resolves through
    ``pyarrow.fs.FileSystem.from_uri`` (s3/hdfs/... on a real cluster),
    which also streams."""
    if path.startswith("file:"):
        local = path[5:]
        if local.startswith("///"):
            local = local[2:]
        f = open(local, "rb")
    elif "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        f = filesystem.open_input_stream(p)
    else:
        f = open(path, "rb")
    with f:
        while True:
            b = f.read(chunk_bytes)
            if not b:
                return
            yield b


def iter_warc_file(path, chunk_bytes=1 << 20):
    """Stream (uri, status, body) records from one .warc / .warc.gz
    path, peak memory O(chunk + largest record). Gzip is detected from
    the first chunk's magic, not the file name."""
    chunks = _open_chunks(path, chunk_bytes)
    first = next(chunks, None)
    if first is None:
        return iter(())
    import itertools

    stream = itertools.chain([first], chunks)
    if first[:2] == b"\x1f\x8b":
        stream = iter_gunzip_stream(stream)
    return iter_warc_stream(stream)


def read_warc_pages(spark, path, encoding="utf-8", batch_rows=2000,
                    chunk_bytes=1 << 20):
    """Spark source: directory/glob of .warc / .warc.gz files → pages
    DataFrame (warc_file, url, http_status, html). One task per file:
    the binaryFile source is used ONLY for distributed file discovery
    (path column projected — the format skips the blob read entirely),
    then each task streams its file through iter_warc_file and emits a
    record batch every ``batch_rows`` pages. Task memory is bounded by
    O(chunk + largest record + batch_rows pages) regardless of archive
    size; binaryFile's 2 GB content cap does not apply."""
    from pyspark.sql import functions as F

    raw = (spark.read.format("binaryFile")
           .load(path)
           .select(F.col("path").alias("warc_file")))

    def parse(batches):
        import pandas as pd

        cols = ["warc_file", "url", "http_status", "html"]
        for pdf in batches:
            for path_ in pdf["warc_file"]:
                rows = []
                for uri, status, body in iter_warc_file(
                        path_, chunk_bytes):
                    rows.append((path_, uri, status,
                                 body.decode(encoding, "replace")))
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        parse,
        "warc_file string, url string, http_status long, html string")
