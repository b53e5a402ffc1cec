"""WARC (ISO 28500 / WARC/1.0-1.1) ingestion — the Common-Crawl wire
format — written from scratch against the public spec.

Common Crawl ships crawls as ``*.warc.gz`` files where EVERY record is
its own gzip member, so a reader can seek to a member offset and inflate
one record independently.  This module implements:

* :func:`iter_warc_records` — record iterator over raw bytes (handles
  per-record-gzip, whole-file-gzip, and uncompressed WARC), parsing
  WARC named fields and splitting the HTTP response envelope from the
  payload of ``response`` records;
* :func:`build_warc` — the writer (per-record gzip members, CC layout),
  used by tests and the deterministic corpus;
* :func:`warc_pages_df` — Spark source: ``binaryFile`` scan of
  ``*.warc[.gz]`` → Arrow kernel → the canonical pages relation
  ``(url, warc_ts, html binary)`` feeding the extraction operators
  unchanged.

Scale note: one WARC file = one task.  Common Crawl segments a crawl
into ~64k files of ~1 GB per dump, so a 1000-executor cluster gets its
parallelism from the file count — no in-file splitting is needed, and
per-record gzip keeps memory flat while streaming members.  The
``binaryFile`` source prunes on path glob; at petabyte scale the same
kernel runs over an Iceberg manifest of (path, offset, length) member
ranges instead.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator

_CRLF = b"\r\n"


class WarcError(ValueError):
    """Malformed WARC structure."""


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Inflate a multi-member gzip stream, yielding one decompressed
    blob per member (the CC per-record layout)."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise WarcError(f"not a gzip member at offset {pos}")
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as exc:
            raise WarcError(f"corrupt gzip member at {pos}: {exc}") from exc
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:  # folded continuation
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        k, _, v = line.partition(b":")
        last = k.strip().decode("latin-1").lower()
        headers[last] = v.strip().decode("latin-1")
    return headers


def _records_from_plain(data: bytes) -> Iterator[dict]:
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos:pos + 5] == b"WARC/":
            raise WarcError(f"missing WARC version line at {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        version_end = data.find(_CRLF, pos)
        headers = _parse_headers(data[version_end + 2:hdr_end])
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        yield {"headers": headers, "body": body,
               "warc_type": headers.get("warc-type", ""),
               "target_uri": headers.get("warc-target-uri", ""),
               "date": headers.get("warc-date", "")}


def split_http_response(body: bytes) -> tuple[dict[str, str], bytes]:
    """Split an ``application/http; msgtype=response`` block into
    (http headers dict incl. ``:status``, payload bytes)."""
    sep = body.find(_CRLF + _CRLF)
    if sep < 0 or not body.startswith(b"HTTP/"):
        return {}, body
    status_end = body.find(_CRLF)
    status_line = body[:status_end].decode("latin-1", "replace")
    headers = _parse_headers(body[status_end + 2:sep])
    parts = status_line.split(None, 2)
    headers[":status"] = parts[1] if len(parts) > 1 else ""
    return headers, body[sep + 4:]


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield dicts for every record: ``warc_type``, ``target_uri``,
    ``date``, ``headers`` (WARC named fields, lower-cased), ``body``;
    response records additionally carry ``http_headers`` + ``payload``."""
    if data[:2] == b"\x1f\x8b":
        blobs: Iterable[bytes] = _split_gzip_members(data)
    else:
        blobs = (data,)
    for blob in blobs:
        for rec in _records_from_plain(blob):
            if rec["warc_type"] == "response":
                http, payload = split_http_response(rec["body"])
                rec["http_headers"] = http
                rec["payload"] = payload
            yield rec


def iter_cdx_entries(data: bytes) -> Iterator[dict]:
    """CDX-style capture-index entries for one ``.warc[.gz]`` blob: one
    dict per ``response`` record carrying the fields a CDX(J) line needs
    — ``url``, ``warc_ts``, the record's byte ``offset`` + ``length``
    (for per-record-gzip files these are the gzip MEMBER's compressed
    span, the range-read handle Common Crawl's own index stores), HTTP
    ``status``, payload ``mime`` (envelope Content-Type sans params),
    ``payload_len`` and ``payload_md5`` over the exact payload bytes.

    Reference parity note: the reference engine has no WARC layer; this
    is part of the crawl-ingestion surface the Spark build adds (CC
    publishes exactly this index next to every crawl)."""
    import hashlib

    def entries(blob: bytes, offset: int, length: int) -> Iterator[dict]:
        for rec in _records_from_plain(blob):
            if rec["warc_type"] != "response":
                continue
            http, payload = split_http_response(rec["body"])
            try:
                status = int(http.get(":status", ""))
            except ValueError:
                status = 0
            yield {
                "url": rec["target_uri"],
                "warc_ts": rec["date"],
                "offset": offset,
                "length": length,
                "status": status,
                "mime": http.get("content-type", "").split(";")[0].strip(),
                "payload_len": len(payload),
                "payload_md5": hashlib.md5(payload).hexdigest(),
            }

    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            if data[pos:pos + 2] != b"\x1f\x8b":
                raise WarcError(f"not a gzip member at offset {pos}")
            d = zlib.decompressobj(wbits=31)
            try:
                blob = d.decompress(data[pos:])
            except zlib.error as exc:
                raise WarcError(
                    f"corrupt gzip member at {pos}: {exc}") from exc
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            yield from entries(blob, pos, consumed)
            pos += consumed
    else:
        # plain .warc (or whole-file gzip already inflated by a caller):
        # spans are the record's own byte range in the file
        pos = 0
        n = len(data)
        while pos < n:
            while data[pos:pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                return
            hdr_end = data.find(_CRLF + _CRLF, pos)
            if hdr_end < 0:
                raise WarcError("unterminated WARC header block")
            version_end = data.find(_CRLF, pos)
            headers = _parse_headers(data[version_end + 2:hdr_end])
            length = int(headers.get("content-length", "0"))
            end = hdr_end + 4 + length
            yield from entries(data[pos:end], pos, end - pos)
            pos = end


# ---------------------------------------------------------------------------
# writing (tests + deterministic corpus)
# ---------------------------------------------------------------------------


def build_record(warc_type: str, body: bytes,
                 uri: str | None = None, date: str | None = None,
                 record_id: str | None = None,
                 content_type: str | None = None) -> bytes:
    fields = [("WARC-Type", warc_type)]
    if uri:
        fields.append(("WARC-Target-URI", uri))
    fields.append(("WARC-Date", date or "2025-01-01T00:00:00Z"))
    fields.append(("WARC-Record-ID",
                   record_id or f"<urn:uuid:{abs(hash((warc_type, uri))):032x}>"))
    if content_type:
        fields.append(("Content-Type", content_type))
    fields.append(("Content-Length", str(len(body))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("latin-1") for k, v in fields)
    return head + _CRLF + body + _CRLF + _CRLF


def build_response_record(uri: str, html: bytes, date: str | None = None,
                          charset: str | None = None) -> bytes:
    ct = "text/html" + (f"; charset={charset}" if charset else "")
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: " + ct.encode("latin-1")
            + b"\r\nContent-Length: " + str(len(html)).encode() + _CRLF + _CRLF)
    return build_record(
        "response", http + html, uri=uri, date=date,
        content_type="application/http; msgtype=response")


def build_warc(records: Iterable[bytes], per_record_gzip: bool = True,
               warcinfo: bool = True) -> bytes:
    """Assemble a .warc.gz (per-record gzip members, the CC layout) or a
    plain .warc when ``per_record_gzip`` is False."""
    recs = list(records)
    if warcinfo:
        info = b"software: perl-html5-dom-spark warc writer\r\n"
        recs.insert(0, build_record("warcinfo", info,
                                    content_type="application/warc-fields"))
    if not per_record_gzip:
        return b"".join(recs)
    out = io.BytesIO()
    for rec in recs:
        # mtime=0 for deterministic bytes
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


def build_conversion_record(uri: str, text: str,
                            date: str | None = None) -> bytes:
    """WET-style ``conversion`` record: the extracted plain text of a
    page (the Common Crawl WET sidecar format — same ISO 28500 framing
    as WARC, payload is UTF-8 text with no HTTP envelope)."""
    return build_record("conversion", text.encode("utf-8"), uri=uri,
                        date=date, content_type="text/plain")


def build_wet(records: Iterable[bytes], per_record_gzip: bool = True) -> bytes:
    """Assemble a ``.warc.wet.gz`` from conversion records (same member
    framing as :func:`build_warc`)."""
    return build_warc(records, per_record_gzip=per_record_gzip)


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def roundtrip_df(df):
    """DataFrame(url, html) → same, but each row makes a full trip
    through the WARC layer inside the kernel: page → response record →
    per-record-gzip member → record parser → payload.  Used by the
    ``warc_extract`` oracle query to prove the ingestion path without
    touching disk."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "html": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                data = build_warc(
                    [build_response_record(url, bytes(html))])
                (rec,) = (r for r in iter_warc_records(data)
                          if r["warc_type"] == "response")
                out["url"].append(rec["target_uri"])
                out["html"].append(rec["payload"])
            yield pd.DataFrame(out)

    return df.select("url", "html").mapInPandas(
        run, schema="url string, html binary")


_CDX_COLS = ("url", "warc_ts", "offset", "length",
             "status", "mime", "payload_len", "payload_md5")
_CDX_SCHEMA = ("url string, warc_ts string, offset bigint, length bigint, "
               "status bigint, mime string, payload_len bigint, "
               "payload_md5 string")


def cdx_index_df(spark, path: str):
    """``*.warc[.gz]`` files → CDX-style capture index DataFrame
    (:data:`_CDX_SCHEMA` plus a leading ``file`` column): the queryable
    index Common Crawl publishes beside every crawl, built with the same
    one-file-one-task parallelism as :func:`warc_pages_df`.

    100 TB shape: the kernel emits only index rows (no payload column
    leaves the executor), so the stage is scan-bound and its output is
    ~100 B/record — small enough to broadcast-join against a URL list
    for targeted member range-reads."""
    import os as _os

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out: dict = {"file": []}
            out.update({k: [] for k in _CDX_COLS})
            for pth, content in zip(pdf["path"], pdf["content"]):
                base = _os.path.basename(str(pth))
                for e in iter_cdx_entries(bytes(content)):
                    out["file"].append(base)
                    for k in _CDX_COLS:
                        out[k].append(e[k])
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        run, schema="file string, " + _CDX_SCHEMA)


def cdx_roundtrip_df(df):
    """DataFrame(url, html) → one CDX entry per page, the WARC layer
    made in-flight (the :func:`roundtrip_df` trick): page → response
    record → per-record-gzip member → :func:`iter_cdx_entries`.  Keeps
    the physical-layout-independent columns (status/mime from the HTTP
    envelope parse, payload length + MD5 over the exact payload bytes)
    so a DuckDB oracle can re-derive every value from the page template;
    member offsets/lengths are pinned by pytest on real multi-record
    files instead (compressed layout isn't SQL-derivable)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "status": [], "mime": [],
                   "payload_len": [], "payload_md5": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                data = build_warc(
                    [build_response_record(url, bytes(html))])
                (e,) = iter_cdx_entries(data)
                out["url"].append(e["url"])
                out["status"].append(e["status"])
                out["mime"].append(e["mime"])
                out["payload_len"].append(e["payload_len"])
                out["payload_md5"].append(e["payload_md5"])
            yield pd.DataFrame(out)

    return df.select("url", "html").mapInPandas(
        run, schema="url string, status bigint, mime string, "
                    "payload_len bigint, payload_md5 string")


def wet_roundtrip_df(df):
    """DataFrame(url, text) → same, but each row makes a full trip
    through the WET layer inside the kernel: text → ``conversion``
    record → per-record-gzip member → record parser → payload.  The
    WET twin of :func:`roundtrip_df`, used by the ``wet_extract``
    oracle query to prove conversion-record ingestion without touching
    disk (any framing bug — headers, Content-Length over multi-byte
    UTF-8, gzip member boundaries — surfaces as a value mismatch)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "text": []}
            for url, text in zip(pdf["url"], pdf["text"]):
                data = build_wet([build_conversion_record(url, text)])
                (rec,) = (r for r in iter_warc_records(data)
                          if r["warc_type"] == "conversion")
                out["url"].append(rec["target_uri"])
                out["text"].append(rec["body"].decode("utf-8"))
            yield pd.DataFrame(out)

    return df.select("url", "text").mapInPandas(
        run, schema="url string, text string")


def _pages_kernel(batches):
    """Arrow kernel shared by the batch and streaming WARC sources:
    (content binary) batches → one row per ``response`` record."""
    import pandas as pd

    for pdf in batches:
        out = {"url": [], "warc_ts": [], "html": []}
        for content in pdf["content"]:
            for rec in iter_warc_records(bytes(content)):
                if rec["warc_type"] != "response":
                    continue
                out["url"].append(rec["target_uri"])
                out["warc_ts"].append(rec["date"])
                out["html"].append(rec["payload"])
        yield pd.DataFrame(out)


_PAGES_KERNEL_SCHEMA = "url string, warc_ts string, html binary"


def _finish_pages(df):
    return df.selectExpr(
        "url",
        "to_timestamp(replace(replace(warc_ts, 'T', ' '), 'Z', '')) as warc_ts",
        "html")


def warc_pages_df(spark, path: str):
    """``*.warc[.gz]`` files → DataFrame(url, warc_ts, html binary).

    ``binaryFile`` yields (path, content); the Arrow kernel inflates
    members and emits one row per ``response`` record.  Parallelism =
    file count (CC segments a crawl into tens of thousands of files)."""
    files = spark.read.format("binaryFile").load(path)
    return _finish_pages(files.select("content").mapInPandas(
        _pages_kernel, schema=_PAGES_KERNEL_SCHEMA))


def _wet_kernel(batches):
    """(content binary) batches → one row per ``conversion`` record."""
    import pandas as pd

    for pdf in batches:
        out = {"url": [], "warc_ts": [], "text": []}
        for content in pdf["content"]:
            for rec in iter_warc_records(bytes(content)):
                if rec["warc_type"] != "conversion":
                    continue
                out["url"].append(rec["target_uri"])
                out["warc_ts"].append(rec["date"])
                out["text"].append(rec["body"].decode("utf-8"))
        yield pd.DataFrame(out)


def wet_docs_df(spark, path: str):
    """``*.wet[.gz]`` files → DataFrame(url, warc_ts, text string).

    The WET ingestion twin of :func:`warc_pages_df`: when a crawl
    provider already ships extracted text, the curation pipeline can
    start from conversion records and skip the HTML parse entirely —
    every downstream text operator (quality, dedup, split, pack) takes
    this frame unchanged."""
    files = spark.read.format("binaryFile").load(path)
    df = files.select("content").mapInPandas(
        _wet_kernel, schema="url string, warc_ts string, text string")
    return df.selectExpr(
        "url",
        "to_timestamp(replace(replace(warc_ts, 'T', ' '), 'Z', '')) as warc_ts",
        "text")


def read_warc_stream(spark, path: str, max_files_per_trigger: int = 4):
    """Streaming twin of :func:`warc_pages_df`: ``readStream`` over
    ``binaryFile`` (a streaming-capable file source since Spark 3.x) so
    WARC files landing in a crawl drop-box flow through the SAME Arrow
    kernel — one micro-batch per trigger, exactly-once via the sink's
    checkpoint/commit log.  At CC scale ``maxFilesPerTrigger`` bounds a
    micro-batch to files × ~1 GB, keeping executor memory flat."""
    # binaryFile's schema is fixed by the format, but the streaming
    # reader requires it to be stated explicitly
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .option("pathGlobFilter", "*.warc*")
             .load(path))
    return _finish_pages(files.select("content").mapInPandas(
        _pages_kernel, schema=_PAGES_KERNEL_SCHEMA))
