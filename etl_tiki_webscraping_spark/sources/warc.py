"""WARC (Web ARChive, ISO 28500) record scan — the crawl-native
SOURCE format (round-14).  A 100 TB pretraining pipeline's raw input
is almost always WARC: Common-Crawl-style archives of per-fetch
records, usually gzip-compressed PER RECORD so members are
independently seekable.  This module turns a binary WARC (or .warc.gz)
blob column into typed per-record rows — the 1->N expansion every
downstream text operator (extraction, language id, dedup) consumes.

Everything is stdlib from the public layout:

- a record = a header block of CRLF-terminated lines ("WARC/1.0",
  then "Name: value" fields), a blank line, exactly Content-Length
  payload bytes, and the record separator CRLF CRLF;
- required fields: WARC-Type, WARC-Record-ID, WARC-Date,
  Content-Length (ISO 28500 §5);
- .warc.gz = concatenated gzip MEMBERS, one record each, walked with
  ``zlib.decompressobj(wbits=31)`` + the unused_data loop;
- response records carry an HTTP message as payload; the status line
  and Content-Type header are parsed from its head (no body decode).

STRICT (the GIF truncation rule): version line must be WARC/0.x-1.x,
Content-Length must parse and fit, the separator must follow each
payload, gzip members must decompress cleanly and tile the file —
else the FILE quarantines (one record_idx = -1 row keeps the loss
observable; a half-written archive should never be half-ingested).

Scale shape: one Arrow-batched 1->N mapInPandas pass per file blob —
files never shuffle, and each task expands only its own partition's
files (the mapInPandas fan-out caveat applies downstream: size joins
over the exploded records explicitly).
"""

from __future__ import annotations

import zlib
from hashlib import md5 as _md5

_REQUIRED = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")


def split_gzip_members(data: bytes) -> "list[bytes] | None":
    """Decompress concatenated gzip members (the .warc.gz layout):
    [member_bytes, ...] or None when any member is corrupt or trailing
    garbage remains."""
    if not data:
        return None
    out: "list[bytes]" = []
    rest = data
    while rest:
        if rest[:2] != b"\x1f\x8b":
            return None
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest)
        except zlib.error:
            return None
        if not d.eof:
            return None  # truncated member
        out.append(chunk)
        rest = d.unused_data
    return out


def parse_warc_records(data: bytes) -> "list[dict] | None":
    """Parse an UNCOMPRESSED WARC file into per-record dicts
    ``{warc_type, record_id, date, content_length, target_uri,
    http_status, http_content_type, payload_digest}`` or None on any
    malformation (strict tiling — see module docstring)."""
    if not data or not data.startswith(b"WARC/"):
        return None
    out: "list[dict]" = []
    pos = 0
    n = len(data)
    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return None
        lines = data[pos:hdr_end].split(b"\r\n")
        if not lines[0].startswith(b"WARC/") or lines[0][5:6] not in b"01":
            return None
        fields: "dict[str, str]" = {}
        for line in lines[1:]:
            if b":" not in line:
                return None
            k, v = line.split(b":", 1)
            fields[k.strip().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        if any(r not in fields for r in _REQUIRED):
            return None
        try:
            clen = int(fields["Content-Length"])
        except ValueError:
            return None
        body_start = hdr_end + 4
        body_end = body_start + clen
        if clen < 0 or body_end + 4 > n:
            return None
        if data[body_end : body_end + 4] != b"\r\n\r\n":
            return None
        payload = data[body_start:body_end]
        status = ctype = None
        if fields["WARC-Type"] == "response" and payload[:5] == b"HTTP/":
            head = payload.split(b"\r\n\r\n", 1)[0]
            hlines = head.split(b"\r\n")
            parts = hlines[0].split(b" ")
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for hl in hlines[1:]:
                if hl.lower().startswith(b"content-type:"):
                    ctype = (
                        hl.split(b":", 1)[1].strip().decode("ascii", "replace")
                    )
                    break
        out.append({
            "warc_type": fields["WARC-Type"],
            "record_id": fields["WARC-Record-ID"],
            "date": fields["WARC-Date"],
            "content_length": clen,
            "target_uri": fields.get("WARC-Target-URI"),
            "http_status": status,
            "http_content_type": ctype,
            "payload_digest": _md5(payload).hexdigest(),
        })
        pos = body_end + 4
    return out or None


def parse_warc_file(data: bytes) -> "list[dict] | None":
    """Uncompressed or per-record-gzip WARC: dispatch on magic."""
    if not data:
        return None
    if data[:2] == b"\x1f\x8b":
        members = split_gzip_members(data)
        if members is None:
            return None
        out: "list[dict]" = []
        for m in members:
            recs = parse_warc_records(m)
            if recs is None or len(recs) != 1:
                return None  # .warc.gz contract: one record per member
            out.extend(recs)
        return out or None
    return parse_warc_records(data)


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------


def _record(warc_type: str, record_id: str, date: str, payload: bytes,
            target_uri: "str | None" = None) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def warc_fixture_html(file_id: int, page: int) -> str:
    """The deterministic HTML body used by ``encode_warc(...,
    html_bodies=True)`` — script content to strip, an entity to
    decode, a comment to drop, all replayable from (file_id, page)
    arithmetic so the catalog oracle can rebuild the EXACT raw string
    and push it through html_to_text_sql."""
    return (
        f"<html><head><title>Site {file_id % 97} page {page}</title>"
        f"<script>var x = {file_id};</script></head>"
        f"<body><h1>Doc {file_id}&nbsp;{page}</h1>"
        f"<p>alpha beta tok{(file_id + page) % 50} gamma</p>"
        f"<!-- hidden {file_id} --></body></html>"
    )


def encode_warc(
    file_id: int,
    n_pages: int,
    gzip_per_record: bool = False,
    truncate: int = 0,
    seed: int = 0,
    html_bodies: bool = False,
) -> bytes:
    """Fixture writer: a warcinfo record followed by ``n_pages``
    request/response pairs with doc-arithmetic URIs, HTTP status
    ``200 + 4 * (page % 2 == 1)`` (200/204 alternating), text/html
    content-type, and md5-derived bodies of ``100 + (file_id + page)
    % 64`` bytes — every field the scan extracts is replayable from
    (file_id, page) arithmetic.  ``gzip_per_record`` emits the
    .warc.gz one-member-per-record layout; ``truncate`` drops trailing
    bytes for the strict-rejection case."""
    date = "2026-01-01T00:00:00Z"
    recs: "list[bytes]" = [
        _record(
            "warcinfo", f"<urn:uuid:{file_id:08d}-0>", date,
            b"software: fixture\r\n",
        )
    ]
    for page in range(n_pages):
        uri = f"https://example.org/site{file_id % 97}/page{page}"
        recs.append(_record(
            "request", f"<urn:uuid:{file_id:08d}-{2 * page + 1}>", date,
            f"GET /site{file_id % 97}/page{page} HTTP/1.1\r\n"
            f"Host: example.org\r\n".encode(),
            target_uri=uri,
        ))
        if html_bodies:
            body = warc_fixture_html(file_id, page).encode()
            body_len = len(body)
        else:
            body_len = 100 + (file_id + page) % 64
            body = b"".join(
                _md5(f"warc:{seed}:{file_id}:{page}:{i}".encode()).digest()
                for i in range(body_len // 16 + 1)
            )[:body_len]
        status = 200 + 4 * (page % 2)
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html\r\n"
            f"Content-Length: {body_len}\r\n\r\n"
        ).encode() + body
        recs.append(_record(
            "response", f"<urn:uuid:{file_id:08d}-{2 * page + 2}>", date,
            http, target_uri=uri,
        ))
    if gzip_per_record:
        out = b"".join(_gzip_member(r) for r in recs)
    else:
        out = b"".join(recs)
    return out[: len(out) - truncate] if truncate else out


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


WARC_SCAN_SCHEMA = (
    "file_id bigint, record_idx int, warc_type string, "
    "target_uri string, content_length bigint, http_status int, "
    "http_content_type string"
)


def scan_warc_records(df, id_col="file_id", content_col="content"):
    """1->N record expansion over WARC file blobs in one Arrow-batched
    mapInPandas pass: each clean file yields one row per record; a
    file the strict parse rejects yields the single record_idx = -1
    quarantine row (a half-written archive is never half-ingested).
    Files never shuffle; downstream joins over the exploded records
    must size themselves explicitly (Catalyst cannot see the fan-out).
    """
    import pandas as pd

    def run(batches):
        for batch in batches:
            out = []
            for fid, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content) if content is not None else None
                recs = parse_warc_file(data)
                if recs is None:
                    out.append({
                        "file_id": int(fid), "record_idx": -1,
                        "warc_type": None, "target_uri": None,
                        "content_length": None, "http_status": None,
                        "http_content_type": None,
                    })
                    continue
                for i, r in enumerate(recs):
                    out.append({
                        "file_id": int(fid), "record_idx": i,
                        "warc_type": r["warc_type"],
                        "target_uri": r["target_uri"],
                        "content_length": r["content_length"],
                        "http_status": r["http_status"],
                        "http_content_type": r["http_content_type"],
                    })
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(
        run, schema=WARC_SCAN_SCHEMA
    )


WARC_RESPONSE_SCHEMA = (
    "file_id bigint, page int, target_uri string, http_status int, "
    "http_content_type string, body string"
)


def scan_warc_responses(df, id_col="file_id", content_col="content"):
    """Response-record expansion WITH bodies: each clean archive
    yields one row per ``response`` record carrying the HTTP payload
    body (bytes after the header's blank line) decoded as UTF-8 — the
    form the text stack (HTML extraction, language id, dedup)
    consumes directly.  Strictness and quarantine contracts are
    identical to :func:`scan_warc_records` (a rejected file emits one
    page = -1 row).  Page numbering follows the fixture convention:
    response record 2p+2 is page p."""
    import pandas as pd

    def run(batches):
        for batch in batches:
            out = []
            for fid, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content) if content is not None else None
                # re-parse with payloads: parse_warc_file validates;
                # the body walk below re-reads the validated records
                if data is None or parse_warc_file(data) is None:
                    out.append({
                        "file_id": int(fid), "page": -1,
                        "target_uri": None, "http_status": None,
                        "http_content_type": None, "body": None,
                    })
                    continue
                members = (
                    split_gzip_members(data)
                    if data[:2] == b"\x1f\x8b" else None
                )
                raw = b"".join(members) if members is not None else data
                page = 0
                pos = 0
                while pos < len(raw):
                    hdr_end = raw.find(b"\r\n\r\n", pos)
                    lines = raw[pos:hdr_end].split(b"\r\n")
                    fields = {}
                    for line in lines[1:]:
                        k, v = line.split(b":", 1)
                        fields[k.strip().decode()] = v.strip().decode(
                            "utf-8", "replace"
                        )
                    clen = int(fields["Content-Length"])
                    payload = raw[hdr_end + 4 : hdr_end + 4 + clen]
                    pos = hdr_end + 4 + clen + 4
                    if fields["WARC-Type"] != "response":
                        continue
                    status = ctype = body = None
                    if payload[:5] == b"HTTP/":
                        parts = payload.split(b"\r\n\r\n", 1)
                        head = parts[0].split(b"\r\n")
                        sl = head[0].split(b" ")
                        if len(sl) >= 2 and sl[1].isdigit():
                            status = int(sl[1])
                        for hl in head[1:]:
                            if hl.lower().startswith(b"content-type:"):
                                ctype = hl.split(b":", 1)[1].strip().decode(
                                    "ascii", "replace"
                                )
                        if len(parts) == 2:
                            body = parts[1].decode("utf-8", "replace")
                    out.append({
                        "file_id": int(fid), "page": page,
                        "target_uri": fields.get("WARC-Target-URI"),
                        "http_status": status,
                        "http_content_type": ctype,
                        "body": body,
                    })
                    page += 1
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(
        run, schema=WARC_RESPONSE_SCHEMA
    )
