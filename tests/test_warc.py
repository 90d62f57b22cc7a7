"""WARC record scan (sources/warc.py): plain + per-record-gzip
layouts, strict tiling, HTTP head extraction, quarantine, and the
Spark-side 1->N expansion."""

from __future__ import annotations

import zlib

from etl_tiki_webscraping_spark.sources.warc import (
    encode_warc,
    parse_warc_file,
    parse_warc_records,
    scan_warc_records,
    split_gzip_members,
)


def test_plain_layout_roundtrip():
    recs = parse_warc_file(encode_warc(7, 3, seed=1))
    assert len(recs) == 7  # warcinfo + 3 request/response pairs
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[1]["warc_type"] == "request"
    assert recs[2]["warc_type"] == "response"
    assert recs[2]["target_uri"] == "https://example.org/site7/page0"
    assert recs[2]["http_status"] == 200
    assert recs[4]["http_status"] == 204  # alternating by page parity
    assert recs[2]["http_content_type"] == "text/html"
    assert recs[2]["content_length"] == 65 + 100 + (7 + 0) % 64


def test_gzip_member_layout_matches_plain():
    plain = parse_warc_file(encode_warc(12, 2, seed=3))
    gz = parse_warc_file(encode_warc(12, 2, gzip_per_record=True, seed=3))
    assert plain == gz


def test_strictness():
    b = encode_warc(5, 2, seed=2)
    g = encode_warc(5, 2, gzip_per_record=True, seed=2)
    for cut in (1, 5, len(b) - 10):
        assert parse_warc_file(b[:-cut]) is None
    assert parse_warc_file(g[:-4]) is None
    assert parse_warc_file(b"\x00" * 40) is None
    assert parse_warc_file(b"") is None and parse_warc_file(None) is None
    # a lying Content-Length rejects
    bad = b.replace(b"Content-Length: 19", b"Content-Length: 21", 1)
    assert parse_warc_records(bad) is None
    # a missing required field rejects
    bad = b.replace(b"WARC-Date: ", b"X-Date: ", 1)
    assert parse_warc_records(bad) is None
    # trailing garbage after the last gzip member rejects
    assert split_gzip_members(g + b"junk") is None
    # a multi-record gzip member violates the .warc.gz contract
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    two_in_one = co.compress(b) + co.flush()
    assert parse_warc_file(two_in_one) is None


def test_spark_scan(spark):
    from pyspark.sql import types as T

    rows = [
        (1, bytearray(encode_warc(1, 2, seed=9))),
        (2, bytearray(encode_warc(2, 1, gzip_per_record=True, seed=9))),
        (3, bytearray(encode_warc(3, 2, seed=9, truncate=6))),
    ]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = scan_warc_records(spark.createDataFrame(rows, schema)).collect()
    by_file: dict = {}
    for r in out:
        by_file.setdefault(r["file_id"], []).append(r)
    assert len(by_file[1]) == 5 and [r["record_idx"] for r in sorted(
        by_file[1], key=lambda r: r["record_idx"])] == [0, 1, 2, 3, 4]
    assert len(by_file[2]) == 3
    assert len(by_file[3]) == 1 and by_file[3][0]["record_idx"] == -1
    assert by_file[3][0]["warc_type"] is None


def test_scan_responses_with_bodies(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.warc import (
        scan_warc_responses,
        warc_fixture_html,
    )

    rows = [
        (1, bytearray(encode_warc(1, 3, html_bodies=True, seed=5))),
        (2, bytearray(encode_warc(2, 2, html_bodies=True,
                                  gzip_per_record=True, seed=5))),
        (3, bytearray(encode_warc(3, 2, seed=5, truncate=4))),
    ]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = scan_warc_responses(spark.createDataFrame(rows, schema)).collect()
    by_file: dict = {}
    for r in out:
        by_file.setdefault(r["file_id"], []).append(r)
    f1 = sorted(by_file[1], key=lambda r: r["page"])
    assert [r["page"] for r in f1] == [0, 1, 2]
    assert f1[0]["http_status"] == 200 and f1[1]["http_status"] == 204
    assert f1[2]["body"] == warc_fixture_html(1, 2)
    assert len(by_file[2]) == 2 and by_file[2][0]["body"] is not None
    assert by_file[3][0]["page"] == -1 and by_file[3][0]["body"] is None


def test_single_pass_payload_capture():
    recs = parse_warc_file(
        encode_warc(9, 2, gzip_per_record=True, seed=4), include_payload=True
    )
    from hashlib import md5

    for r in recs:
        assert md5(r["payload"]).hexdigest() == r["payload_digest"]
        assert len(r["payload"]) == r["content_length"]


def test_http_decode_modes():
    from etl_tiki_webscraping_spark.sources.warc import (
        decode_http_response,
        encode_http_response,
        warc_fixture_text,
    )

    # mode = (file_id + page) % 6; file_id parity picks the latin-1
    # signalling channel (header param vs <meta charset>)
    for fid, page, enc, charset in [
        (6, 0, "identity", "utf-8"),
        (6, 1, "chunked", "utf-8"),
        (6, 2, "gzip", "utf-8"),
        (6, 3, "chunked+gzip", "utf-8"),
        (6, 4, "identity", "latin-1"),   # charset= param (even fid)
        (7, 3, "identity", "latin-1"),   # <meta charset> (odd fid)
    ]:
        dec = decode_http_response(encode_http_response(fid, page))
        assert dec["http_status"] == 200
        assert dec["http_encoding"] == enc, (fid, page)
        assert dec["charset"] == charset
        expected = warc_fixture_text(fid, page)
        if (fid, page) == (7, 3):
            expected = '<meta charset="iso-8859-1">' + expected
        assert dec["body"] == expected
        assert "café" in dec["body"]
    # mode 5: truncated chunk framing -> row-granular quarantine
    dec = decode_http_response(encode_http_response(6, 5))
    assert dec["http_encoding"] == "bad_chunked" and dec["body"] is None
    assert dec["http_status"] == 200  # the head still parses


def test_http_decode_quarantine_classes():
    from etl_tiki_webscraping_spark.sources.warc import decode_http_response

    assert decode_http_response(b"GET / HTTP/1.1\r\n\r\n")["http_encoding"] == "not_http"
    assert decode_http_response(b"HTTP/1.1 200 OK\r\nX: 1")["http_encoding"] == "no_body"
    # corrupt gzip body
    bad_gz = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n\x1f\x8bjunk"
    )
    assert decode_http_response(bad_gz)["http_encoding"] == "bad_content_encoding"
    # trailing garbage after a valid gzip stream is NOT a shorter body
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    gz = co.compress(b"x") + co.flush()
    assert decode_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz + b"!"
    )["http_encoding"] == "bad_content_encoding"
    # unknown coding and unsupported charset both quarantine
    assert decode_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxx"
    )["http_encoding"] == "bad_content_encoding"
    assert decode_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n\r\nxx"
    )["http_encoding"] == "bad_charset"


def test_dechunk_strictness():
    from etl_tiki_webscraping_spark.sources.warc import _dechunk

    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    # chunk extension ignored; trailer section ignored
    assert _dechunk(b"5;ext=1\r\nhello\r\n0\r\nX-T: v\r\n\r\n") == b"hello"
    assert _dechunk(b"zz\r\nhello\r\n0\r\n\r\n") is None        # bad hex
    assert _dechunk(b"6\r\nhello\r\n0\r\n\r\n") is None         # short data
    assert _dechunk(b"5\r\nhelloXX0\r\n\r\n") is None           # missing CRLF
    assert _dechunk(b"5\r\nhello\r\n") is None                  # no terminal
    # ADVICE r15: int(tok, 16) accepts '-', '+', '0x', '_' — a crafted
    # negative chunk size rewound pos and the loop never terminated
    # (an untrusted-bytes HANG, worse than an exception).  Strict hex
    # now rejects these up front, and the call returns (quarantine).
    assert _dechunk(b"-2\r\n-2\r\n-2\r\n-6\r\n" * 5) is None
    assert _dechunk(b"+5\r\nhello\r\n0\r\n\r\n") is None
    assert _dechunk(b"0x5\r\nhello\r\n0\r\n\r\n") is None
    assert _dechunk(b"1_0\r\n" + b"x" * 16 + b"\r\n0\r\n\r\n") is None


def test_deflate_both_wrappers():
    import zlib

    from etl_tiki_webscraping_spark.sources.warc import _decompress_ce

    body = b"deflate body bytes"
    wrapped = zlib.compress(body)
    raw = zlib.compressobj(wbits=-15)
    raw_bytes = raw.compress(body) + raw.flush()
    assert _decompress_ce(wrapped, "deflate") == body
    assert _decompress_ce(raw_bytes, "deflate") == body


def test_mixed_bodies_and_router(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.pdfmeta import (
        pdf_fixture_text,
    )
    from etl_tiki_webscraping_spark.sources.warc import (
        scan_warc_routed,
        warc_fixture_html,
    )

    rows = [
        (13, bytearray(encode_warc(13, 6, mixed_bodies=True))),
        # file 3: page 1 embeds pdf id 4 (clean); file 2: page 1 embeds
        # pdf id 3 (ENCRYPTED -> kind pdf, NULL text)
        (2, bytearray(encode_warc(2, 2, mixed_bodies=True,
                                  gzip_per_record=True))),
        (9, bytearray(encode_warc(9, 2, mixed_bodies=True, truncate=5))),
    ]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {}
    for r in scan_warc_routed(spark.createDataFrame(rows, schema)).collect():
        out[(r["file_id"], r["page"])] = r
    # html pages (identity and gzip CE) carry the raw html string
    assert out[(13, 0)]["kind"] == "html"
    assert out[(13, 0)]["html"] == warc_fixture_html(13, 0)
    assert out[(13, 2)]["kind"] == "html"  # gzip-encoded leg
    assert out[(13, 2)]["html"] == warc_fixture_html(13, 2)
    # pdf page: bytes routed through the pdf extractor, text joined ' '
    e = 13 + 1
    want = " ".join(pdf_fixture_text(e, p) for p in range(1 + e % 4))
    assert out[(13, 1)]["kind"] == "pdf" and out[(13, 1)]["pdf_text"] == want
    # encrypted embedded pdf (e = 2 + 1 = 3, 3 % 5 == 3): NULL text
    assert out[(2, 1)]["kind"] == "pdf" and out[(2, 1)]["pdf_text"] is None
    # truncated archive quarantines whole-file
    assert out[(9, -1)]["kind"] is None
