"""PDF triage + text extraction (operators/pdfmeta.py): xref
cross-check strictness, encrypted routing, escape-aware literals,
Tj/TJ join conventions, and the Spark-side scans."""

from __future__ import annotations

from etl_tiki_webscraping_spark.operators.pdfmeta import (
    encode_pdf_fixture,
    extract_text_ops,
    parse_pdf,
    parse_pdf_text,
    pdf_fixture_text,
)


def test_meta_roundtrip_all_modes():
    for fid in range(15):
        m = parse_pdf(encode_pdf_fixture(fid))
        assert m is not None
        assert m["n_pages"] == 1 + fid % 4
        assert m["version_minor"] == 4 + fid % 3
        assert m["encrypted"] == (fid % 5 == 3)
        if fid % 5 == 3:
            assert m["producer"] is None and m["title"] is None
            assert m["n_objects"] == 4 + 2 * m["n_pages"]
        else:
            assert m["producer"] == "FixtureWriter 1.0"
            assert m["title"] == f"Doc ({fid})"  # escaped parens survive
            assert m["n_objects"] == 3 + 2 * m["n_pages"]


def test_text_roundtrip_and_join_conventions():
    for fid in (0, 1, 2, 5, 6, 7):  # k = 0,1,2 twice
        texts = parse_pdf_text(encode_pdf_fixture(fid))
        want = [
            pdf_fixture_text(fid, p) for p in range(1 + fid % 4)
        ]
        assert texts == want, (fid, texts)
        assert all("(q" in t for t in texts)  # escapes exercised


def test_strictness():
    b = encode_pdf_fixture(2)
    assert parse_pdf(encode_pdf_fixture(2, truncate=7)) is None
    assert parse_pdf(b[: len(b) // 2]) is None
    assert parse_pdf(b"") is None and parse_pdf(None) is None
    assert parse_pdf(b"%PDF-2.0\n%%EOF") is None
    # a lying xref offset (entry no longer lands on 'N 0 obj') rejects
    bad = b.replace(b"1 0 obj", b"X 0 obj", 1)
    assert parse_pdf(bad) is None
    # a lying /Size rejects
    import re

    m = re.search(rb"/Size (\d+)", b)
    bad = b.replace(m.group(0), b"/Size %d" % (int(m.group(1)) + 1), 1)
    assert parse_pdf(bad) is None
    # encrypted -> no text, ever
    assert parse_pdf_text(encode_pdf_fixture(3)) is None


def test_extract_text_ops_rules():
    assert extract_text_ops(b"BT (a) Tj (b) Tj ET") == "a b"
    assert extract_text_ops(b"BT [(a) -10 (b)] TJ ET") == "ab"
    assert extract_text_ops(b"(outside) Tj BT (in) Tj ET") == "in"
    assert extract_text_ops(rb"BT (a\(x\)b) Tj ET") == "a(x)b"
    assert extract_text_ops(rb"BT (a\\b) Tj ET") == "a\\b"
    assert extract_text_ops(b"BT (nested (ok)) Tj ET") == "nested (ok)"
    assert extract_text_ops(b"BT (dangling") is None
    # a literal NOT followed by a show operator does not leak in
    assert extract_text_ops(b"BT (a) Tj (ignored) Td ET") == "a"


def test_spark_scans(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.pdfmeta import (
        extract_pdf_metadata,
        extract_pdf_text,
    )

    rows = [
        (0, bytearray(encode_pdf_fixture(0))),       # clean Tj
        (3, bytearray(encode_pdf_fixture(3))),       # encrypted
        (4, bytearray(encode_pdf_fixture(4, truncate=7))),  # truncated
    ]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    meta = {r["file_id"]: r for r in extract_pdf_metadata(df).collect()}
    assert meta[0]["n_pages"] == 1 and meta[0]["encrypted"] is False
    assert meta[3]["encrypted"] is True and meta[3]["producer"] is None
    assert meta[4]["is_pdf"] is True and meta[4]["n_pages"] is None
    text = {}
    for r in extract_pdf_text(df).collect():
        text.setdefault(r["file_id"], []).append(r)
    assert [r["text"] for r in text[0]] == [pdf_fixture_text(0, 0)]
    assert text[3][0]["page"] == -1 and text[4][0]["page"] == -1
