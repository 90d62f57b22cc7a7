"""ZIP container triage (operators/zipmeta.py): EOCD discovery,
central-directory walk, classification, strictness, Spark path."""

from __future__ import annotations

import struct

from etl_tiki_webscraping_spark.operators.zipmeta import (
    encode_zip_fixture,
    extract_zip_metadata,
    parse_zip,
    sniff_zip,
)


def test_kind_classification():
    for kind, extra in (("zip", 0), ("docx", 2), ("xlsx", 2), ("pptx", 2),
                        ("epub", 1), ("jar", 1)):
        m = parse_zip(encode_zip_fixture(7, kind, n_docs=3, seed=1))
        assert m["kind"] == kind and m["n_entries"] == 3 + extra, kind
        assert not m["has_encrypted"]
    # payload byte totals replay from arithmetic
    m = parse_zip(encode_zip_fixture(7, "zip", n_docs=2, seed=1))
    assert m["total_uncompressed"] == (40 + 7 % 32) + (40 + 8 % 32)


def test_comment_and_strictness():
    b = encode_zip_fixture(5, "jar", n_docs=2, seed=2)
    # an EOCD comment is fine when its declared length reaches EOF
    commented = b[:-2] + struct.pack("<H", 5) + b"hello"
    assert parse_zip(commented) is not None
    # ...but a lying comment length rejects
    assert parse_zip(b[:-2] + struct.pack("<H", 9) + b"hello") is None
    for cut in (1, 4, len(b) - 30):
        assert parse_zip(b[:-cut]) is None
    assert sniff_zip(b) and not sniff_zip(b"\x00\x00\x00\x00")
    assert parse_zip(b"\x00" * 60) is None
    assert parse_zip(None) is None and parse_zip(b"") is None
    # lying entry count rejects
    bb = bytearray(b)
    eocd = len(bb) - 22
    bb[eocd + 10 : eocd + 12] = struct.pack("<H", 99)
    assert parse_zip(bytes(bb)) is None
    # encryption flag is surfaced
    bb = bytearray(b)
    cd_off = struct.unpack_from("<I", bytes(bb), eocd + 16)[0]
    bb[cd_off + 8] |= 0x01
    m = parse_zip(bytes(bb))
    assert m is not None and m["has_encrypted"]


def test_spark_extract(spark):
    from pyspark.sql import types as T

    good = encode_zip_fixture(1, "epub", n_docs=2, seed=3)
    rows = [(1, bytearray(good)), (2, bytearray(good[:-5]))]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["file_id"]: r
        for r in extract_zip_metadata(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["kind"] == "epub" and out[1]["n_entries"] == 3
    assert out[2]["is_zip"] and out[2]["kind"] is None


def test_zip_member_bytes_strictness():
    import struct
    import zlib

    from etl_tiki_webscraping_spark.operators.zipmeta import (
        encode_docx_fixture,
        encode_zip_fixture,
        zip_member_bytes,
    )

    b = encode_docx_fixture(11, 4)
    xml = zip_member_bytes(b, "word/document.xml")
    assert xml is not None and xml.count(b"<w:p>") == 4
    assert zip_member_bytes(b, "missing") is None
    # stored members read back too
    z = encode_zip_fixture(5, "epub")
    assert zip_member_bytes(z, "mimetype") == b"application/epub+zip"
    # corrupt deflate payload -> None (CRC/size cross-check)
    i = b.index(b"word/document.xml") + len("word/document.xml")
    bad = bytearray(b)
    bad[i + 5] ^= 0xFF
    assert zip_member_bytes(bytes(bad), "word/document.xml") is None
    # truncated archive rejects at the directory walk
    assert zip_member_bytes(b[:-9], "word/document.xml") is None


def test_docx_xml_spark_scan(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.zipmeta import (
        docx_fixture_paragraph,
        encode_docx_fixture,
        encode_zip_fixture,
        extract_docx_xml,
    )

    rows = [
        (1, bytearray(encode_docx_fixture(1, 2))),
        (2, bytearray(encode_docx_fixture(2, 3, truncate=9))),
        (3, bytearray(encode_zip_fixture(3, "epub"))),  # not a docx
    ]
    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {r["file_id"]: r["document_xml"]
           for r in extract_docx_xml(spark.createDataFrame(rows, schema)).collect()}
    assert docx_fixture_paragraph(1, 1).split(" beta")[0] in out[1]
    assert out[2] is None and out[3] is None
