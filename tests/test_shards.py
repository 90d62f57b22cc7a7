"""Training-shard ingest paths (round-15): WET conversion scan
(sources/warc.py), multi-member gzip JSONL shards
(sources/records.py::gunzip_concat_text)."""

from __future__ import annotations

import zlib

from etl_tiki_webscraping_spark.sources.warc import (
    encode_wet,
    parse_warc_file,
    scan_wet_conversions,
    wet_fixture_text,
)


def _gz(b: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(b) + co.flush()


def test_wet_layouts_agree():
    plain = parse_warc_file(encode_wet(3, 4), include_payload=True)
    gz = parse_warc_file(
        encode_wet(3, 4, gzip_per_record=True), include_payload=True
    )
    assert [r["payload"] for r in plain] == [r["payload"] for r in gz]
    convs = [r for r in plain if r["warc_type"] == "conversion"]
    assert len(convs) == 4
    for p, r in enumerate(convs):
        assert r["payload"].decode("utf-8") == wet_fixture_text(3, p)
        assert r["target_uri"].endswith(f"/page{p}")
    # strictness rides the shared walk
    assert parse_warc_file(encode_wet(3, 4, truncate=5)) is None


def test_wet_spark_scan(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    rows = [
        (1, bytearray(encode_wet(1, 2))),
        (2, bytearray(encode_wet(2, 2, truncate=3))),
    ]
    out = scan_wet_conversions(spark.createDataFrame(rows, schema))
    got = {(r.file_id, r.page): r for r in out.collect()}
    assert got[(1, 0)].text == wet_fixture_text(1, 0)
    assert got[(1, 1)].text == wet_fixture_text(1, 1)
    # warcinfo never consumes a page index
    assert set(k[1] for k in got if k[0] == 1) == {0, 1}
    assert got[(2, -1)].text is None and got[(2, -1)].target_uri is None


def test_gunzip_concat_members(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.records import gunzip_concat_text

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    single = _gz("a é b\n".encode())
    multi = _gz(b"line1\nli") + _gz(b"ne2\nline3\n")
    truncated = _gz(b"line1\nline2\n")[:-4]
    garbage = _gz(b"ok\n") + b"JUNK"
    notgz = b"plain text"
    rows = [
        (1, bytearray(single)), (2, bytearray(multi)),
        (3, bytearray(truncated)), (4, bytearray(garbage)),
        (5, bytearray(notgz)),
    ]
    out = gunzip_concat_text(spark.createDataFrame(rows, schema))
    got = {r.file_id: r.text for r in out.collect()}
    assert got[1] == "a é b\n"
    # members concatenate across the split-mid-line boundary
    assert got[2] == "line1\nline2\nline3\n"
    assert got[3] is None and got[4] is None and got[5] is None


def test_decompress_concat_dispatch(spark):
    import bz2
    import lzma

    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.records import (
        decompress_concat_text,
    )

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    raw = "line1 é\nline2\n".encode()
    rows = [
        (1, bytearray(_gz(raw))),
        # bz2 multistream split mid-line: only a correct stream walk
        # reproduces the full text
        (2, bytearray(bz2.compress(raw[:5]) + bz2.compress(raw[5:]))),
        (3, bytearray(lzma.compress(raw, format=lzma.FORMAT_XZ))),
        (4, bytearray(bz2.compress(raw)[:-4])),       # truncated
        (5, bytearray(bz2.compress(raw) + b"JUNK")),  # trailing garbage
        (6, bytearray(b"not compressed")),            # unknown magic
        (7, bytearray(lzma.compress(raw, format=lzma.FORMAT_XZ)[:-3])),
    ]
    out = decompress_concat_text(spark.createDataFrame(rows, schema))
    got = {r.file_id: r.text for r in out.collect()}
    assert got[1] == got[2] == got[3] == raw.decode()
    assert got[4] is None and got[5] is None
    assert got[6] is None and got[7] is None
