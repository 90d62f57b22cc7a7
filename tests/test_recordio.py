"""TFRecord/tf.Example (operators/tfrecord.py) and Avro OCF
(operators/avrometa.py): framing CRCs, protobuf wire walk, zigzag
longs, codec paths, quarantine granularity, Spark scan paths."""

from __future__ import annotations

import struct

from etl_tiki_webscraping_spark.operators.avrometa import (
    _zz_decode,
    _zz_encode,
    avro_fixture_text,
    encode_avro_file,
    parse_avro_records,
    scan_avro_records,
)
from etl_tiki_webscraping_spark.operators.tfrecord import (
    crc32c,
    encode_tf_example,
    encode_tfrecord_file,
    example_fixture_features,
    frame_tfrecord,
    masked_crc32c,
    parse_tf_example,
    parse_tfrecord_file,
    scan_tfrecord_examples,
)


def test_crc32c_public_vectors():
    # RFC 3720 §B.4 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E
    # mask formula is its own inverse modulo the spec arithmetic
    assert masked_crc32c(b"") == ((crc32c(b"") >> 15 | crc32c(b"") << 17)
                                  + 0xA282EAD8) & 0xFFFFFFFF


def test_tf_example_roundtrip():
    feats = example_fixture_features(3, 1)
    ex = parse_tf_example(encode_tf_example(feats))
    assert set(ex) == {"image", "label", "weight", "tokens"}
    assert ex["label"]["kind"] == "int64"
    assert ex["label"]["values"] == [3 * 10 + 1 % 5]
    assert ex["weight"]["values"] == [(1 % 8) / 4.0]  # float32-exact grid
    assert ex["tokens"]["values"] == [100 + (3 + 1 + j) % 50 for j in range(3)]
    assert len(ex["image"]["values"][0]) == 40 + 4 % 60
    # wire malformation rejects
    assert parse_tf_example(b"\xff\xff\xff") is None


def test_tfrecord_quarantine_granularity():
    # clean walk
    recs = parse_tfrecord_file(encode_tfrecord_file(7, 4))
    assert [r["valid"] for r in recs] == [True] * 4
    # data crc: RECORD-level (framing intact, neighbors survive)
    recs = parse_tfrecord_file(encode_tfrecord_file(7, 4, corrupt_data_crc_at=2))
    assert [r["valid"] for r in recs] == [True, True, False, True]
    assert recs[2]["example"] is None
    # length crc: FILE-level (length untrustworthy, walk stops)
    assert parse_tfrecord_file(
        encode_tfrecord_file(7, 4, corrupt_length_crc_at=1)) is None
    # truncation / trailing garbage: FILE-level
    assert parse_tfrecord_file(encode_tfrecord_file(7, 4, truncate=2)) is None
    assert parse_tfrecord_file(encode_tfrecord_file(7, 2) + b"xx") is None
    assert parse_tfrecord_file(None) is None
    assert parse_tfrecord_file(b"") is None


def test_frame_layout():
    payload = b"hello tfrecord"
    f = frame_tfrecord(payload)
    (ln,) = struct.unpack_from("<Q", f, 0)
    assert ln == len(payload)
    assert f[12 : 12 + ln] == payload
    assert struct.unpack_from("<I", f, 8)[0] == masked_crc32c(f[:8])
    assert struct.unpack_from("<I", f, 12 + ln)[0] == masked_crc32c(payload)


def test_avro_zigzag_and_roundtrip():
    for v in (0, -1, 1, -64, 63, 64, -65, 2**40, -(2**40)):
        assert _zz_decode(_zz_encode(v), 0)[0] == v
    for codec in ("null", "deflate"):
        m = parse_avro_records(encode_avro_file(9, 5, codec=codec))
        assert m["codec"] == codec and m["schema_name"] == "Doc"
        assert m["records"] == [
            (900 + i, avro_fixture_text(9, i)) for i in range(5)
        ]


def test_tf_example_negative_int64_roundtrip():
    # ADVICE r15: a legal negative int64 feature (10-byte varint, e.g.
    # label -1) decoded as 2^64-1 and the Arrow int64 conversion then
    # raised OverflowError, killing the query on a valid shard.  The
    # decode now folds two's complement; the encoder masks negatives
    # (it previously spun forever on them).
    from etl_tiki_webscraping_spark.operators.tfrecord import (
        encode_tf_example,
        parse_tf_example,
    )

    ex = encode_tf_example(
        {"label": ("int64", [-1, 0, 1, -(2**63), 2**63 - 1])}
    )
    got = parse_tf_example(ex)
    assert got["label"]["values"] == [-1, 0, 1, -(2**63), 2**63 - 1]


def test_avro_strictness():
    b = encode_avro_file(9, 4)
    assert parse_avro_records(b[:-3]) is None
    assert parse_avro_records(b + b"x") is None
    # sync corruption on the last block
    bb = bytearray(b)
    bb[-1] ^= 0xFF
    assert parse_avro_records(bytes(bb)) is None
    assert parse_avro_records(b"Obj\x01") is None
    assert parse_avro_records(b"nope") is None and parse_avro_records(None) is None
    # a lying block record-count rejects (records must consume the
    # block exactly): 4 records, 2 per block -> bump the first block's
    # count varint (zigzag 2 -> 3 is byte 4 -> 6)
    start = b.index(bytes((9 * 7 + j) % 256 for j in range(16))) + 16
    assert b[start] == 4  # zigzag(2)
    bb = bytearray(b)
    bb[start] = 6  # zigzag(3)
    assert parse_avro_records(bytes(bb)) is None


def test_spark_scans(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    tf_rows = [
        (1, bytearray(encode_tfrecord_file(1, 2))),
        (2, bytearray(encode_tfrecord_file(2, 2, truncate=1))),
    ]
    got = {
        (r.file_id, r.record_idx): r
        for r in scan_tfrecord_examples(
            spark.createDataFrame(tf_rows, schema)).collect()
    }
    assert got[(1, 0)].label == 10 and got[(1, 0)].valid
    assert got[(1, 1)].feature_names == "image,label,tokens,weight"
    assert got[(2, -1)].valid is False and got[(2, -1)].label is None

    av_rows = [
        (1, bytearray(encode_avro_file(1, 3, codec="deflate"))),
        (2, bytearray(encode_avro_file(2, 3, truncate=2))),
    ]
    got = {
        (r.file_id, r.rec_idx): r
        for r in scan_avro_records(
            spark.createDataFrame(av_rows, schema)).collect()
    }
    assert got[(1, 2)].rec_id == 102 and got[(1, 2)].codec == "deflate"
    assert got[(2, -1)].text is None
