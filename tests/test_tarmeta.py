"""TAR / WebDataset shard triage (operators/tarmeta.py): ustar walk
strictness, checksum/octal validation, prefix reconstruction, the
strict-subset typeflag posture, and the Spark 1->N scan path."""

from __future__ import annotations

import io
import tarfile

from etl_tiki_webscraping_spark.operators.tarmeta import (
    encode_tar_shard,
    parse_tar,
    scan_tar_members,
    sniff_tar,
    webdataset_parts,
)

_BLOCK = 512


def _rechecksum(hdr: bytearray) -> None:
    """Recompute a patched header's checksum so a test can reach the
    validation stage BEHIND the checksum gate."""
    s = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:512])
    hdr[148:156] = b"%06o\x00 " % s


def test_roundtrip_and_order():
    b = encode_tar_shard(7, 3)
    entries = parse_tar(b)
    assert entries is not None
    # archive order: per sample, the webdataset_parts write order
    names = [e["name"] for e in entries]
    expect = [
        f"sample{7000 + i}.{ext}"
        for i in range(3)
        for ext, _ in webdataset_parts(7, i)
    ]
    assert names == expect
    for e, (_, size) in zip(
        entries,
        [p for i in range(3) for p in webdataset_parts(7, i)],
    ):
        assert e["size"] == size and not e["is_dir"]
        assert e["mtime"] == 1767225600


def test_dir_entry_and_sniff():
    b = encode_tar_shard(9, 2, dir_prefix="data")
    entries = parse_tar(b)
    assert entries[0] == {
        "name": "data/", "size": 0, "mtime": 1767225600, "is_dir": True,
    }
    assert all(e["name"].startswith("data/") for e in entries[1:])
    assert sniff_tar(b) and not sniff_tar(b"not a tar") and not sniff_tar(None)


def test_strictness_classes():
    b = encode_tar_shard(5, 2)
    # truncated: declared data missing
    assert parse_tar(b[:_BLOCK]) is None
    # length not a block multiple
    assert parse_tar(b[:-7]) is None
    # trailing zeros stripped: end marker / block tiling gone
    assert parse_tar(b.rstrip(b"\x00")) is None
    # corrupt a name byte -> checksum mismatch
    bad = bytearray(b)
    bad[0] ^= 0xFF
    assert parse_tar(bytes(bad)) is None
    # non-octal size field (checksum recomputed so the octal gate is
    # what rejects)
    bad = bytearray(b)
    bad[124:126] = b"zz"
    hdr = bytearray(bad[:512])
    _rechecksum(hdr)
    bad[:512] = hdr
    assert parse_tar(bytes(bad)) is None
    # non-zero garbage after the end marker
    assert parse_tar(b + b"x" * _BLOCK) is None
    assert parse_tar(None) is None and parse_tar(b"") is None


def test_unsupported_typeflag_rejects():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo("link")
        ti.type = tarfile.SYMTYPE
        ti.linkname = "target"
        ti.mtime = 0
        tf.addfile(ti)
    assert parse_tar(buf.getvalue()) is None


def test_prefix_reconstruction_and_empty_member():
    long_dir = "d" * 120
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo(long_dir + "/leaf.txt")
        ti.size = 3
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(b"abc"))
        ti = tarfile.TarInfo("empty.bin")
        ti.size = 0
        ti.mtime = 0
        tf.addfile(ti)
    entries = parse_tar(buf.getvalue())
    assert entries is not None
    # tarfile spilled the long path into the prefix field; the walk
    # must reconstruct prefix + '/' + name
    assert entries[0]["name"] == long_dir + "/leaf.txt"
    assert entries[0]["size"] == 3
    assert entries[1] == {
        "name": "empty.bin", "size": 0, "mtime": 0, "is_dir": False,
    }


def test_spark_scan(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    rows = [
        (1, bytearray(encode_tar_shard(1, 2))),
        (2, bytearray(encode_tar_shard(2, 1, truncate=True))),
    ]
    out = scan_tar_members(spark.createDataFrame(rows, schema))
    got = {(r.file_id, r.member_idx): r for r in out.collect()}
    n1 = sum(len(webdataset_parts(1, i)) for i in range(2))
    assert sum(1 for k in got if k[0] == 1) == n1
    assert got[(1, 0)].name == "sample1000.jpg"
    # quarantine: single -1 row, NULL fields
    assert got[(2, -1)].name is None and got[(2, -1)].size is None
    assert sum(1 for k in got if k[0] == 2) == 1


def test_payload_capture_single_walk():
    b = encode_tar_shard(4, 2)
    entries = parse_tar(b, include_payload=True)
    for e, (_, size) in zip(
        entries, [p for i in range(2) for p in webdataset_parts(4, i)]
    ):
        assert len(e["payload"]) == size == e["size"]
    # without the flag no payload key is materialized
    assert "payload" not in parse_tar(b)[0]


def test_media_router_spark(spark):
    import numpy as np
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.tarmeta import (
        encode_wds_media_shard,
        scan_tar_routed,
        wds_media_text,
    )

    schema = T.StructType([
        T.StructField("file_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    rows = [
        (1, bytearray(encode_wds_media_shard(1, 2))),
        (2, bytearray(encode_wds_media_shard(2, 1, truncate=True))),
    ]
    out = scan_tar_routed(spark.createDataFrame(rows, schema))
    got = {(r.file_id, r.member_idx): r for r in out.collect()}
    # image member: real PNG decode, exact gradient luma sum
    y, x = np.mgrid[0:6, 0:8]
    assert got[(1, 0)].kind == "image"
    assert got[(1, 0)].luma_sum == int(((1 + 0 + 3 * y + 5 * x) % 256).sum())
    assert (got[(1, 0)].img_w, got[(1, 0)].img_h) == (8, 6)
    # text member: utf-8 through, non-ASCII preserved
    assert got[(1, 1)].kind == "text"
    assert got[(1, 1)].payload_text == wds_media_text(1, 0)
    # json member routed as string (JVM parses downstream)
    assert got[(1, 2)].kind == "json"
    assert got[(1, 2)].payload_text == '{"label": 10}'
    # truncated shard: single quarantine row
    assert got[(2, -1)].kind is None
    assert sum(1 for k in got if k[0] == 2) == 1


def test_wds_datasource(spark, tmp_path):
    from etl_tiki_webscraping_spark.sources.wds_datasource import (
        WebDatasetDataSource,
    )

    for d, trunc in ((3, False), (4, True)):
        with open(tmp_path / f"shard{d}.tar", "wb") as fh:
            fh.write(encode_tar_shard(d, 2, truncate=trunc))
    spark.dataSource.register(WebDatasetDataSource)
    df = (
        spark.read.format("webdataset")
        .schema("shard string, member_idx int, name string, size bigint")
        .option("path", str(tmp_path))
        .load()
    )
    got = {(r.shard, r.member_idx): r for r in df.collect()}
    n3 = sum(len(webdataset_parts(3, i)) for i in range(2))
    assert sum(1 for k in got if k[0] == "shard3.tar") == n3
    assert got[("shard3.tar", 0)].name == "sample3000.jpg"
    # truncated shard surfaces its quarantine row at the source
    assert got[("shard4.tar", -1)].name is None
    assert sum(1 for k in got if k[0] == "shard4.tar") == 1
    # the parallelism floor splits a small directory across tasks
    # (default min_partitions=32 shrinks the byte budget below one
    # shard, so each file gets its own partition here)...
    assert df.rdd.getNumPartitions() == 2
    # ...while min_partitions=1 lets the 128 MiB budget bin-pack the
    # whole directory into ONE task, and the rows are identical
    packed = (
        spark.read.format("webdataset")
        .schema("shard string, member_idx int, name string, size bigint")
        .option("path", str(tmp_path))
        .option("min_partitions", "1")
        .load()
    )
    assert packed.rdd.getNumPartitions() == 1
    assert sorted(r.name for r in packed.collect() if r.name) == sorted(
        r.name for r in df.collect() if r.name
    )
