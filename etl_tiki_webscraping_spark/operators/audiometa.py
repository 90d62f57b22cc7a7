"""Compressed-audio STREAM METADATA parsers (MP3 frame walk, Ogg page
walk) — the "metadata without decode" triage tier of the audio surface
(round-13, extending the r12 ask #4 per-format quarantine): a 100 TB
crawl pipeline cannot (and need not) decode MP3/Ogg payloads, but it
DOES need per-file duration / bitrate / page accounting to budget,
sample, and quarantine — exactly what these parsers extract from frame
and page HEADERS alone.

Everything is stdlib from the public format layouts:

- MP3 (MPEG-1 Layer III, the dominant web variant): 32-bit frame
  headers (11-bit sync, version/layer/bitrate/samplerate/padding
  fields), frame sizes ``144000 * bitrate_kbps / sample_rate +
  padding``, 1152 samples per frame, optional leading ID3v2 tag
  (syncsafe 28-bit size).  STRICT: every frame header must parse with
  a consistent version/layer/samplerate, frames must tile the stream
  exactly (no trailing garbage), else None — the GIF truncation rule.

- Ogg: "OggS" pages (version 0) with the 27-byte header, lacing
  table, and the page CRC-32 (poly 0x04C11DB7, unreflected, computed
  with the CRC field zeroed) VERIFIED per page; pages must tile the
  stream, the first page must carry beginning-of-stream, the last
  end-of-stream.

Both have fixture writers so tests and the catalog oracle replay the
whole trip from doc_id arithmetic (all-integer outputs — bit-strict).
Spark-side shape: one Arrow-batched mapInPandas pass
(:func:`extract_audio_stream_metadata`), blobs never shuffle.
"""

from __future__ import annotations

import struct
from hashlib import md5 as _md5

# MPEG-1 Layer III bitrate table (kbps), index 1..14
_MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)  # MPEG-1 sample-rate index 0..2
_MP3_SAMPLES_PER_FRAME = 1152


def parse_id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent): 10-byte
    header + the syncsafe 28-bit size.  Returns -1 on a malformed tag
    (non-syncsafe size bytes)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        return -1
    size = (
        (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    )
    return 10 + size


def parse_mp3_stream(content: bytes) -> "dict | None":
    """Walk every MPEG-1 Layer III frame header: returns
    ``{n_frames, sample_rate, bitrate_kbps_min, bitrate_kbps_max,
    duration_ms, has_id3}`` or None when the bytes are not a clean
    MP3 stream (bad sync anywhere, inconsistent version/layer/rate,
    reserved fields, frames not tiling the buffer)."""
    if content is None or len(content) < 4:
        return None
    skip = parse_id3v2_size(content)
    if skip < 0 or skip >= len(content):
        return None
    pos = skip
    n_frames = 0
    rate = None
    br_min = br_max = None
    while pos < len(content):
        if pos + 4 > len(content):
            return None
        (hdr,) = struct.unpack_from(">I", content, pos)
        if (hdr >> 21) & 0x7FF != 0x7FF:
            return None
        version = (hdr >> 19) & 3
        layer = (hdr >> 17) & 3
        if version != 3 or layer != 1:  # MPEG-1, Layer III only
            return None
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 3
        padding = (hdr >> 9) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            return None  # free-format / reserved: out of scope
        this_rate = _MP3_RATES[sr_idx]
        if rate is None:
            rate = this_rate
        elif this_rate != rate:
            return None
        kbps = _MP3_BITRATES[br_idx]
        br_min = kbps if br_min is None else min(br_min, kbps)
        br_max = kbps if br_max is None else max(br_max, kbps)
        frame_len = (144_000 * kbps) // rate + padding
        if frame_len < 4 or pos + frame_len > len(content):
            return None
        pos += frame_len
        n_frames += 1
    if n_frames == 0 or pos != len(content):
        return None
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "bitrate_kbps_min": br_min,
        "bitrate_kbps_max": br_max,
        "duration_ms": n_frames * _MP3_SAMPLES_PER_FRAME * 1000 // rate,
        "has_id3": skip > 0,
    }


def encode_mp3_frames(
    bitrate_indices: "list[int]",
    sr_idx: int = 0,
    id3_size: "int | None" = None,
    seed: int = 0,
) -> bytes:
    """Fixture writer: one valid MPEG-1 Layer III frame per bitrate
    index, md5-derived payload bytes of exactly the header-implied
    length (padding bit alternates), optional leading ID3v2 tag."""
    out = bytearray()
    if id3_size is not None:
        out += b"ID3\x04\x00\x00"
        out += bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        junk = b"".join(
            _md5(f"id3:{seed}:{i}".encode()).digest()
            for i in range(id3_size // 16 + 1)
        )
        out += junk[:id3_size]
    rate = _MP3_RATES[sr_idx]
    for fi, br_idx in enumerate(bitrate_indices):
        if not 1 <= br_idx <= 14:
            raise ValueError(f"bitrate index out of range: {br_idx}")
        padding = fi & 1
        hdr = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (padding << 9)
            | (3 << 6)  # mono channel mode
        )
        frame_len = (144_000 * _MP3_BITRATES[br_idx]) // rate + padding
        body = b"".join(
            _md5(f"mp3:{seed}:{fi}:{i}".encode()).digest()
            for i in range(frame_len // 16 + 1)
        )[: frame_len - 4]
        out += struct.pack(">I", hdr) + body
    return bytes(out)


# --------------------------------------------------------------------------
# Ogg pages
# --------------------------------------------------------------------------


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, unreflected, no
    final xor (NOT the zlib crc32)."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
    return crc


def parse_ogg_stream(content: bytes) -> "dict | None":
    """Walk every Ogg page, VERIFYING each page CRC: returns
    ``{n_pages, serial, last_granule, payload_bytes, bos, eos}`` or
    None (bad capture pattern, version, CRC, truncation, missing
    bos/eos, serial change mid-stream)."""
    if content is None or len(content) < 27 or content[:4] != b"OggS":
        return None
    pos = 0
    n_pages = 0
    serial = None
    last_granule = None
    payload_bytes = 0
    bos = eos = False
    while pos < len(content):
        if pos + 27 > len(content) or content[pos : pos + 4] != b"OggS":
            return None
        if content[pos + 4] != 0:  # stream structure version
            return None
        htype = content[pos + 5]
        (granule,) = struct.unpack_from("<q", content, pos + 6)
        (ser,) = struct.unpack_from("<I", content, pos + 14)
        (crc,) = struct.unpack_from("<I", content, pos + 22)
        nseg = content[pos + 26]
        lace_end = pos + 27 + nseg
        if lace_end > len(content):
            return None
        body_len = sum(content[pos + 27 : lace_end])
        page_end = lace_end + body_len
        if page_end > len(content):
            return None
        page = bytearray(content[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            return None
        if serial is None:
            serial = ser
            if not htype & 0x02:  # first page must be BOS
                return None
            bos = True
        elif ser != serial:
            return None
        if htype & 0x04:
            eos = True
        last_granule = granule
        payload_bytes += body_len
        n_pages += 1
        pos = page_end
    if not n_pages or not eos or pos != len(content):
        return None
    return {
        "n_pages": n_pages,
        "serial": serial,
        "last_granule": last_granule,
        "payload_bytes": payload_bytes,
        "bos": bos,
        "eos": eos,
    }


def encode_ogg_pages(
    n_pages: int,
    serial: int,
    final_granule: int,
    seed: int = 0,
    page_payload: int = 200,
) -> bytes:
    """Fixture writer: ``n_pages`` CRC-correct Ogg pages (BOS on the
    first, EOS on the last, granule -1 on intermediate pages per the
    continued-packet convention, ``final_granule`` on the last),
    md5-derived payloads."""
    if n_pages < 1:
        raise ValueError("need at least one page")
    out = bytearray()
    for p in range(n_pages):
        htype = (0x02 if p == 0 else 0) | (0x04 if p == n_pages - 1 else 0)
        granule = final_granule if p == n_pages - 1 else -1
        body = b"".join(
            _md5(f"ogg:{seed}:{p}:{i}".encode()).digest()
            for i in range(page_payload // 16 + 1)
        )[:page_payload]
        nseg_full, tail = divmod(page_payload, 255)
        lacing = bytes([255] * nseg_full + [tail])
        page = bytearray()
        page += b"OggS\x00"
        page.append(htype)
        page += struct.pack("<q", granule)
        page += struct.pack("<I", serial)
        page += struct.pack("<I", p)
        page += b"\x00\x00\x00\x00"  # CRC placeholder
        page.append(len(lacing))
        page += lacing
        page += body
        crc = _ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        out += page
    return bytes(out)


AUDIO_STREAM_META_SCHEMA = "media_id bigint, container string, " \
    "n_units int, sample_rate int, duration_ms bigint, vbr boolean, " \
    "last_granule bigint"


def extract_audio_stream_metadata(df, id_col="media_id", content_col="content"):
    """Header-only stream metadata per blob in one Arrow-batched
    mapInPandas pass: MP3 -> (n_frames, sample_rate, duration_ms,
    vbr), Ogg -> (n_pages, last_granule); a stream its strict parser
    rejects emits the NULL-stats quarantine row with the sniffed
    container — per-format observability with NO audio decode."""
    import pandas as pd

    from etl_tiki_webscraping_spark.operators.multimodal import (
        sniff_audio_container,
    )

    def run(batches):
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content) if content is not None else None
                container = sniff_audio_container(data)
                rec = {
                    "media_id": int(mid), "container": container,
                    "n_units": None, "sample_rate": None,
                    "duration_ms": None, "vbr": None, "last_granule": None,
                }
                if container == "mp3":
                    m = parse_mp3_stream(data)
                    if m is not None:
                        rec.update(
                            n_units=m["n_frames"],
                            sample_rate=m["sample_rate"],
                            duration_ms=m["duration_ms"],
                            vbr=m["bitrate_kbps_min"] != m["bitrate_kbps_max"],
                        )
                elif container == "ogg":
                    o = parse_ogg_stream(data)
                    if o is not None:
                        rec.update(
                            n_units=o["n_pages"],
                            last_granule=o["last_granule"],
                        )
                out.append(rec)
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(
        run, schema=AUDIO_STREAM_META_SCHEMA
    )


def iter_mp3_frames(content: bytes) -> "list[tuple[int, int, int]] | None":
    """Per-frame walk: [(frame_idx, bitrate_kbps, frame_bytes), ...]
    under the same strict rules as :func:`parse_mp3_stream` (None on
    any malformation) — the 1->N form the UDTF tier exposes."""
    if content is None or len(content) < 4:
        return None
    skip = parse_id3v2_size(content)
    if skip < 0 or skip >= len(content):
        return None
    pos = skip
    rate = None
    out: "list[tuple[int, int, int]]" = []
    while pos < len(content):
        if pos + 4 > len(content):
            return None
        (hdr,) = struct.unpack_from(">I", content, pos)
        if (hdr >> 21) & 0x7FF != 0x7FF or (hdr >> 19) & 3 != 3 \
                or (hdr >> 17) & 3 != 1:
            return None
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 3
        padding = (hdr >> 9) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        this_rate = _MP3_RATES[sr_idx]
        if rate is None:
            rate = this_rate
        elif this_rate != rate:
            return None
        kbps = _MP3_BITRATES[br_idx]
        frame_len = (144_000 * kbps) // rate + padding
        if frame_len < 4 or pos + frame_len > len(content):
            return None
        out.append((len(out), kbps, frame_len))
        pos += frame_len
    return out or None
