"""ZIP container TRIAGE — central-directory walk (round-14): a crawl
sees ZIP everywhere office/ebook formats live (docx/xlsx/pptx are OPC
zips, EPUB is a zip with a ``mimetype`` first entry, JARs are zips
with ``META-INF/MANIFEST.MF``), and classifying them needs only the
PUBLIC PKWARE APPNOTE layout — no payload inflation:

- End Of Central Directory record (sig 0x06054b50) found from the
  tail (it ends the file, optionally followed by a <= 64 KiB comment
  whose declared length must land exactly at EOF);
- central directory file headers (sig 0x02014b50): per-entry name,
  compression method, compressed/uncompressed sizes, the
  encryption bit of the general-purpose flags;
- entry count / directory size / offset cross-checked against the
  EOCD fields (a lying EOCD rejects — the strict-tiling rule).

Classification (``kind``): 'docx'/'xlsx'/'pptx' via the OPC
``[Content_Types].xml`` marker + the ``word/``/``xl/``/``ppt/``
prefix, 'epub' via the ``mimetype`` entry, 'jar' via
``META-INF/MANIFEST.MF``, else 'zip'.

Spark-side shape: one Arrow-batched 1->1 mapInPandas pass
(:func:`extract_zip_metadata`), blobs never shuffle.  Fixtures are
written with the stdlib ``zipfile`` module (stored entries so sizes
replay from the oracle's arithmetic) but parsed with THIS module's
independent walk — writer and reader share no code.
"""

from __future__ import annotations

import struct
import zipfile
from hashlib import md5 as _md5
from io import BytesIO

_EOCD_SIG = 0x06054B50
_CDFH_SIG = 0x02014B50


def parse_zip(content: bytes) -> "dict | None":
    """Strict central-directory parse: ``{n_entries, total_uncompressed,
    total_compressed, n_deflated, has_encrypted, kind, first_name}``
    or None (no/ambiguous EOCD, comment not reaching EOF, directory
    not tiling, count mismatch, ZIP64 markers)."""
    if content is None or len(content) < 22:
        return None
    # EOCD: scan the last 64 KiB + 22 for the signature whose comment
    # length lands exactly at EOF
    tail_start = max(0, len(content) - (0xFFFF + 22))
    eocd = None
    pos = len(content) - 22
    while pos >= tail_start:
        if struct.unpack_from("<I", content, pos)[0] == _EOCD_SIG:
            (clen,) = struct.unpack_from("<H", content, pos + 20)
            if pos + 22 + clen == len(content):
                eocd = pos
                break
        pos -= 1
    if eocd is None:
        return None
    disk, cd_disk, n_disk, n_total, cd_size, cd_off = struct.unpack_from(
        "<HHHHII", content, eocd + 4
    )
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        return None  # multi-disk archives out of scope
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        return None  # ZIP64 out of scope (strict, not silently wrong)
    if cd_off + cd_size != eocd:
        return None  # directory must end exactly at the EOCD
    names: "list[str]" = []
    total_u = total_c = n_deflated = 0
    has_encrypted = False
    p = cd_off
    for _ in range(n_total):
        if p + 46 > eocd or struct.unpack_from("<I", content, p)[0] != _CDFH_SIG:
            return None
        flags, method = struct.unpack_from("<HH", content, p + 8)
        csize, usize = struct.unpack_from("<II", content, p + 20)
        nlen, elen, klen = struct.unpack_from("<HHH", content, p + 28)
        if p + 46 + nlen + elen + klen > eocd:
            return None
        name = content[p + 46 : p + 46 + nlen].decode("utf-8", "replace")
        names.append(name)
        total_u += usize
        total_c += csize
        if method == 8:
            n_deflated += 1
        elif method != 0:
            return None  # stored/deflate only (strict subset)
        if flags & 0x1:
            has_encrypted = True
        p += 46 + nlen + elen + klen
    if p != eocd:
        return None
    nameset = set(names)
    kind = "zip"
    if "[Content_Types].xml" in nameset:
        if any(n.startswith("word/") for n in names):
            kind = "docx"
        elif any(n.startswith("xl/") for n in names):
            kind = "xlsx"
        elif any(n.startswith("ppt/") for n in names):
            kind = "pptx"
        else:
            kind = "opc"
    elif names and names[0] == "mimetype":
        kind = "epub"
    elif "META-INF/MANIFEST.MF" in nameset:
        kind = "jar"
    return {
        "n_entries": n_total,
        "total_uncompressed": total_u,
        "total_compressed": total_c,
        "n_deflated": n_deflated,
        "has_encrypted": has_encrypted,
        "kind": kind,
        "first_name": names[0] if names else None,
    }


def sniff_zip(content: "bytes | None") -> bool:
    """Local-file-header magic at offset 0 (the common case; a
    self-extractor prefix would still parse via the EOCD walk)."""
    return content is not None and content[:4] in (b"PK\x03\x04", b"PK\x05\x06")


def encode_zip_fixture(
    file_id: int,
    kind: str = "zip",
    n_docs: int = 3,
    seed: int = 0,
) -> bytes:
    """Fixture writer via stdlib ``zipfile`` (STORED entries so the
    oracle replays sizes exactly): per ``kind`` the marker entries a
    classifier must key on, plus ``n_docs`` payload entries of
    ``40 + (file_id + i) % 32`` md5-derived bytes each."""
    buf = BytesIO()
    date = (2026, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        def add(name: str, data: bytes) -> None:
            zi = zipfile.ZipInfo(name, date_time=date)
            zf.writestr(zi, data)

        if kind == "epub":
            add("mimetype", b"application/epub+zip")
        elif kind in ("docx", "xlsx", "pptx"):
            add("[Content_Types].xml", b"<Types/>")
            prefix = {"docx": "word/", "xlsx": "xl/", "pptx": "ppt/"}[kind]
            add(prefix + "main.xml", b"<root/>")
        elif kind == "jar":
            add("META-INF/MANIFEST.MF", b"Manifest-Version: 1.0\r\n")
        for i in range(n_docs):
            n = 40 + (file_id + i) % 32
            body = b"".join(
                _md5(f"zip:{seed}:{file_id}:{i}:{j}".encode()).digest()
                for j in range(n // 16 + 1)
            )[:n]
            add(f"data/part{i}.bin", body)
    return buf.getvalue()


ZIP_META_SCHEMA = (
    "file_id bigint, is_zip boolean, kind string, n_entries int, "
    "total_uncompressed bigint, has_encrypted boolean"
)


def extract_zip_metadata(df, id_col="file_id", content_col="content"):
    """Per-blob ZIP triage in one Arrow-batched mapInPandas pass; a
    blob the strict directory walk rejects emits the magic-sniffed
    quarantine row."""
    import pandas as pd

    def run(batches):
        for batch in batches:
            out = []
            for fid, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content) if content is not None else None
                meta = parse_zip(data)
                rec = {
                    "file_id": int(fid), "is_zip": sniff_zip(data),
                    "kind": None, "n_entries": None,
                    "total_uncompressed": None, "has_encrypted": None,
                }
                if meta is not None:
                    rec.update(
                        kind=meta["kind"],
                        n_entries=meta["n_entries"],
                        total_uncompressed=meta["total_uncompressed"],
                        has_encrypted=meta["has_encrypted"],
                    )
                out.append(rec)
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(
        run, schema=ZIP_META_SCHEMA
    )
