"""Pure-python FLAC codec (mono + stereo, 16-bit) — the compressed-audio leg
of the multimodal surface (round-12 VERDICT ask #4: real crawls carry
MP3/FLAC/Ogg; audio was 16-bit PCM WAV only).  Like
:mod:`.jpeg`/:mod:`.webp`, everything is stdlib + numpy from the
PUBLIC format layout (MSB-first bit stream; fLaC magic + STREAMINFO;
frames with CRC-8-checked headers and CRC-16-checked bodies;
constant / verbatim / fixed-predictor (orders 0-4) / LPC subframes;
Rice-coded residuals with partition orders and the raw-bits escape;
a final MD5 signature over the raw PCM) — no libFLAC lineage.

Decoder scope (strict — the GIF truncation rule: malformed bytes,
a failed CRC, a sample-count or MD5 mismatch all return None, so
arbitrary binary never mis-routes and corruption is never silently
truncated): mono and STEREO 16-bit streams — stereo under all four
channel assignments (independent, left/side, right/side, mid/side;
side channels carry bps + 1 bits, mid/side keeps the parity bit in
the side channel) — all subframe types, both Rice methods, any
partition order, wasted-bits.  >2 channels / other depths are out of
scope and rejected (observable per-format quarantine, the WAV 16-bit
rule).

Encoder scope (:func:`encode_flac`): frame splitting, best-of
fixed-predictor orders 0-2 with per-partition Rice parameter search,
all four stereo channel assignments (left/side genuinely beats
independent on correlated channels — measured in tests), plus option
flags that force specific decoder branches (verbatim, constant, an
order-1 LPC equivalent, the escape coding, higher partition orders)
so tests exercise every path end to end.

FLAC is LOSSLESS, so decode(encode(pcm)) == pcm exactly — integer
samples an external engine can replay from first principles, which is
what upgrades the audio leg's catalog query to a bit-strict oracle.
"""

from __future__ import annotations

import struct
from hashlib import md5 as _md5

import numpy as np

# --------------------------------------------------------------------------
# MSB-first bit I/O (FLAC convention — opposite of VP8L)
# --------------------------------------------------------------------------


class _BitReaderMSB:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> "int | None":
        end = self.bitpos + n
        if end > len(self.data) * 8:
            return None
        v = 0
        pos = self.bitpos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def read_signed(self, n: int) -> "int | None":
        v = self.read(n)
        if v is None:
            return None
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self, limit: int = 1 << 20) -> "int | None":
        q = 0
        while q < limit:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
        return None

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


class _BitWriterMSB:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07 over the frame header, CRC-16 poly
# 0x8005 over the whole frame; both init 0)
# --------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number_encode(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (standard UTF-8 widths)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_number_decode(br: _BitReaderMSB) -> "int | None":
    b0 = br.read(8)
    if b0 is None:
        return None
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        return None
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------------------------
# fixed predictors (shared by encoder and decoder)
# --------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _rice_decode(br: _BitReaderMSB, param: int) -> "int | None":
    q = br.read_unary()
    if q is None:
        return None
    low = br.read(param) if param else 0
    if low is None:
        return None
    v = (q << param) | low
    return (v >> 1) ^ -(v & 1)  # zigzag


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _decode_subframe(
    br: _BitReaderMSB, blocksize: int, bps: int
) -> "np.ndarray | None":
    pad = br.read(1)
    stype = br.read(6)
    wasted_flag = br.read(1)
    if pad != 0 or stype is None or wasted_flag is None:
        return None
    wasted = 0
    if wasted_flag:
        u = br.read_unary()
        if u is None:
            return None
        wasted = u + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        return None
    if stype == 0:  # constant
        v = br.read_signed(eff_bps)
        if v is None:
            return None
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # verbatim
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            v = br.read_signed(eff_bps)
            if v is None:
                return None
            out[i] = v
    elif 8 <= stype <= 12:  # fixed order 0..4
        order = stype - 8
        out = _decode_predicted(br, blocksize, eff_bps, order, _FIXED_COEFS[order], 0)
        if out is None:
            return None
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = []
        for _ in range(order):
            v = br.read_signed(eff_bps)
            if v is None:
                return None
            warm.append(v)
        prec = br.read(4)
        if prec is None or prec == 15:
            return None
        precision = prec + 1
        shift = br.read_signed(5)
        if shift is None or shift < 0:
            return None
        coefs = []
        for _ in range(order):
            c = br.read_signed(precision)
            if c is None:
                return None
            coefs.append(c)
        out = _decode_residual_and_reconstruct(
            br, blocksize, order, warm, coefs, shift
        )
        if out is None:
            return None
    else:
        return None
    if wasted:
        out = out << wasted
    return out


def _decode_predicted(
    br: _BitReaderMSB, blocksize: int, bps: int, order: int, coefs: "list[int]",
    shift: int,
) -> "np.ndarray | None":
    warm = []
    for _ in range(order):
        v = br.read_signed(bps)
        if v is None:
            return None
        warm.append(v)
    return _decode_residual_and_reconstruct(br, blocksize, order, warm, coefs, shift)


def _decode_residual_and_reconstruct(
    br: _BitReaderMSB, blocksize: int, order: int, warm: "list[int]",
    coefs: "list[int]", shift: int,
) -> "np.ndarray | None":
    method = br.read(2)
    if method not in (0, 1):
        return None
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    if porder is None:
        return None
    nparts = 1 << porder
    # partitions must tile the block exactly and partition 0 must keep
    # a non-negative sample count after the warmup samples
    if blocksize % nparts or (blocksize >> porder) - order < 0:
        return None
    res: "list[int]" = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            return None
        param = br.read(pbits)
        if param is None:
            return None
        if param == escape:
            raw = br.read(5)
            if raw is None:
                return None
            for _ in range(count):
                v = br.read_signed(raw) if raw else 0
                if v is None:
                    return None
                res.append(v)
        else:
            for _ in range(count):
                v = _rice_decode(br, param)
                if v is None:
                    return None
                res.append(v)
    if len(res) != blocksize - order:
        return None
    out = np.empty(blocksize, dtype=np.int64)
    out[:order] = warm
    for i in range(order, blocksize):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * int(out[i - 1 - j])
        out[i] = res[i - order] + (pred >> shift)
    return out


_BLOCKSIZE_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                   **{n: 256 << (n - 8) for n in range(8, 16)}}


def decode_flac_pcm(content: bytes) -> "np.ndarray | None":
    """Strict 16-bit FLAC decode, FIRST channel as 1-D int32 (the
    ``_decode_wav`` first-channel convention) — see
    :func:`decode_flac_pcm_multi` for all channels."""
    multi = decode_flac_pcm_multi(content)
    return multi[:, 0].copy() if multi is not None else None


def decode_flac_pcm_multi(content: bytes) -> "np.ndarray | None":
    """Strict 16-bit FLAC decode: returns the int32 PCM samples as
    ``(n_samples, channels)`` — mono and STEREO, the latter under all
    four channel assignments (independent, left/side, right/side,
    mid/side; side channels carry bps+1 bits and the standard
    decorrelation inverses) — or None (wrong magic, unsupported
    layout, CRC/MD5/sample-count mismatch, truncation)."""
    if content is None or len(content) < 42 or content[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    # metadata blocks
    while pos + 4 <= len(content):
        hdr = content[pos]
        (blen,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        body = content[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            return None
        if hdr & 0x7F == 0:
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    else:
        return None
    if streaminfo is None or len(streaminfo) != 34:
        return None
    si = _BitReaderMSB(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_sig = streaminfo[18:34]
    if channels not in (1, 2) or bps != 16 or sample_rate == 0 or total == 0:
        return None
    samples: "list[np.ndarray]" = []
    got = 0
    while got < total:
        if pos + 5 > len(content):
            return None
        br = _BitReaderMSB(content, pos * 8)
        sync = br.read(14)
        if sync != 0b11111111111110:
            return None
        if br.read(1) != 0:
            return None
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0:
            return None
        if ss_code != 0b100:  # 16-bit only
            return None
        if channels == 1:
            if ch_code != 0:
                return None
        elif ch_code not in (1, 8, 9, 10):  # 2ch indep / L-S / R-S / M-S
            return None
        if _utf8_number_decode(br) is None:
            return None
        if bs_code in (0, None):
            return None
        if bs_code == 6:
            b = br.read(8)
            if b is None:
                return None
            blocksize = b + 1
        elif bs_code == 7:
            b = br.read(16)
            if b is None:
                return None
            blocksize = b + 1
        else:
            blocksize = _BLOCKSIZE_CODE.get(bs_code)
            if blocksize is None:
                return None
        if sr_code == 15:
            return None
        if sr_code == 12:
            if br.read(8) is None:
                return None
        elif sr_code in (13, 14):
            if br.read(16) is None:
                return None
        hdr_end_bits = br.bitpos
        if hdr_end_bits % 8:
            return None
        crc8 = br.read(8)
        if crc8 is None or _crc8(content[pos : hdr_end_bits // 8]) != crc8:
            return None
        if channels == 1:
            sub = _decode_subframe(br, blocksize, 16)
            if sub is None:
                return None
            frame = sub[:, None]
        else:
            # per-channel bits: the SIDE channel carries bps + 1
            bits0 = 17 if ch_code == 9 else 16
            bits1 = 17 if ch_code in (8, 10) else 16
            c0 = _decode_subframe(br, blocksize, bits0)
            c1 = _decode_subframe(br, blocksize, bits1) if c0 is not None else None
            if c0 is None or c1 is None:
                return None
            if ch_code == 1:  # independent L, R
                left, right = c0, c1
            elif ch_code == 8:  # left / side
                left, right = c0, c0 - c1
            elif ch_code == 9:  # side / right
                left, right = c1 + c0, c1
            else:  # mid / side: mid = (l+r)>>1 with the parity bit in side
                mid2 = (c0 << 1) | (c1 & 1)
                left = (mid2 + c1) >> 1
                right = (mid2 - c1) >> 1
            frame = np.stack([left, right], axis=1)
        br.align()
        crc16 = br.read(16)
        if crc16 is None:
            return None
        frame_end = br.bitpos // 8
        if _crc16(content[pos : frame_end - 2]) != crc16:
            return None
        if frame.size and (
            int(frame.max()) > 32767 or int(frame.min()) < -32768
        ):
            return None
        samples.append(frame)
        got += blocksize
        pos = frame_end
    if got != total or pos != len(content):  # no trailing garbage
        return None
    pcm = np.concatenate(samples).astype(np.int32)  # (n, channels)
    if _md5(pcm.astype("<i2").tobytes()).digest() != md5_sig:
        return None
    return pcm


def decode_flac(content: bytes) -> "np.ndarray | None":
    """float32 waveform in [-1, 1) — the ``_decode_audio_impl``
    contract (the WAV convention: pcm / 32768)."""
    pcm = decode_flac_pcm(content)
    if pcm is None:
        return None
    return pcm.astype(np.float32) / 32768.0


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _best_rice_param(res: "list[int]", pbits: int) -> int:
    best, best_bits = 0, None
    for param in range((1 << pbits) - 1):
        bits = 0
        for v in res:
            bits += (_zigzag_encode(v) >> param) + 1 + param
            if best_bits is not None and bits > best_bits:
                break
        if best_bits is None or bits < best_bits:
            best, best_bits = param, bits
    return best


def _write_residual(
    bw: _BitWriterMSB, res: "list[int]", order: int, blocksize: int,
    porder: int, force_escape: bool,
) -> None:
    bw.write(0, 2)  # method 0: 4-bit Rice
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[idx : idx + count]
        idx += count
        if force_escape:
            bw.write(15, 4)  # escape
            raw = max((max(abs(v) for v in part).bit_length() + 1) if part else 1, 1)
            bw.write(raw, 5)
            for v in part:
                bw.write(v & ((1 << raw) - 1), raw)
        else:
            param = _best_rice_param(part, 4)
            bw.write(param, 4)
            for v in part:
                z = _zigzag_encode(v)
                bw.write_unary(z >> param)
                if param:
                    bw.write(z & ((1 << param) - 1), param)


_STEREO_CH_CODE = {
    "independent": 1, "left_side": 8, "right_side": 9, "mid_side": 10,
}


def encode_flac(
    pcm: "np.ndarray",
    sample_rate: int = 16_000,
    blocksize: int = 256,
    subframe: str = "fixed",
    fixed_order: "int | None" = None,
    partition_order: int = 0,
    force_escape: bool = False,
    stereo_mode: str = "mid_side",
) -> bytes:
    """16-bit FLAC writer — mono ``(n,)`` or STEREO ``(n, 2)`` input.
    ``subframe``: 'fixed' (best of orders 0-2, or ``fixed_order``
    pinned), 'verbatim', 'constant' (requires constant input), or
    'lpc1' (an LPC subframe with coefficient 32 / shift 5 —
    numerically order-1 fixed, but through the decoder's LPC path).
    ``partition_order``/``force_escape`` steer the residual coder into
    specific decoder branches.  ``stereo_mode`` picks the channel
    assignment ('independent', 'left_side', 'right_side', 'mid_side' —
    side channels carry bps + 1 bits per the spec)."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2 or pcm.shape[1] not in (1, 2) or pcm.shape[0] == 0:
        raise ValueError("pcm must be non-empty (n,) mono or (n, 2) stereo")
    if int(pcm.max()) > 32767 or int(pcm.min()) < -32768:
        raise ValueError("16-bit PCM required")
    channels = pcm.shape[1]
    if channels == 2 and stereo_mode not in _STEREO_CH_CODE:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if blocksize < 16:
        raise ValueError("FLAC blocksize must be >= 16 (spec minimum)")
    total = pcm.shape[0]
    out = bytearray(b"fLaC")
    si = _BitWriterMSB()
    # min == max == blocksize: the spec's fixed-blocksize signal (a
    # shorter FINAL frame is allowed and does NOT make the stream
    # variable-blocksize; writing the short tail as min_blocksize would
    # mislead conforming external decoders — ADVICE r13)
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # bps - 1
    si.write(total, 36)
    body = si.getvalue() + _md5(pcm.astype("<i2").tobytes()).digest()
    out.append(0x80)  # last block, type 0 (STREAMINFO)
    out += struct.pack(">I", len(body))[1:]
    out += body

    for fi, start in enumerate(range(0, total, blocksize)):
        block2 = pcm[start : start + blocksize]
        bs = block2.shape[0]
        bw = _BitWriterMSB()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        if bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code = 8 + (bs // 256).bit_length() - 1
            bs_tail = None
        elif bs <= 256:
            bs_code, bs_tail = 6, (bs - 1, 8)
        else:
            bs_code, bs_tail = 7, (bs - 1, 16)
        bw.write(bs_code, 4)
        bw.write(0, 4)      # sample rate: from STREAMINFO
        ch_code = 0 if channels == 1 else _STEREO_CH_CODE[stereo_mode]
        bw.write(ch_code, 4)
        bw.write(0b100, 3)  # 16-bit
        bw.write(0, 1)
        for b in _utf8_number_encode(fi):
            bw.write(b, 8)
        if bs_tail is not None:
            bw.write(*bs_tail)
        hdr = bw.out[:]
        assert bw.nbits == 0
        bw.write(_crc8(bytes(hdr)), 8)
        # channel streams + per-channel bit widths
        if channels == 1:
            streams = [(block2[:, 0], 16)]
        else:
            left, right = block2[:, 0], block2[:, 1]
            side = left - right
            if stereo_mode == "independent":
                streams = [(left, 16), (right, 16)]
            elif stereo_mode == "left_side":
                streams = [(left, 16), (side, 17)]
            elif stereo_mode == "right_side":
                streams = [(side, 17), (right, 16)]
            else:  # mid_side
                mid = (left + right) >> 1
                streams = [(mid, 16), (side, 17)]
        for block, bits in streams:
            _write_channel_subframe(
                bw, block, bits, subframe, fixed_order, partition_order,
                force_escape,
            )
        bw.align()
        frame = bytes(bw.out)
        out += frame
        out += struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_channel_subframe(
    bw: "_BitWriterMSB",
    block: "np.ndarray",
    bits: int,
    subframe: str,
    fixed_order: "int | None",
    partition_order: int,
    force_escape: bool,
) -> None:
    """One subframe at ``bits`` sample width (17 for side channels)."""
    bs = block.size
    mask = (1 << bits) - 1

    mode = subframe
    if mode == "constant" and not (block == block[0]).all():
        raise ValueError("constant subframe needs constant input")
    if mode == "fixed":
        orders = [fixed_order] if fixed_order is not None else [0, 1, 2]
        best_order, best_cost = 0, None
        for o in orders:
            if o >= bs:
                continue
            res = _fixed_residual(block, o)
            cost = sum(_zigzag_encode(v).bit_length() for v in res)
            if best_cost is None or cost < best_cost:
                best_order, best_cost = o, cost
        o = best_order
        bw.write(0, 1)
        bw.write(8 + o, 6)
        bw.write(0, 1)  # no wasted bits
        for v in block[:o]:
            bw.write(int(v) & mask, bits)
        _write_residual(
            bw, _fixed_residual(block, o), o, bs, partition_order,
            force_escape,
        )
    elif mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in block:
            bw.write(int(v) & mask, bits)
    elif mode == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(block[0]) & mask, bits)
    elif mode == "lpc1":
        bw.write(0, 1)
        bw.write(32, 6)  # LPC order 1
        bw.write(0, 1)
        bw.write(int(block[0]) & mask, bits)
        bw.write(6, 4)   # precision - 1 = 6 -> 7 bits (+32 needs 7 signed)
        bw.write(5, 5)   # shift 5
        bw.write(32, 7)  # coefficient 32: (32*prev)>>5 = prev
        res = [int(block[i]) - int(block[i - 1]) for i in range(1, bs)]
        _write_residual(bw, res, 1, bs, partition_order, force_escape)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def _fixed_residual(block: "np.ndarray", order: int) -> "list[int]":
    x = block.astype(np.int64)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    return [int(v) for v in res[: x.size - order]] if order else [int(v) for v in res]
