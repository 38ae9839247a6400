"""Dependency-free baseline TIFF codec (decode + scriptable encoder).

Continues the `sources/jpeg.py` / `gif.py` / `webp.py` codec family
(reference decodes scraped media through PIL,
`Preprocessing/ImageLabeler.py:133-151`): TIFF is the scanned-document
format a crawled corpus keeps running into. Supported: both byte
orders (II/MM), classic 32-bit IFDs, strip-based storage, grayscale
(min-is-black) and RGB, 8 bits per sample, compressions 1 (none),
5 (TIFF-LZW) and 32773 (PackBits). Tiled TIFFs, 16-bit samples, CMYK
and JPEG-in-TIFF remain documented NotImplementedError boundaries.

Format notes (public TIFF 6.0 spec):
- header: byte order (`II` little / `MM` big), magic 42, offset of the
  first IFD; an IFD is a count + 12-byte entries (tag, type, count,
  value-or-offset) + next-IFD offset;
- strip layout: RowsPerStrip rows per strip, offsets/byte-counts in
  tags 273/279; samples interleaved per pixel (PlanarConfiguration 1);
- TIFF-LZW differs from GIF LZW: codes pack MSB-first, the code width
  starts at 9 bits with fixed Clear=256 / EOI=257, and the width
  bumps at table sizes 511/1023/2047 (one EARLIER than GIF's
  LSB-first variant — the "early change" convention);
- PackBits: n ≥ 0 → copy n+1 literal bytes; n in [-127, -1] → repeat
  the next byte 1-n times; -128 is a no-op.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(b: bytes, off: int, bo: str) -> tuple[dict[int, list[int]], int]:
    (count,) = struct.unpack_from(bo + "H", b, off)
    entries: dict[int, list[int]] = {}
    pos = off + 2
    for _ in range(count):
        tag, typ, n = struct.unpack_from(bo + "HHI", b, pos)
        size = _TYPE_SIZES.get(typ, 1) * n
        if size <= 4:
            raw = b[pos + 8 : pos + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", b, pos + 8)
            raw = b[voff : voff + size]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt:
            entries[tag] = list(struct.unpack(bo + fmt * n, raw))
        elif typ == 5:  # rational
            vals = struct.unpack(bo + "I" * (2 * n), raw)
            entries[tag] = [vals[i] // max(vals[i + 1], 1) for i in range(0, 2 * n, 2)]
        pos += 12
    (nxt,) = struct.unpack_from(bo + "I", b, pos)
    return entries, nxt


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128 = no-op
    if len(out) < expected:
        raise ValueError("tiff: PackBits strip shorter than expected")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW: MSB-first codes, Clear=256, EOI=257, early width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == EOI:
                if len(out) < expected:
                    raise ValueError("tiff: LZW strip ended early")
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"tiff: LZW code {code} out of range")
            out += entry
            prev = entry
            # early change: width bumps when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    if len(out) < expected:
        raise ValueError("tiff: LZW strip ended early")
    return bytes(out[:expected])


def decode_tiff(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """TIFF bytes → (width, height, channels, flat uint8 pixels)."""
    b = bytes(b)
    if b[:2] == b"II":
        bo = "<"
    elif b[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a tiff")
    magic, ifd_off = struct.unpack_from(bo + "HI", b, 2)
    if magic != 42:
        raise NotImplementedError(
            f"tiff magic {magic} (BigTIFF and friends) is a codec boundary"
        )
    tags, _ = _read_ifd(b, ifd_off, bo)
    width = tags[256][0]
    height = tags[257][0]
    bps = tags.get(258, [8])
    spp = tags.get(277, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    planar = tags.get(284, [1])[0]
    if any(x != 8 for x in bps):
        raise NotImplementedError(f"tiff bits-per-sample {bps} is a codec boundary")
    if planar != 1:
        raise NotImplementedError("tiff planar configuration 2 is a codec boundary")
    if photo not in (0, 1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            f"tiff photometric {photo} / {spp} samples is a codec boundary "
            "(grayscale and RGB decode dependency-free)"
        )
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"tiff compression {comp} is a codec boundary "
            "(1/none, 5/LZW, 32773/PackBits decode dependency-free)"
        )
    rows_per_strip = tags.get(278, [height])[0]
    offsets = tags[273]
    counts = tags.get(279, [len(b) - offsets[0]])
    row_bytes = width * spp
    out = bytearray()
    row = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rows_per_strip, height - row)
        expected = nrows * row_bytes
        raw = b[off : off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("tiff: truncated uncompressed strip")
            out += raw[:expected]
        elif comp == 5:
            out += _lzw_decode(raw, expected)
        else:
            out += _unpackbits(raw, expected)
        row += nrows
    px = np.frombuffer(bytes(out), dtype=np.uint8).copy()
    if photo == 0:  # min-is-white → invert to min-is-black convention
        px = 255 - px
    return width, height, spp, px


# ------------------------------------------------------ encoder (tests)


def _packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            lit_start = i
            i += 1
            while (
                i < n
                and i - lit_start < 128
                and not (i + 1 < n and data[i + 1] == data[i])
            ):
                i += 1
            out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Minimal conforming TIFF-LZW encoder (string table, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # lockstep with the decoder's early change: the decoder
            # (one code behind in time) bumps before reading code t+1
            # when its next index + 1 reaches 2^W; at the encoder's
            # post-append checkpoint that instant is next_code == 2^W
            if next_code >= (1 << width) and width < 12:
                width += 1
            if next_code >= 4094:
                emit(CLEAR)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            w = bytes([byte])
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Scriptable TIFF writer covering every decoder path: none/LZW/
    PackBits compression, gray/RGB, multi-strip, both byte orders."""
    bo = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or height
    row_bytes = width * channels
    strips = []
    r = 0
    while r < height:
        nrows = min(rows_per_strip, height - r)
        raw = pixels[r * row_bytes : (r + nrows) * row_bytes]
        if compression == 5:
            raw = _lzw_encode(raw)
        elif compression == 32773:
            raw = _packbits(raw)
        strips.append(raw)
        r += nrows
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    tags = [
        (256, 4, 1, width),
        (257, 4, 1, height),
        (258, 3, channels, None),  # bits per sample (8 each)
        (259, 3, 1, compression),
        (262, 3, 1, 2 if channels == 3 else 1),
        (273, 4, len(strips), None),  # strip offsets
        (277, 3, 1, channels),
        (278, 4, 1, rows_per_strip),
        (279, 4, len(strips), None),  # strip byte counts
        (284, 3, 1, 1),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def put_extra(fmt: str, vals: list[int]) -> int:
        nonlocal extra
        off = extra_off + len(extra)
        extra += struct.pack(bo + fmt * len(vals), *vals)
        return off

    # reserve layout: extra area first, then strip data
    deferred: dict[int, list[int]] = {258: [8] * channels}
    # compute where strip data will live after two passes
    n_extra = 0
    if channels > 1:
        n_extra += 2 * channels  # bps shorts
    if len(strips) > 1:
        n_extra += 4 * len(strips) * 2  # offsets + counts
    data_off = extra_off + n_extra
    offs = []
    pos = data_off
    for sdata in strips:
        offs.append(pos)
        pos += len(sdata)
    deferred[273] = offs
    deferred[279] = [len(s) for s in strips]
    ifd = bytearray(struct.pack(bo + "H", len(tags)))
    for tag, typ, n, val in tags:
        if val is not None and n == 1:
            if typ == 3:
                ifd += struct.pack(bo + "HHIHH", tag, typ, n, val, 0)
            else:
                ifd += struct.pack(bo + "HHII", tag, typ, n, val)
        else:
            vals = deferred[tag]
            if typ == 3 and n * 2 <= 4:
                packed = struct.pack(bo + "H" * n, *vals) + b"\x00" * (4 - 2 * n)
                ifd += struct.pack(bo + "HHI", tag, typ, n) + packed
            elif typ == 4 and n * 4 <= 4:
                ifd += struct.pack(bo + "HHII", tag, typ, n, vals[0])
            else:
                off = put_extra("H" if typ == 3 else "I", vals)
                ifd += struct.pack(bo + "HHII", tag, typ, n, off)
    ifd += struct.pack(bo + "I", 0)
    assert len(ifd) == ifd_size
    out = header + bytes(ifd) + bytes(extra)
    out += b"\x00" * (data_off - len(out))
    for sdata in strips:
        out += sdata
    return out
