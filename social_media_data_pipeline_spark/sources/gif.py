"""Dependency-free GIF codec (stdlib + numpy): decoder for GIF87a/89a
single-frame images — variable-width LSB-first LZW, global and local
color tables, interlace — plus a self-consistent encoder used by tests
to round-trip real bytes.

Reference semantic spec: the reference pipeline decodes scraped .jpg
/.gif media through PIL inside its labeling stage
(`Preprocessing/ImageLabeler.py:133-151`); this module supplies the
same decode contract for GIF without an imaging library, continuing
the `sources/jpeg.py` pattern. Animated GIFs: the FIRST image
descriptor is decoded at its own frame dimensions (the reference's
labeler also consumes single frames).

Format notes (public GIF89a specification):
- logical screen descriptor carries the global color table (2^(k+1)
  RGB triples when the flag bit is set);
- each image descriptor may override with a local color table and may
  be interlaced (4-pass row shuffle: rows 0,8,16.. then 4,12.. then
  2,6.. then 1,3..);
- pixel data is LZW with an initial code width of `min_code_size`+1
  bits, growing after the dictionary reaches 2^width entries, capped
  at 12 bits; codes are packed LSB-first into 255-byte-max sub-blocks.

The encoder emits valid LZW without building a dictionary: every pixel
index goes out as a literal code, with a CLEAR emitted whenever the
virtual next-code counter would force a width increase — the classic
"uncompressed GIF" trick, decodable by any conforming reader.
"""

from __future__ import annotations


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated LZW stream")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary: code → byte string; single-byte roots stay fixed
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    reader = _BitReader(data)
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code <= end or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # width grows when the NEXT code could not be represented
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _interlace_inverse(h: int) -> list[int]:
    """`inv[display_row] = stored_row` for the 4 interlace passes
    (rows 0,8,16.. / 4,12.. / 2,6.. / 1,3..)."""
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    inv = [0] * h
    for stored, display in enumerate(order):
        inv[display] = stored
    return inv


def decode_gif(b: bytes):
    """First frame of a GIF → (width, height, 3, flat uint8 RGB array).

    Raises ValueError on non-GIF bytes or structural corruption."""
    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    packed = b[10]
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = b[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label then sub-blocks until 0
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected gif block 0x{block:02x}")
        w = int.from_bytes(b[pos + 5 : pos + 7], "little")
        h = int.from_bytes(b[pos + 7 : pos + 9], "little")
        ipacked = b[pos + 9]
        pos += 10
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = b[pos : pos + 3 * n]
            pos += 3 * n
        if table is None:
            raise ValueError("gif frame has no color table")
        min_code_size = b[pos]
        pos += 1
        chunks = bytearray()
        while b[pos] != 0:
            size = b[pos]
            chunks += b[pos + 1 : pos + 1 + size]
            pos += 1 + size
        indices = _lzw_decode(bytes(chunks), min_code_size, w * h)
        if len(indices) < w * h:
            raise ValueError("gif pixel data short of frame size")
        idx = np.frombuffer(bytes(indices[: w * h]), dtype=np.uint8)
        palette = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        if ipacked & 0x40:  # interlaced: reorder stored rows for display
            rgb = rgb.reshape(h, w, 3)[_interlace_inverse(h)]
        return w, h, 3, rgb.reshape(-1).copy()
    raise ValueError("gif contains no image descriptor")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Encode an RGB buffer as a single-frame GIF89a (≤256 distinct
    colors; ValueError otherwise). Literal-code LZW with CLEAR flushes —
    valid output for any conforming decoder, used to round-trip the
    decoder against real bytes without an imaging library."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    if len(px) != width * height:
        raise ValueError("rgb buffer does not match dimensions")
    colors, indices = np.unique(px, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"gif needs a <=256-color palette, got {len(colors)}")
    bits = max(2, int(len(colors) - 1).bit_length())
    table_size = 1 << bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    min_code_size = bits
    clear = 1 << min_code_size
    end = clear + 1
    writer = _BitWriter()
    width_bits = min_code_size + 1
    writer.write(clear, width_bits)
    next_code = end + 1
    for i in indices.reshape(-1):
        writer.write(int(i), width_bits)
        # decoder adds one table entry per emitted code; flush before
        # the virtual counter would widen codes we never use
        next_code += 1
        if next_code == (1 << width_bits) - 1:
            writer.write(clear, width_bits)
            next_code = end + 1
    writer.write(end, width_bits)
    data = writer.finish()
    out = bytearray()
    out += b"GIF89a"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # global table, 2^bits entries
    out += palette.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += b"\x00"  # no local table, not interlaced
    out += bytes([min_code_size])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
