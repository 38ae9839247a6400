"""Dependency-free Ogg container layer + FLAC-in-Ogg demux.

Reference semantics: the reference pipeline's media handling decodes
scraped binaries through a library (`Preprocessing/ImageLabeler.py:133-151`
for images; audio is the modality this engine adds for multimodal
corpora). This module extends the in-repo codec family
(`sources/audio.py` WAV, `sources/flac.py` FLAC) to FLAC streams
wrapped in the Ogg transport (the public "Ogg FLAC" mapping): parse
Ogg pages (capture pattern, segment lacing, page CRC), reassemble
logical packets, strip the Ogg-FLAC mapping headers, and rebuild the
native FLAC stream for the existing full decoder. Vorbis/Opus payloads
remain the documented perceptual-codec boundary — the CONTAINER is
fully parsed either way (stream type is reported), only their
transform codecs are out of dependency-free scope.

Format notes (public Ogg spec, RFC 3533; Ogg-FLAC mapping spec):
- a page: "OggS", version 0, header_type bitfield (0x1 continuation,
  0x2 begin-of-stream, 0x4 end-of-stream), 64-bit granule position,
  32-bit serial, 32-bit page sequence, 32-bit CRC, segment count, then
  the lacing table (each segment 0-255 bytes; a packet is the
  concatenation of segments up to the first one < 255 — a lacing value
  of exactly 255 continues the packet, possibly across pages);
- the page CRC is CRC-32 with polynomial 0x04c11db7, MSB-first
  (NON-reflected), init 0, no final xor, computed over the whole page
  with the CRC field zeroed;
- Ogg-FLAC mapping: first packet = 0x7F "FLAC" major minor
  n_header_packets(16-bit BE) "fLaC" STREAMINFO-block; each following
  header packet is one native metadata block; every audio packet is
  one native FLAC frame, byte-for-byte.
"""

from __future__ import annotations

import struct

# MSB-first CRC-32/04C11DB7, init 0, no xor-out (the Ogg page CRC)
_CRC_TABLE: list[int] = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


class OggPage:
    __slots__ = ("header_type", "granule", "serial", "seq", "segments")

    def __init__(self, header_type, granule, serial, seq, segments):
        self.header_type = header_type
        self.granule = granule
        self.serial = serial
        self.seq = seq
        self.segments = segments  # list[bytes] with lacing semantics


def parse_pages(b: bytes, verify_crc: bool = True) -> list[OggPage]:
    """All pages in capture order; raises on bad capture/CRC."""
    pages = []
    pos = 0
    n = len(b)
    while pos < n:
        if b[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at byte {pos}")
        if b[pos + 4] != 0:
            raise ValueError(f"unsupported Ogg version {b[pos + 4]}")
        header_type = b[pos + 5]
        granule, serial, seq, crc, nsegs = struct.unpack_from(
            "<qIIIB", b, pos + 6
        )
        lacing = b[pos + 27 : pos + 27 + nsegs]
        body_len = sum(lacing)
        page_end = pos + 27 + nsegs + body_len
        if page_end > n:
            raise ValueError("truncated Ogg page")
        if verify_crc:
            zeroed = (
                b[pos : pos + 22] + b"\x00\x00\x00\x00" + b[pos + 26 : page_end]
            )
            if _ogg_crc(zeroed) != crc:
                raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        segments = []
        off = pos + 27 + nsegs
        for lv in lacing:
            segments.append((lv, b[off : off + lv]))
            off += lv
        pages.append(OggPage(header_type, granule, serial, seq, segments))
        pos = page_end
    return pages


def assemble_packets(pages: list[OggPage]) -> list[bytes]:
    """Lacing-table packet reassembly for a single logical stream (the
    first serial seen); 255-valued lacings continue a packet across
    segments and pages."""
    if not pages:
        return []
    serial = pages[0].serial
    packets: list[bytes] = []
    cur = bytearray()
    open_packet = False
    for page in pages:
        if page.serial != serial:
            continue  # single-stream reader: ignore other multiplexed streams
        if not (page.header_type & 0x1) and open_packet:
            # spec: continuation flag must be set when a packet spans
            raise ValueError("packet continuation without continuation flag")
        for lv, seg in page.segments:
            cur.extend(seg)
            open_packet = True
            if lv < 255:
                packets.append(bytes(cur))
                cur = bytearray()
                open_packet = False
    if open_packet:
        raise ValueError("stream ends mid-packet")
    return packets


def sniff_codec(b: bytes) -> str:
    """Codec of the first logical stream: 'flac' | 'vorbis' | 'opus' |
    'unknown' (container parse is real for all of them)."""
    pages = parse_pages(b, verify_crc=False)
    packets = assemble_packets(pages)
    if not packets:
        return "unknown"
    p0 = packets[0]
    if p0[:5] == b"\x7fFLAC":
        return "flac"
    if p0[:7] == b"\x01vorbis":
        return "vorbis"
    if p0[:8] == b"OpusHead":
        return "opus"
    return "unknown"


def ogg_flac_to_native(b: bytes) -> bytes:
    """Demux an Ogg-FLAC stream back to the native FLAC byte stream the
    in-repo decoder (`sources/flac.py`) reads: mapping packet →
    "fLaC" + STREAMINFO, following header packets verbatim (metadata
    blocks), audio packets verbatim (frames)."""
    packets = assemble_packets(parse_pages(b))
    if not packets or packets[0][:5] != b"\x7fFLAC":
        raise ValueError("not an Ogg-FLAC stream")
    head = packets[0]
    if head[5] != 1:
        raise ValueError(f"unsupported Ogg-FLAC mapping major version {head[5]}")
    n_headers = struct.unpack_from(">H", head, 7)[0]
    if head[9:13] != b"fLaC":
        raise ValueError("mapping packet lacks native fLaC signature")
    native = bytearray(head[9:])  # "fLaC" + STREAMINFO metadata block
    # n_headers following packets are further metadata blocks; the
    # last-metadata flag already sits in whichever block carries it
    # (the muxer preserves native block headers byte-for-byte)
    for pk in packets[1 : 1 + n_headers]:
        native.extend(pk)
    if n_headers == 0:
        # STREAMINFO must then be flagged last-metadata already
        pass
    for pk in packets[1 + n_headers :]:
        native.extend(pk)
    return bytes(native)


def decode_ogg(b: bytes):
    """Ogg container decode: FLAC payloads decode for real through the
    in-repo FLAC codec; Vorbis/Opus raise the documented
    perceptual-codec boundary (container parsing, CRC checks and
    packet reassembly all still run)."""
    codec = sniff_codec(b)
    if codec == "flac":
        from .flac import decode_flac

        return decode_flac(ogg_flac_to_native(b))
    raise NotImplementedError(
        f"Ogg payload codec {codec!r} is a perceptual-codec boundary "
        "(Ogg-FLAC decodes for real)"
    )


# ------------------------------------------------------- muxer (tests)


def _emit_page(
    serial: int,
    seq: int,
    granule: int,
    header_type: int,
    packet_chunks: list[bytes],
    continued_out: bool,
) -> bytes:
    """One page carrying `packet_chunks`; each chunk except possibly
    the last is a COMPLETE packet (lacing closes it); if
    `continued_out`, the final chunk's lacing stays open (multiple of
    255 semantics handled by the caller via chunk size)."""
    lacing = bytearray()
    body = bytearray()
    for k, chunk in enumerate(packet_chunks):
        body.extend(chunk)
        full, rem = divmod(len(chunk), 255)
        lacing.extend(b"\xff" * full)
        last_chunk = k == len(packet_chunks) - 1
        if not (last_chunk and continued_out):
            lacing.append(rem)
        elif rem:
            raise ValueError("open chunk must be a multiple of 255 bytes")
    if len(lacing) > 255:
        raise ValueError(
            f"page lacing table has {len(lacing)} entries (max 255): "
            "split the packet across pages (_paginate_packets does this)"
        )
    header = bytearray(b"OggS\x00")
    header.append(header_type)
    header.extend(struct.pack("<qIIIB", granule, serial, seq, 0, len(lacing)))
    header.extend(lacing)
    page = bytes(header) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _paginate_packets(
    pages: list[bytes], serial: int, seq: int, packets: list[bytes], eos: bool
) -> int:
    """Emit `packets` as one or more conforming pages, splitting any
    packet whose lacing would overflow a page's 255-entry table across
    pages via the continued path (header_type 0x1 on the continuation
    page, open 255-multiple chunk before it). Returns the next page
    sequence number. A packet ending exactly on a page boundary gets
    its closing 0-lacing entry on the next page, per the spec."""
    cur: list[bytes] = []
    used = 0
    cont_in = False

    def flush(cont_out: bool, last: bool) -> None:
        nonlocal cur, used, seq, cont_in
        ht = (0x1 if cont_in else 0x0) | (0x4 if eos and last else 0x0)
        gran = -1 if eos and last else 0
        pages.append(_emit_page(serial, seq, gran, ht, cur, cont_out))
        seq += 1
        cont_in = cont_out
        cur = []
        used = 0

    for p in packets:
        rest = p
        while len(rest) // 255 + 1 > 255 - used:
            slots = 255 - used
            if slots == 0:
                flush(False, False)
                continue
            cur.append(rest[: 255 * slots])  # multiple of 255 → open
            used += slots
            flush(True, False)
            rest = rest[255 * slots :]
        cur.append(rest)
        used += len(rest) // 255 + 1
    flush(False, True)
    return seq


def encode_ogg_flac(
    native_flac: bytes, serial: int = 0x5F1AC, page_audio_packets: int = 4
) -> bytes:
    """Wrap a native FLAC stream (as produced by
    `flac.encode_flac`/`encode_flac_scripted`) into a conforming
    Ogg-FLAC stream — the scriptable muxer the round-trip tests drive.
    Splits metadata blocks and frames with the same parser boundaries
    the demuxer relies on, exercising multi-packet pages, packet
    spill across pages (255-lacing), and BOS/EOS flags."""
    if native_flac[:4] != b"fLaC":
        raise ValueError("not a native FLAC stream")
    # split metadata blocks
    pos = 4
    blocks = []
    last = False
    while not last and pos < len(native_flac):
        hdr = native_flac[pos]
        last = bool(hdr & 0x80)
        blen = int.from_bytes(native_flac[pos + 1 : pos + 4], "big")
        blocks.append(native_flac[pos : pos + 4 + blen])
        pos += 4 + blen
    if not blocks or (blocks[0][0] & 0x7F) != 0:
        raise ValueError("first metadata block must be STREAMINFO")
    frames = native_flac[pos:]
    # mapping packet: 0x7F FLAC 1 0 nheaders "fLaC" STREAMINFO
    n_headers = len(blocks) - 1
    mapping = (
        b"\x7fFLAC\x01\x00"
        + struct.pack(">H", n_headers)
        + b"fLaC"
        + blocks[0]
    )
    pages = []
    seq = 0
    pages.append(_emit_page(serial, seq, 0, 0x2, [mapping], False))
    seq += 1
    for blk in blocks[1:]:
        pages.append(_emit_page(serial, seq, 0, 0x0, [blk], False))
        seq += 1
    # audio: frames as one packet each; split frame packets into pages
    from .flac import split_frames

    frame_packets = split_frames(native_flac) if frames else []
    for i in range(0, len(frame_packets), page_audio_packets):
        chunk = frame_packets[i : i + page_audio_packets]
        eos = i + page_audio_packets >= len(frame_packets)
        lace_needed = sum(len(c) // 255 + 1 for c in chunk)
        if lace_needed <= 255:
            pages.append(
                _emit_page(
                    serial, seq, 0 if not eos else -1, 0x4 if eos else 0x0, chunk, False
                )
            )
            seq += 1
        else:
            # oversized packets (> ~65 KB, e.g. long verbatim FLAC
            # frames) span pages via the continued path
            seq = _paginate_packets(pages, serial, seq, chunk, eos)
    return b"".join(pages)
