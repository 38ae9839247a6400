"""MPEG audio (mp3/mp2/mp1) FRAME-HEADER metadata — no decode.

The transform codec (polyphase filterbank / MDCT / Huffman) stays the
documented perceptual boundary (`sources/audio.py`; the reference's
library-based media decode is `Preprocessing/ImageLabeler.py:133-151`
— audio is this engine's multimodal extension), but a 100 TB
audio corpus still needs duration / bitrate / rate / channel metadata
for every scraped mp3 WITHOUT decoding it. This walks the physical
frame sequence exactly as written: skip ID3v2 (syncsafe length),
validate each 4-byte frame header (sync, version, layer, indices),
step by the computed frame length, count frames and bytes. All tables
below are from the public MPEG-1/2 audio spec (ISO/IEC 11172-3 /
13818-3).

Frame length: Layer I: (12·bitrate/rate + pad)·4 slots; Layers II/III:
144·bitrate/rate + pad (72· for MPEG-2/2.5 Layer III — halved frame
size). Samples per frame: Layer I 384; Layer II 1152; Layer III 1152
(576 for MPEG-2/2.5).
"""

from __future__ import annotations

# bitrate tables [kbps], index 1..14 (0 = free, 15 = bad)
_BITRATES = {
    # (version_group, layer): version_group 1 = MPEG-1, 2 = MPEG-2/2.5
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}

_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _id3v2_size(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none); tag length is
    a 28-bit syncsafe integer after the 10-byte header."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = (
        ((b[6] & 0x7F) << 21)
        | ((b[7] & 0x7F) << 14)
        | ((b[8] & 0x7F) << 7)
        | (b[9] & 0x7F)
    )
    return 10 + size


def parse_frame_header(b: bytes, pos: int) -> dict | None:
    """Validate + decode the 4-byte header at `pos`; None if invalid."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (h >> 19) & 0x3
    if version_bits == 1:  # reserved
        return None
    layer_bits = (h >> 17) & 0x3
    if layer_bits == 0:  # reserved
        return None
    layer = 4 - layer_bits  # 3→I, 2→II, 1→III
    bitrate_idx = (h >> 12) & 0xF
    if bitrate_idx in (0, 15):  # free-format / bad
        return None
    rate_idx = (h >> 10) & 0x3
    if rate_idx == 3:
        return None
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    vgroup = 1 if version_bits == 3 else 2
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx - 1] * 1000
    rate = _SAMPLE_RATES[version_bits][rate_idx]
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
        samples = 384
    elif layer == 2:
        frame_len = 144 * bitrate // rate + padding
        samples = 1152
    else:  # layer III
        if vgroup == 1:
            frame_len = 144 * bitrate // rate + padding
            samples = 1152
        else:
            frame_len = 72 * bitrate // rate + padding
            samples = 576
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "mode": _MODES[mode],
        "n_channels": 1 if mode == 3 else 2,
        "frame_len": frame_len,
        "samples": samples,
    }


def mp3_info(b: bytes, max_resync: int = 4096) -> dict:
    """Walk the whole frame sequence → stream metadata. Tolerates a
    leading ID3v2 tag and up to `max_resync` junk bytes before the
    first header; after the first frame, headers must land exactly
    where the previous frame length points (no mid-stream resync —
    corrupt streams should be REPORTED, not papered over), except that
    a trailing ID3v1 tag ('TAG', 128 bytes) and end padding are
    accepted."""
    b = bytes(b)
    pos = _id3v2_size(b)
    first = None
    limit = min(len(b), pos + max_resync)
    while pos < limit:
        first = parse_frame_header(b, pos)
        if first is not None:
            break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame found")
    n_frames = 0
    total_samples = 0
    total_bits = 0
    duration = 0.0
    bitrates_seen: set[int] = set()
    while pos < len(b):
        hdr = parse_frame_header(b, pos)
        if hdr is None:
            rest = b[pos:]
            if rest[:3] == b"TAG" or all(x == 0 for x in rest[:64]):
                break  # ID3v1 trailer / zero padding
            raise ValueError(f"lost MPEG frame sync at byte {pos}")
        if pos + hdr["frame_len"] > len(b):
            # a header whose declared length points past EOF is a
            # truncated frame — report, don't count it as complete
            raise ValueError(
                f"truncated final MPEG frame at byte {pos}: header "
                f"declares {hdr['frame_len']} bytes, {len(b) - pos} remain"
            )
        n_frames += 1
        total_samples += hdr["samples"]
        # per-frame seconds: mid-stream sample-rate changes (legal to
        # the walker) contribute at their own rate, not the first
        # frame's
        duration += hdr["samples"] / hdr["sample_rate"]
        total_bits += hdr["bitrate"] * (hdr["samples"] / hdr["sample_rate"])
        bitrates_seen.add(hdr["bitrate"])
        pos += hdr["frame_len"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "mode": first["mode"],
        "n_channels": first["n_channels"],
        "n_frames": n_frames,
        "total_samples": total_samples,
        "duration_s": duration,
        # time-weighted: exact average rate over VBR and mixed-rate streams
        "avg_bitrate": int(round(total_bits / duration)) if duration else 0,
        "vbr": len(bitrates_seen) > 1,
    }


def encode_mp3_skeleton(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    layer: int = 3,
    mode: int = 0,
    id3v2_bytes: int = 0,
    bitrates_per_frame: list[int] | None = None,
) -> bytes:
    """Scriptable producer for tests: structurally-valid MPEG frame
    sequences (correct headers + frame lengths, zeroed payloads — the
    payload is the perceptual boundary, the STRUCTURE is what mp3_info
    reads). Supports CBR and per-frame bitrate lists (VBR), optional
    leading ID3v2 tag."""
    out = bytearray()
    if id3v2_bytes:
        body = id3v2_bytes - 10
        out += b"ID3\x04\x00\x00" + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F, (body >> 7) & 0x7F, body & 0x7F]
        )
        out += b"\x00" * body
    rates = {44100: 0, 48000: 1, 32000: 2}
    br_list = bitrates_per_frame or [bitrate_kbps] * n_frames
    for kbps in br_list:
        table = _BITRATES[(1, layer)]
        idx = table.index(kbps) + 1
        h = (
            (0x7FF << 21)
            | (3 << 19)  # MPEG-1
            | ((4 - layer) << 17)
            | (1 << 16)  # protection bit set = no CRC-16
            | (idx << 12)
            | (rates[sample_rate] << 10)
            | (0 << 9)  # no padding
            | (1 << 8)  # private
            | (mode << 6)
        )
        if layer == 1:
            flen = (12 * kbps * 1000 // sample_rate) * 4
        else:
            flen = 144 * kbps * 1000 // sample_rate
        frame = bytearray(flen)
        frame[0:4] = h.to_bytes(4, "big")
        out += frame
    return bytes(out)
