"""AVI (RIFF) container with MJPEG video — parse, frame iterate, write.

This converts "compressed video" from a stub into a real decode path:
MJPEG AVIs carry one self-contained JPEG per frame, which
`sources/jpeg.py` (baseline + progressive) decodes without any native
codec. Inter-frame codecs (H.264/VP9/AV1) stay a documented boundary —
they need a real motion-compensation decoder — but the CONTAINER walk
below (chunk offsets, stream headers, frame index) is the same one any
codec-backed sampler would reuse.

Container layout (public Microsoft AVI RIFF spec):
  RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf ...))
               LIST('movi' {'00dc' <frame bytes>}*) [idx1])

Frame sampling never decodes skipped frames: the movi walk is offset
arithmetic only, so sampling 1-in-N of a large file costs N-th of the
JPEG decodes (same contract as the Y4M stride decode in
`sources/binary.py`).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _fourcc(b: bytes) -> str:
    return b.decode("latin-1")


def parse_avi(b: bytes) -> dict:
    """Parse header + frame directory. Returns {width, height, fps,
    codec, frames: [(offset, size)], n_frames} without touching frame
    payloads."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    info: dict = {"width": None, "height": None, "fps": None, "codec": None}
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            body = i + 8
            if cid == b"LIST":
                ltype = b[body : body + 4]
                if ltype in (b"hdrl", b"movi", b"strl"):
                    walk(body + 4, min(body + size, end))
            elif cid == b"avih" and size >= 40:
                # dwMicroSecPerFrame at +0, dwWidth/dwHeight at +32/+36
                usec = int.from_bytes(b[body : body + 4], "little")
                info["fps"] = round(1e6 / usec, 3) if usec else None
                info["width"] = int.from_bytes(b[body + 32 : body + 36], "little")
                info["height"] = int.from_bytes(b[body + 36 : body + 40], "little")
            elif cid == b"strh" and size >= 8:
                if b[body : body + 4] == b"vids":
                    info["codec"] = _fourcc(b[body + 4 : body + 8]).strip("\x00")
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                # compressed / uncompressed video frame chunk (e.g. 00dc)
                frames.append((body, size))
            i = body + size + (size & 1)

    walk(12, len(b))
    if not frames:
        raise ValueError("AVI stream contains no video frame chunks")
    info["frames"] = frames
    info["n_frames"] = len(frames)
    return info


def decode_avi_mjpeg_frames(
    b: bytes, every_n: int = 30
) -> Iterator[tuple[int, int, int, np.ndarray]]:
    """Yield (frame_idx, width, height, rgb uint8 (h, w, 3)) for every
    `every_n`-th frame of an MJPEG AVI. Skipped frames are never
    decoded (offset walk only)."""
    from social_media_data_pipeline_spark.sources.jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    info = parse_avi(b)
    codec = (info["codec"] or "").upper()
    if codec not in ("MJPG", "MJPEG", ""):
        raise NotImplementedError(
            f"AVI codec {codec!r} needs an inter-frame video decoder "
            "(ffmpeg/pyav); MJPEG AVIs decode for real here"
        )
    for idx, (off, size) in enumerate(info["frames"]):
        if idx % every_n:
            continue
        payload = b[off : off + size]
        if payload[:2] != b"\xff\xd8":
            raise ValueError(f"frame {idx}: not a JPEG payload (codec {codec!r})")
        w, h, c, px = decode_jpeg(payload)
        rgb = np.asarray(px, dtype=np.uint8).reshape(h, w, c)
        if c == 1:
            rgb = np.repeat(rgb, 3, axis=2)
        yield idx, w, h, rgb


def encode_avi_mjpeg(
    width: int,
    height: int,
    rgb_frames,
    fps: float = 30.0,
    quality: int = 85,
) -> bytes:
    """Write an MJPEG AVI from an iterable of flat RGB byte buffers —
    the fixture writer/sink mirroring `encode_y4m`."""
    from social_media_data_pipeline_spark.sources.jpeg import encode_jpeg

    jpegs = [
        encode_jpeg(width, height, f, channels=3, quality=quality)
        for f in rgb_frames
    ]
    if not jpegs:
        raise ValueError("need at least one frame")

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    usec = int(round(1e6 / fps)) if fps else 0
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps or 1)), 0, len(jpegs), 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D, width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame (offset relative to movi list start + 4)
    idx_entries = []
    off = 4
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
