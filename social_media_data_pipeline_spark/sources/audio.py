"""Audio modality (multimodal LLM-pipeline extension): WAV/PCM decode,
resampling, and windowed DSP features over binary columns.

The reference pipeline carries images only; audio is the modality a
training-data pipeline adds next (speech corpora, audio captioning).
Same contract as the image path (`sources/binary.py`): binary column in,
Arrow-batched `mapInPandas` out, typed metadata struct, deterministic
math — all stdlib + numpy, no soundfile/librosa (not in this container).

Codec coverage is REAL, not stubbed:
  - RIFF/WAVE parse: PCM u8 / s16 / s24 / s32 little-endian and IEEE
    float32/float64 (fmt tags 1, 3, and WAVE_FORMAT_EXTENSIBLE 0xFFFE
    wrapping either), any channel count.
  - `encode_wav` writes the same subset (fixture generation + sink).
  - Linear resampling, frame windowing, per-frame RMS / zero-crossing
    rate / spectral centroid (numpy rFFT), HTK log-mel spectrogram.
  - FLAC decode via the in-repo `sources/flac.py` codec (constant /
    verbatim / fixed / LPC subframes, all stereo decorrelations,
    Rice/Rice2 partitions, wasted bits, CRC + MD5 verification) —
    every audio operator accepts WAV and FLAC bytes transparently
    through `decode_audio_bytes`.
Remaining compressed audio (mp3/ogg/aac — perceptual codecs needing
psychoacoustic filterbanks) is the documented NotImplementedError
boundary: the operator plumbing (schema, batching) is identical, only
`decode_audio_bytes` would grow a branch.

Scale shape (100 TB of audio): decode and feature extraction are
map-side only — one task per parquet/binary-file split, no shuffle; the
per-frame explode multiplies rows map-side and any downstream
aggregation grounds on (path, frame) keys. Clip windowing bounds output
size by `max_windows`, the same guard as `sample_video_frames`.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- codec

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_ALAW = 6
_WAVE_FORMAT_MULAW = 7
_WAVE_FORMAT_IMA_ADPCM = 0x11
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


# ------------------------------------------------------- G.711 / ADPCM
#
# Telephony codecs carried inside WAVE containers — real decodes, not
# boundaries: μ-law/A-law are table-free bit formulas (G.711), IMA
# ADPCM (fmt 0x11) is the 4-bit block-predictive codec. mp3/ogg/aac
# (psychoacoustic transforms) remain the documented boundary.


def _mulaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 μ-law bytes → int16 samples (±32124)."""
    u = (~b.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples → G.711 μ-law bytes."""
    x = x.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    m = np.minimum(np.abs(x), 32635) + 0x84
    exp = np.clip(np.int64(np.log2(1)) + (63 - _clz64(m)) - 7, 0, 7)
    mant = (m >> (exp + 3)) & 0xF
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def _alaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 samples (±32256)."""
    a = b.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    # after the 0x55 toggle the MSB is 1 for POSITIVE values (G.711)
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples → G.711 A-law bytes."""
    x = x.astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    m = np.minimum(np.abs(x), 32767)
    exp = np.clip((63 - _clz64(np.maximum(m, 1))) - 7, 0, 7)
    mant = np.where(exp == 0, m >> 4, (m >> (exp + 3)) & 0xF)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


def _clz64(m: np.ndarray) -> np.ndarray:
    """63 - floor(log2(m)) for positive int64 arrays (bit-length helper)."""
    out = np.zeros_like(m)
    v = m.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (1 << shift)
        out = np.where(big, out + shift, out)
        v = np.where(big, v >> shift, v)
    return 63 - out


_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)


def _ima_decode_nibbles(nibbles: np.ndarray, predictor: int, index: int) -> np.ndarray:
    """Core IMA ADPCM loop: 4-bit codes → int16 samples."""
    out = np.empty(nibbles.size, dtype=np.int16)
    pred, idx = int(predictor), int(index)
    step_t, idx_t = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    for i, n in enumerate(nibbles):
        n = int(n)
        step = int(step_t[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(idx_t[n])))
        out[i] = pred
    return out


def _ima_encode_block(x: np.ndarray, index: int) -> tuple[bytes, int]:
    """Encode one mono block: first sample becomes the header
    predictor; remaining samples quantize to nibbles. Returns (block
    bytes incl. 4-byte header, final step index)."""
    pred, idx = int(x[0]), int(index)
    header = struct.pack("<hBB", pred, idx, 0)
    nibbles = []
    for v in map(int, x[1:]):
        step = int(_IMA_STEP_TABLE[idx])
        diff = v - pred
        n = 8 if diff < 0 else 0
        diff = abs(diff)
        d = step >> 3
        if diff >= step:
            n |= 4
            diff -= step
            d += step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
            d += step >> 1
        if diff >= step >> 2:
            n |= 1
            d += step >> 2
        pred = pred - d if n & 8 else pred + d
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[n])))
        nibbles.append(n)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return header + packed, idx


def encode_wav_g711(samples: np.ndarray, sample_rate: int, law: str = "mulaw") -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → G.711 WAV bytes
    (fmt tag 7 μ-law / 6 A-law) — the fixture generator for the G.711
    decode path."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, n_ch = x.shape
    xi = np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int64).reshape(-1)
    if law == "mulaw":
        tag, raw = _WAVE_FORMAT_MULAW, _mulaw_encode(xi).tobytes()
    elif law == "alaw":
        tag, raw = _WAVE_FORMAT_ALAW, _alaw_encode(xi).tobytes()
    else:
        raise ValueError(f"law must be mulaw or alaw, got {law!r}")
    fmt = struct.pack("<HHIIHH", tag, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8)
    fmt += struct.pack("<H", 0)  # cbSize=0 (non-PCM fmt carries the field)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n_frames)
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """float mono samples in [-1, 1] → IMA-ADPCM WAV bytes (fmt 0x11),
    the fixture generator for the ADPCM decode path."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    xi = np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int64)
    block_align = 4 + (samples_per_block - 1 + 1) // 2
    blocks, idx = [], 0
    for start in range(0, xi.size, samples_per_block):
        blk = xi[start : start + samples_per_block]
        if blk.size == 0:
            break
        body, idx = _ima_encode_block(blk, idx)
        body = body.ljust(block_align, b"\x00")
        blocks.append(body)
    raw = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_IMA_ADPCM,
        1,
        sample_rate,
        sample_rate * block_align // samples_per_block,
        block_align,
        4,
    ) + struct.pack("<HH", 2, samples_per_block)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, xi.size)
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav_chunks(b: bytes) -> dict[str, tuple[int, int]]:
    """RIFF chunk walk → {chunk_id: (offset, size)} for fmt/data."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    chunks: dict[str, tuple[int, int]] = {}
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4].decode("latin-1")
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        chunks.setdefault(cid, (i + 8, size))
        # chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size + (size & 1)
    if "fmt " not in chunks or "data" not in chunks:
        raise ValueError("WAVE stream missing fmt/data chunk")
    return chunks


def wav_info(b: bytes) -> dict:
    """Header-only parse: format tag, channels, sample rate, bit depth,
    frame count — the metadata row, no sample decode."""
    chunks = _parse_wav_chunks(b)
    off, size = chunks["fmt "]
    if size < 16:
        raise ValueError(f"fmt chunk too small: {size}")
    tag, n_ch, sr, _byte_rate, block_align, bits = struct.unpack_from("<HHIIHH", b, off)
    if tag == _WAVE_FORMAT_EXTENSIBLE:
        # sub-format GUID starts at fmt+24; first 2 bytes are the real tag
        if size < 40:
            raise ValueError("extensible fmt chunk truncated")
        tag = int.from_bytes(b[off + 24 : off + 26], "little")
    d_off, d_size = chunks["data"]
    d_size = min(d_size, len(b) - d_off)  # tolerate truncated writes
    n_frames = d_size // block_align if block_align else 0
    samples_per_block = None
    if tag == _WAVE_FORMAT_IMA_ADPCM:
        # extended fmt: cbSize at fmt+16, wSamplesPerBlock at fmt+18
        if size < 20:
            raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
        samples_per_block = int.from_bytes(b[off + 18 : off + 20], "little")
        n_blocks = d_size // block_align if block_align else 0
        if "fact" in chunks and chunks["fact"][1] >= 4:
            # fact dwSampleLength = per-channel sample frames
            f_off = chunks["fact"][0]
            n_frames = int.from_bytes(b[f_off : f_off + 4], "little")
        else:
            n_frames = n_blocks * samples_per_block
    return {
        "format_tag": tag,
        "n_channels": n_ch,
        "sample_rate": sr,
        "bits_per_sample": bits,
        "block_align": block_align,
        "n_frames": n_frames,
        "samples_per_block": samples_per_block,
        "data_offset": d_off,
        "data_size": d_size,
    }


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1], shape (n_frames,
    n_channels); sample_rate). Supports PCM u8/s16/s24/s32 LE, IEEE
    float32/float64 (any channel count), G.711 μ-law/A-law, and mono
    IMA ADPCM (fmt 0x11, block-wise via wSamplesPerBlock)."""
    info = wav_info(b)
    tag, bits = info["format_tag"], info["bits_per_sample"]
    n_ch = info["n_channels"]
    off, size = info["data_offset"], info["data_size"]
    n = info["n_frames"] * n_ch
    raw = b[off : off + size]
    if tag == _WAVE_FORMAT_PCM:
        if bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8, count=n).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2", count=n).astype(np.float32) / 32768.0
        elif bits == 24:
            u = np.frombuffer(raw, dtype=np.uint8, count=n * 3).reshape(-1, 3)
            v = (
                u[:, 0].astype(np.int32)
                | (u[:, 1].astype(np.int32) << 8)
                | (u[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4", count=n).astype(np.float32) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4", count=n).astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8", count=n).astype(np.float32)
        else:
            raise NotImplementedError(f"float bit depth {bits} not supported")
    elif tag == _WAVE_FORMAT_MULAW:
        x = _mulaw_decode(np.frombuffer(raw, dtype=np.uint8, count=n)).astype(np.float32) / 32768.0
    elif tag == _WAVE_FORMAT_ALAW:
        x = _alaw_decode(np.frombuffer(raw, dtype=np.uint8, count=n)).astype(np.float32) / 32768.0
    elif tag == _WAVE_FORMAT_IMA_ADPCM:
        if n_ch != 1:
            raise NotImplementedError("IMA ADPCM decode supports mono streams")
        spb = info["samples_per_block"]
        block_align = info["block_align"]
        pieces = []
        for boff in range(0, size - size % block_align, block_align):
            block = raw[boff : boff + block_align]
            pred, idx, _ = struct.unpack_from("<hBB", block, 0)
            nib_bytes = np.frombuffer(block, dtype=np.uint8, offset=4)
            nibbles = np.empty(nib_bytes.size * 2, dtype=np.uint8)
            nibbles[0::2] = nib_bytes & 0xF
            nibbles[1::2] = nib_bytes >> 4
            decoded = _ima_decode_nibbles(nibbles[: spb - 1], pred, idx)
            pieces.append(np.int16(pred))
            pieces.append(decoded)
        flat = np.concatenate([np.atleast_1d(p) for p in pieces]) if pieces else np.empty(0, np.int16)
        x = flat[: info["n_frames"]].astype(np.float32) / 32768.0
    else:
        # mp3/ogg/flac arrive as other containers entirely; a non-PCM
        # fmt tag inside WAVE (e.g. 0x0055 MP3) is the documented
        # compressed-audio boundary; G.711 μ-law/A-law (6/7) and IMA
        # ADPCM (0x11) are decoded for real above.
        raise NotImplementedError(
            f"compressed WAVE format tag 0x{tag:04x} is a codec boundary "
            "(PCM, IEEE-float, G.711 and IMA ADPCM are decoded for real; "
            "swap in a codec lib for MP3-in-WAV)"
        )
    return x.reshape(-1, n_ch), info["sample_rate"]


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → WAV bytes.
    bits: 8 (u8), 16/24/32 (signed PCM), or 33 meaning float32 (tag 3)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, n_ch = x.shape
    x = np.clip(x, -1.0, 1.0)
    if bits == 8:
        raw = (np.round(x * 127.0) + 128).astype(np.uint8).tobytes()
        tag, stored_bits = _WAVE_FORMAT_PCM, 8
    elif bits == 16:
        raw = np.round(x * 32767.0).astype("<i2").tobytes()
        tag, stored_bits = _WAVE_FORMAT_PCM, 16
    elif bits == 24:
        v = np.round(x * float((1 << 23) - 1)).astype(np.int64)
        u = np.empty((v.size, 3), dtype=np.uint8)
        flat = v.reshape(-1) & 0xFFFFFF
        u[:, 0] = flat & 0xFF
        u[:, 1] = (flat >> 8) & 0xFF
        u[:, 2] = (flat >> 16) & 0xFF
        raw = u.tobytes()
        tag, stored_bits = _WAVE_FORMAT_PCM, 24
    elif bits == 32:
        raw = np.round(x * float((1 << 31) - 1)).astype("<i4").tobytes()
        tag, stored_bits = _WAVE_FORMAT_PCM, 32
    elif bits == 33:  # float32 convention
        raw = x.astype("<f4").tobytes()
        tag, stored_bits = _WAVE_FORMAT_IEEE_FLOAT, 32
    else:
        raise ValueError(f"unsupported bits {bits}")
    block_align = n_ch * stored_bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, n_ch, sample_rate, sample_rate * block_align, block_align, stored_bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio_bytes(b: bytes) -> tuple[np.ndarray, int]:
    """Format-dispatched decode: bytes → (float32 samples (n, ch),
    sample_rate). WAV (PCM/IEEE-float) and FLAC decode for real via the
    in-repo codecs; mp3/ogg/aac are the documented perceptual-codec
    boundary."""
    fmt = _sniff_audio(bytes(b))
    if fmt == "wav":
        return decode_wav(b)
    if fmt == "flac":
        from .flac import decode_flac

        return decode_flac(b)
    if fmt == "ogg":
        from .ogg import decode_ogg

        # Ogg-FLAC decodes for real (container demux + in-repo FLAC
        # codec); Vorbis/Opus payloads raise the perceptual boundary
        return decode_ogg(b)
    raise NotImplementedError(
        f"audio format {fmt!r} is a codec boundary (wav, flac and "
        "ogg-flac are decoded for real; mp3/ogg-vorbis/opus/aac need a "
        "perceptual-codec library)"
    )


# ------------------------------------------------------------------ dsp


def downmix_mono(x: np.ndarray) -> np.ndarray:
    """(n, ch) → (n,) channel mean."""
    return x.mean(axis=1) if x.ndim == 2 else x


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """1-D linear-interpolation resample — the cheap deterministic
    baseline (a polyphase filter is a quality upgrade, not a contract
    change)."""
    if sr_in == sr_out or x.size == 0:
        return x.astype(np.float32, copy=False)
    n_out = max(1, int(round(x.size * sr_out / sr_in)))
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(x.size, dtype=np.float64), x).astype(np.float32)


def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """1-D signal → (n_frames, frame_len) strided view copy; trailing
    partial frame dropped (standard STFT convention)."""
    if x.size < frame_len:
        return np.empty((0, frame_len), dtype=x.dtype)
    n_frames = 1 + (x.size - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[idx]


def frame_features(x: np.ndarray, sr: int, frame_len: int = 1024, hop: int = 512) -> pd.DataFrame:
    """Per-frame RMS energy, zero-crossing rate, spectral centroid (Hz).
    Columns: frame, t_start_s, rms, zcr, centroid_hz."""
    frames = frame_signal(np.asarray(x, dtype=np.float32), frame_len, hop)
    n = frames.shape[0]
    if n == 0:
        return pd.DataFrame(columns=["frame", "t_start_s", "rms", "zcr", "centroid_hz"])
    rms = np.sqrt(np.mean(frames**2, axis=1))
    zcr = np.mean(np.abs(np.diff(np.signbit(frames).astype(np.int8), axis=1)), axis=1)
    win = np.hanning(frame_len).astype(np.float32)
    mag = np.abs(np.fft.rfft(frames * win, axis=1))
    freqs = np.fft.rfftfreq(frame_len, d=1.0 / sr)
    denom = mag.sum(axis=1)
    centroid = np.where(denom > 0, (mag * freqs).sum(axis=1) / np.maximum(denom, 1e-12), 0.0)
    return pd.DataFrame(
        {
            "frame": np.arange(n, dtype=np.int32),
            "t_start_s": (hop * np.arange(n) / sr).astype(np.float32),
            "rms": rms.astype(np.float32),
            "zcr": zcr.astype(np.float32),
            "centroid_hz": centroid.astype(np.float32),
        }
    )


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 40, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """HTK-style triangular mel filterbank, shape (n_mels, n_fft//2+1)."""
    fmax = fmax or sr / 2.0
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), dtype=np.float32)
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, min(c, fb.shape[1])):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, min(hi, fb.shape[1])):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def log_mel_spectrogram(
    x: np.ndarray, sr: int, frame_len: int = 1024, hop: int = 512, n_mels: int = 40
) -> np.ndarray:
    """(n_frames, n_mels) log-mel energies — the standard audio-model
    input feature."""
    frames = frame_signal(np.asarray(x, dtype=np.float32), frame_len, hop)
    if frames.shape[0] == 0:
        return np.empty((0, n_mels), dtype=np.float32)
    win = np.hanning(frame_len).astype(np.float32)
    power = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
    mel = power @ mel_filterbank(sr, frame_len, n_mels).T
    return np.log(mel + 1e-10).astype(np.float32)


# ------------------------------------------------------------ spark ops

AUDIO_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.FloatType()),
    ]
)


def _sniff_audio(b: bytes) -> str:
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"fLaC":
        return "flac"
    if b[:4] == b"OggS":
        return "ogg"
    if b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    ):
        # MPEG audio frame sync (11 set bits) or leading ID3v2 tag
        return "mp3"
    return "unknown"


def audio_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Binary column → typed audio metadata struct (real header parse
    for wav; format sniff only for compressed containers)."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[content_col]:
                b = bytes(b)
                fmt = _sniff_audio(b)
                row = {
                    "format": fmt,
                    "n_channels": None,
                    "sample_rate": None,
                    "bits_per_sample": None,
                    "n_frames": None,
                    "duration_s": None,
                }
                if fmt == "wav":
                    try:
                        info = wav_info(b)
                        row.update(
                            n_channels=info["n_channels"],
                            sample_rate=info["sample_rate"],
                            bits_per_sample=info["bits_per_sample"],
                            n_frames=info["n_frames"],
                            duration_s=float(info["n_frames"]) / max(info["sample_rate"], 1),
                        )
                    except (ValueError, struct.error):
                        pass
                elif fmt == "flac":
                    try:
                        from .flac import flac_info

                        info = flac_info(b)
                        row.update(
                            n_channels=info["n_channels"],
                            sample_rate=info["sample_rate"],
                            bits_per_sample=info["bits_per_sample"],
                            n_frames=info["total_samples"],
                            duration_s=float(info["total_samples"])
                            / max(info["sample_rate"], 1),
                        )
                    except (ValueError, struct.error):
                        pass
                elif fmt == "mp3":
                    # frame-HEADER walk (sources/mp3.py): duration /
                    # rate / channels without touching the perceptual
                    # codec boundary
                    try:
                        from .mp3 import mp3_info

                        info = mp3_info(b)
                        row.update(
                            n_channels=info["n_channels"],
                            sample_rate=info["sample_rate"],
                            n_frames=info["total_samples"],
                            duration_s=info["duration_s"],
                        )
                    except (ValueError, struct.error):
                        pass
                rows.append(row)
            out = pdf.drop(columns=[content_col])
            out["meta"] = rows
            yield out

    schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col] + [T.StructField("meta", AUDIO_META)]
    )
    return df.mapInPandas(_meta, schema)


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    target_sr: int | None = None,
    mono: bool = True,
) -> DataFrame:
    """Binary WAV column → (…passthrough, samples array<float>,
    sample_rate, n_samples). Optional mono downmix + linear resample to
    `target_sr` so heterogeneous corpora land on one canonical rate —
    the audio analog of `resize_image`. Map-side only; no shuffle."""
    keep = [f for f in df.schema.fields if f.name != content_col]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples, rates, counts = [], [], []
            for b in pdf[content_col]:
                x, sr = decode_audio_bytes(bytes(b))
                x1 = downmix_mono(x) if mono else x.reshape(-1)
                if target_sr is not None:
                    x1 = resample_linear(x1, sr, target_sr)
                    sr = target_sr
                samples.append([float(v) for v in x1])
                rates.append(sr)
                counts.append(len(x1))
            out = pdf.drop(columns=[content_col])
            out["samples"] = samples
            out["sample_rate"] = pd.array(rates, dtype="int32")
            out["n_samples"] = pd.array(counts, dtype="int64")
            yield out

    schema = T.StructType(
        keep
        + [
            T.StructField("samples", T.ArrayType(T.FloatType())),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )
    return df.mapInPandas(_decode, schema)


def audio_frame_features(
    df: DataFrame,
    content_col: str = "content",
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Binary WAV column → one row per analysis frame with RMS / ZCR /
    spectral centroid. The explode happens map-side inside the UDF (rows
    out ≫ rows in), so no shuffle is introduced; group downstream on the
    passthrough key."""
    keep = [f for f in df.schema.fields if f.name != content_col]

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                x, sr = decode_audio_bytes(bytes(row[content_col]))
                feats = frame_features(downmix_mono(x), sr, frame_len, hop)
                for f in keep:
                    feats[f.name] = row[f.name]
                outs.append(feats)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = T.StructType(
        [
            T.StructField("frame", T.IntegerType()),
            T.StructField("t_start_s", T.FloatType()),
            T.StructField("rms", T.FloatType()),
            T.StructField("zcr", T.FloatType()),
            T.StructField("centroid_hz", T.FloatType()),
        ]
        + keep
    )
    return df.mapInPandas(_feat, schema)


def sample_audio_windows(
    df: DataFrame,
    content_col: str = "content",
    window_s: float = 1.0,
    every_s: float = 5.0,
    max_windows: int = 16,
) -> DataFrame:
    """Clip extraction: every `every_s` seconds emit a `window_s`-long
    WAV clip (re-encoded 16-bit mono) — the audio analog of
    `sample_video_frames`, bounded by `max_windows` per file."""
    if window_s <= 0 or every_s <= 0:
        raise ValueError("window_s and every_s must be positive")
    keep = [f for f in df.schema.fields if f.name != content_col]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                x, sr = decode_audio_bytes(bytes(row[content_col]))
                x1 = downmix_mono(x)
                step, width = int(sr * every_s), int(sr * window_s)
                for w, start in enumerate(range(0, max(x1.size - width + 1, 1), max(step, 1))):
                    if w >= max_windows:
                        break
                    clip = x1[start : start + width]
                    r = {f.name: row[f.name] for f in keep}
                    r["window"] = w
                    r["t_start_s"] = float(start / sr)
                    r["clip"] = encode_wav(clip, sr, bits=16)
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in keep] + ["window", "t_start_s", "clip"],
            )

    schema = T.StructType(
        keep
        + [
            T.StructField("window", T.IntegerType()),
            T.StructField("t_start_s", T.FloatType()),
            T.StructField("clip", T.BinaryType()),
        ]
    )
    return df.mapInPandas(_sample, schema)


# -------------------------------------------------------- fingerprint


def audio_fingerprint64(
    x: np.ndarray, sr: int, frame_len: int = 1024, hop: int = 512, n_mels: int = 16
) -> int:
    """64-bit perceptual audio fingerprint — the audio analog of image
    dHash (chromaprint-style, public construction): log-mel energies
    over 16 bands, averaged into 4 time segments, then one bit per
    (segment, band-neighbor) energy-gradient comparison + one bit per
    (segment-neighbor, band) temporal gradient. Robust to re-encoding,
    resampling, and gain changes (gradients ignore absolute level);
    discriminative across different material.

    Returned as a SIGNED 64-bit int (Spark LongType two's complement).

    Input is first resampled to a fixed internal 8 kHz so fingerprints
    are comparable ACROSS sample rates (the mel filterbank spans sr/2 —
    without a canonical rate, the same material at 8 k and 16 k hashes
    different band layouts; chromaprint does the same with 11025 Hz).
    """
    if sr != 8000:
        x = resample_linear(np.asarray(x, dtype=np.float32), sr, 8000)
        sr = 8000
    mel = log_mel_spectrogram(x, sr, frame_len, hop, n_mels)
    if mel.shape[0] == 0:
        return 0
    # collapse time into 4 equal segments (handles any clip length)
    edges = (np.arange(5) * mel.shape[0] // 4).astype(int)
    segs = np.stack(
        [
            mel[edges[i] : max(edges[i + 1], edges[i] + 1)].mean(axis=0)
            for i in range(4)
        ]
    )  # (4, n_mels)
    spectral = (segs[:, :-1] > segs[:, 1:]).reshape(-1)  # 4 × 15 = 60 bits
    temporal = (segs[:-1, 0:4] > segs[1:, 0:4]).reshape(-1)  # 3 × 4 = 12 → take 4
    bits = np.concatenate([spectral, temporal[:4]])  # 64 bits
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_dhash(
    df: DataFrame, content_col: str = "content", key_col: str = "image"
) -> DataFrame:
    """Binary WAV column → (audio, duration_s, afp) 64-bit fingerprint,
    map-side. Near-dup pairs come from the same pigeonhole machinery as
    text/image: `functions.sketches.hamming_blocked_pairs` over
    (audio, afp) — the full multimodal dedup trio rides one join shape."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, buf in zip(pdf[key_col], pdf[content_col]):
                x, sr = decode_audio_bytes(bytes(buf))
                x1 = downmix_mono(x)
                rows.append(
                    {
                        "audio": key,
                        "duration_s": float(x1.size / max(sr, 1)),
                        "afp": audio_fingerprint64(x1, sr),
                    }
                )
            yield pd.DataFrame(rows, columns=["audio", "duration_s", "afp"])

    schema = T.StructType(
        [
            T.StructField("audio", T.StringType()),
            T.StructField("duration_s", T.FloatType()),
            T.StructField("afp", T.LongType()),
        ]
    )
    return df.mapInPandas(_fp, schema)
