"""Tests: Ogg container layer + Ogg-FLAC demux (`sources/ogg.py`) —
page CRC, lacing/packet reassembly (incl. 255-continuation across
pages), mapping header handling, end-to-end decode through the in-repo
FLAC codec, and the boundary for perceptual payloads."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources import flac as eflac
from social_media_data_pipeline_spark.sources import ogg as eogg
from social_media_data_pipeline_spark.sources.audio import decode_audio_bytes


def _tone(n=9000, sr=8000, ch=2):
    t = np.arange(n) / sr
    left = 0.5 * np.sin(2 * np.pi * 220 * t)
    right = 0.3 * np.sin(2 * np.pi * 330 * t)
    return np.stack([left, right], axis=1)[:, :ch], sr


class TestOggPages:
    def test_roundtrip_small_packets(self):
        x, sr = _tone()
        native = eflac.encode_flac(x, sr, block_size=1024)
        wrapped = eogg.encode_ogg_flac(native)
        assert wrapped[:4] == b"OggS"
        assert eogg.sniff_codec(wrapped) == "flac"
        assert eogg.ogg_flac_to_native(wrapped) == native

    def test_crc_detects_corruption(self):
        x, sr = _tone(n=2000)
        wrapped = eogg.encode_ogg_flac(eflac.encode_flac(x, sr, block_size=1024))
        bad = bytearray(wrapped)
        bad[-1] ^= 0x01  # flip a body byte of the last page
        with pytest.raises(ValueError, match="CRC"):
            eogg.parse_pages(bytes(bad))

    def test_packet_spanning_pages(self):
        """A frame packet far larger than one page's segment budget
        must reassemble across 255-lacing continuation pages."""
        x, sr = _tone(n=20000)
        native = eflac.encode_flac(x, sr, block_size=16384)  # one big frame
        frames = eflac.split_frames(native)
        assert len(frames) >= 1 and max(len(f) for f in frames) > 255 * 40
        wrapped = eogg.encode_ogg_flac(native, page_audio_packets=1)
        assert eogg.ogg_flac_to_native(wrapped) == native

    def test_decode_matches_native_decode(self):
        x, sr = _tone()
        native = eflac.encode_flac(x, sr, block_size=1024)
        wrapped = eogg.encode_ogg_flac(native)
        got, got_sr = eogg.decode_ogg(wrapped)
        want, want_sr = eflac.decode_flac(native)
        assert got_sr == want_sr
        np.testing.assert_array_equal(got, want)

    def test_audio_dispatch_handles_ogg_flac(self):
        x, sr = _tone(n=3000)
        wrapped = eogg.encode_ogg_flac(eflac.encode_flac(x, sr, block_size=1024))
        got, got_sr = decode_audio_bytes(wrapped)
        assert got_sr == sr and got.shape[0] == 3000

    def test_vorbis_payload_is_documented_boundary(self):
        # minimal single-page stream whose first packet is a Vorbis id header
        page = eogg._emit_page(7, 0, 0, 0x2, [b"\x01vorbis" + b"\x00" * 23], False)
        assert eogg.sniff_codec(page) == "vorbis"
        with pytest.raises(NotImplementedError, match="perceptual"):
            eogg.decode_ogg(page)

    def test_split_frames_reassembles_stream(self):
        x, sr = _tone()
        native = eflac.encode_flac(x, sr, block_size=1024)
        frames = eflac.split_frames(native)
        assert len(frames) == (9000 + 1023) // 1024
        info = eflac.flac_info(native)
        assert native[info["frames_offset"]:] == b"".join(frames)


class TestOversizedPackets:
    """r7: a packet whose lacing exceeds one page's 255-entry table
    must split across pages (continued path), not raise struct.error."""

    def test_emit_page_rejects_overlong_lacing(self):
        big = b"x" * (70 * 1024)  # 70 KB → 281 lacing entries
        with pytest.raises(ValueError, match="255"):
            eogg._emit_page(1, 0, 0, 0, [big], False)

    def test_paginate_splits_and_reassembles(self):
        rng = np.random.default_rng(7)
        packets = [
            bytes(rng.integers(0, 256, 70 * 1024, dtype=np.uint8)),  # > 1 page
            b"small",
            bytes(rng.integers(0, 256, 200 * 1024, dtype=np.uint8)),  # ~4 pages
        ]
        pages: list[bytes] = []
        eogg._paginate_packets(pages, 42, 0, packets, eos=True)
        assert len(pages) >= 4
        parsed = eogg.parse_pages(b"".join(pages))
        # continuation pages carry the continued flag
        assert any(p.header_type & 0x1 for p in parsed)
        assert eogg.assemble_packets(parsed) == packets

    def test_packet_ending_on_page_boundary(self):
        # exactly fills one page's lacing open-chunk path: 255*255 bytes
        p = b"y" * (255 * 255)
        pages: list[bytes] = []
        eogg._paginate_packets(pages, 1, 0, [p, b"tail"], eos=True)
        parsed = eogg.parse_pages(b"".join(pages))
        assert eogg.assemble_packets(parsed) == [p, b"tail"]

    def test_encode_ogg_flac_large_packet_path(self):
        # force the paginator through encode_ogg_flac with many packets
        # per page so the group lacing overflows 255 entries
        x, sr = _tone(n=300000, ch=1)
        native = eflac.encode_flac(x, sr, block_size=4096)
        wrapped = eogg.encode_ogg_flac(native, page_audio_packets=300)
        assert eogg.ogg_flac_to_native(wrapped) == native
