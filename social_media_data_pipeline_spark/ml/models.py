"""Pluggable model interfaces + deterministic offline stubs (F1-F5).

The reference runs real models in-process: spaCy langdetect
(`Translator.py:67-94`), GoogleTranslator (`Translator.py:96-145`),
Places365 ResNet (`ImageLabeler.py:96-158`), cv2 face pixelation
(`anonymization/anonymize_face.py:18-69`), DIR feature extraction
(`DIRAdapter.py:20-76`). None of those libraries ship in this container,
so each model is an interface with a deterministic stub: the Spark-side
plumbing (schemas, batching, per-executor lazy init) is real and tested,
and a production deployment swaps the stub for the real weights without
touching any operator code.

Stubs are keyed on md5 of the input so results are stable across runs,
engines, and partitionings.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

PLACES365_SAMPLE = [
    "museum/indoor",
    "art_gallery",
    "castle",
    "beach",
    "street",
    "park",
    "restaurant",
    "library/indoor",
    "bridge",
    "mountain",
]


def _digest_floats(key: bytes, n: int, salt: str = "") -> list[float]:
    """n floats in [0,1) from iterated md5 — deterministic everywhere."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.md5(salt.encode() + key + counter.to_bytes(4, "big")).digest()
        for i in range(0, 16, 4):
            if len(out) >= n:
                break
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
        counter += 1
    return out


@dataclass
class StubSceneLabeler:
    """F3 stand-in for Places365 ResNet (`ImageLabeler.py:96-158`):
    top-5 [category, confidence] pairs + top-1, from an md5-keyed
    pseudo-softmax over a fixed label set."""

    categories: tuple[str, ...] = tuple(PLACES365_SAMPLE)
    top_k: int = 5

    def predict(self, content: bytes) -> tuple[list[tuple[str, float]], str]:
        raw = _digest_floats(content, len(self.categories), salt="scene")
        exp = [math.exp(4 * x) for x in raw]
        z = sum(exp)
        probs = sorted(
            ((c, round(e / z, 6)) for c, e in zip(self.categories, exp)),
            key=lambda t: (-t[1], t[0]),
        )
        top = probs[: self.top_k]
        return top, top[0][0]


@dataclass
class StubFeatureExtractor:
    """F5 stand-in for DIR ResNet101-AP-GeM (`DIRAdapter.py:20-76`):
    md5-keyed unit vector of `dim` floats (L2-normalized like DIR)."""

    dim: int = 2048

    def extract(self, content: bytes) -> list[float]:
        raw = [x - 0.5 for x in _digest_floats(content, self.dim, salt="feat")]
        norm = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [round(x / norm, 8) for x in raw]


@dataclass
class StubFaceAnonymizer:
    """F4 stand-in for cv2 DNN face pixelation
    (`anonymization/anonymize_face.py:18-69`). Real decode/pixelate needs
    cv2 (absent here) — the stub tags the payload so the binary→binary
    contract and sink plumbing are testable end-to-end."""

    marker: bytes = b"ANON:"

    def anonymize(self, content: bytes) -> bytes:
        if content.startswith(self.marker):
            return content  # idempotent, like skip-if-already-processed
        return self.marker + content

    def decode_real(self, content: bytes) -> bytes:
        raise NotImplementedError(
            "real face anonymization requires cv2 (not in this container); "
            "swap StubFaceAnonymizer for a cv2-backed implementation"
        )


@dataclass
class HeuristicLangDetector:
    """F1 stand-in for spaCy langdetect (`Translator.py:67-94`): stopword
    overlap vote; returns (lang, score) with the reference's 'empty'
    sentinel for blank text (`Translator.py:78-79`)."""

    def detect(self, text: str | None) -> tuple[str, float]:
        from social_media_data_pipeline_spark.functions.text import STOPWORDS

        if text is None or not len(text) or text.isspace():
            return "empty", 1.0
        toks = text.lower().split()
        best_lang, best_hits = "und", 0
        for lang in sorted(STOPWORDS):
            hits = sum(1 for t in toks if t in STOPWORDS[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        score = min(1.0, best_hits / max(len(toks), 1) * 3) if best_hits else 0.0
        return best_lang, round(score, 6)


@dataclass
class StubTranslator:
    """F2 stand-in for GoogleTranslator (`Translator.py:96-145`):
    deterministic tagged passthrough; raises on >5k chars like the real
    API limit (`Translator.py:100`)."""

    target_language: str = "en"
    max_chars: int = 5000

    def translate(self, text: str) -> str:
        if len(text) >= self.max_chars:
            raise ValueError("text too long to translate")
        return f"[{self.target_language}] {text}"
