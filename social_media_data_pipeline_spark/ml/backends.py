"""Opt-in REAL model backends behind the F1-F5 interfaces (ml/models.py).

Each class here reproduces one of the reference's in-process models with
the same predict/extract/anonymize/translate contract as its stub, so a
deployment swaps backends by passing a different ``*_factory`` to the
same operators (`ml/inference.py`) or stage params (`plans/stages.py`)
— zero operator-code changes:

- ``TorchSceneLabeler``  ≙ Places365 ResNet top-5 scene labeling
  (`Preprocessing/ImageLabeling/ImageLabeler.py:96-158`)
- ``Cv2FaceAnonymizer``  ≙ res10 SSD face detect + NxN mean-pixelation
  (`Preprocessing/ImageAnonymization/anonymization/anonymize_face.py:18-69`)
- ``TorchFeatureExtractor`` ≙ DIR-style global image descriptor, GeM
  pooled + L2-normalized (`Preprocessing/FeatureVectors/DIRAdapter.py:20-76`)
- ``DeepTranslatorBackend`` ≙ GoogleTranslator with the 5k-char API
  limit (`Preprocessing/Translation/Translator.py:96-145`)

None of torch/torchvision/PIL/cv2/deep_translator ship in this
container, so every heavy import happens lazily inside ``__init__`` /
first call and raises a clear ImportError when absent; the module itself
always imports. ``resolve_*_factory`` helpers pick the real backend only
when its env var points at an existing model file AND the import
succeeds — otherwise the deterministic stub, so CI and offline runs
never break. The factories are executor-side lazy singletons via
`inference._get_model`, exactly like the stubs (one model per Python
worker, never per row).

Env vars (all optional):
  SMDP_PLACES365_WEIGHTS  path to resnet18_places365.pth.tar-style checkpoint
  SMDP_PLACES365_CLASSES  path to categories_places365.txt
  SMDP_FACE_PROTOTXT      path to deploy.prototxt
  SMDP_FACE_WEIGHTS       path to res10_300x300_ssd_iter_140000.caffemodel
  SMDP_TRANSLATE_ONLINE   "1" to use deep_translator (needs network)
"""

from __future__ import annotations

import io
import os
from typing import Any, Callable

from . import models


def _require(module: str, extra: str = ""):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:  # pragma: no cover - exercised only without deps
        raise ImportError(
            f"backend needs '{module}' which is not installed{extra}; "
            f"install it or keep the deterministic stub"
        ) from e


class TorchSceneLabeler:
    """Places365 CNN scene labeler (`ImageLabeler.py:96-158` parity).

    predict(content: bytes) -> ([(category, confidence) x top_k], top1)
    — identical contract to `models.StubSceneLabeler.predict`.
    """

    def __init__(
        self,
        weights_path: str,
        categories_path: str,
        arch: str = "resnet18",
        top_k: int = 5,
    ):
        torch = _require("torch")
        tv_models = _require("torchvision.models")
        trn = _require("torchvision.transforms")
        self._torch = torch
        self._pil_image = _require("PIL.Image")
        model = tv_models.__dict__[arch](num_classes=365)
        checkpoint = torch.load(
            weights_path, map_location=lambda storage, loc: storage
        )
        state_dict = {
            k.replace("module.", ""): v for k, v in checkpoint["state_dict"].items()
        }
        model.load_state_dict(state_dict)
        model.eval()
        self._model = model
        # same transform chain as the reference (Resize 256 → CenterCrop
        # 224 → ImageNet normalize)
        self._tf = trn.Compose(
            [
                trn.Resize((256, 256)),
                trn.CenterCrop(224),
                trn.ToTensor(),
                trn.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
            ]
        )
        # classes file lines look like "/a/airfield 0" → "airfield"
        classes = []
        with open(categories_path) as fh:
            for line in fh:
                classes.append(line.strip().split(" ")[0][3:])
        self.categories = tuple(classes)
        self.top_k = top_k

    def predict(self, content: bytes) -> tuple[list[tuple[str, float]], str]:
        torch = self._torch
        img = self._pil_image.open(io.BytesIO(content)).convert("RGB")
        with torch.no_grad():
            logit = self._model(self._tf(img).unsqueeze(0))
            h_x = torch.nn.functional.softmax(logit, 1).squeeze()
            probs, idx = h_x.sort(0, True)
        top = [
            (self.categories[int(idx[i])], float(probs[i])) for i in range(self.top_k)
        ]
        return top, top[0][0]


class TorchFeatureExtractor:
    """DIR-style global descriptor (`DIRAdapter.py:20-76` parity): a
    torchvision backbone, generalized-mean (GeM) pooled over the last
    conv map, L2-normalized — the AP-GeM recipe from the public
    "Learning with Average Precision" paper the DIR package implements.

    extract(content: bytes) -> list[float]  (unit L2 norm), identical
    contract to `models.StubFeatureExtractor.extract`.
    """

    def __init__(self, arch: str = "resnet18", gem_p: float = 3.0):
        torch = _require("torch")
        tv_models = _require("torchvision.models")
        trn = _require("torchvision.transforms")
        self._torch = torch
        self._pil_image = _require("PIL.Image")
        backbone = tv_models.__dict__[arch](weights="DEFAULT")
        # drop avgpool+fc: keep the conv feature map for GeM pooling
        self._features = torch.nn.Sequential(*list(backbone.children())[:-2])
        self._features.eval()
        self.gem_p = gem_p
        self._tf = trn.Compose(
            [
                trn.Resize((224, 224)),
                trn.ToTensor(),
                trn.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
            ]
        )

    def extract(self, content: bytes) -> list[float]:
        torch = self._torch
        img = self._pil_image.open(io.BytesIO(content)).convert("RGB")
        with torch.no_grad():
            fmap = self._features(self._tf(img).unsqueeze(0))  # 1 x C x H x W
            p = self.gem_p
            gem = fmap.clamp(min=1e-6).pow(p).mean(dim=(2, 3)).pow(1.0 / p)
            vec = torch.nn.functional.normalize(gem, dim=1).squeeze(0)
        return [float(x) for x in vec]


class Cv2FaceAnonymizer:
    """res10 SSD face detection + NxN mean-block pixelation
    (`anonymize_face.py:18-69` parity, including the blocks=3 default
    and the >confidence threshold).

    anonymize(content: bytes) -> bytes — identical contract to
    `models.StubFaceAnonymizer.anonymize`. Re-encodes as PNG
    (lossless) rather than the reference's in-place JPEG overwrite.
    """

    def __init__(
        self,
        prototxt_path: str,
        weights_path: str,
        confidence: float = 0.5,
        blocks: int = 3,
    ):
        cv2 = _require("cv2")
        self._cv2 = cv2
        self._np = _require("numpy")
        self._net = cv2.dnn.readNet(prototxt_path, weights_path)
        self.confidence = confidence
        self.blocks = blocks

    def _pixelate(self, face):
        # NxN grid, each cell painted with its mean color — same visual
        # contract as the reference's linspace/rectangle loop, vectorized
        np = self._np
        h, w = face.shape[:2]
        ys = np.linspace(0, h, self.blocks + 1, dtype=int)
        xs = np.linspace(0, w, self.blocks + 1, dtype=int)
        for i in range(self.blocks):
            for j in range(self.blocks):
                roi = face[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
                if roi.size:
                    face[ys[i] : ys[i + 1], xs[j] : xs[j + 1]] = roi.mean(
                        axis=(0, 1)
                    ).astype(face.dtype)
        return face

    def anonymize(self, content: bytes) -> bytes:
        cv2, np = self._cv2, self._np
        image = cv2.imdecode(np.frombuffer(content, np.uint8), cv2.IMREAD_COLOR)
        if image is None:
            return content  # not decodable — pass through unchanged
        h, w = image.shape[:2]
        blob = cv2.dnn.blobFromImage(image, 1.0, (300, 300), (104.0, 177.0, 123.0))
        self._net.setInput(blob)
        detections = self._net.forward()
        for i in range(detections.shape[2]):
            if detections[0, 0, i, 2] > self.confidence:
                box = detections[0, 0, i, 3:7] * np.array([w, h, w, h])
                x0, y0, x1, y1 = box.astype(int)
                x0, y0 = max(x0, 0), max(y0, 0)
                if x1 > x0 and y1 > y0:
                    image[y0:y1, x0:x1] = self._pixelate(image[y0:y1, x0:x1])
        ok, buf = cv2.imencode(".png", image)
        return buf.tobytes() if ok else content


class DeepTranslatorBackend:
    """Online translation via deep_translator's GoogleTranslator
    (`Translator.py:96-145` parity: same 5k-char API limit, same
    target-language knob).

    translate(text: str) -> str — identical contract to
    `models.StubTranslator.translate` (raises ValueError past the
    limit, like the reference's length guard at `Translator.py:100`).
    """

    def __init__(self, target_language: str = "en", max_chars: int = 5000):
        dt = _require("deep_translator", extra=" (network-backed)")
        self._translator = dt.GoogleTranslator(source="auto", target=target_language)
        self.target_language = target_language
        self.max_chars = max_chars

    def translate(self, text: str) -> str:
        if len(text) >= self.max_chars:
            raise ValueError("text too long to translate")
        return self._translator.translate(text)


# ---------------------------------------------------------------------------
# env-driven resolution: real backend when configured AND importable,
# deterministic stub otherwise. Each returns a zero-arg picklable factory
# suitable for inference.*_udf / stage params.
# ---------------------------------------------------------------------------


def _files_exist(*paths: str | None) -> bool:
    return all(p and os.path.isfile(p) for p in paths)


def resolve_scene_labeler_factory() -> Callable[[], Any]:
    weights = os.environ.get("SMDP_PLACES365_WEIGHTS")
    classes = os.environ.get("SMDP_PLACES365_CLASSES")
    if _files_exist(weights, classes):
        return lambda: TorchSceneLabeler(weights, classes)
    return models.StubSceneLabeler


def resolve_face_anonymizer_factory() -> Callable[[], Any]:
    proto = os.environ.get("SMDP_FACE_PROTOTXT")
    weights = os.environ.get("SMDP_FACE_WEIGHTS")
    if _files_exist(proto, weights):
        return lambda: Cv2FaceAnonymizer(proto, weights)
    return models.StubFaceAnonymizer


def resolve_feature_extractor_factory(dim: int = 2048) -> Callable[[], Any]:
    if os.environ.get("SMDP_DIR_FEATURES") == "1":
        return lambda: TorchFeatureExtractor()
    return lambda: models.StubFeatureExtractor(dim=dim)


def resolve_translator_factory(target_language: str = "en") -> Callable[[], Any]:
    if os.environ.get("SMDP_TRANSLATE_ONLINE") == "1":
        return lambda: DeepTranslatorBackend(target_language=target_language)
    return lambda: models.StubTranslator(target_language=target_language)
