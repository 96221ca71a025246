"""CLIP encoder wrapper (reference utils/clip_utils.py parity).

The reference wraps an OpenAI CLIP image/text encoder for feature-field
experiments (utils/clip_utils.py:8-58). Here the encoder loads through
`transformers` when its pretrained weights are available on disk; this
zero-egress image cannot download them, so construction raises a clear
error and everything downstream treats the encoder as a pluggable
`encode_image/encode_text` pair (the same contract data.features uses for
its extractor).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def make_clip_encoders(model_name: str = "openai/clip-vit-base-patch32"
                       ) -> Tuple[Callable, Callable]:
    """Returns (encode_image(img01 HxWx3) -> (D,), encode_text(str) -> (D,)).

    Requires transformers + the pretrained checkpoint on disk.
    """
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor
        model = CLIPModel.from_pretrained(model_name)
        proc = CLIPProcessor.from_pretrained(model_name)
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            f"CLIP unavailable ({e}); supply your own encode fns "
            "(zero-egress environments cannot fetch pretrained weights)")
    model.eval()

    def encode_image(img01: np.ndarray) -> np.ndarray:
        import torch
        with torch.no_grad():
            inp = proc(images=(np.asarray(img01) * 255).astype(np.uint8),
                       return_tensors="pt")
            f = model.get_image_features(**inp)[0]
        return (f / f.norm()).numpy()

    def encode_text(text: str) -> np.ndarray:
        import torch
        with torch.no_grad():
            inp = proc(text=[text], return_tensors="pt", padding=True)
            f = model.get_text_features(**inp)[0]
        return (f / f.norm()).numpy()

    return encode_image, encode_text


def similarity_map(feature_map: np.ndarray, text_feature: np.ndarray
                   ) -> np.ndarray:
    """(H, W, D) rendered feature map x (D,) text embedding -> (H, W)
    cosine-similarity heatmap (the reference's language-query use)."""
    fm = np.asarray(feature_map, np.float32)
    fm = fm / np.maximum(np.linalg.norm(fm, axis=-1, keepdims=True), 1e-9)
    t = np.asarray(text_feature, np.float32)
    t = t / max(np.linalg.norm(t), 1e-9)
    return fm @ t
