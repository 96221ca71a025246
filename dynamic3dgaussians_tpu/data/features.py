"""Offline dense-feature extraction pipeline (DINOv2-style) for feature fields.

Capability parity with the reference's `feature_rendering/get_features.py`
(SURVEY.md P13): per-frame dense ViT patch features blended from an
overlapping multi-crop pyramid, a GLOBAL PCA fit to `out_dim` (32) channels,
and per-frame .npy dumps that the feature-field trainers consume as GT maps
(reference dyn_train.py:63-65, sanity_feature.py:442).

The feature extractor itself is pluggable: any
`extract_fn(image (h, w, 3) float[0,1]) -> (h//patch, w//patch, F)` works.
`make_dinov2_extractor` builds one from torch-hub DINOv2 when its weights are
available (reference get_features.py:194 uses ViT-S/14-reg); this zero-egress
environment cannot download them, so the pyramid/PCA machinery is fully
testable with a synthetic extractor instead.

All pyramid/PCA math is numpy (offline data prep, not the TPU hot path).
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def multicrop_boxes(h: int, w: int, crop: int, overlap: float = 0.5
                    ) -> List[Tuple[int, int]]:
    """Top-left corners of overlapping square crops covering (h, w).

    Mirrors the overlapping crop enumeration of get_features.py:20-70:
    stride = crop * (1 - overlap), final row/col snapped to the border.
    """
    stride = max(1, int(crop * (1.0 - overlap)))

    def starts(size):
        ss = list(range(0, max(size - crop, 0) + 1, stride))
        if not ss or ss[-1] != size - crop:
            ss.append(max(size - crop, 0))
        return sorted(set(ss))

    return [(y, x) for y in starts(h) for x in starts(w)]


def _bilinear_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Minimal bilinear resize (numpy; avoids a cv2/PIL dependency here)."""
    h, w = img.shape[:2]
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    v = img if img.ndim == 3 else img[..., None]
    out = ((1 - fy) * (1 - fx) * v[y0][:, x0]
           + (1 - fy) * fx * v[y0][:, x1]
           + fy * (1 - fx) * v[y1][:, x0]
           + fy * fx * v[y1][:, x1])
    return out if img.ndim == 3 else out[..., 0]


def blend_feature_pyramid(image: np.ndarray, extract_fn: Callable,
                          crop_sizes: Sequence[int] = (224, 448),
                          out_hw: Optional[Tuple[int, int]] = None,
                          overlap: float = 0.5) -> np.ndarray:
    """Dense (H', W', F) feature map from overlapping multi-scale crops.

    For each crop size, extract patch features per crop, bilinearly upsample
    each crop's features to its pixel footprint, and average overlapping
    contributions (get_features.py:72-135 blending).
    """
    h, w = image.shape[:2]
    oh, ow = out_hw or (h, w)
    acc: Optional[np.ndarray] = None
    weight = np.zeros((oh, ow, 1), np.float32)
    sy, sx = oh / h, ow / w
    for crop in crop_sizes:
        c = min(crop, h, w)
        for (y, x) in multicrop_boxes(h, w, c, overlap):
            feats = extract_fn(image[y:y + c, x:x + c])
            f = np.asarray(feats, np.float32)
            oy0, ox0 = int(round(y * sy)), int(round(x * sx))
            oy1, ox1 = int(round((y + c) * sy)), int(round((x + c) * sx))
            up = _bilinear_resize(f, max(oy1 - oy0, 1), max(ox1 - ox0, 1))
            if acc is None:
                acc = np.zeros((oh, ow, up.shape[-1]), np.float32)
            acc[oy0:oy1, ox0:ox1] += up
            weight[oy0:oy1, ox0:ox1] += 1.0
    assert acc is not None, "no crops produced features"
    return acc / np.maximum(weight, 1.0)


class GlobalPCA:
    """Global PCA to `out_dim` channels, fit across all frames
    (get_features.py:276-320: fit once, apply per frame, persist as pkl)."""

    def __init__(self, out_dim: int = 32):
        self.out_dim = out_dim
        self.mean: Optional[np.ndarray] = None
        self.components: Optional[np.ndarray] = None   # (F, out_dim)

    def fit(self, feature_maps: Sequence[np.ndarray],
            max_samples: int = 200_000, seed: int = 0) -> "GlobalPCA":
        x = np.concatenate([fm.reshape(-1, fm.shape[-1])
                            for fm in feature_maps], 0)
        if x.shape[0] > max_samples:
            idx = np.random.RandomState(seed).choice(
                x.shape[0], max_samples, replace=False)
            x = x[idx]
        self.mean = x.mean(0, keepdims=True)
        xc = x - self.mean
        # SVD of the covariance (F x F — F is ~384 for ViT-S)
        cov = xc.T @ xc / max(x.shape[0] - 1, 1)
        eigval, eigvec = np.linalg.eigh(cov)
        order = np.argsort(eigval)[::-1][:self.out_dim]
        self.components = eigvec[:, order].astype(np.float32)
        return self

    def transform(self, feature_map: np.ndarray) -> np.ndarray:
        assert self.components is not None, "fit() first"
        shape = feature_map.shape[:-1]
        x = feature_map.reshape(-1, feature_map.shape[-1]) - self.mean
        return (x @ self.components).reshape(*shape, self.out_dim)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump({"mean": self.mean, "components": self.components,
                         "out_dim": self.out_dim}, f)

    @classmethod
    def load(cls, path: str) -> "GlobalPCA":
        with open(path, "rb") as f:
            d = pickle.load(f)
        pca = cls(d["out_dim"])
        pca.mean, pca.components = d["mean"], d["components"]
        return pca


def extract_sequence(images: Sequence[np.ndarray], extract_fn: Callable,
                     out_dir: str, out_dim: int = 32,
                     crop_sizes: Sequence[int] = (224,),
                     out_hw: Optional[Tuple[int, int]] = None,
                     masks: Optional[Sequence[np.ndarray]] = None
                     ) -> GlobalPCA:
    """Full offline pipeline: pyramid-blend every frame, fit ONE global PCA,
    save `{i:05d}.npy` reduced maps + `pca.pkl` (get_features.py layout).

    `masks` optionally zero out background features before the PCA fit
    (the SAM-masked variant, get_features.py:169-185).
    """
    os.makedirs(out_dir, exist_ok=True)
    maps = []
    for i, im in enumerate(images):
        fm = blend_feature_pyramid(np.asarray(im, np.float32), extract_fn,
                                   crop_sizes=crop_sizes, out_hw=out_hw)
        if masks is not None:
            m = np.asarray(masks[i], np.float32)
            if m.shape[:2] != fm.shape[:2]:
                m = _bilinear_resize(m, fm.shape[0], fm.shape[1])
            fm = fm * (m[..., None] if m.ndim == 2 else m)
        maps.append(fm)
    pca = GlobalPCA(out_dim).fit(maps)
    for i, fm in enumerate(maps):
        np.save(os.path.join(out_dir, f"{i:05d}.npy"),
                pca.transform(fm).astype(np.float32))
    pca.save(os.path.join(out_dir, "pca.pkl"))
    return pca


def load_feature_map(out_dir: str, frame: int) -> np.ndarray:
    return np.load(os.path.join(out_dir, f"{frame:05d}.npy"))


def make_dinov2_extractor(model_name: str = "dinov2_vits14_reg",
                          patch: int = 14, model=None) -> Callable:
    """DINOv2 patch-feature extractor via torch hub (get_features.py:194).

    Requires the pretrained weights on disk (zero-egress environments cannot
    download them) — raises a clear error otherwise. `model` injects a
    ready torch module exposing DINOv2's `forward_features` contract
    (golden tests drive the wrapper's normalization/crop/layout conventions
    through a stub this way).
    """
    if model is None:
        try:
            import torch
            model = torch.hub.load("facebookresearch/dinov2", model_name)
        except Exception as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                f"DINOv2 unavailable ({e}); pass a custom extract_fn instead")
    model.eval()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def extract_fn(image: np.ndarray) -> np.ndarray:
        import torch
        h, w = image.shape[:2]
        ch, cw = (h // patch) * patch, (w // patch) * patch
        x = (image[:ch, :cw] - mean) / std
        t = torch.from_numpy(x.transpose(2, 0, 1))[None]
        with torch.no_grad():
            tokens = model.forward_features(t)["x_norm_patchtokens"][0]
        return tokens.reshape(ch // patch, cw // patch, -1).numpy()

    return extract_fn
