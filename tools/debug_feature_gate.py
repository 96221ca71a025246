"""Diagnose the round-4 gate FAIL on golden_render_feature_field.npz.

The compiled-Mosaic render of the feature scene misses the frozen CPU
fixture by up to 3.8e-2 on ~50% of RGB pixels (all configs equally),
while the two non-feature scenes pass at 5e-4 — so the divergence rides
the extra-channel (wide record table) path only. This script renders the
scene on the real TPU and prints the error structure: per-output-channel
max error, per-tile spatial structure, and an A/B with extra_channels
stripped (same scene, narrow table) to isolate whether table width alone
flips the result.
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from test_golden_fixtures import _render_both

fx = dict(np.load("tests/fixtures/golden_render_feature_field.npz"))

out, grads = _render_both(fx, "pallas")
rgb = np.asarray(out.rgb)
err = np.abs(rgb - fx["rgb"])
print("rgb err: max", err.max(), "mean", err.mean(),
      "frac>5e-4", (err > 5e-4).mean())
print("alpha err max:", np.abs(np.asarray(out.alpha) - fx["alpha"]).max())
print("depth err max:", np.abs(np.asarray(out.depth) - fx["depth"]).max())
if out.extra is not None:
    print("extra err max:", np.abs(np.asarray(out.extra) - fx["extra"]).max())

# spatial structure: max error per 16x16 tile (crop to multiples of 16 so
# a non-divisible fixture can't abort the diagnostic before the A/B below)
h, w = err.shape[:2]
em = err.max(axis=2)[: h - h % 16, : w - w % 16]
tiles = em.reshape(em.shape[0] // 16, 16, em.shape[1] // 16, 16).max(
    axis=(1, 3))
print("per-tile max err:")
for r in tiles:
    print(" ".join(f"{v:8.1e}" for v in r))

# A/B: same scene without extra channels (narrow record table)
fx2 = dict(fx)
del fx2["extra_in"], fx2["extra"]
out2, _ = _render_both(fx2, "pallas")
err2 = np.abs(np.asarray(out2.rgb) - fx["rgb"])
print("rgb err WITHOUT extras: max", err2.max(), "frac>5e-4",
      (err2 > 5e-4).mean())
