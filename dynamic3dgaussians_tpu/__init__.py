"""dynamic3dgaussians_tpu — TPU-native dynamic 3D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ImNotPrepared/Dynamic3DGaussians (PyTorch + CUDA reference): differentiable
tile-based Gaussian rasterization with RGB / depth / alpha / semantic-feature
outputs, the per-timestep dynamic training loop with densification and the
rigidity-family regularizers, k-NN graphs, evaluation metrics, checkpointing
and visualization — designed TPU-first (static shapes, MXU-friendly
compositing, shard_map multi-chip scaling) rather than as a port.

Layer map (mirrors SURVEY.md §1, rebuilt idiomatically):
  ops/       L0/L1: projection, binning, compositing kernels (XLA + Pallas)
  models/    L2: Gaussian parameter tables (capacity-padded), motion bases
  train/     L3: losses, Adam with moment surgery, densify, timestep driver
  parallel/  multi-device meshes: camera-DP, pixel-sharded rendering
  data/      dataset readers (reference train_meta.json layout) + synthetic
  eval/      L4: PSNR/SSIM/LPIPS-style metrics, tracking PCK, mask IoU, pose
  viz/       L5: offline renders, PLY/npz export compatible with reference
"""

__version__ = "0.1.0"

from dynamic3dgaussians_tpu.ops.camera import Camera, make_camera  # noqa: F401
from dynamic3dgaussians_tpu.ops.rasterize import render, RenderOutput  # noqa: F401
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig  # noqa: F401
from dynamic3dgaussians_tpu.ops.playback import (  # noqa: F401
    PlaybackCache, build_cache, render_playback)
