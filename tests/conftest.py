"""Test harness config: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's plan: multi-device tests run on
xla_force_host_platform_device_count fake-device meshes.

NOTE: this image pre-imports jax via a sitecustomize (TPU tunnel), so setting
env vars here is too late for the import — we also update jax.config, which
takes effect because backends initialize lazily at first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep matmuls in f32 even if a TPU-ish default leaks through.
jax.config.update("jax_default_matmul_precision", "highest")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
