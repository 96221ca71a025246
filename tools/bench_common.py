"""Shared bench-scene builders used by bench.py and the variant sweep.

tools/bench_r3_variants.py exists to validate bench.py's configuration
choices verbatim, so the scene/camera construction must be a single
definition — a drifting copy would make the sweep measure something other
than what the bench reports.
"""

from __future__ import annotations

import numpy as np


def orbit4_cameras(w: int, h: int, f: float, z: float = 6.0,
                   dx: float = 0.01):
    """Four x-shifted cameras around the bench viewpoint (the batched
    visualizer-loop measurement: 4 cached playback frames per dispatch)."""
    from dynamic3dgaussians_tpu.ops.camera import make_camera, stack_cameras
    cams = []
    for i in range(4):
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = z
        w2c[0, 3] = dx * i
        cams.append(make_camera(
            w, h, [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], w2c))
    return stack_cameras(cams)
