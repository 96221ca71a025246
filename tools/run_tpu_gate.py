"""Run the compiled-kernel golden gate on the real TPU.

tests/conftest.py forces the CPU backend for the whole pytest suite, so the
TPU-only fixture test never sees the chip under normal CI. This runner
executes the same checks against the default (TPU) backend directly:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/run_tpu_gate.py

Exits nonzero on any budget violation (budgets: tests/fixtures/TOLERANCES.md).
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def main():
    import jax
    if jax.default_backend() != "tpu":
        print(f"backend is {jax.default_backend()!r}, not tpu — aborting")
        return 2
    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_golden_fixtures import _check, _render_both

    fixtures = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "golden_render_*.npz")))
    assert fixtures, "no fixtures; run tools/make_golden_fixtures.py"
    failed = 0
    for path in fixtures:
        name = os.path.basename(path)
        fx = dict(np.load(path))
        try:
            out, grads = _render_both(fx, "pallas")
            _check(fx, out, grads, atol_rgb=5e-4, atol_depth=5e-3,
                   rel_grad=3e-2)
            print(f"PASS {name}")
        except AssertionError as e:
            failed += 1
            print(f"FAIL {name}: {e}")
    print(f"{len(fixtures) - failed}/{len(fixtures)} compiled-kernel "
          "fixtures pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
