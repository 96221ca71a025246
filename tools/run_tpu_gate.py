"""Run the compiled-kernel golden gate on the real TPU — ALL shipping configs.

tests/conftest.py forces the CPU backend for the whole pytest suite, so the
TPU-only fixture test never sees the chip under normal CI. This runner
executes the same checks against the default (TPU) backend directly, for
every RasterConfig variant that bench.py / the trainer can select
(VERDICT r3 item 5: a config the gate hasn't passed on hardware must not
be a bench candidate):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/run_tpu_gate.py
    # or a subset:  python tools/run_tpu_gate.py base fast_bench

Gate semantics (budgets: tests/fixtures/TOLERANCES.md):

* configs with f32 sort transport (base / mxu / chunk256) are checked
  element-wise against the frozen CPU fixture bits;
* configs with pack_records=True transport the payload as bf16 pairs — a
  deliberate one-8-bit-quantum approximation, so element-wise fixture
  comparison is the wrong check (tiny grads deviate relatively even when
  the grad NORM error is ~5e-3). They are gated against the on-TPU BASE
  render of the same scene: images under one 8-bit quantum, gradients
  norm-relative — the same budget tests/test_pallas.py pins on CPU. Since
  base itself is gated against the fixture bits, the chain is anchored.

Exits nonzero on any violation; a wedged Mosaic compile is abandoned via a
worker-thread timeout so the remaining configs still report.
"""

from __future__ import annotations

import glob
import os
import sys
import threading

import numpy as np

CONFIG_TIMEOUT_S = 900

# every lever individually + the exact combos bench.py / the trainer ship.
SHIPPING_CONFIGS = {
    "base": {},
    "mxu": {"power_impl": "mxu"},
    "chunk256": {"chunk": 256, "scan_impl": "matmul_block128"},
    "pack": {"pack_records": True},
    "pack_gather": {"pack_records": True, "unsort_impl": "gather"},
    # bench.py "fast" forward candidate, verbatim
    "fast_bench": {"power_impl": "mxu", "chunk": 256,
                   "scan_impl": "matmul_block128", "pack_records": True},
    # bench.py "fast_fused" r5 candidate, verbatim (fused-op cell pipeline)
    "fast_fused": {"power_impl": "mxu_fused", "chunk": 256,
                   "scan_impl": "matmul_block128", "pack_records": True},
    # trainer shipping combo (bench train phase + tools/scale_run.py)
    "train_ship": {"pack_records": True, "unsort_impl": "gather",
                   "power_impl": "mxu"},
}
EXACT_TOL = dict(atol_rgb=5e-4, atol_depth=5e-3, rel_grad=3e-2)


def _timed(name, fn):
    box = {}

    def run():
        try:
            box["out"] = fn()
        except AssertionError as e:
            box["assert"] = e
        except Exception as e:  # noqa: BLE001
            box["err"] = repr(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(CONFIG_TIMEOUT_S)
    if th.is_alive():
        return "WEDGE", f"blocked > {CONFIG_TIMEOUT_S}s — abandoned"
    if "assert" in box:
        return "FAIL", str(box["assert"])[:300]
    if "err" in box:
        return "ERROR", box["err"][:300]
    return "PASS", ""


def _check_vs_base(base, got):
    """Pack-transport budget: one 8-bit image quantum, norm-relative grads
    (mirrors tests/test_pallas.py::test_bench_fast_candidate_parity)."""
    b_out, b_grads = base
    out, grads = got
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(b_out.rgb),
                               atol=3.9e-3)
    np.testing.assert_allclose(np.asarray(out.alpha),
                               np.asarray(b_out.alpha), atol=5e-3)
    # depth/grads see the f16 tile-relative x/y rounding (~0.06 px)
    # amplified by splat size; CPU-measured worst case across the fixture
    # scenes is depth 2.8e-2 abs, grads 1.6e-2 norm-rel (big_splats,
    # k_cap=64). A Mosaic miscompile produces errors orders of magnitude
    # above these budgets.
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(b_out.depth), atol=6e-2)
    np.testing.assert_array_equal(np.asarray(out.radii),
                                  np.asarray(b_out.radii))
    for a, b in zip(b_grads, grads):
        na = float(np.linalg.norm(np.asarray(a).ravel()))
        rel = float(np.linalg.norm(
            (np.asarray(b) - np.asarray(a)).ravel()))
        assert rel <= max(3e-2 * na, 3e-5), ("grad norm-rel", rel, na)


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
    names = sys.argv[1:] or list(SHIPPING_CONFIGS)
    base_renders = {}  # fixture path -> (out, grads) from the base config
    failed = 0
    # base FIRST, always (even when listed later on the CLI): it anchors
    # the pack-config comparisons
    if any(SHIPPING_CONFIGS[n].get("pack_records") for n in names):
        names = ["base"] + [n for n in names if n != "base"]
    for cname in names:
        overrides = SHIPPING_CONFIGS[cname]
        packed = overrides.get("pack_records", False)
        for path in fixtures:
            fname = os.path.basename(path)
            fx = dict(np.load(path))

            def one(fx=fx, overrides=overrides, packed=packed, path=path,
                    cname=cname):
                out, grads = _render_both(fx, "pallas",
                                          cfg_overrides=overrides)
                if packed:
                    if path not in base_renders:
                        raise RuntimeError("base render unavailable "
                                           "(base config failed/skipped)")
                    _check_vs_base(base_renders[path], (out, grads))
                else:
                    _check(fx, out, grads, **EXACT_TOL)
                if cname == "base":
                    # anchor ONLY a fixture-verified base render: a base
                    # that failed its own gate must not silently validate
                    # the pack configs against a shared miscompile
                    base_renders[path] = (out, grads)

            status, msg = _timed(f"{cname}/{fname}", one)
            print(f"{status} [{cname}] {fname}"
                  + (f": {msg}" if msg else ""), flush=True)
            if status != "PASS":
                failed += 1
    total = len(names) * len(fixtures)
    print(f"{total - failed}/{total} compiled-kernel config x fixture "
          "checks pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
