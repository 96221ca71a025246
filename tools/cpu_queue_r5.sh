#!/bin/bash
# Round-5 unattended CPU queue: full suite + the marked-slow realistic-N
# test (VERDICT r4 item 8: its run log must be committed each round so
# regressions at realistic N are caught), then the long-sequence tracking
# eval on CPU as fallback evidence if the TPU sequence run cannot land.
#
# Advisor r4: each step stages ONLY the files it produced.
set -x
cd /root/repo
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu

commit_files() {
    msg="$1"; shift
    git add "$@" && git commit -m "$msg" || true
}

timeout 3600 python -m pytest tests/ -x -q 2>&1 | tail -5 \
    > artifacts/pytest_r5_final.log
commit_files "round 5: full CPU suite log" artifacts/pytest_r5_final.log

timeout 1500 python -m pytest -m slow tests/test_scale_slow.py -q 2>&1 \
    | tail -5 > artifacts/pytest_slow_r5.log
commit_files "round 5: marked-slow realistic-N test log (VERDICT r4 item 8)" \
    artifacts/pytest_slow_r5.log
