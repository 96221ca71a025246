"""Pipelined device timing — the ONLY reliable methodology on this setup.

Under the axon tunnel, `jax.block_until_ready` on a single enqueued call
returns before execution finishes, and the relay caches identical
computations. So: issue all iterations asynchronously with a perturbed
input per call, block ONCE on the whole list, and report sustained
throughput. Isolated blocking micro-benchmarks vary up to 25x run-to-run
(see PROFILE.md); numbers from this helper reproduce within ~3%.
"""

from __future__ import annotations

import time

import numpy as np


def pipelined_ms(fn, iters: int = 30) -> float:
    """Milliseconds per call of `fn(scalar)` at sustained throughput.

    `fn` must accept one float32 scalar and fold it into its computation
    (e.g. `means + s`) so no caching layer can replay a previous result.
    The first call warms up/compiles and is excluded.
    """
    import jax
    jax.block_until_ready(fn(np.float32(0.0)))
    t0 = time.perf_counter()
    outs = [fn(np.float32(1e-7 * (i + 1))) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3
