"""Measure lax.sort cost on TPU vs (n, payload rows, dtype).

Pipelined timing (issue all iters, block once) so the axon-relay dispatch
RTT does not pollute per-call numbers; inputs perturbed per call so no
caching layer can replay results.

Builds the cost model that motivates (or kills) a Pallas sort kernel:
if cost ~ rows * n * log^2(n) passes, a hierarchical bitonic/merge sort
with VMEM-resident blocks wins by ~10x.
"""

from __future__ import annotations

import time

import numpy as np


from dynamic3dgaussians_tpu.utils.timing import pipelined_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()

    rng = np.random.RandomState(0)
    print("| n | keys | payload rows | payload dtype | ms |")
    print("|---|---|---|---|---|")
    for n in (200_000, 819_200, 1_638_400):
        tile = jnp.asarray(rng.randint(0, 920, n).astype(np.int32))
        depth = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
        for rows, dtype in ((0, "f32"), (1, "f32"), (4, "f32"), (10, "f32"),
                            (4, "bf16"), (10, "bf16"), (4, "i32")):
            dt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                  "i32": jnp.int32}[dtype]
            pay = tuple(
                jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)).astype(dt)
                for _ in range(rows))

            def f(s, pay=pay, tile=tile, depth=depth):
                return lax.sort((tile, depth + s) + pay, num_keys=2,
                                is_stable=False)
            ms = pipelined_ms(jax.jit(f))
            print(f"| {n} | 2 | {rows} | {dtype} | {ms:.2f} |", flush=True)

        # single fused int32 key (tile<<22 | depth-bits>>10), no payload
        key1 = jnp.asarray((rng.randint(0, 920, n).astype(np.int64) << 22
                            | rng.randint(0, 1 << 22, n)).astype(np.int32))

        def g(s, key1=key1, depth=depth):
            return lax.sort((key1 + (s * 0).astype(jnp.int32), depth + s),
                            num_keys=1, is_stable=False)
        ms = pipelined_ms(jax.jit(g))
        print(f"| {n} | 1(i32 fused) | 1 | f32 | {ms:.2f} |", flush=True)


if __name__ == "__main__":
    main()
