"""Block until the TPU accepts work, then exit 0.

A stale axon session (left by a killed client) holds the device for
~30-60 min; any new client blocks with zero CPU until it expires
(PROFILE.md). This probe simply issues a tiny computation with NO external
timeout — killing it would create exactly the stale session it is waiting
out — and prints how long the wait was. Run it as the first step of a
batched TPU session (tools/tpu_session_r3.sh).
"""

import time

t0 = time.time()
import jax
import jax.numpy as jnp

x = jnp.ones((128, 128))
y = (x @ x).block_until_ready()
t1 = time.time()
# second op catches the "first op cached, device still wedged" case
y = (x @ (x + 1.0)).block_until_ready()
print(f"device ready: first op {t1 - t0:.1f}s, "
      f"second {time.time() - t1:.1f}s", flush=True)
