#!/usr/bin/env python
"""Standalone compile-and-run check for the fused Pallas solve kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")

import jax
import jax.numpy as jnp
import numpy as np

from box2d_mt_tpu.ops import pallas_solve as ps


def main():
    W, nb, p_total = 2, 1024, 8192
    key = jax.random.PRNGKey(0)
    # minimal sane blob: one active 1-point contact per first CK lanes
    blob = np.zeros((W, 51, p_total), np.float32)
    blob[:, 0, :8] = 1.0                # active
    blob[:, 1, :8] = np.arange(8) * 2   # body_a
    blob[:, 2, :8] = np.arange(8) * 2 + 1
    blob[:, 3, :8] = 1.0                # point_count
    blob[:, 6, :8] = 1.0                # inv_mass_a
    blob[:, 7, :8] = 1.0
    blob[:, 11, :8] = 1.0               # normal y
    blob[:, 20, :8] = 1.0               # normal_mass 0
    vel = jax.random.normal(key, (W, 8, nb), jnp.float32)
    pos = jax.random.normal(key, (W, 8, nb), jnp.float32)
    t0 = time.perf_counter()
    out = jax.jit(lambda b, v, p: ps.solve_middle_pallas(
        b, v, p, jnp.int32(2), jnp.float32(1 / 60), 8, 3))(
        jnp.asarray(blob), vel, pos)
    np.asarray(out[0][0, 0, 0:1])
    print(f"kernel compile+run OK in {time.perf_counter()-t0:.1f}s")
    print("velo[0,0,:4] =", np.asarray(out[0][0, 0, :4]))
    print("aux nan?", bool(jnp.any(jnp.isnan(out[2]))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
