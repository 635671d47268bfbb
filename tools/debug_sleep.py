#!/usr/bin/env python
"""Diagnose the deep-stack equilibrium micro-jitter that defeats sleep
(VERDICT round 2, Weak #1). Steps pyramid(rows) and reports per-step
max |w| / max |v| over awake dynamic bodies, the sleep step (if any), and
lets solver knobs be swept from the command line.

Usage: python tools/debug_sleep.py [rows] [steps] [vel_iters] [pos_iters]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")

import numpy as np
import jax
import jax.numpy as jnp

# the host sitecustomize force-registers the TPU platform and overrides
# jax_platforms at interpreter start; these debug sweeps must run on CPU
jax.config.update("jax_platforms", "cpu")


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    vi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pi = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    ws = (sys.argv[5] != "0") if len(sys.argv) > 5 else True

    from box2d_mt_tpu import world as W
    from box2d_mt_tpu.models import scenes

    st = scenes.pyramid(rows)
    kinds = W.possible_kinds(st)
    dt = 1.0 / 60.0

    step = jax.jit(lambda s: W.step(
        s, dt, velocity_iterations=vi, position_iterations=pi,
        kinds=kinds, continuous=False, warm_starting=ws))

    slept_at = None
    print(f"rows={rows} vi={vi} pi={pi} ws={ws}")
    for i in range(steps):
        st, ev = step(st)
        dyn = np.asarray(st.bodies.body_type) == 2
        awake = np.asarray(st.bodies.awake) & dyn
        w = np.abs(np.asarray(st.bodies.w))
        v = np.linalg.norm(np.asarray(st.bodies.v), axis=-1)
        stime = np.asarray(st.bodies.sleep_time)
        n_awake = int(awake.sum())
        if n_awake == 0 and slept_at is None:
            slept_at = i
            print(f"step {i:4d}: ALL ASLEEP")
            break
        if i % 10 == 0 or i == steps - 1:
            wmax = w[awake].max() if n_awake else 0.0
            vmax = v[awake].max() if n_awake else 0.0
            smin = stime[awake].min() if n_awake else 0.0
            # which bodies exceed the angular sleep tolerance?
            over = int(((w > 0.0349) & awake).sum())
            overv = int(((v > 0.01) & awake).sum())
            wi = int(np.argmax(np.where(awake, w, 0)))
            vi_b = int(np.argmax(np.where(awake, v, 0)))
            c = np.asarray(st.bodies.c)
            print(f"step {i:4d}: awake={n_awake:3d} wmax={wmax:.5f}@b{wi}"
                  f"({c[wi][0]:.2f},{c[wi][1]:.2f}) "
                  f"vmax={vmax:.5f}@b{vi_b}({c[vi_b][0]:.2f},{c[vi_b][1]:.2f}) "
                  f"n_over_ang={over} n_over_lin={overv} "
                  f"c_ovf={int(ev.color_overflow)}")
    if slept_at is not None:
        print(f"SLEPT at step {slept_at}")
    else:
        print(f"NEVER SLEPT in {steps} steps")


if __name__ == "__main__":
    main()
