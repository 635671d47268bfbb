#!/usr/bin/env python
"""Per-phase timing of the fused batched step on the current backend.

Times lax.scan rollouts of step_batched variants and differences them to
attribute ms/step to phases (collide+prep, solve, post, TOI). The
reference's 13-phase b2Profile (b2TimeStep.h:25-40) is the model; fused XLA
programs can't be bracketed with timers, so variant differencing is the
TPU-native equivalent.

Usage: python tools/profile_phases.py [worlds] [steps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed_rollout(state, n_steps, fn):
    def roll(s, dt):
        def body(ss, _):
            return fn(ss, dt), None
        out, _ = jax.lax.scan(body, s, None, length=n_steps)
        return out

    roll = jax.jit(roll)
    dt = jnp.float32(1 / 60)
    t0 = time.perf_counter()
    out = roll(state, dt)
    np.asarray(out.bodies.c)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = roll(state, dt)
    np.asarray(out.bodies.c)
    run_s = time.perf_counter() - t0
    return compile_s, run_s


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import dataclasses

    from box2d_mt_tpu import world
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import replicate_state

    base = scenes.pyramid(10)
    state = replicate_state(base, n_worlds)
    kinds = world.possible_kinds(base)

    def var(name, **kw):
        kw.setdefault("kinds", kinds)

        def fn(ss, dt):
            return world.step_batched(ss, dt, **kw)[0]
        c, r = timed_rollout(state, n_steps, fn)
        ms = 1e3 * r / n_steps
        print(f"{name:32s} compile {c:7.1f}s   {ms:8.2f} ms/step   "
              f"{n_worlds * n_steps / r:9.0f} worlds*steps/s", flush=True)
        return ms

    def pre_only(ss, dt):
        pre = jax.vmap(lambda s: world._pre_solve(s, dt, True, 16, kinds))(ss)
        b = dataclasses.replace(
            ss.bodies, c=ss.bodies.c + 0.0 * pre.bs[..., 0:2])
        return dataclasses.replace(ss, bodies=b)

    print(f"profile: {n_worlds} worlds x pyramid(10), {n_steps} steps, "
          f"{jax.devices()[0].device_kind}", flush=True)
    full = var("full (v8 p3 cont)", velocity_iterations=8,
               position_iterations=3, continuous=True)
    nocont = var("no-TOI", velocity_iterations=8,
                 position_iterations=3, continuous=False)
    v1p1 = var("no-TOI v1 p1", velocity_iterations=1,
               position_iterations=1, continuous=False)
    allk = var("full, all kinds", velocity_iterations=8,
               position_iterations=3, continuous=True,
               kinds=(0, 1, 2, 3, 4))
    c, r = timed_rollout(state, n_steps, pre_only)
    pre_ms = 1e3 * r / n_steps
    print(f"{'pre_solve only':32s} compile {c:7.1f}s   {pre_ms:8.2f} ms/step",
          flush=True)

    print()
    print(f"TOI phase:           {full - nocont:8.2f} ms/step")
    print(f"solve iters (7v+2p): {nocont - v1p1:8.2f} ms/step")
    print(f"kind gating saves:   {allk - full:8.2f} ms/step")
    print(f"pre_solve:           {pre_ms:8.2f} ms/step")
    print(f"post+1v1p residual:  {v1p1 - pre_ms:8.2f} ms/step")


if __name__ == "__main__":
    main()
