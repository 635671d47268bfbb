#!/usr/bin/env python
"""Headline benchmark: worlds x steps / second on vmapped pyramid worlds.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

detail includes a per-phase breakdown (the b2Profile analog) and a 1k-body
pyramid measurement (the BASELINE.md north-star shape).

Baseline: the reference publishes no absolute numbers; `vs_baseline` is
measured worlds*steps/sec divided by the measured reference single-world
steps/sec on this host's CPU (tools/ref_baseline.json).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Host-fetch one element: block_until_ready does not synchronize on
    the axon tunnel backend."""
    np.asarray(jax.tree.leaves(out)[0].ravel()[0:1])


def _time(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    n_worlds = int(os.environ.get("BENCH_WORLDS", "512"))
    rows = int(os.environ.get("BENCH_ROWS", "10"))      # 10 rows = 55 bodies + ground
    n_steps = int(os.environ.get("BENCH_STEPS", "60"))
    with_phases = os.environ.get("BENCH_PHASES", "1") != "0"
    with_big = os.environ.get("BENCH_BIG", "1") != "0"

    from box2d_mt_tpu import world as W
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

    state = scenes.pyramid(rows)
    n_bodies = int(jnp.sum(state.bodies.body_type >= 0))
    batched = replicate_state(state, n_worlds)
    max_colors = int(os.environ.get("BENCH_COLORS", "16"))
    kinds = W.possible_kinds(state)
    dt = jnp.float32(1 / 60)

    # lax.scan rollout: the whole n-step run is ONE program (no per-step
    # dispatch); this is how production rollouts should drive the engine.
    roll = make_rollout(n_steps, velocity_iterations=8, position_iterations=3,
                        max_colors=max_colors)

    t0 = time.perf_counter()
    out = roll(batched, dt)
    _sync(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = roll(batched, dt)
    np.asarray(out.bodies.c)     # full host fetch guarantees completion
    elapsed = time.perf_counter() - t0

    worlds_steps_per_sec = n_worlds * n_steps / elapsed

    detail = {
        "n_worlds": n_worlds, "n_bodies": n_bodies, "n_steps": n_steps,
        "elapsed_s": round(elapsed, 3), "compile_s": round(compile_s, 1),
        "steps_per_sec_per_world": round(worlds_steps_per_sec / n_worlds, 1),
    }

    if with_phases:
        # per-phase attribution from whole-step deltas (b2Profile analog;
        # full isolation lives in tools/profile_phases.py)
        full = jax.jit(lambda s: W.step_batched(
            s, dt, kinds=kinds, max_colors=max_colors)[0])
        no_ccd = jax.jit(lambda s: W.step_batched(
            s, dt, kinds=kinds, max_colors=max_colors, continuous=False)[0])
        vi1 = jax.jit(lambda s: W.step_batched(
            s, dt, kinds=kinds, max_colors=max_colors, continuous=False,
            velocity_iterations=1, position_iterations=1)[0])
        t_full = _time(full, out) * 1e3
        t_noccd = _time(no_ccd, out) * 1e3
        t_vi1 = _time(vi1, out) * 1e3
        detail["phases_ms"] = {
            "step_full": round(t_full, 2),
            "toi": round(t_full - t_noccd, 2),
            "solve_iters": round(t_noccd - t_vi1, 2),
            "base_collide_prepare_post": round(t_vi1, 2),
        }

    if with_big:
        big_rows = int(os.environ.get("BENCH_BIG_ROWS", "44"))  # ~990 bodies
        big_worlds = int(os.environ.get("BENCH_BIG_WORLDS", "16"))
        big_steps = 10
        big = replicate_state(scenes.pyramid(big_rows), big_worlds)
        nb_big = int(jnp.sum(big.bodies.body_type[0] >= 0))
        roll_big = make_rollout(big_steps, velocity_iterations=8,
                                position_iterations=3, max_colors=max_colors)
        t0 = time.perf_counter()
        ob = roll_big(big, dt)
        _sync(ob)
        big_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        ob = roll_big(big, dt)
        _sync(ob)
        big_elapsed = time.perf_counter() - t0
        detail["big_world"] = {
            "n_bodies": nb_big, "n_worlds": big_worlds,
            "worlds_steps_per_sec": round(
                big_worlds * big_steps / big_elapsed, 1),
            "compile_s": round(big_compile, 1),
        }

    # reference baseline: measured single-world steps/sec if recorded,
    # else 60 Hz real-time budget.
    ref_file = os.path.join(os.path.dirname(__file__), "tools",
                            "ref_baseline.json")
    ref_steps_per_sec = 60.0
    if os.path.exists(ref_file):
        with open(ref_file) as f:
            ref = json.load(f)
        # compare like-for-like step windows: the reference's long-window
        # numbers are inflated ~7x by the pyramid falling asleep
        ref_steps_per_sec = ref.get(
            f"pyramid{rows}_steps{n_steps}_steps_per_sec",
            ref.get(f"pyramid{rows}_steps_per_sec", ref_steps_per_sec))
    detail["ref_steps_per_sec"] = ref_steps_per_sec

    print(json.dumps({
        "metric": f"worlds*steps/sec, {n_worlds} vmapped pyramid({rows}) "
                  f"worlds ({n_bodies} bodies each), "
                  f"{jax.devices()[0].device_kind}",
        "value": round(worlds_steps_per_sec, 1),
        "unit": "worlds*steps/s",
        "vs_baseline": round(worlds_steps_per_sec / ref_steps_per_sec, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
