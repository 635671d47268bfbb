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

# persistent compilation cache: repeat bench/driver runs skip the 30-40s
# cold compile per shape (first-ever run still pays it)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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

    # north-star shape (BASELINE.md): 4096 vmapped pyramid(10) worlds
    if os.environ.get("BENCH_NORTHSTAR", "1") != "0":
        ns_worlds = int(os.environ.get("BENCH_NS_WORLDS", "4096"))
        ns_steps = int(os.environ.get("BENCH_NS_STEPS", "60"))
        ns = replicate_state(state, ns_worlds)
        roll_ns = make_rollout(ns_steps, velocity_iterations=8,
                               position_iterations=3, max_colors=max_colors,
                               kinds=kinds)
        t0 = time.perf_counter()
        on = roll_ns(ns, dt)
        _sync(on)
        ns_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        on = roll_ns(ns, dt)
        _sync(on)
        ns_elapsed = time.perf_counter() - t0
        detail["north_star_4096"] = {
            "n_worlds": ns_worlds, "n_steps": ns_steps,
            "worlds_steps_per_sec": round(
                ns_worlds * ns_steps / ns_elapsed, 1),
            "compile_s": round(ns_compile, 1),
        }

    # long-window (sleep-parity) measurement: 1000 steps of pyramid(10) —
    # the window where the reference gains ~7x from the pyramid sleeping at
    # ~step 100. With sleep parity + the all-asleep fast path, the engine
    # must win this window too, not just the all-awake 60-step one.
    if os.environ.get("BENCH_LONGWIN", "1") != "0":
        lw_worlds = int(os.environ.get("BENCH_LW_WORLDS", "512"))
        lw_steps = int(os.environ.get("BENCH_LW_STEPS", "1000"))
        lw = replicate_state(state, lw_worlds)
        roll_lw = make_rollout(lw_steps, velocity_iterations=8,
                               position_iterations=3, max_colors=max_colors,
                               kinds=kinds)
        t0 = time.perf_counter()
        ol = roll_lw(lw, dt)
        _sync(ol)
        lw_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        ol = roll_lw(lw, dt)
        _sync(ol)
        lw_elapsed = time.perf_counter() - t0
        asleep = not bool(np.asarray(
            (ol.bodies.awake & (ol.bodies.body_type == 2)).any()))
        lw_detail = {
            "n_worlds": lw_worlds, "n_steps": lw_steps,
            "worlds_steps_per_sec": round(
                lw_worlds * lw_steps / lw_elapsed, 1),
            "compile_s": round(lw_compile, 1),
            "all_asleep_at_end": asleep,
        }
        ref_file0 = os.path.join(os.path.dirname(__file__), "tools",
                                 "ref_baseline.json")
        if os.path.exists(ref_file0):
            with open(ref_file0) as f:
                ref0 = json.load(f)
            rk = f"pyramid{rows}_steps{lw_steps}_steps_per_sec"
            if rk in ref0:
                lw_detail["ref_steps_per_sec"] = ref0[rk]
                lw_detail["vs_ref"] = round(
                    lw_detail["worlds_steps_per_sec"] / ref0[rk], 2)
        detail["long_window"] = lw_detail

    if with_big:
        big_rows = int(os.environ.get("BENCH_BIG_ROWS", "44"))  # ~990 bodies
        big_steps = int(os.environ.get("BENCH_BIG_STEPS", "60"))
        # BASELINE.md north star asks for the largest feasible batch of
        # ~1k-body worlds: walk a descending ladder and keep the biggest
        # batch that fits device memory (BENCH_BIG_WORLDS pins one size).
        if "BENCH_BIG_WORLDS" in os.environ:
            ladder = [int(os.environ["BENCH_BIG_WORLDS"])]
        else:
            ladder = [1024, 256, 64, 16]
        base_big = scenes.pyramid(big_rows)
        nb_big = int(jnp.sum(base_big.bodies.body_type >= 0))
        roll_big = make_rollout(big_steps, velocity_iterations=8,
                                position_iterations=3, max_colors=max_colors)
        for big_worlds in ladder:
            try:
                big = replicate_state(base_big, big_worlds)
                t0 = time.perf_counter()
                ob = roll_big(big, dt)
                _sync(ob)
                big_compile = time.perf_counter() - t0
                t0 = time.perf_counter()
                ob = roll_big(big, dt)
                _sync(ob)
                big_elapsed = time.perf_counter() - t0
                del ob, big
                break
            except Exception as e:  # memory exhaustion: try a smaller batch
                if big_worlds == ladder[-1]:
                    raise
                sys.stderr.write(
                    f"big_world: {big_worlds} worlds failed "
                    f"({type(e).__name__}); trying smaller\n")
        detail["big_world"] = {
            "n_bodies": nb_big, "n_worlds": big_worlds, "n_steps": big_steps,
            "worlds_steps_per_sec": round(
                big_worlds * big_steps / big_elapsed, 1),
            "compile_s": round(big_compile, 1),
        }
        # same-host reference comparison at the 1k-body shape, when measured
        ref_file0 = os.path.join(os.path.dirname(__file__), "tools",
                                 "ref_baseline.json")
        if os.path.exists(ref_file0):
            with open(ref_file0) as f:
                ref0 = json.load(f)
            rk = f"pyramid{big_rows}_steps{big_steps}_steps_per_sec"
            if rk in ref0:
                detail["big_world"]["ref_steps_per_sec"] = ref0[rk]
                detail["big_world"]["vs_ref"] = round(
                    detail["big_world"]["worlds_steps_per_sec"] / ref0[rk],
                    2)

    # reference baseline: measured single-world steps/sec if recorded,
    # else 60 Hz real-time budget.
    ref_file = os.path.join(os.path.dirname(__file__), "tools",
                            "ref_baseline.json")
    ref_steps_per_sec = 60.0
    if os.path.exists(ref_file):
        with open(ref_file) as f:
            ref = json.load(f)
        # compare like-for-like step windows ONLY (long windows let the
        # reference sleep the pyramid and inflate its steps/sec ~7x);
        # a window with no measured reference row fails loudly instead of
        # silently falling back to a mismatched window.
        key = f"pyramid{rows}_steps{n_steps}_steps_per_sec"
        if key not in ref:
            raise KeyError(
                f"tools/ref_baseline.json has no '{key}' — measure the "
                f"reference at this exact (rows, steps) window with "
                f"tools/golden_gen/refbench.cpp before comparing")
        ref_steps_per_sec = ref[key]
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
