#!/usr/bin/env python
"""Headline benchmark: worlds x steps / second on vmapped pyramid worlds.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no absolute numbers; the
driver-set north star is a single TPU v5e core stepping 4096 parallel
1k-body worlds faster than Box2D-MT-on-8-threads steps one. `vs_baseline`
reports measured worlds*steps/sec divided by a measured reference
single-world steps/sec when available (tools/ref_bench), else against the
conservative 60 steps/sec real-time budget at 8 threads.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_worlds = int(os.environ.get("BENCH_WORLDS", "512"))
    rows = int(os.environ.get("BENCH_ROWS", "10"))      # 10 rows = 55 bodies + ground
    n_steps = int(os.environ.get("BENCH_STEPS", "60"))

    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

    state = scenes.pyramid(rows)
    n_bodies = int(jnp.sum(state.bodies.body_type >= 0))
    batched = replicate_state(state, n_worlds)
    max_colors = int(os.environ.get("BENCH_COLORS", "16"))
    dt = jnp.float32(1 / 60)

    # lax.scan rollout: the whole n-step run is ONE program (no per-step
    # dispatch); this is how production rollouts should drive the engine.
    roll = make_rollout(n_steps, velocity_iterations=8, position_iterations=3,
                        max_colors=max_colors)

    t0 = time.perf_counter()
    out = roll(batched, dt)
    jax.block_until_ready(out.bodies.c)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = roll(batched, dt)
    import numpy as _np
    _np.asarray(out.bodies.c)     # host fetch guarantees completion
    elapsed = time.perf_counter() - t0

    worlds_steps_per_sec = n_worlds * n_steps / elapsed

    # reference baseline: measured single-world steps/sec if recorded,
    # else 60 Hz real-time budget.
    ref_file = os.path.join(os.path.dirname(__file__), "tools", "ref_baseline.json")
    ref_steps_per_sec = 60.0
    if os.path.exists(ref_file):
        with open(ref_file) as f:
            ref = json.load(f)
        ref_steps_per_sec = ref.get(f"pyramid{rows}_steps_per_sec",
                                    ref_steps_per_sec)

    print(json.dumps({
        "metric": f"worlds*steps/sec, {n_worlds} vmapped pyramid({rows}) worlds "
                  f"({n_bodies} bodies each), {jax.devices()[0].device_kind}",
        "value": round(worlds_steps_per_sec, 1),
        "unit": "worlds*steps/s",
        "vs_baseline": round(worlds_steps_per_sec / ref_steps_per_sec, 2),
        "detail": {
            "n_worlds": n_worlds, "n_bodies": n_bodies, "n_steps": n_steps,
            "elapsed_s": round(elapsed, 3), "compile_s": round(compile_s, 1),
            "steps_per_sec_per_world": round(worlds_steps_per_sec / n_worlds, 1),
            "ref_steps_per_sec": ref_steps_per_sec,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
