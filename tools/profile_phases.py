#!/usr/bin/env python
"""Per-phase timing harness — the TPU analog of the reference's b2Profile
13-phase breakdown (Box2D/Dynamics/b2TimeStep.h:25-40) and the TestMT CSV
profiler (Testbed/Framework/TestMT.cpp:146-186).

Production runs one fused program; for profiling we compile each phase of
step_batched as its own program and time it on a warmed-up state so phase
costs can be attributed. Also reports whole-step time with/without CCD and
per-velocity-iteration marginal cost.

Usage: python tools/profile_phases.py [--worlds 512] [--rows 10] [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(out):
    """Force device completion: block_until_ready is not a reliable sync
    on the axon tunnel backend; a host fetch of one element is."""
    import numpy as _np
    leaf = jax.tree.leaves(out)[0]
    _np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=512)
    ap.add_argument("--rows", type=int, default=10)
    ap.add_argument("--warm-steps", type=int, default=30)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="whole-step variants only (4 compiles)")
    args = ap.parse_args()

    from box2d_mt_tpu import world as W
    from box2d_mt_tpu import settings
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import replicate_state, make_rollout

    state = scenes.pyramid(args.rows)
    states = replicate_state(state, args.worlds)
    kinds = W.possible_kinds(state)
    dt = jnp.float32(1 / 60)
    max_colors = settings.MAX_COLORS

    # warm up the state so the contact table is realistic (touching stacks)
    warm = make_rollout(args.warm_steps, kinds=kinds)
    states = warm(states, dt)
    jax.block_until_ready(states.bodies.c)

    results = {}

    # ---- whole-step variants
    full = jax.jit(lambda s: W.step_batched(s, dt, kinds=kinds)[0])
    no_ccd = jax.jit(lambda s: W.step_batched(s, dt, kinds=kinds,
                                              continuous=False)[0])
    results["step_full_ms"] = timeit(full, states)
    results["step_no_ccd_ms"] = timeit(no_ccd, states)
    results["toi_attributed_ms"] = (results["step_full_ms"]
                                    - results["step_no_ccd_ms"])

    one_vi = jax.jit(lambda s: W.step_batched(
        s, dt, kinds=kinds, continuous=False, velocity_iterations=1)[0])
    one_pi = jax.jit(lambda s: W.step_batched(
        s, dt, kinds=kinds, continuous=False, position_iterations=1)[0])
    results["step_vi1_ms"] = timeit(one_vi, states)
    results["step_pi1_ms"] = timeit(one_pi, states)
    results["per_vel_iter_ms"] = (results["step_no_ccd_ms"]
                                  - results["step_vi1_ms"]) / 7.0
    results["per_pos_iter_ms"] = (results["step_no_ccd_ms"]
                                  - results["step_pi1_ms"]) / 2.0

    if args.quick:
        meta = {"worlds": args.worlds, "rows": args.rows,
                "device": jax.devices()[0].device_kind}
        if args.json:
            print(json.dumps({**meta, **{k: round(v, 2) for k, v in
                                         results.items()}}))
        else:
            print(f"# phase profile (quick): {meta}")
            for k, v in results.items():
                print(f"{k:28s} {v:8.2f}")
        return 0

    # ---- individual phases (separate programs; boundary transfers add a
    # little, so the sum slightly exceeds step_full)
    collide = jax.jit(lambda s: W._collide_b(s, kinds))
    results["phase_collide_ms"] = timeit(collide, states)

    man, sensor, stouch, ba, bb = collide(states)
    jax.block_until_ready(man.count)
    enabled = jnp.ones(states.contacts.f_a.shape, bool)

    pre_fn = jax.jit(lambda s, m, sn, st_, en, a_, b_: jax.vmap(
        lambda s1, m1, sn1, st1, en1, a1, b1: W._pre_solve(
            s1, dt, True, max_colors, m1, sn1, st1, en1, a1, b1)
    )(s, m, sn, st_, en, a_, b_))
    results["phase_presolve_ms"] = timeit(pre_fn, states, man, sensor,
                                          stouch, enabled, ba, bb)

    pre = pre_fn(states, man, sensor, stouch, enabled, ba, bb)
    jax.block_until_ready(pre.bs)

    mid_fn = jax.jit(lambda s, p: W._solve_middle_b(s, p, dt, 8, 3, True,
                                                    max_colors)[0])
    results["phase_solve_middle_ms"] = timeit(mid_fn, states, pre)

    mids = mid_fn(states, pre)
    jax.block_until_ready(mids[0])

    post_fn = jax.jit(lambda s, p, m: W._post_solve_b(s, p, dt, True, m)[0])
    results["phase_post_ms"] = timeit(post_fn, states, pre, mids)

    post = post_fn(states, pre, mids)
    jax.block_until_ready(post.bodies.c)

    toi_fn = jax.jit(lambda s: W._solve_toi_b(
        s, dt, 8, 8, kinds, max(32, s.contacts.capacity // 8))[0])
    results["phase_toi_ms"] = timeit(toi_fn, post)

    results["sum_phases_ms"] = sum(
        v for k, v in results.items() if k.startswith("phase_"))
    meta = {"worlds": args.worlds, "rows": args.rows,
            "device": jax.devices()[0].device_kind}

    if args.json:
        print(json.dumps({**meta, **{k: round(v, 2) for k, v in
                                     results.items()}}))
    else:
        print(f"# phase profile: {meta}")
        for k, v in results.items():
            print(f"{k:28s} {v:8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
