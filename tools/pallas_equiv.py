#!/usr/bin/env python
"""On-hardware equivalence: Pallas kernels vs the XLA reference paths.

Interpret-mode tests (tests/test_pallas_solve.py, test_pallas_toi.py) prove
the kernel LOGIC; this tool proves the MOSAIC LOWERING on the real chip:

  * solve middle: world._solve_middle_b with the fused Pallas kernel vs the
    XLA color-chunk path on the SAME warmed big-world _PreSolve inputs, at
    two shapes; max-abs diffs of velocities/positions/impulses.
  * TOI: ops.pallas_toi.time_of_impact_lanes compiled on the chip vs the
    XLA conservative-advancement reference on the golden TOI fixtures.

Writes PALLAS_EQUIV_r05.json in the repo root (the artifact VERDICT r4
item 2 asks for) and exits nonzero if any diff exceeds tolerance.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOLVE_TOL = 5e-4     # f32 sequential-impulse math, different op orders
TOI_T_TOL = 5e-3     # hybrid secant/bisection root find tolerance


def solve_middle_equiv(rows, n_worlds):
    from box2d_mt_tpu import world as Wd, settings
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

    state = scenes.pyramid(rows)
    states = replicate_state(state, n_worlds)
    kinds = Wd.possible_kinds(state)
    dt = jnp.float32(1 / 60)
    warm = make_rollout(30, kinds=kinds)
    states = warm(states, dt)
    jax.block_until_ready(states.bodies.c)

    collide = jax.jit(lambda s: Wd._collide_b(s, kinds))
    man, sensor, stouch, ba, bb = collide(states)
    enabled = jnp.ones(states.contacts.f_a.shape, bool)
    pre = jax.jit(jax.vmap(
        lambda s, m, sn, st_, en, a_, b_: Wd._pre_solve(
            s, dt, True, settings.MAX_COLORS, m, sn, st_, en, a_, b_)))(
        states, man, sensor, stouch, enabled, ba, bb)
    jax.block_until_ready(pre.bs)

    def run():
        fn = jax.jit(lambda s, p: Wd._solve_middle_b(
            s, p, dt, 8, 3, True, settings.MAX_COLORS)[0])
        out = fn(states, pre)
        jax.block_until_ready(out[0])
        return [np.asarray(x) for x in out[:7]]

    os.environ["BOX2D_TPU_NO_PALLAS"] = "1"   # XLA chunk path
    jax.clear_caches()
    ref = run()
    del os.environ["BOX2D_TPU_NO_PALLAS"]     # Pallas middle (on TPU)
    jax.clear_caches()
    got = run()

    names = ["ni", "ti", "c", "a", "v", "w", "min_sep"]
    diffs = {n: float(np.max(np.abs(g - r)))
             for n, g, r in zip(names, got, ref)}
    # min_sep is diagnostic-only (sleep convergence flag compares against
    # -3*slop); the state channels are what must agree
    state_ok = all(diffs[n] <= SOLVE_TOL for n in names[:6])
    return {"rows": rows, "n_worlds": n_worlds,
            "max_abs_diff": diffs, "tol": SOLVE_TOL, "ok": bool(state_ok)}


def joint_world():
    """512-body-slot world with BOTH joints and contacts: a long revolute
    bridge with circles dropped onto it — exercises the sandwich kernels
    (pack / vel-iter / pos-iter / unpack with XLA joint passes between)."""
    from box2d_mt_tpu import settings, shapes
    from box2d_mt_tpu.world import WorldBuilder
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-220.0, -8.0), (220.0, -8.0)))
    n_planks = 380
    prev = ground
    x = -190.0
    for i in range(n_planks):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(x + 0.5, 5.0))
        wb.create_fixture(b, shapes.Polygon.box(0.5, 0.125), density=20.0,
                          friction=0.2)
        wb.create_revolute_joint(prev, b, (x, 5.0))
        prev = b
        x += 1.0
    for i in range(100):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(-150.0 + 3.0 * i, 8.0 + (i % 5)))
        wb.create_fixture(b, shapes.Circle(0.4), density=1.0, friction=0.3)
    return wb.freeze()


def solve_middle_equiv_joints(n_worlds):
    from box2d_mt_tpu import world as Wd, settings
    from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

    state = joint_world()
    nb = int(state.bodies.body_type.shape[0])
    assert nb >= 512, nb
    states = replicate_state(state, n_worlds)
    kinds = Wd.possible_kinds(state)
    dt = jnp.float32(1 / 60)
    warm = make_rollout(30, kinds=kinds)
    states = warm(states, dt)
    jax.block_until_ready(states.bodies.c)

    collide = jax.jit(lambda s: Wd._collide_b(s, kinds))
    man, sensor, stouch, ba, bb = collide(states)
    enabled = jnp.ones(states.contacts.f_a.shape, bool)
    pre = jax.jit(jax.vmap(
        lambda s, m, sn, st_, en, a_, b_: Wd._pre_solve(
            s, dt, True, settings.MAX_COLORS, m, sn, st_, en, a_, b_)))(
        states, man, sensor, stouch, enabled, ba, bb)
    jax.block_until_ready(pre.bs)

    def run():
        fn = jax.jit(lambda s, p: Wd._solve_middle_b(
            s, p, dt, 8, 3, True, settings.MAX_COLORS)[0])
        out = fn(states, pre)
        jax.block_until_ready(out[0])
        return [np.asarray(x) for x in out[:7]]

    os.environ["BOX2D_TPU_NO_PALLAS"] = "1"   # XLA interleaved path
    jax.clear_caches()
    ref = run()
    del os.environ["BOX2D_TPU_NO_PALLAS"]     # sandwich kernels (on TPU)
    jax.clear_caches()
    got = run()

    names = ["ni", "ti", "c", "a", "v", "w", "min_sep"]
    diffs = {n: float(np.max(np.abs(g - r)))
             for n, g, r in zip(names, got, ref)}
    state_ok = all(diffs[n] <= SOLVE_TOL for n in names[:6])
    return {"scene": "bridge+circles (joints)", "n_bodies": nb,
            "n_worlds": n_worlds, "max_abs_diff": diffs,
            "tol": SOLVE_TOL, "ok": bool(state_ok)}


def toi_equiv():
    from box2d_mt_tpu.ops import distance as dst
    from box2d_mt_tpu.ops import pallas_toi as ptoi
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import load_jsonl
    from test_pallas_toi import _build_lanes, _proxy_arrays

    rows = load_jsonl("toi.jsonl")
    sblob, vax, vay, vbx, vby, n = _build_lanes(rows)
    state_p, t_p = ptoi.time_of_impact_lanes(sblob, vax, vay, vbx, vby,
                                             interpret=False)
    state_p = np.asarray(state_p)[:n]
    t_p = np.asarray(t_p)[:n]

    va, ca, ra = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy_arrays(r["a"]) for r in rows])
    vb, cb, rb = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy_arrays(r["b"]) for r in rows])
    sa = jnp.asarray([r["sweepA"] for r in rows], jnp.float32)
    sb = jnp.asarray([r["sweepB"] for r in rows], jnp.float32)
    zc = jnp.zeros(2, jnp.float32)
    fn = jax.jit(jax.vmap(
        lambda va, ca, ra, vb, cb, rb, s_a, s_b: dst.time_of_impact(
            va, ca, ra, zc, s_a[0:2], s_a[2:4], s_a[4], s_a[5],
            vb, cb, rb, zc, s_b[0:2], s_b[2:4], s_b[4], s_b[5],
            jnp.float32(1.0))))
    state_x, t_x = fn(va, ca, ra, vb, cb, rb, sa, sb)
    state_x = np.asarray(state_x)
    t_x = np.asarray(t_x)

    state_bad = int(np.sum(state_p != state_x))
    touch = state_x == dst.TOI_TOUCHING
    t_bad = int(np.sum(touch & (np.abs(t_p - t_x) > TOI_T_TOL)))
    worst = float(np.max(np.abs(t_p - t_x)[touch])) if touch.any() else 0.0
    ok = (state_bad <= max(2, n // 50)
          and t_bad <= max(2, int(touch.sum()) // 50))
    return {"n_fixtures": n, "state_mismatches": state_bad,
            "t_mismatches": t_bad, "worst_t_diff": worst,
            "t_tol": TOI_T_TOL, "ok": bool(ok)}


def main():
    t0 = time.time()
    out = {"device": jax.devices()[0].device_kind,
           "platform": jax.devices()[0].platform}
    shapes = [(24, 8), (44, 16)]
    out["solve_middle"] = []
    for rows, w in shapes:
        try:
            out["solve_middle"].append(solve_middle_equiv(rows, w))
        except Exception as e:
            out["solve_middle"].append(
                {"rows": rows, "n_worlds": w, "ok": False,
                 "error": f"{type(e).__name__}: {e}"[:400]})
    try:
        out["solve_middle"].append(solve_middle_equiv_joints(8))
    except Exception as e:
        out["solve_middle"].append(
            {"scene": "joints", "ok": False,
             "error": f"{type(e).__name__}: {e}"[:400]})
    try:
        out["toi"] = toi_equiv()
    except Exception as e:
        out["toi"] = {"ok": False, "error": f"{type(e).__name__}: {e}"[:400]}
    out["elapsed_s"] = round(time.time() - t0, 1)
    out["ok"] = (all(s.get("ok") for s in out["solve_middle"])
                 and out["toi"].get("ok", False))
    path = os.path.join(REPO, "PALLAS_EQUIV_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
