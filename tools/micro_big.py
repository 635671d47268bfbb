#!/usr/bin/env python
"""Microbench the big-world (pyramid 44, 991 bodies) hot sub-phases on TPU.

Times each graph/table pass on a warmed (settling) state so the costs of
islands / coloring / pair finding / carry-over / the solve permutation can
be attributed independently before optimizing them.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


def timeit(name, fn, *args, reps=5):
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {ms:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    W = int(os.environ.get("MB_WORLDS", "16"))
    rows = int(os.environ.get("MB_ROWS", "44"))

    from box2d_mt_tpu import world as Wd
    from box2d_mt_tpu import settings
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.ops import broadphase, coloring, islands
    from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

    state = scenes.pyramid(rows)
    states = replicate_state(state, W)
    kinds = Wd.possible_kinds(state)
    dt = jnp.float32(1 / 60)
    nb = state.bodies.capacity
    nc = state.contacts.capacity
    nf = state.fixtures.capacity
    print(f"# W={W} rows={rows} nb={nb} nf={nf} nc={nc}", flush=True)

    warm = make_rollout(30, kinds=kinds)
    states = warm(states, dt)
    jax.block_until_ready(states.bodies.c)

    # collide products for presolve pieces
    collide = jax.jit(lambda s: Wd._collide_b(s, kinds))
    man, sensor, stouch, ba, bb = collide(states)
    enabled = jnp.ones(states.contacts.f_a.shape, bool)
    pt = jax.jit(jax.vmap(Wd._pre_touch))(states, man, sensor, stouch,
                                          enabled, ba, bb)
    _sync(pt.solvable)

    timeit("pre_touch", jax.vmap(Wd._pre_touch),
           states, man, sensor, stouch, enabled, ba, bb)

    timeit("island_labels", jax.vmap(
        lambda a, b, o, n: islands.island_labels(nb, a, b, o, n)),
        ba, bb, pt.solvable, pt.non_static)

    labels = jax.jit(jax.vmap(
        lambda a, b, o, n: islands.island_labels(nb, a, b, o, n)))(
        ba, bb, pt.solvable, pt.non_static)
    awake, cc_active = jax.jit(jax.vmap(Wd._cc_active_of))(pt, labels, ba, bb)
    _sync(cc_active)
    n_act = int(jnp.sum(cc_active[0]))
    print(f"# active contacts/world ~ {n_act}")

    timeit("coloring", jax.vmap(
        lambda a, b, da, db, cca: coloring.color_constraints(
            a, b, da, db, cca, nb, settings.MAX_COLORS, with_rank=True)),
        ba, bb, pt.dyn_a, pt.dyn_b, cc_active)

    color, ov, rank = jax.jit(jax.vmap(
        lambda a, b, da, db, cca: coloring.color_constraints(
            a, b, da, db, cca, nb, settings.MAX_COLORS, with_rank=True)))(
        ba, bb, pt.dyn_a, pt.dyn_b, cc_active)
    ncol = int(jnp.max(jnp.where(color >= 0, color, -1)) + 1)
    print(f"# colors used = {ncol}, overflow = {int(jnp.max(ov))}")

    timeit("find_pairs (allpairs/grid auto)", jax.vmap(
        lambda s: broadphase.find_pairs(s, nc)), states)

    f_a, f_b, _ = jax.jit(jax.vmap(
        lambda s: broadphase.find_pairs(s, nc)))(states)
    timeit("carry_over_contacts", jax.vmap(
        lambda c, fa, fb: broadphase.carry_over_contacts(c, fa, fb, nf)),
        states.contacts, f_a, f_b)

    pre = jax.jit(jax.vmap(
        lambda s, m, sn, st_, en, a_, b_: Wd._pre_solve(
            s, dt, True, settings.MAX_COLORS, m, sn, st_, en, a_, b_)))(
        states, man, sensor, stouch, enabled, ba, bb)
    _sync(pre.bs)

    timeit("solve_middle vi=1 pi=0 (fixed ovh)",
           lambda s, p: Wd._solve_middle_b(s, p, dt, 1, 0, True,
                                           settings.MAX_COLORS)[0],
           states, pre)
    timeit("solve_middle vi=8 pi=3",
           lambda s, p: Wd._solve_middle_b(s, p, dt, 8, 3, True,
                                           settings.MAX_COLORS)[0],
           states, pre)
    return 0


if __name__ == "__main__":
    sys.exit(main())
