#!/usr/bin/env python
"""Micro-bench the pre_solve components on the bench workload (batched)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    fn2 = jax.jit(fn)
    out = fn2(*args)
    jax.block_until_ready(out)

    def chained(x):
        def body(c, _):
            o = fn2(*args)
            leaf = jax.tree.leaves(o)[0]
            return c + 0.0 * jnp.sum(leaf).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    ch = jax.jit(chained)
    x0 = jnp.float32(0.0)
    np.asarray(ch(x0))
    t0 = time.perf_counter()
    np.asarray(ch(x0))
    el = time.perf_counter() - t0
    print(f"{name:30s} {1e3 * el / iters:8.3f} ms/iter", flush=True)


def main():
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from box2d_mt_tpu import world, settings
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import replicate_state
    from box2d_mt_tpu.ops import broadphase, coloring, islands, integrate
    from box2d_mt_tpu.ops import narrowphase as nph
    from box2d_mt_tpu.ops import solver as csolver
    from box2d_mt_tpu.ops.gather import gather_rows

    base = scenes.pyramid(10)
    states = replicate_state(base, n_worlds)
    kinds = world.possible_kinds(base)
    dt = jnp.float32(1 / 60)

    nb = base.bodies.capacity
    nc = base.contacts.capacity
    nf = base.fixtures.capacity
    print(f"W={n_worlds} N={nb} C={nc} F={nf} kinds={kinds}")

    vg = jax.vmap(gather_rows)

    def fblob_of(s):
        fx = s.fixtures
        W = fx.body.shape[0]
        return jnp.concatenate([
            fx.verts.reshape(W, nf, 16), fx.normals.reshape(W, nf, 16),
            fx.radius[..., None], fx.nverts.astype(jnp.float32)[..., None],
            fx.ghosts.astype(jnp.float32),
            fx.shape_type.astype(jnp.float32)[..., None],
            fx.body.astype(jnp.float32)[..., None],
            fx.is_sensor.astype(jnp.float32)[..., None]], axis=-1)

    def gath(s):
        ia = jnp.clip(s.contacts.f_a, 0)
        ib = jnp.clip(s.contacts.f_b, 0)
        return vg(fblob_of(s), jnp.concatenate([ia, ib], axis=1))

    timeit("fblob+gather (2C,39)", gath, states)

    g0 = jax.jit(gath)(states)

    def unpack_rows(r):
        return nph.ShapeRows(
            verts=r[..., 0:16].reshape(-1, 8, 2),
            normals=r[..., 16:32].reshape(-1, 8, 2),
            nverts=r[..., 33].astype(jnp.int32),
            ghosts=r[..., 34:36] > 0.5,
            radius=r[..., 32])

    def coll(s, g):
        W = g.shape[0]
        rows_a = unpack_rows(g[:, :nc].reshape(W * nc, -1))
        rows_b = unpack_rows(g[:, nc:].reshape(W * nc, -1))
        type_ab = g[..., 36].astype(jnp.int32)
        body_ab = jnp.clip(g[..., 37].astype(jnp.int32), 0)
        p, q = jax.vmap(world._body_xf)(s.bodies)
        pq = jnp.concatenate([p, q], axis=-1)
        pq_ab = vg(pq, body_ab).reshape(W * 2 * nc, 4)
        kind = nph.contact_kind(type_ab[:, :nc], type_ab[:, nc:]).reshape(-1)
        man = jax.vmap(lambda *a: nph.collide(*a, kinds=kinds))(
            kind, rows_a, pq_ab[:W * nc, 0:2], pq_ab[:W * nc, 2:4],
            rows_b, pq_ab[W * nc:, 0:2], pq_ab[W * nc:, 2:4])
        return man.points

    timeit("collide (gated kinds)", coll, states, g0)

    def isl(s):
        fx = s.fixtures
        ia = jnp.clip(s.contacts.f_a, 0)
        ib = jnp.clip(s.contacts.f_b, 0)
        take = jax.vmap(lambda t, i: t[i])
        ba = jnp.clip(take(fx.body, ia), 0)
        bb = jnp.clip(take(fx.body, ib), 0)
        ns = s.bodies.exists & ~s.bodies.is_static
        return jax.vmap(lambda a_, b_, t_, n_: islands.island_labels(
            nb, a_, b_, t_, n_))(ba, bb, s.contacts.touching, ns)

    timeit("island_labels", isl, states)

    def col(s):
        fx = s.fixtures
        ia = jnp.clip(s.contacts.f_a, 0)
        ib = jnp.clip(s.contacts.f_b, 0)
        take = jax.vmap(lambda t, i: t[i])
        ba = jnp.clip(take(fx.body, ia), 0)
        bb = jnp.clip(take(fx.body, ib), 0)
        dyn = s.bodies.is_dynamic
        takeb = jax.vmap(lambda t, i: t[i])
        return jax.vmap(lambda a_, b_, da, db, t_: coloring.color_constraints(
            a_, b_, da, db, t_, nb, 16)[0])(
            ba, bb, takeb(dyn, ba), takeb(dyn, bb), s.contacts.touching)

    timeit("coloring (16)", col, states)

    def icc(s):
        return jax.vmap(lambda c_, f_, b_: csolver.init_contact_constraints(
            c_, f_, b_, b_.c, b_.a, b_.v, b_.w, c_.touching).normal)(
            s.contacts, s.fixtures, s.bodies)

    timeit("init_contact_constraints", icc, states)

    def iv(s):
        return jax.vmap(lambda b_, m_: integrate.integrate_velocities(
            b_, s.gravity[0], dt, m_))(
            s.bodies, s.bodies.awake & ~s.bodies.is_static)

    timeit("integrate_velocities", iv, states)

    def pairs(s):
        f_a, f_b, _ = jax.vmap(
            lambda ss: broadphase.find_pairs_allpairs(ss, nc))(s)
        return f_a

    timeit("find_pairs", pairs, states)

    def carry(s):
        f_a, f_b, _ = jax.vmap(
            lambda ss: broadphase.find_pairs_allpairs(ss, nc))(s)
        c2 = jax.vmap(lambda c_, fa, fb: broadphase.carry_over_contacts(
            c_, fa, fb, nf))(s.contacts, f_a, f_b)
        return c2.normal_impulse

    timeit("find_pairs+carry_over", carry, states)

    def presolve(s):
        return jax.vmap(
            lambda ss: world._pre_solve(ss, dt, True, 16, kinds).bs)(s)

    timeit("pre_solve (all)", presolve, states)


if __name__ == "__main__":
    main()
