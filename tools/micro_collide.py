#!/usr/bin/env python
"""Micro-profile of _collide_b internals on the bench workload."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(out):
    import numpy as _np
    leaf = jax.tree.leaves(out)[0]
    _np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_worlds = int(os.environ.get("W", "512"))
    from box2d_mt_tpu import world as W
    from box2d_mt_tpu.models import scenes
    from box2d_mt_tpu.parallel.sharding import replicate_state, make_rollout
    from box2d_mt_tpu.ops import narrowphase as nph

    state = scenes.pyramid(10)
    states = replicate_state(state, n_worlds)
    kinds = W.possible_kinds(state)
    print("kinds:", kinds)
    dt = jnp.float32(1 / 60)
    warm = make_rollout(30, kinds=kinds)
    states = warm(states, dt)
    jax.block_until_ready(states.bodies.c)

    t = timeit(jax.jit(lambda s: W._collide_b(s, kinds)), states)
    print(f"collide full (kinds={kinds}): {t:.2f} ms")
    t = timeit(jax.jit(lambda s: W._collide_b(s, kinds[:1])), states)
    print(f"collide dense-only: {t:.2f} ms")

    # dense pass decomposition
    def gathers_only(ss):
        fx = ss.fixtures
        contacts = ss.contacts
        n_worlds = fx.body.shape[0]
        nf = fx.capacity
        from box2d_mt_tpu.ops.gather import gather_rows
        vgather = jax.vmap(gather_rows)
        ia = jnp.clip(contacts.f_a, 0)
        ib = jnp.clip(contacts.f_b, 0)
        iab = jnp.concatenate([ia, ib], axis=1)
        fblob = jnp.concatenate([
            fx.verts.reshape(n_worlds, nf, 16),
            fx.normals.reshape(n_worlds, nf, 16),
            fx.radius[..., None], fx.nverts.astype(jnp.float32)[..., None],
            fx.ghosts.astype(jnp.float32),
            fx.shape_type.astype(jnp.float32)[..., None],
            fx.body.astype(jnp.float32)[..., None],
            fx.is_sensor.astype(jnp.float32)[..., None],
        ], axis=-1)
        g = vgather(fblob, iab)
        p_all, q_all = jax.vmap(W._body_xf)(ss.bodies)
        pq = jnp.concatenate([p_all, q_all], axis=-1)
        body_ab = jnp.clip(g[..., 37].astype(jnp.int32), 0)
        pq_ab = vgather(pq, body_ab)
        return g, pq_ab

    t = timeit(jax.jit(gathers_only), states)
    print(f"collide gathers only: {t:.2f} ms")

    # raw vmapped polygon collider on prepared inputs
    g, pq_ab = jax.jit(gathers_only)(states)
    nc = states.contacts.capacity

    def poly_only(g, pq_ab):
        flat2 = lambda x: x.reshape((n_worlds * nc,) + x.shape[2:])

        def unpack_rows(r):
            return nph.ShapeRows(
                verts=r[..., 0:16].reshape(-1, 8, 2),
                normals=r[..., 16:32].reshape(-1, 8, 2),
                nverts=r[..., 33].astype(jnp.int32),
                ghosts=r[..., 34:36] > 0.5,
                radius=r[..., 32])
        man = jax.vmap(nph.collide_polygons)(
            unpack_rows(flat2(g[:, :nc])),
            flat2(pq_ab[:, :nc, 0:2]), flat2(pq_ab[:, :nc, 2:4]),
            unpack_rows(flat2(g[:, nc:])),
            flat2(pq_ab[:, nc:, 0:2]), flat2(pq_ab[:, nc:, 2:4]))
        return man

    t = timeit(jax.jit(poly_only), g, pq_ab)
    print(f"polygon collider on prepped inputs: {t:.2f} ms")


if __name__ == "__main__":
    main()
