"""Standalone PBD rope vs reference golden trace (Rope/b2Rope.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from box2d_mt_tpu import rope

from conftest import load_jsonl


def _build():
    n = 40
    vertices = [(0.0, 20.0 - 0.25 * i) for i in range(n)]
    masses = [1.0] * n
    masses[0] = 0.0
    masses[1] = 0.0
    st = rope.make_rope(vertices, masses, gravity=(0.0, -10.0),
                        damping=0.1, k2=1.0, k3=0.5)
    return rope.set_angle(st, 0.25 * 3.14159265)


def test_rope_matches_reference():
    st = _build()
    ref = load_jsonl("rope_pbd_240.jsonl")
    step = jax.jit(lambda s: rope.rope_step(s, 1 / 60, 1))
    errs = []
    for i in range(240):
        st = step(st)
        ps = np.asarray(st.ps)
        errs.append(np.abs(ps - np.asarray(ref[i]["ps"])).max())
    # sequential PBD in f32: tiny per-step drift accumulates; the swing is
    # ~10 m in amplitude, so centimeter agreement over 4 s is tight parity
    assert max(errs[:60]) < 2e-3, max(errs[:60])
    assert max(errs) < 0.05, max(errs)


def test_rope_batched():
    """vmapped ropes step independently and identically."""
    st = _build()
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (8,) + x.shape),
                           st)
    step1 = jax.jit(lambda s: rope.rope_step(s, 1 / 60, 1))
    stepn = jax.jit(jax.vmap(lambda s: rope.rope_step(s, 1 / 60, 1)))
    for _ in range(10):
        st = step1(st)
        batched = stepn(batched)
    np.testing.assert_allclose(np.asarray(batched.ps[3]), np.asarray(st.ps),
                               rtol=0, atol=1e-6)


def test_rope_zero_dt_noop():
    st = _build()
    st2 = jax.jit(lambda s: rope.rope_step(s, 0.0, 1))(st)
    np.testing.assert_array_equal(np.asarray(st2.ps), np.asarray(st.ps))
