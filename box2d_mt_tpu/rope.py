"""Standalone position-based-dynamics rope (reference: Rope/b2Rope.cpp:1-259).

Not world-integrated, exactly like the reference: a rope is its own little
simulation with stretch (C2) and bending (C3) constraints solved by
sequential Gauss-Seidel. The constraint sweeps are order-dependent, so they
run as a `lax.scan` over segments — bit-faithful to the reference's loops —
while `jax.vmap(rope_step)` batches thousands of independent ropes, which is
where the TPU throughput comes from (one rope's 40-segment scan is latency,
4096 ropes' scans are one vectorized program).

API:
    state = make_rope(vertices, masses, gravity, damping=0., k2=1., k3=0.1)
    state = rope_step(state, h, iterations)      # jittable / vmappable
    state = set_angle(state, angle)              # b2Rope::SetAngle
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

PI = 3.14159265358979323846


class RopeState(NamedTuple):
    """b2Rope's arrays (b2Rope.h:63-114) as a pytree."""
    ps: jax.Array        # (N,2) positions
    vs: jax.Array        # (N,2) velocities
    ims: jax.Array       # (N,) inverse masses
    lengths: jax.Array   # (N-1,) rest lengths
    angles: jax.Array    # (N-2,) rest joint angles
    gravity: jax.Array   # (2,)
    damping: jax.Array   # ()
    k2: jax.Array        # () stretch stiffness
    k3: jax.Array        # () bend stiffness


def make_rope(vertices, masses, gravity=(0.0, -10.0), damping=0.0,
              k2=1.0, k3=0.1) -> RopeState:
    """b2Rope::Initialize (b2Rope.cpp:46-103)."""
    ps = np.asarray(vertices, np.float32)
    m = np.asarray(masses, np.float32)
    assert ps.shape[0] >= 3, "reference requires count >= 3"
    ims = np.where(m > 0.0, 1.0 / np.where(m > 0.0, m, 1.0), 0.0)
    d = ps[1:] - ps[:-1]
    lengths = np.sqrt((d ** 2).sum(-1))
    d1, d2 = d[:-1], d[1:]
    angles = np.arctan2(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0],
                        (d1 * d2).sum(-1))
    return RopeState(
        ps=jnp.asarray(ps), vs=jnp.zeros_like(jnp.asarray(ps)),
        ims=jnp.asarray(ims.astype(np.float32)),
        lengths=jnp.asarray(lengths.astype(np.float32)),
        angles=jnp.asarray(angles.astype(np.float32)),
        gravity=jnp.asarray(gravity, jnp.float32),
        damping=jnp.float32(damping), k2=jnp.float32(k2),
        k3=jnp.float32(k3))


def set_angle(state: RopeState, angle) -> RopeState:
    """b2Rope::SetAngle (b2Rope.cpp:171-178)."""
    return state._replace(angles=jnp.full_like(state.angles, angle))


def _solve_c2(ps, ims, lengths, k2):
    """Stretch constraints, sequential (b2Rope::SolveC2, b2Rope.cpp:140-168)."""
    n = ps.shape[0]

    def body(ps, i):
        p1 = ps[i]
        p2 = ps[i + 1]
        d = p2 - p1
        length = jnp.sqrt(jnp.sum(d * d))
        dn = d / jnp.where(length > 0.0, length, 1.0)
        im1 = ims[i]
        im2 = ims[i + 1]
        s = im1 + im2
        ok = s != 0.0
        inv = 1.0 / jnp.where(ok, s, 1.0)
        corr = k2 * (lengths[i] - length)
        p1n = p1 - (im1 * inv) * corr * dn
        p2n = p2 + (im2 * inv) * corr * dn
        ps = ps.at[i].set(jnp.where(ok, p1n, p1))
        ps = ps.at[i + 1].set(jnp.where(ok, p2n, p2))
        return ps, None

    ps, _ = jax.lax.scan(body, ps, jnp.arange(n - 1))
    return ps


def _solve_c3(ps, ims, angles, k3):
    """Bending constraints, sequential (b2Rope::SolveC3, b2Rope.cpp:180-249)."""
    n = ps.shape[0]

    def body(ps, i):
        p1, p2, p3 = ps[i], ps[i + 1], ps[i + 2]
        m1, m2, m3 = ims[i], ims[i + 1], ims[i + 2]
        d1 = p2 - p1
        d2 = p3 - p2
        l1 = jnp.sum(d1 * d1)
        l2 = jnp.sum(d2 * d2)
        ok = l1 * l2 != 0.0
        a = d1[0] * d2[1] - d1[1] * d2[0]
        b = jnp.sum(d1 * d2)
        angle = jnp.arctan2(a, b)

        jd1 = (-1.0 / jnp.where(l1 != 0.0, l1, 1.0)) * jnp.array(
            [-d1[1], d1[0]])
        jd2 = (1.0 / jnp.where(l2 != 0.0, l2, 1.0)) * jnp.array(
            [-d2[1], d2[0]])
        j1 = -jd1
        j2 = jd1 - jd2
        j3 = jd2
        mass = (m1 * jnp.sum(j1 * j1) + m2 * jnp.sum(j2 * j2)
                + m3 * jnp.sum(j3 * j3))
        ok = ok & (mass != 0.0)
        inv_mass = 1.0 / jnp.where(mass != 0.0, mass, 1.0)

        # wrap C into (-pi, pi] (the reference's while loops)
        c = angle - angles[i]
        c = c - 2.0 * PI * jnp.floor((c + PI) / (2.0 * PI))
        impulse = -k3 * inv_mass * c

        ps = ps.at[i].set(jnp.where(ok, p1 + (m1 * impulse) * j1, p1))
        ps = ps.at[i + 1].set(jnp.where(ok, p2 + (m2 * impulse) * j2, p2))
        ps = ps.at[i + 2].set(jnp.where(ok, p3 + (m3 * impulse) * j3, p3))
        return ps, None

    ps, _ = jax.lax.scan(body, ps, jnp.arange(n - 2))
    return ps


def rope_step(state: RopeState, h, iterations: int = 1) -> RopeState:
    """b2Rope::Step (b2Rope.cpp:105-138): integrate, iterate C2/C3/C2,
    derive velocities from position deltas."""
    h = jnp.asarray(h, jnp.float32)
    d = jnp.exp(-h * state.damping)
    movable = state.ims > 0.0
    vs = jnp.where(movable[:, None], state.vs + h * state.gravity, state.vs)
    vs = vs * d
    p0s = state.ps
    ps = state.ps + h * vs

    def it(_, ps):
        ps = _solve_c2(ps, state.ims, state.lengths, state.k2)
        ps = _solve_c3(ps, state.ims, state.angles, state.k3)
        ps = _solve_c2(ps, state.ims, state.lengths, state.k2)
        return ps

    ps = jax.lax.fori_loop(0, iterations, it, ps)
    inv_h = jnp.where(h != 0.0, 1.0 / jnp.where(h != 0.0, h, 1.0), 0.0)
    vs = inv_h * (ps - p0s)
    # h == 0 is a no-op (b2Rope.cpp:107-110)
    zero = h == 0.0
    return state._replace(ps=jnp.where(zero, state.ps, ps),
                          vs=jnp.where(zero, state.vs, vs))
