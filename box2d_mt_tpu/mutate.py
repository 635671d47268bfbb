"""Functional between-step mutations — the b2Body/b2World setter API
(reference: b2Body.h:139-430) as pure State -> State transforms.

All functions are jit-friendly and take either scalar body indices or index
arrays; they are the TPU replacement for calling setters on body pointers
between steps.
"""

import dataclasses

import jax.numpy as jnp

from . import settings
from .math2d import cross_sv, rot_from_angle, rot_vec
from .state import State


def _upd_bodies(state, **kw):
    return dataclasses.replace(state, bodies=dataclasses.replace(state.bodies, **kw))


def set_transform(state: State, body, position, angle) -> State:
    """b2Body::SetTransform: origin position + angle; recomputes sweep
    center; resets sweep start. Does NOT wake the body (reference behavior)."""
    b = state.bodies
    position = jnp.asarray(position, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    q = rot_from_angle(angle)
    c = position + rot_vec(q, b.local_center[body])
    bodies = dataclasses.replace(
        b,
        c=b.c.at[body].set(c), a=b.a.at[body].set(angle),
        c0=b.c0.at[body].set(c), a0=b.a0.at[body].set(angle))
    state = dataclasses.replace(state, bodies=bodies)
    return _resync_fixtures(state, body)


def _resync_fixtures(state: State, body) -> State:
    """Refresh fat AABBs of the moved body's fixtures so the next step's
    pair pass sees the teleport (b2Body::SetTransform synchronizes proxies)."""
    from .ops import broadphase
    fx = state.fixtures
    bset = jnp.isin(fx.body, jnp.atleast_1d(jnp.asarray(body)))
    q = rot_from_angle(state.bodies.a)
    p = state.bodies.c - rot_vec(q, state.bodies.local_center)
    fb = jnp.clip(fx.body, 0)
    lo, hi = broadphase.tight_aabbs(fx, p[fb], q[fb])
    lo -= settings.AABB_EXTENSION
    hi += settings.AABB_EXTENSION
    fx = dataclasses.replace(
        fx,
        aabb_lo=jnp.where(bset[:, None], lo, fx.aabb_lo),
        aabb_hi=jnp.where(bset[:, None], hi, fx.aabb_hi))
    return dataclasses.replace(state, fixtures=fx)


def set_linear_velocity(state: State, body, v) -> State:
    b = state.bodies
    return _upd_bodies(state, v=b.v.at[body].set(jnp.asarray(v, jnp.float32)),
                       awake=b.awake.at[body].set(True))


def set_angular_velocity(state: State, body, w) -> State:
    b = state.bodies
    return _upd_bodies(state, w=b.w.at[body].set(jnp.float32(w)),
                       awake=b.awake.at[body].set(True))


def apply_force(state: State, body, force, point=None, wake=True) -> State:
    """b2Body::ApplyForce / ApplyForceToCenter."""
    b = state.bodies
    force = jnp.asarray(force, jnp.float32)
    new_force = b.force.at[body].add(force)
    if point is None:
        new_torque = b.torque
    else:
        point = jnp.asarray(point, jnp.float32)
        r = point - b.c[body]
        new_torque = b.torque.at[body].add(r[..., 0] * force[..., 1]
                                           - r[..., 1] * force[..., 0])
    kw = dict(force=new_force, torque=new_torque)
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_torque(state: State, body, torque, wake=True) -> State:
    b = state.bodies
    kw = dict(torque=b.torque.at[body].add(jnp.float32(torque)))
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_linear_impulse(state: State, body, impulse, point, wake=True) -> State:
    """b2Body::ApplyLinearImpulse."""
    b = state.bodies
    impulse = jnp.asarray(impulse, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    r = point - b.c[body]
    new_v = b.v.at[body].add(b.inv_mass[body, None] * impulse)
    new_w = b.w.at[body].add(b.inv_inertia[body] *
                             (r[..., 0] * impulse[..., 1] - r[..., 1] * impulse[..., 0]))
    kw = dict(v=new_v, w=new_w)
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_angular_impulse(state: State, body, impulse, wake=True) -> State:
    b = state.bodies
    kw = dict(w=b.w.at[body].add(b.inv_inertia[body] * jnp.float32(impulse)))
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def set_awake(state: State, body, flag: bool) -> State:
    b = state.bodies
    if flag:
        return _upd_bodies(state, awake=b.awake.at[body].set(True),
                           sleep_time=b.sleep_time.at[body].set(0.0))
    return _upd_bodies(
        state,
        awake=b.awake.at[body].set(False),
        sleep_time=b.sleep_time.at[body].set(0.0),
        v=b.v.at[body].set(0.0), w=b.w.at[body].set(0.0),
        force=b.force.at[body].set(0.0), torque=b.torque.at[body].set(0.0))
