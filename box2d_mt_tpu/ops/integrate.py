"""Velocity/position integration (b2Island::Solve integration blocks,
b2Island.cpp:192-230 and :283-313)."""

import jax.numpy as jnp

from .. import settings
from ..math2d import dot


def integrate_velocities(bodies, gravity, dt, solve_mask):
    """Semi-implicit Euler + Padé damping for awake dynamic bodies."""
    dyn = solve_mask & bodies.is_dynamic
    v = bodies.v + dt * (bodies.gravity_scale[:, None] * gravity[None, :]
                         + bodies.inv_mass[:, None] * bodies.force)
    w = bodies.w + dt * bodies.inv_inertia * bodies.torque
    v = v * (1.0 / (1.0 + dt * bodies.linear_damping))[:, None]
    w = w * (1.0 / (1.0 + dt * bodies.angular_damping))
    v = jnp.where(dyn[:, None], v, bodies.v)
    w = jnp.where(dyn, w, bodies.w)
    return v, w


def integrate_positions(c, a, v, w, dt, move_mask):
    """Integrate with translation/rotation clamps. Returns (c, a, v, w) —
    note the reference clamps *velocities* when the step would exceed the
    limits (b2Island.cpp:290-303)."""
    translation2 = dt * dt * dot(v, v)
    tlen = jnp.sqrt(jnp.maximum(translation2, 1e-30))
    ratio_t = jnp.where(translation2 > settings.MAX_TRANSLATION_SQUARED,
                        settings.MAX_TRANSLATION / tlen, 1.0)
    v = v * ratio_t[:, None]
    rotation = dt * w
    ratio_r = jnp.where(rotation * rotation > settings.MAX_ROTATION_SQUARED,
                        settings.MAX_ROTATION / jnp.abs(jnp.where(rotation == 0.0, 1.0, rotation)),
                        1.0)
    w = w * ratio_r

    c_new = c + dt * v
    a_new = a + dt * w
    c = jnp.where(move_mask[:, None], c_new, c)
    a = jnp.where(move_mask, a_new, a)
    return c, a, v, w
