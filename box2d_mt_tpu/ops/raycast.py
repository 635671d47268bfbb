"""Ray casts and AABB queries.

Vectorized equivalents of the reference's shape ray casts
(b2CircleShape.cpp:84-120, b2PolygonShape.cpp RayCast, b2EdgeShape.cpp:30-91)
and the b2World::RayCast / QueryAABB tree traversals (b2World.cpp:1752-1795):
instead of walking a tree with callbacks, every fixture is tested in one
fused pass and results come back as arrays (closest hit or full hit masks).
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import dot, normalize, rot_from_angle, rot_t_vec, rot_vec

_I8 = np.arange(settings.MAX_POLYGON_VERTICES)
BIG = 3.402823466e38


class RayHit(NamedTuple):
    hit: jax.Array       # bool
    fraction: jax.Array  # f32 in [0, max_fraction]
    point: jax.Array     # (2,) world hit point
    normal: jax.Array    # (2,) world normal


def _raycast_circle(center_l, radius, p1, p2, max_fraction):
    """b2CircleShape::RayCast (b2CircleShape.cpp:84-120), local frame."""
    s = p1 - center_l
    b = dot(s, s) - radius * radius
    r = p2 - p1
    c = dot(s, r)
    rr = dot(r, r)
    sigma = c * c - rr * b
    ok = (sigma >= 0.0) & (rr >= 1.1920929e-7)
    t = -(c + jnp.sqrt(jnp.maximum(sigma, 0.0)))
    ok &= (0.0 <= t) & (t <= max_fraction * rr)
    t = t / jnp.where(rr > 0.0, rr, 1.0)
    normal, _ = normalize(s + t * r)
    return ok, t, normal


def _raycast_polygon(verts, normals, count, p1, p2, max_fraction):
    """b2PolygonShape::RayCast: half-plane clipping, local frame."""
    d = p2 - p1
    valid = _I8 < count
    num = dot(normals, verts - p1[None, :])      # (8,)
    den = dot(normals, d[None, :])               # (8,)
    t = num / jnp.where(den != 0.0, den, 1.0)
    # entering planes raise lower; exiting planes cut upper
    entering = valid & (den < 0.0)
    exiting = valid & (den > 0.0)
    parallel_out = valid & (den == 0.0) & (num < 0.0)
    lower_cand = jnp.where(entering, t, -BIG)
    lower = jnp.max(jnp.concatenate([lower_cand, jnp.zeros(1)]))
    idx = jnp.argmax(jnp.where(entering & (t == lower), 1, 0))
    upper_cand = jnp.where(exiting, t, BIG)
    upper = jnp.min(jnp.concatenate([upper_cand, jnp.full(1, max_fraction)]))
    has_lower = jnp.any(entering & (t >= lower))
    ok = ~jnp.any(parallel_out) & (lower <= upper) & has_lower & \
        (lower >= 0.0) & (lower <= max_fraction)
    return ok, lower, normals[idx]


def _raycast_edge(v1, v2, p1, p2, max_fraction):
    """b2EdgeShape::RayCast (b2EdgeShape.cpp:30-91), local frame."""
    d = p2 - p1
    e = v2 - v1
    normal, _ = normalize(jnp.stack([e[1], -e[0]]))
    num = dot(normal, v1 - p1)
    den = dot(normal, d)
    ok = den != 0.0
    t = num / jnp.where(den != 0.0, den, 1.0)
    ok &= (t >= 0.0) & (t <= max_fraction)
    q = p1 + t * d
    ee = dot(e, e)
    s = dot(q - v1, e) / jnp.where(ee > 0.0, ee, 1.0)
    ok &= (ee > 0.0) & (s >= 0.0) & (s <= 1.0)
    normal = jnp.where(dot(normal, d) > 0.0, -normal, normal)
    return ok, t, normal


def raycast_fixture(shape_type, verts, normals, nverts, radius,
                    p, q, p1, p2, max_fraction):
    """Ray cast one fixture (world-frame ray). Returns RayHit."""
    lp1 = rot_t_vec(q, p1 - p)
    lp2 = rot_t_vec(q, p2 - p)
    ok_c, t_c, n_c = _raycast_circle(verts[0], radius, lp1, lp2, max_fraction)
    ok_p, t_p, n_p = _raycast_polygon(verts, normals, nverts, lp1, lp2,
                                      max_fraction)
    ok_e, t_e, n_e = _raycast_edge(verts[0], verts[1], lp1, lp2, max_fraction)

    is_c = shape_type == settings.SHAPE_CIRCLE
    is_e = shape_type == settings.SHAPE_EDGE
    ok = jnp.where(is_c, ok_c, jnp.where(is_e, ok_e, ok_p))
    t = jnp.where(is_c, t_c, jnp.where(is_e, t_e, t_p))
    n_local = jnp.where(is_c, n_c, jnp.where(is_e, n_e, n_p))
    point = p1 + t[..., None] * (p2 - p1)
    return RayHit(hit=ok, fraction=jnp.where(ok, t, BIG),
                  point=point, normal=rot_vec(q, n_local))


def ray_cast_all(state, p1, p2, max_fraction=1.0):
    """Ray cast against every fixture. Returns RayHit with (F,) leading dim
    — the functional replacement for b2RayCastCallback enumeration."""
    fx = state.fixtures
    bodies = state.bodies
    q = rot_from_angle(bodies.a)
    p = bodies.c - rot_vec(q, bodies.local_center)
    fb = jnp.clip(fx.body, 0)
    p1 = jnp.asarray(p1, jnp.float32)
    p2 = jnp.asarray(p2, jnp.float32)
    hits = jax.vmap(raycast_fixture, in_axes=(0, 0, 0, 0, 0, 0, 0,
                                              None, None, None))(
        fx.shape_type, fx.verts, fx.normals, fx.nverts, fx.radius,
        p[fb], q[fb], p1, p2, jnp.float32(max_fraction))
    alive = fx.exists & bodies.enabled[fb]
    return RayHit(hit=hits.hit & alive,
                  fraction=jnp.where(alive, hits.fraction, BIG),
                  point=hits.point, normal=hits.normal)


def ray_cast_closest(state, p1, p2, max_fraction=1.0):
    """b2World::RayCast with a closest-hit callback: returns
    (hit, fixture_index, point, normal, fraction)."""
    hits = ray_cast_all(state, p1, p2, max_fraction)
    idx = jnp.argmin(hits.fraction).astype(jnp.int32)
    hit = hits.hit[idx]
    return (hit, jnp.where(hit, idx, -1), hits.point[idx],
            hits.normal[idx], hits.fraction[idx])


def query_aabb(state, lower, upper, use_fat: bool = True):
    """b2World::QueryAABB: (F,) mask of fixtures whose (fat) broad-phase
    AABB overlaps the query box — same semantics as the reference's tree
    query over fattened proxies."""
    fx = state.fixtures
    lower = jnp.asarray(lower, jnp.float32)
    upper = jnp.asarray(upper, jnp.float32)
    if use_fat:
        lo, hi = fx.aabb_lo, fx.aabb_hi
    else:
        from .broadphase import tight_aabbs
        bodies = state.bodies
        q = rot_from_angle(bodies.a)
        p = bodies.c - rot_vec(q, bodies.local_center)
        fb = jnp.clip(fx.body, 0)
        lo, hi = tight_aabbs(fx, p[fb], q[fb])
    overlap = jnp.all((lo <= upper[None, :]) & (lower[None, :] <= hi), axis=1)
    return overlap & fx.exists
