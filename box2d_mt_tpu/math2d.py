"""Batched 2D math primitives.

Functional equivalents of the reference's b2Vec2/b2Rot/b2Transform/b2Sweep
(reference: Box2D/Common/b2Math.h:35-383), redesigned for TPU: every op is
elementwise over arrays whose last axis is the 2-vector, so a "transform" is
just a pair of arrays (center `p` of shape (..., 2) and rotation `q` as
(sin, cos) pairs of shape (..., 2)) and all helpers vectorize over arbitrary
leading batch dimensions. No classes on the hot path — pure jnp functions.
"""

import jax.numpy as jnp

# Rotations are stored as (..., 2) arrays holding (sin, cos) — same layout as
# the reference's b2Rot (b2Math.h:281).


def rot_from_angle(angle):
    """b2Rot::Set (b2Math.h:288-293)."""
    return jnp.stack([jnp.sin(angle), jnp.cos(angle)], axis=-1)


def rot_identity(shape=()):
    return jnp.broadcast_to(jnp.array([0.0, 1.0], jnp.float32), (*shape, 2))


def rot_xaxis(q):
    """b2Rot::GetXAxis (b2Math.h:311): (c, s)."""
    return jnp.stack([q[..., 1], q[..., 0]], axis=-1)


def rot_yaxis(q):
    """b2Rot::GetYAxis (b2Math.h:317): (-s, c)."""
    return jnp.stack([-q[..., 0], q[..., 1]], axis=-1)


def rot_vec(q, v):
    """b2Mul(q, v) (b2Math.h:451-454): rotate v by q."""
    s, c = q[..., 0], q[..., 1]
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def rot_t_vec(q, v):
    """b2MulT(q, v) (b2Math.h:457-460): inverse-rotate v by q."""
    s, c = q[..., 0], q[..., 1]
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x + s * y, -s * x + c * y], axis=-1)


def rot_mul(q, r):
    """b2Mul(q, r) (b2Math.h:429-439): compose rotations q*r."""
    qs, qc = q[..., 0], q[..., 1]
    rs, rc = r[..., 0], r[..., 1]
    return jnp.stack([qs * rc + qc * rs, qc * rc - qs * rs], axis=-1)


def rot_mul_t(q, r):
    """b2MulT(q, r) (b2Math.h:441-448): compose qT * r."""
    qs, qc = q[..., 0], q[..., 1]
    rs, rc = r[..., 0], r[..., 1]
    return jnp.stack([qc * rs - qs * rc, qc * rc + qs * rs], axis=-1)


def rot_angle(q):
    """b2Rot::GetAngle (b2Math.h:305)."""
    return jnp.arctan2(q[..., 0], q[..., 1])


def transform_point(p, q, v):
    """b2Mul(T, v) (b2Math.h:462-468): world point of local v."""
    return rot_vec(q, v) + p


def transform_t_point(p, q, v):
    """b2MulT(T, v) (b2Math.h:470-477): local point of world v."""
    return rot_t_vec(q, v - p)


def transform_mul_t(pa, qa, pb, qb):
    """b2MulT(A, B) (b2Math.h:488-495): A^-1 * B as (p, q)."""
    q = rot_mul_t(qa, qb)
    p = rot_t_vec(qa, pb - pa)
    return p, q


def cross_vv(a, b):
    """b2Cross(a, b) (b2Math.h:402): scalar cross of two 2-vectors."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def cross_vs(v, s):
    """b2Cross(v, s) (b2Math.h:408-411)."""
    return jnp.stack([s * v[..., 1], -s * v[..., 0]], axis=-1)


def cross_sv(s, v):
    """b2Cross(s, v) (b2Math.h:414-417)."""
    return jnp.stack([-s * v[..., 1], s * v[..., 0]], axis=-1)


def dot(a, b):
    """b2Dot (b2Math.h:396)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]


def skew(v):
    """b2Vec2::Skew (b2Math.h:115): perpendicular (-y, x)."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v, eps=1.1754943508222875e-38):
    """b2Vec2::Normalize (b2Math.h:98-110): returns (unit, length); zero
    vectors normalize to zero, matching the reference's epsilon guard."""
    ln = length(v)
    safe = jnp.where(ln < eps, 1.0, ln)
    unit = jnp.where((ln < eps)[..., None], jnp.zeros_like(v), v / safe[..., None])
    return unit, ln


def clamp_vec(v, lo, hi):
    return jnp.clip(v, lo, hi)


def mat22_solve(a11, a12, a21, a22, bx, by):
    """b2Mat22::Solve (b2Math.h:203-214): solve 2x2 system with the
    reference's zero-determinant guard (det==0 -> zero solution)."""
    det = a11 * a22 - a12 * a21
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    x = inv_det * (a22 * bx - a12 * by)
    y = inv_det * (a11 * by - a21 * bx)
    return x, y


def sweep_get_transform(local_center, c0, c, a0, a, beta):
    """b2Sweep::GetTransform (b2Math.h:645-656): interpolated transform at
    fraction beta between (c0, a0) and (c, a), shifted by local center."""
    pos = (1.0 - beta)[..., None] * c0 + beta[..., None] * c
    angle = (1.0 - beta) * a0 + beta * a
    q = rot_from_angle(angle)
    p = pos - rot_vec(q, local_center)
    return p, q


def sweep_advance(c0, c, a0, a, alpha0, alpha):
    """b2Sweep::Advance (b2Math.h:658-666): advance the t=0 state to alpha,
    returning (c0', a0', alpha0')."""
    beta = (alpha - alpha0) / (1.0 - alpha0)
    c0n = c0 + beta[..., None] * (c - c0)
    a0n = a0 + beta * (a - a0)
    return c0n, a0n, alpha
