"""Batched joint constraint solvers.

Each implemented joint type re-derives its reference solver
(Box2D/Dynamics/Joints/b2{Revolute,Distance,Prismatic}Joint.cpp) as array
ops over the typed SoA block. All types share one coloring pass (joints
conflict through shared dynamic bodies exactly like contacts), and within a
color every type's masked kernel scatters to disjoint bodies.

Limit states (e_inactiveLimit/e_atLower/e_atUpper/e_equalLimits,
b2Joint.h:77-84) persist across steps in the joint block and gate impulse
resets at init, matching the reference's hysteresis.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import cross_sv, cross_vv, dot, rot_from_angle, rot_vec
from ..ops import coloring

# limit states (b2Joint.h:77-84)
LIMIT_INACTIVE = 0
LIMIT_AT_LOWER = 1
LIMIT_AT_UPPER = 2
LIMIT_EQUAL = 3


def _solve22(k11, k12, k22, bx, by):
    det = k11 * k22 - k12 * k12
    inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    return inv * (k22 * bx - k12 * by), inv * (k11 * by - k12 * bx)


def _solve33(k11, k12, k13, k22, k23, k33, bx, by, bz):
    """b2Mat33::Solve33 (b2Math.cpp): Cramer with zero-det guard."""
    # det = ex . (ey x ez) with symmetric K
    cx = k22 * k33 - k23 * k23
    cy = k23 * k13 - k12 * k33
    cz = k12 * k23 - k22 * k13
    det = k11 * cx + k12 * cy + k13 * cz
    inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    x = inv * (bx * cx + by * cy + bz * cz)
    y = inv * (bx * cy
               + by * (k11 * k33 - k13 * k13)
               + bz * (k13 * k12 - k11 * k23))
    z = inv * (bx * cz
               + by * (k13 * k12 - k11 * k23)
               + bz * (k11 * k22 - k12 * k12))
    return x, y, z


class _Common(NamedTuple):
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    m_a: jax.Array
    m_b: jax.Array
    i_a: jax.Array
    i_b: jax.Array
    lc_a: jax.Array
    lc_b: jax.Array
    color: jax.Array


def _common(block, bodies, awake, color):
    ba = jnp.clip(block.body_a, 0)
    bb = jnp.clip(block.body_b, 0)
    dyn = bodies.is_dynamic
    active = block.active & ((dyn[ba] & awake[ba]) | (dyn[bb] & awake[bb]))
    return _Common(
        active=active, body_a=ba, body_b=bb,
        m_a=bodies.inv_mass[ba], m_b=bodies.inv_mass[bb],
        i_a=bodies.inv_inertia[ba], i_b=bodies.inv_inertia[bb],
        lc_a=bodies.local_center[ba], lc_b=bodies.local_center[bb],
        color=color)


def _apply(common, v, w, mask, d_va, d_wa, d_vb, d_wb):
    m = mask & common.active
    v = v.at[common.body_a].add(jnp.where(m[:, None], d_va, 0.0))
    w = w.at[common.body_a].add(jnp.where(m, d_wa, 0.0))
    v = v.at[common.body_b].add(jnp.where(m[:, None], d_vb, 0.0))
    w = w.at[common.body_b].add(jnp.where(m, d_wb, 0.0))
    return v, w


# ==========================================================================
# revolute (b2RevoluteJoint.cpp)
# ==========================================================================


class RevoluteData(NamedTuple):
    com: _Common
    r_a: jax.Array      # (J,2)
    r_b: jax.Array
    k11: jax.Array
    k12: jax.Array
    k13: jax.Array
    k22: jax.Array
    k23: jax.Array
    k33: jax.Array
    motor_mass: jax.Array
    fixed_rotation: jax.Array


def _revolute_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b
    fixed = (iA + iB) == 0.0
    k11 = mA + mB + r_a[:, 1] ** 2 * iA + r_b[:, 1] ** 2 * iB
    k12 = -r_a[:, 1] * r_a[:, 0] * iA - r_b[:, 1] * r_b[:, 0] * iB
    k13 = -r_a[:, 1] * iA - r_b[:, 1] * iB
    k22 = mA + mB + r_a[:, 0] ** 2 * iA + r_b[:, 0] ** 2 * iB
    k23 = r_a[:, 0] * iA + r_b[:, 0] * iB
    k33 = iA + iB
    motor_mass = jnp.where(k33 > 0.0, 1.0 / jnp.where(k33 > 0.0, k33, 1.0), 0.0)

    # limit state transition (InitVelocityConstraints)
    angle = bodies.a[com.body_b] - bodies.a[com.body_a] - blk.reference_angle
    equal = jnp.abs(blk.upper_angle - blk.lower_angle) < 2.0 * settings.ANGULAR_SLOP
    at_lower = angle <= blk.lower_angle
    at_upper = angle >= blk.upper_angle
    new_state = jnp.where(
        blk.enable_limit & ~fixed,
        jnp.where(equal, LIMIT_EQUAL,
                  jnp.where(at_lower, LIMIT_AT_LOWER,
                            jnp.where(at_upper, LIMIT_AT_UPPER, LIMIT_INACTIVE))),
        LIMIT_INACTIVE).astype(jnp.int32)
    z_reset = ((new_state == LIMIT_AT_LOWER) & (blk.limit_state != LIMIT_AT_LOWER)) | \
              ((new_state == LIMIT_AT_UPPER) & (blk.limit_state != LIMIT_AT_UPPER)) | \
              (new_state == LIMIT_INACTIVE)

    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    mot = blk.motor_impulse * dt_ratio if warm else jnp.zeros_like(blk.motor_impulse)
    imp = imp.at[:, 2].set(jnp.where(z_reset, 0.0, imp[:, 2]))
    mot = jnp.where(~blk.enable_motor | fixed, 0.0, mot)

    data = RevoluteData(com, r_a, r_b, k11, k12, k13, k22, k23, k33,
                        motor_mass, fixed)
    st = {"impulse": imp, "motor_impulse": mot, "limit_state": new_state}
    return data, st


def _revolute_warm(data, st, v, w, mask=None):
    com = data.com
    m = com.active if mask is None else (com.active & mask)
    imp = st["impulse"]
    p = imp[:, :2]
    l_a = cross_vv(data.r_a, p) + st["motor_impulse"] + imp[:, 2]
    l_b = cross_vv(data.r_b, p) + st["motor_impulse"] + imp[:, 2]
    return _apply(com, v, w, jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * l_a,
                  com.m_b[:, None] * p, com.i_b * l_b)


def _revolute_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    iA, iB, mA, mB = com.i_a, com.i_b, com.m_a, com.m_b
    limit_state = st["limit_state"]
    imp = st["impulse"]
    fixed = data.fixed_rotation

    # motor
    motor_on = blk.enable_motor & (limit_state != LIMIT_EQUAL) & ~fixed & m
    cdot_m = wb - wa - blk.motor_speed
    lam = -data.motor_mass * cdot_m
    max_imp = dt * blk.max_motor_torque
    new_mi = jnp.clip(st["motor_impulse"] + lam, -max_imp, max_imp)
    dlam = jnp.where(motor_on, new_mi - st["motor_impulse"], 0.0)
    motor_impulse = jnp.where(motor_on, new_mi, st["motor_impulse"])
    wa = wa - iA * dlam
    wb = wb + iB * dlam

    # limit branch (3x3 block)
    limit_on = blk.enable_limit & (limit_state != LIMIT_INACTIVE) & ~fixed & m
    cdot1 = vb + cross_sv(wb, data.r_b) - va - cross_sv(wa, data.r_a)
    cdot2 = wb - wa
    ix, iy, iz = _solve33(data.k11, data.k12, data.k13, data.k22, data.k23,
                          data.k33, -cdot1[:, 0], -cdot1[:, 1], -cdot2)
    new_z = imp[:, 2] + iz
    # lower-limit clamp: if accumulated z would go negative, re-solve 2x2
    viol_lower = (limit_state == LIMIT_AT_LOWER) & (new_z < 0.0)
    viol_upper = (limit_state == LIMIT_AT_UPPER) & (new_z > 0.0)
    viol = viol_lower | viol_upper
    rhs_x = -cdot1[:, 0] + imp[:, 2] * data.k13
    rhs_y = -cdot1[:, 1] + imp[:, 2] * data.k23
    red_x, red_y = _solve22(data.k11, data.k12, data.k22, rhs_x, rhs_y)
    dx = jnp.where(viol, red_x, ix)
    dy = jnp.where(viol, red_y, iy)
    dz = jnp.where(viol, -imp[:, 2], iz)
    imp_l = jnp.stack([imp[:, 0] + dx, imp[:, 1] + dy,
                       jnp.where(viol, 0.0, imp[:, 2] + dz)], axis=1)

    # point-to-point branch (2x2)
    px, py = _solve22(data.k11, data.k12, data.k22, -cdot1[:, 0], -cdot1[:, 1])
    imp_p = jnp.stack([imp[:, 0] + px, imp[:, 1] + py, imp[:, 2]], axis=1)

    use_limit = limit_on
    d_imp_x = jnp.where(use_limit, dx, px)
    d_imp_y = jnp.where(use_limit, dy, py)
    d_imp_z = jnp.where(use_limit, dz, 0.0)
    imp_new = jnp.where(use_limit[:, None], imp_l, imp_p)
    imp_new = jnp.where(m[:, None], imp_new, imp)

    p = jnp.stack([d_imp_x, d_imp_y], axis=1)
    p = jnp.where(m[:, None], p, 0.0)
    d_imp_z = jnp.where(m, d_imp_z, 0.0)
    va = va - mA[:, None] * p
    wa = wa - iA * (cross_vv(data.r_a, p) + d_imp_z)
    vb = vb + mB[:, None] * p
    wb = wb + iB * (cross_vv(data.r_b, p) + d_imp_z)

    st = {**st, "impulse": imp_new, "motor_impulse": motor_impulse}
    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return st, v, w


def _revolute_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    ca, aa = c[com.body_a], a[com.body_a]
    cb, ab = c[com.body_b], a[com.body_b]
    iA, iB, mA, mB = com.i_a, com.i_b, com.m_a, com.m_b
    fixed = data.fixed_rotation
    limit_state = st["limit_state"]

    angular_error = jnp.zeros_like(aa)
    limit_on = blk.enable_limit & (limit_state != LIMIT_INACTIVE) & ~fixed & m
    angle = ab - aa - blk.reference_angle
    # equal limits
    c_eq = jnp.clip(angle - blk.lower_angle, -settings.MAX_ANGULAR_CORRECTION,
                    settings.MAX_ANGULAR_CORRECTION)
    # at lower
    c_lo_raw = angle - blk.lower_angle
    c_lo = jnp.clip(c_lo_raw + settings.ANGULAR_SLOP,
                    -settings.MAX_ANGULAR_CORRECTION, 0.0)
    # at upper
    c_up_raw = angle - blk.upper_angle
    c_up = jnp.clip(c_up_raw - settings.ANGULAR_SLOP, 0.0,
                    settings.MAX_ANGULAR_CORRECTION)
    c_limit = jnp.where(limit_state == LIMIT_EQUAL, c_eq,
                        jnp.where(limit_state == LIMIT_AT_LOWER, c_lo,
                                  jnp.where(limit_state == LIMIT_AT_UPPER, c_up, 0.0)))
    err = jnp.where(limit_state == LIMIT_EQUAL, jnp.abs(c_eq),
                    jnp.where(limit_state == LIMIT_AT_LOWER, -c_lo_raw,
                              jnp.where(limit_state == LIMIT_AT_UPPER, c_up_raw, 0.0)))
    limit_impulse = jnp.where(limit_on, -data.motor_mass * c_limit, 0.0)
    angular_error = jnp.where(limit_on, err, 0.0)
    aa = aa - iA * limit_impulse
    ab = ab + iB * limit_impulse

    # point-to-point
    qa = rot_from_angle(aa)
    qb = rot_from_angle(ab)
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    cvec = cb + r_b - ca - r_a
    position_error = jnp.sqrt(dot(cvec, cvec))
    k11 = mA + mB + iA * r_a[:, 1] ** 2 + iB * r_b[:, 1] ** 2
    k12 = -iA * r_a[:, 0] * r_a[:, 1] - iB * r_b[:, 0] * r_b[:, 1]
    k22 = mA + mB + iA * r_a[:, 0] ** 2 + iB * r_b[:, 0] ** 2
    px, py = _solve22(k11, k12, k22, -cvec[:, 0], -cvec[:, 1])
    p = jnp.stack([px, py], axis=1)
    p = jnp.where(m[:, None], p, 0.0)
    ca = ca - mA[:, None] * p
    aa = aa - iA * cross_vv(r_a, p)
    cb = cb + mB[:, None] * p
    ab = ab + iB * cross_vv(r_b, p)

    ok = (position_error <= settings.LINEAR_SLOP) & \
         (angular_error <= settings.ANGULAR_SLOP)
    ok = ok | ~m

    mm = m
    c = c.at[com.body_a].add(jnp.where(mm[:, None], ca - c[com.body_a], 0.0))
    a = a.at[com.body_a].add(jnp.where(mm, aa - a[com.body_a], 0.0))
    c = c.at[com.body_b].add(jnp.where(mm[:, None], cb - c[com.body_b], 0.0))
    a = a.at[com.body_b].add(jnp.where(mm, ab - a[com.body_b], 0.0))
    return c, a, ok


# ==========================================================================
# distance (b2DistanceJoint.cpp)
# ==========================================================================


class DistanceData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    u: jax.Array        # (J,2) unit axis
    mass: jax.Array
    gamma: jax.Array
    bias: jax.Array
    soft: jax.Array     # bool frequency > 0


def _distance_init(blk, bodies, awake, color, dt_ratio, warm, dt):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u = bodies.c[com.body_b] + r_b - bodies.c[com.body_a] - r_a
    length = jnp.sqrt(dot(u, u))
    u = jnp.where((length > settings.LINEAR_SLOP)[:, None],
                  u / jnp.where(length > 0, length, 1.0)[:, None], 0.0)
    cr_a = cross_vv(r_a, u)
    cr_b = cross_vv(r_b, u)
    inv_mass = com.m_a + com.i_a * cr_a ** 2 + com.m_b + com.i_b * cr_b ** 2
    mass = jnp.where(inv_mass != 0.0, 1.0 / jnp.where(inv_mass != 0.0, inv_mass, 1.0), 0.0)

    soft = blk.frequency > 0.0
    cc = length - blk.length
    omega = 2.0 * jnp.pi * blk.frequency
    d = 2.0 * mass * blk.damping_ratio * omega
    k = mass * omega * omega
    gamma_raw = dt * (d + dt * k)
    gamma = jnp.where(gamma_raw != 0.0, 1.0 / jnp.where(gamma_raw != 0.0, gamma_raw, 1.0), 0.0)
    bias = cc * dt * k * gamma
    inv_mass_soft = inv_mass + gamma
    mass_soft = jnp.where(inv_mass_soft != 0.0,
                          1.0 / jnp.where(inv_mass_soft != 0.0, inv_mass_soft, 1.0), 0.0)
    mass = jnp.where(soft, mass_soft, mass)
    gamma = jnp.where(soft, gamma, 0.0)
    bias = jnp.where(soft, bias, 0.0)

    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    data = DistanceData(com, r_a, r_b, u, mass, gamma, bias, soft)
    return data, {"impulse": imp}


def _distance_warm(data, st, v, w, mask=None):
    com = data.com
    p = st["impulse"][:, None] * data.u
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * cross_vv(data.r_a, p),
                  com.m_b[:, None] * p, com.i_b * cross_vv(data.r_b, p))


def _distance_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    vp_a = v[com.body_a] + cross_sv(w[com.body_a], data.r_a)
    vp_b = v[com.body_b] + cross_sv(w[com.body_b], data.r_b)
    cdot = dot(data.u, vp_b - vp_a)
    lam = -data.mass * (cdot + data.bias + data.gamma * st["impulse"])
    lam = jnp.where(m, lam, 0.0)
    imp = st["impulse"] + lam
    p = lam[:, None] * data.u
    v, w = _apply(com, v, w, mask,
                  -com.m_a[:, None] * p, -com.i_a * cross_vv(data.r_a, p),
                  com.m_b[:, None] * p, com.i_b * cross_vv(data.r_b, p))
    return {**st, "impulse": imp}, v, w


def _distance_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active & ~data.soft
    qa = rot_from_angle(a[com.body_a])
    qb = rot_from_angle(a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u = c[com.body_b] + r_b - c[com.body_a] - r_a
    length = jnp.sqrt(dot(u, u))
    u = u / jnp.where(length > 0, length, 1.0)[:, None]
    cc = jnp.clip(length - blk.length, -settings.MAX_LINEAR_CORRECTION,
                  settings.MAX_LINEAR_CORRECTION)
    lam = jnp.where(m, -data.mass * cc, 0.0)
    p = lam[:, None] * u
    c = c.at[com.body_a].add(jnp.where(m[:, None], -com.m_a[:, None] * p, 0.0))
    a = a.at[com.body_a].add(jnp.where(m, -com.i_a * cross_vv(r_a, p), 0.0))
    c = c.at[com.body_b].add(jnp.where(m[:, None], com.m_b[:, None] * p, 0.0))
    a = a.at[com.body_b].add(jnp.where(m, com.i_b * cross_vv(r_b, p), 0.0))
    ok = (jnp.abs(cc) < settings.LINEAR_SLOP) | ~m
    return c, a, ok


# ==========================================================================
# prismatic (b2PrismaticJoint.cpp)
# ==========================================================================


class PrismaticData(NamedTuple):
    com: _Common
    axis: jax.Array
    perp: jax.Array
    a1: jax.Array
    a2: jax.Array
    s1: jax.Array
    s2: jax.Array
    k11: jax.Array
    k12: jax.Array
    k13: jax.Array
    k22: jax.Array
    k23: jax.Array
    k33: jax.Array
    motor_mass: jax.Array


def _prismatic_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    d = bodies.c[com.body_b] - bodies.c[com.body_a] + r_b - r_a
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b

    axis = rot_vec(qa, blk.local_axis_a)
    a1 = cross_vv(d + r_a, axis)
    a2 = cross_vv(r_b, axis)
    k_m = mA + mB + iA * a1 * a1 + iB * a2 * a2
    motor_mass = jnp.where(k_m > 0.0, 1.0 / jnp.where(k_m > 0.0, k_m, 1.0), 0.0)

    local_y = jnp.stack([-blk.local_axis_a[:, 1], blk.local_axis_a[:, 0]], axis=1)
    perp = rot_vec(qa, local_y)
    s1 = cross_vv(d + r_a, perp)
    s2 = cross_vv(r_b, perp)
    k11 = mA + mB + iA * s1 * s1 + iB * s2 * s2
    k12 = iA * s1 + iB * s2
    k13 = iA * s1 * a1 + iB * s2 * a2
    k22_raw = iA + iB
    k22 = jnp.where(k22_raw == 0.0, 1.0, k22_raw)
    k23 = iA * a1 + iB * a2
    k33 = mA + mB + iA * a1 * a1 + iB * a2 * a2

    # limit state
    translation = dot(axis, d)
    equal = jnp.abs(blk.upper_translation - blk.lower_translation) < 2.0 * settings.LINEAR_SLOP
    at_lower = translation <= blk.lower_translation
    at_upper = translation >= blk.upper_translation
    new_state = jnp.where(
        blk.enable_limit,
        jnp.where(equal, LIMIT_EQUAL,
                  jnp.where(at_lower, LIMIT_AT_LOWER,
                            jnp.where(at_upper, LIMIT_AT_UPPER, LIMIT_INACTIVE))),
        LIMIT_INACTIVE).astype(jnp.int32)
    z_reset = (new_state != blk.limit_state) | (new_state == LIMIT_INACTIVE)
    # reference resets z only when entering a new lower/upper state or inactive
    keep = ((new_state == blk.limit_state) & (new_state != LIMIT_INACTIVE)) | (new_state == LIMIT_EQUAL)
    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    imp = imp.at[:, 2].set(jnp.where(keep, imp[:, 2], 0.0))
    mot = blk.motor_impulse * dt_ratio if warm else jnp.zeros_like(blk.motor_impulse)
    mot = jnp.where(~blk.enable_motor, 0.0, mot)

    data = PrismaticData(com, axis, perp, a1, a2, s1, s2,
                         k11, k12, k13, k22, k23, k33, motor_mass)
    return data, {"impulse": imp, "motor_impulse": mot, "limit_state": new_state}


def _prismatic_warm(data, st, v, w, mask=None):
    com = data.com
    imp = st["impulse"]
    mi = st["motor_impulse"]
    p = imp[:, 0:1] * data.perp + (mi + imp[:, 2])[:, None] * data.axis
    l_a = imp[:, 0] * data.s1 + imp[:, 1] + (mi + imp[:, 2]) * data.a1
    l_b = imp[:, 0] * data.s2 + imp[:, 1] + (mi + imp[:, 2]) * data.a2
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * l_a,
                  com.m_b[:, None] * p, com.i_b * l_b)


def _prismatic_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b
    imp = st["impulse"]
    limit_state = st["limit_state"]

    # motor
    motor_on = blk.enable_motor & (limit_state != LIMIT_EQUAL) & m
    cdot_m = dot(data.axis, vb - va) + data.a2 * wb - data.a1 * wa
    lam = data.motor_mass * (blk.motor_speed - cdot_m)
    max_imp = dt * blk.max_motor_force
    new_mi = jnp.clip(st["motor_impulse"] + lam, -max_imp, max_imp)
    dlam = jnp.where(motor_on, new_mi - st["motor_impulse"], 0.0)
    motor_impulse = jnp.where(motor_on, new_mi, st["motor_impulse"])
    p = dlam[:, None] * data.axis
    va = va - mA[:, None] * p
    wa = wa - iA * dlam * data.a1
    vb = vb + mB[:, None] * p
    wb = wb + iB * dlam * data.a2

    cdot1x = dot(data.perp, vb - va) + data.s2 * wb - data.s1 * wa
    cdot1y = wb - wa

    # limit branch: 3x3 + z clamp + 2x2 re-solve
    limit_on = blk.enable_limit & (limit_state != LIMIT_INACTIVE) & m
    cdot2 = dot(data.axis, vb - va) + data.a2 * wb - data.a1 * wa
    dfx, dfy, dfz = _solve33(data.k11, data.k12, data.k13, data.k22,
                             data.k23, data.k33, -cdot1x, -cdot1y, -cdot2)
    f1z = imp[:, 2]
    z_new = f1z + dfz
    z_new = jnp.where(limit_state == LIMIT_AT_LOWER, jnp.maximum(z_new, 0.0), z_new)
    z_new = jnp.where(limit_state == LIMIT_AT_UPPER, jnp.minimum(z_new, 0.0), z_new)
    bx = -cdot1x - (z_new - f1z) * data.k13
    by = -cdot1y - (z_new - f1z) * data.k23
    f2x, f2y = _solve22(data.k11, data.k12, data.k22, bx, by)
    imp_l = jnp.stack([imp[:, 0] + f2x, imp[:, 1] + f2y, z_new], axis=1)

    # no-limit branch: 2x2
    gx, gy = _solve22(data.k11, data.k12, data.k22, -cdot1x, -cdot1y)
    imp_n = jnp.stack([imp[:, 0] + gx, imp[:, 1] + gy, imp[:, 2]], axis=1)

    imp_new = jnp.where(limit_on[:, None], imp_l, imp_n)
    imp_new = jnp.where(m[:, None], imp_new, imp)
    df = imp_new - imp
    p = df[:, 0:1] * data.perp + df[:, 2:3] * data.axis
    l_a = df[:, 0] * data.s1 + df[:, 1] + df[:, 2] * data.a1
    l_b = df[:, 0] * data.s2 + df[:, 1] + df[:, 2] * data.a2
    va = va - mA[:, None] * p
    wa = wa - iA * l_a
    vb = vb + mB[:, None] * p
    wb = wb + iB * l_b

    st = {**st, "impulse": imp_new, "motor_impulse": motor_impulse}
    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return st, v, w


def _prismatic_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    ca, aa = c[com.body_a], a[com.body_a]
    cb, ab = c[com.body_b], a[com.body_b]
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b

    qa = rot_from_angle(aa)
    qb = rot_from_angle(ab)
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    d = cb + r_b - ca - r_a
    axis = rot_vec(qa, blk.local_axis_a)
    a1 = cross_vv(d + r_a, axis)
    a2 = cross_vv(r_b, axis)
    local_y = jnp.stack([-blk.local_axis_a[:, 1], blk.local_axis_a[:, 0]], axis=1)
    perp = rot_vec(qa, local_y)
    s1 = cross_vv(d + r_a, perp)
    s2 = cross_vv(r_b, perp)

    c1x = dot(perp, d)
    c1y = ab - aa - blk.reference_angle
    linear_error = jnp.abs(c1x)
    angular_error = jnp.abs(c1y)

    translation = dot(axis, d)
    equal = jnp.abs(blk.upper_translation - blk.lower_translation) < 2.0 * settings.LINEAR_SLOP
    lower_v = jnp.clip(translation - blk.lower_translation + settings.LINEAR_SLOP,
                       -settings.MAX_LINEAR_CORRECTION, 0.0)
    upper_v = jnp.clip(translation - blk.upper_translation - settings.LINEAR_SLOP,
                       0.0, settings.MAX_LINEAR_CORRECTION)
    eq_v = jnp.clip(translation, -settings.MAX_LINEAR_CORRECTION,
                    settings.MAX_LINEAR_CORRECTION)
    at_lower = translation <= blk.lower_translation
    at_upper = translation >= blk.upper_translation
    active = blk.enable_limit & (equal | at_lower | at_upper)
    c2 = jnp.where(equal, eq_v, jnp.where(at_lower, lower_v,
                                          jnp.where(at_upper, upper_v, 0.0)))
    linear_error = jnp.where(
        active,
        jnp.maximum(linear_error,
                    jnp.where(equal, jnp.abs(translation),
                              jnp.where(at_lower, blk.lower_translation - translation,
                                        translation - blk.upper_translation))),
        linear_error)

    k11 = mA + mB + iA * s1 * s1 + iB * s2 * s2
    k12 = iA * s1 + iB * s2
    k13 = iA * s1 * a1 + iB * s2 * a2
    k22_raw = iA + iB
    k22 = jnp.where(k22_raw == 0.0, 1.0, k22_raw)
    k23 = iA * a1 + iB * a2
    k33 = mA + mB + iA * a1 * a1 + iB * a2 * a2

    i3x, i3y, i3z = _solve33(k11, k12, k13, k22, k23, k33, -c1x, -c1y, -c2)
    i2x, i2y = _solve22(k11, k12, k22, -c1x, -c1y)
    ix = jnp.where(active, i3x, i2x)
    iy = jnp.where(active, i3y, i2y)
    iz = jnp.where(active, i3z, 0.0)

    p = ix[:, None] * perp + iz[:, None] * axis
    l_a = ix * s1 + iy + iz * a1
    l_b = ix * s2 + iy + iz * a2
    p = jnp.where(m[:, None], p, 0.0)
    l_a = jnp.where(m, l_a, 0.0)
    l_b = jnp.where(m, l_b, 0.0)

    c = c.at[com.body_a].add(-mA[:, None] * p)
    a = a.at[com.body_a].add(-iA * l_a)
    c = c.at[com.body_b].add(mB[:, None] * p)
    a = a.at[com.body_b].add(iB * l_b)

    ok = ((linear_error <= settings.LINEAR_SLOP) &
          (angular_error <= settings.ANGULAR_SLOP)) | ~m
    return c, a, ok


# ==========================================================================
# registry / dispatcher
# ==========================================================================


class JointData(NamedTuple):
    revolute: object
    distance: object
    prismatic: object
    n_colors: int


def init_joints(joints, bodies, awake, v, w, dt, dt_ratio, warm_starting,
                nb, max_colors):
    """Color all joints jointly, init per-type data. Returns (data, state)."""
    blocks = []
    for name in ("revolute", "distance", "prismatic"):
        blk = getattr(joints, name)
        if blk.body_a.shape[0] > 0:
            blocks.append((name, blk))
    for name in ("mouse", "weld", "friction", "rope", "motor", "wheel",
                 "pulley", "gear"):
        blk = getattr(joints, name)
        if blk.body_a.shape[0] > 0:
            raise NotImplementedError(f"{name} joints not yet solved")

    ba = jnp.concatenate([b.body_a for _, b in blocks])
    bb = jnp.concatenate([b.body_b for _, b in blocks])
    act = jnp.concatenate([b.active for _, b in blocks])
    dyn = bodies.is_dynamic
    col, _ = coloring.color_constraints(
        jnp.clip(ba, 0), jnp.clip(bb, 0),
        dyn[jnp.clip(ba, 0)], dyn[jnp.clip(bb, 0)], act, nb, max_colors)
    # slice colors back per block
    colors = {}
    off = 0
    for name, b in blocks:
        n = b.body_a.shape[0]
        colors[name] = col[off:off + n]
        off += n

    data = {"_names": tuple(n for n, _ in blocks)}
    state = {}
    for name, blk in blocks:
        if name == "revolute":
            d, s = _revolute_init(blk, bodies, awake, colors[name], dt_ratio,
                                  warm_starting)
        elif name == "distance":
            d, s = _distance_init(blk, bodies, awake, colors[name], dt_ratio,
                                  warm_starting, dt)
        elif name == "prismatic":
            d, s = _prismatic_init(blk, bodies, awake, colors[name], dt_ratio,
                                   warm_starting)
        data[name] = (blk, d)
        state[name] = s
    return data, state


def warm_start_joints(jdata, jstate, v, w):
    for name in jdata["_names"]:
        blk, d = jdata[name]
        fn = {"revolute": _revolute_warm, "distance": _distance_warm,
              "prismatic": _prismatic_warm}[name]
        v, w = fn(d, jstate[name], v, w)
    return v, w


def solve_joint_velocity(jdata, jstate, v, w, dt, max_colors=settings.MAX_COLORS):
    """One velocity iteration over all joints, color by color."""
    fns = {"revolute": _revolute_velocity, "distance": _distance_velocity,
           "prismatic": _prismatic_velocity}

    def color_pass(ci, carry):
        jstate, v, w = carry
        for name in jdata["_names"]:
            blk, d = jdata[name]
            st, v, w = fns[name](blk, d, jstate[name], v, w, dt,
                                 d.com.color == ci)
            jstate = {**jstate, name: st}
        return jstate, v, w

    return jax.lax.fori_loop(0, max_colors, color_pass, (jstate, v, w))


def solve_joint_position(jdata, jstate, c, a, max_colors=settings.MAX_COLORS):
    """One NGS iteration over all joints. Returns (c, a, ok_body)."""
    fns = {"revolute": _revolute_position, "distance": _distance_position,
           "prismatic": _prismatic_position}
    nb = c.shape[0]
    ok_body = jnp.ones(nb, bool)

    def color_pass(ci, carry):
        c, a, ok_body = carry
        for name in jdata["_names"]:
            blk, d = jdata[name]
            c, a, ok = fns[name](blk, d, jstate[name], c, a, d.com.color == ci)
            okm = ok | (d.com.color != ci)
            ok_i = ok_body.astype(jnp.int32)
            ok_i = ok_i.at[d.com.body_a].min(okm.astype(jnp.int32))
            ok_i = ok_i.at[d.com.body_b].min(okm.astype(jnp.int32))
            ok_body = ok_i.astype(bool)
        return c, a, ok_body

    return jax.lax.fori_loop(0, max_colors, color_pass, (c, a, ok_body))


def store_joint_impulses(joints, jstate):
    """Persist impulses + limit states back into the typed blocks."""
    import dataclasses as dc
    out = joints
    if "revolute" in jstate:
        s = jstate["revolute"]
        out = dc.replace(out, revolute=dc.replace(
            out.revolute, impulse=s["impulse"],
            motor_impulse=s["motor_impulse"], limit_state=s["limit_state"]))
    if "distance" in jstate:
        s = jstate["distance"]
        out = dc.replace(out, distance=dc.replace(
            out.distance, impulse=s["impulse"]))
    if "prismatic" in jstate:
        s = jstate["prismatic"]
        out = dc.replace(out, prismatic=dc.replace(
            out.prismatic, impulse=s["impulse"],
            motor_impulse=s["motor_impulse"], limit_state=s["limit_state"]))
    return out
