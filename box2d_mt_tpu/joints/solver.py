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
from ..math2d import cross_sv, cross_vv, dot, rot_from_angle, rot_t_vec, rot_vec
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
# mouse (b2MouseJoint.cpp) — soft target drag on body B
# ==========================================================================


class MouseData(NamedTuple):
    com: _Common
    r_b: jax.Array
    m11: jax.Array
    m12: jax.Array
    m22: jax.Array
    c_beta: jax.Array   # (J,2) beta * (cB + rB - target)
    gamma: jax.Array


def _mouse_init(blk, bodies, awake, color, dt_ratio, warm, dt):
    com = _common(blk, bodies, awake, color)
    qb = rot_from_angle(bodies.a[com.body_b])
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    mass_b = jnp.where(com.m_b > 0.0, 1.0 / jnp.where(com.m_b > 0.0, com.m_b, 1.0), 0.0)
    omega = 2.0 * jnp.pi * blk.frequency
    d = 2.0 * mass_b * blk.damping_ratio * omega
    k = mass_b * omega * omega
    gamma_raw = dt * (d + dt * k)
    gamma = jnp.where(gamma_raw != 0.0, 1.0 / jnp.where(gamma_raw != 0.0, gamma_raw, 1.0), 0.0)
    beta = dt * k * gamma
    k11 = com.m_b + com.i_b * r_b[:, 1] ** 2 + gamma
    k12 = -com.i_b * r_b[:, 0] * r_b[:, 1]
    k22 = com.m_b + com.i_b * r_b[:, 0] ** 2 + gamma
    det = k11 * k22 - k12 * k12
    inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    c_beta = beta[:, None] * (bodies.c[com.body_b] + r_b - blk.target)
    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    data = MouseData(com, r_b, inv * k22, -inv * k12, inv * k11, c_beta, gamma)
    return data, {"impulse": imp}


def _mouse_warm(data, st, v, w, mask=None):
    com = data.com
    p = st["impulse"]
    # reference also damps wB by 0.98 at init (b2MouseJoint.cpp wB *= 0.98f)
    m = com.active if mask is None else com.active & mask
    w = w.at[com.body_b].mul(jnp.where(m, 0.98, 1.0))
    return _apply(com, v, w, jnp.ones_like(com.active) if mask is None else mask,
                  jnp.zeros_like(p), jnp.zeros_like(com.i_a),
                  com.m_b[:, None] * p, com.i_b * cross_vv(data.r_b, p))


def _mouse_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    vb = v[com.body_b]
    wb = w[com.body_b]
    cdot = vb + cross_sv(wb, data.r_b) + data.c_beta + data.gamma[:, None] * st["impulse"]
    ix = -(data.m11 * cdot[:, 0] + data.m12 * cdot[:, 1])
    iy = -(data.m12 * cdot[:, 0] + data.m22 * cdot[:, 1])
    imp_new = st["impulse"] + jnp.stack([ix, iy], axis=1)
    max_i = dt * blk.max_force
    ln = jnp.sqrt(dot(imp_new, imp_new))
    scale = jnp.where(ln > max_i, max_i / jnp.where(ln > 0, ln, 1.0), 1.0)
    imp_new = imp_new * scale[:, None]
    d_imp = jnp.where(m[:, None], imp_new - st["impulse"], 0.0)
    imp_out = jnp.where(m[:, None], imp_new, st["impulse"])
    v2, w2 = _apply(com, v, w, mask,
                    jnp.zeros_like(d_imp), jnp.zeros_like(com.i_a),
                    com.m_b[:, None] * d_imp, com.i_b * cross_vv(data.r_b, d_imp))
    return {**st, "impulse": imp_out}, v2, w2


def _mouse_position(blk, data, st, c, a, mask):
    return c, a, jnp.ones_like(mask)   # no position correction


# ==========================================================================
# friction (b2FrictionJoint.cpp) — top-down friction
# ==========================================================================


class FrictionData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    lm11: jax.Array
    lm12: jax.Array
    lm22: jax.Array
    angular_mass: jax.Array


def _lin22(com, r_a, r_b):
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b
    k11 = mA + mB + iA * r_a[:, 1] ** 2 + iB * r_b[:, 1] ** 2
    k12 = -iA * r_a[:, 0] * r_a[:, 1] - iB * r_b[:, 0] * r_b[:, 1]
    k22 = mA + mB + iA * r_a[:, 0] ** 2 + iB * r_b[:, 0] ** 2
    det = k11 * k22 - k12 * k12
    inv = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    return inv * k22, -inv * k12, inv * k11


def _friction_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    lm11, lm12, lm22 = _lin22(com, r_a, r_b)
    k33 = com.i_a + com.i_b
    am = jnp.where(k33 > 0.0, 1.0 / jnp.where(k33 > 0.0, k33, 1.0), 0.0)
    li = blk.linear_impulse * dt_ratio if warm else jnp.zeros_like(blk.linear_impulse)
    ai = blk.angular_impulse * dt_ratio if warm else jnp.zeros_like(blk.angular_impulse)
    return (FrictionData(com, r_a, r_b, lm11, lm12, lm22, am),
            {"linear_impulse": li, "angular_impulse": ai})


def _friction_warm(data, st, v, w, mask=None):
    com = data.com
    p = st["linear_impulse"]
    ai = st["angular_impulse"]
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * (cross_vv(data.r_a, p) + ai),
                  com.m_b[:, None] * p, com.i_b * (cross_vv(data.r_b, p) + ai))


def _friction_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    # angular
    cdot_a = wb - wa
    lam = -data.angular_mass * cdot_a
    max_a = dt * blk.max_torque
    ai_new = jnp.clip(st["angular_impulse"] + lam, -max_a, max_a)
    d_ai = jnp.where(m, ai_new - st["angular_impulse"], 0.0)
    ai_out = jnp.where(m, ai_new, st["angular_impulse"])
    wa = wa - com.i_a * d_ai
    wb = wb + com.i_b * d_ai
    # linear
    cdot = vb + cross_sv(wb, data.r_b) - va - cross_sv(wa, data.r_a)
    ix = -(data.lm11 * cdot[:, 0] + data.lm12 * cdot[:, 1])
    iy = -(data.lm12 * cdot[:, 0] + data.lm22 * cdot[:, 1])
    li_new = st["linear_impulse"] + jnp.stack([ix, iy], axis=1)
    max_l = dt * blk.max_force
    ln = jnp.sqrt(dot(li_new, li_new))
    scale = jnp.where(ln > max_l, max_l / jnp.where(ln > 0, ln, 1.0), 1.0)
    li_new = li_new * scale[:, None]
    d_li = jnp.where(m[:, None], li_new - st["linear_impulse"], 0.0)
    li_out = jnp.where(m[:, None], li_new, st["linear_impulse"])
    va = va - com.m_a[:, None] * d_li
    wa = wa - com.i_a * cross_vv(data.r_a, d_li)
    vb = vb + com.m_b[:, None] * d_li
    wb = wb + com.i_b * cross_vv(data.r_b, d_li)
    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return {**st, "linear_impulse": li_out, "angular_impulse": ai_out}, v, w


def _friction_position(blk, data, st, c, a, mask):
    return c, a, jnp.ones_like(mask)


# ==========================================================================
# rope (b2RopeJoint.cpp) — max-length inequality
# ==========================================================================


class RopeData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    u: jax.Array
    mass: jax.Array
    length: jax.Array


def _rope_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u = bodies.c[com.body_b] + r_b - bodies.c[com.body_a] - r_a
    length = jnp.sqrt(dot(u, u))
    short = length <= settings.LINEAR_SLOP
    u = jnp.where(short[:, None], 0.0, u / jnp.where(length > 0, length, 1.0)[:, None])
    cr_a = cross_vv(r_a, u)
    cr_b = cross_vv(r_b, u)
    inv_mass = com.m_a + com.i_a * cr_a ** 2 + com.m_b + com.i_b * cr_b ** 2
    mass = jnp.where(short | (inv_mass == 0.0), 0.0,
                     1.0 / jnp.where(inv_mass != 0.0, inv_mass, 1.0))
    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    imp = jnp.where(short, 0.0, imp)
    return RopeData(com, r_a, r_b, u, mass, length), {"impulse": imp}


def _rope_warm(data, st, v, w, mask=None):
    com = data.com
    p = st["impulse"][:, None] * data.u
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * cross_vv(data.r_a, p),
                  com.m_b[:, None] * p, com.i_b * cross_vv(data.r_b, p))


def _rope_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    vp_a = v[com.body_a] + cross_sv(w[com.body_a], data.r_a)
    vp_b = v[com.body_b] + cross_sv(w[com.body_b], data.r_b)
    c_err = data.length - blk.max_length
    cdot = dot(data.u, vp_b - vp_a)
    cdot = cdot + jnp.where(c_err < 0.0, (1.0 / dt) * c_err, 0.0)
    lam = -data.mass * cdot
    imp_new = jnp.minimum(0.0, st["impulse"] + lam)
    d_imp = jnp.where(m, imp_new - st["impulse"], 0.0)
    imp_out = jnp.where(m, imp_new, st["impulse"])
    p = d_imp[:, None] * data.u
    v, w = _apply(com, v, w, mask,
                  -com.m_a[:, None] * p, -com.i_a * cross_vv(data.r_a, p),
                  com.m_b[:, None] * p, com.i_b * cross_vv(data.r_b, p))
    return {**st, "impulse": imp_out}, v, w


def _rope_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    qa = rot_from_angle(a[com.body_a])
    qb = rot_from_angle(a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u = c[com.body_b] + r_b - c[com.body_a] - r_a
    length = jnp.sqrt(dot(u, u))
    u = u / jnp.where(length > 0, length, 1.0)[:, None]
    cc = jnp.clip(length - blk.max_length, 0.0, settings.MAX_LINEAR_CORRECTION)
    lam = jnp.where(m, -data.mass * cc, 0.0)
    p = lam[:, None] * u
    c = c.at[com.body_a].add(jnp.where(m[:, None], -com.m_a[:, None] * p, 0.0))
    a = a.at[com.body_a].add(jnp.where(m, -com.i_a * cross_vv(r_a, p), 0.0))
    c = c.at[com.body_b].add(jnp.where(m[:, None], com.m_b[:, None] * p, 0.0))
    a = a.at[com.body_b].add(jnp.where(m, com.i_b * cross_vv(r_b, p), 0.0))
    ok = (length - blk.max_length < settings.LINEAR_SLOP) | ~m
    return c, a, ok


# ==========================================================================
# motor (b2MotorJoint.cpp) — drive relative transform to target offsets
# ==========================================================================


class MotorData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    lm11: jax.Array
    lm12: jax.Array
    lm22: jax.Array
    angular_mass: jax.Array
    linear_error: jax.Array   # (J,2)
    angular_error: jax.Array


def _motor_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.linear_offset - com.lc_a)
    r_b = rot_vec(qb, -com.lc_b)
    lm11, lm12, lm22 = _lin22(com, r_a, r_b)
    k33 = com.i_a + com.i_b
    am = jnp.where(k33 > 0.0, 1.0 / jnp.where(k33 > 0.0, k33, 1.0), 0.0)
    lin_err = bodies.c[com.body_b] + r_b - bodies.c[com.body_a] - r_a
    ang_err = bodies.a[com.body_b] - bodies.a[com.body_a] - blk.angular_offset
    li = blk.linear_impulse * dt_ratio if warm else jnp.zeros_like(blk.linear_impulse)
    ai = blk.angular_impulse * dt_ratio if warm else jnp.zeros_like(blk.angular_impulse)
    return (MotorData(com, r_a, r_b, lm11, lm12, lm22, am, lin_err, ang_err),
            {"linear_impulse": li, "angular_impulse": ai})


_motor_warm = _friction_warm


def _motor_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    inv_h = 1.0 / dt
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    cdot_a = wb - wa + inv_h * blk.correction_factor * data.angular_error
    lam = -data.angular_mass * cdot_a
    max_a = dt * blk.max_torque
    ai_new = jnp.clip(st["angular_impulse"] + lam, -max_a, max_a)
    d_ai = jnp.where(m, ai_new - st["angular_impulse"], 0.0)
    ai_out = jnp.where(m, ai_new, st["angular_impulse"])
    wa = wa - com.i_a * d_ai
    wb = wb + com.i_b * d_ai
    cdot = (vb + cross_sv(wb, data.r_b) - va - cross_sv(wa, data.r_a)
            + inv_h * blk.correction_factor[:, None] * data.linear_error)
    ix = -(data.lm11 * cdot[:, 0] + data.lm12 * cdot[:, 1])
    iy = -(data.lm12 * cdot[:, 0] + data.lm22 * cdot[:, 1])
    li_new = st["linear_impulse"] + jnp.stack([ix, iy], axis=1)
    max_l = dt * blk.max_force
    ln = jnp.sqrt(dot(li_new, li_new))
    scale = jnp.where(ln > max_l, max_l / jnp.where(ln > 0, ln, 1.0), 1.0)
    li_new = li_new * scale[:, None]
    d_li = jnp.where(m[:, None], li_new - st["linear_impulse"], 0.0)
    li_out = jnp.where(m[:, None], li_new, st["linear_impulse"])
    va = va - com.m_a[:, None] * d_li
    wa = wa - com.i_a * cross_vv(data.r_a, d_li)
    vb = vb + com.m_b[:, None] * d_li
    wb = wb + com.i_b * cross_vv(data.r_b, d_li)
    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return {**st, "linear_impulse": li_out, "angular_impulse": ai_out}, v, w


def _motor_position(blk, data, st, c, a, mask):
    return c, a, jnp.ones_like(mask)


# ==========================================================================
# weld (b2WeldJoint.cpp) — rigid 3-DOF lock with optional softness
# ==========================================================================


class WeldData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    k11: jax.Array
    k12: jax.Array
    k13: jax.Array
    k22: jax.Array
    k23: jax.Array
    k33: jax.Array
    ez_mass: jax.Array   # soft angular mass (1 / (iA+iB+gamma))
    gamma: jax.Array
    bias: jax.Array
    soft: jax.Array


def _weld_init(blk, bodies, awake, color, dt_ratio, warm, dt):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b
    k11 = mA + mB + r_a[:, 1] ** 2 * iA + r_b[:, 1] ** 2 * iB
    k12 = -r_a[:, 1] * r_a[:, 0] * iA - r_b[:, 1] * r_b[:, 0] * iB
    k13 = -r_a[:, 1] * iA - r_b[:, 1] * iB
    k22 = mA + mB + r_a[:, 0] ** 2 * iA + r_b[:, 0] ** 2 * iB
    k23 = r_a[:, 0] * iA + r_b[:, 0] * iB
    k33 = iA + iB
    soft = blk.frequency > 0.0
    inv_m = jnp.where(k33 > 0.0, 1.0 / jnp.where(k33 > 0.0, k33, 1.0), 0.0)
    cc = bodies.a[com.body_b] - bodies.a[com.body_a] - blk.reference_angle
    omega = 2.0 * jnp.pi * blk.frequency
    d = 2.0 * inv_m * blk.damping_ratio * omega
    kk = inv_m * omega * omega
    gamma_raw = dt * (d + dt * kk)
    gamma = jnp.where(gamma_raw != 0.0, 1.0 / jnp.where(gamma_raw != 0.0, gamma_raw, 1.0), 0.0)
    bias = cc * dt * kk * gamma
    ez_raw = k33 + gamma
    ez_mass = jnp.where(ez_raw != 0.0, 1.0 / jnp.where(ez_raw != 0.0, ez_raw, 1.0), 0.0)
    gamma = jnp.where(soft, gamma, 0.0)
    bias = jnp.where(soft, bias, 0.0)
    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    data = WeldData(com, r_a, r_b, k11, k12, k13, k22, k23, k33,
                    ez_mass, gamma, bias, soft)
    return data, {"impulse": imp}


def _weld_warm(data, st, v, w, mask=None):
    com = data.com
    imp = st["impulse"]
    p = imp[:, :2]
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p,
                  -com.i_a * (cross_vv(data.r_a, p) + imp[:, 2]),
                  com.m_b[:, None] * p,
                  com.i_b * (cross_vv(data.r_b, p) + imp[:, 2]))


def _weld_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    imp = st["impulse"]

    # soft path: angular spring then 2x2 linear
    cdot2_s = wb - wa
    i2 = -data.ez_mass * (cdot2_s + data.bias + data.gamma * imp[:, 2])
    wa_s = wa - com.i_a * i2
    wb_s = wb + com.i_b * i2
    cdot1_s = vb + cross_sv(wb_s, data.r_b) - va - cross_sv(wa_s, data.r_a)
    sx, sy = _solve22(data.k11, data.k12, data.k22,
                      -cdot1_s[:, 0], -cdot1_s[:, 1])
    imp_soft = jnp.stack([imp[:, 0] + sx, imp[:, 1] + sy, imp[:, 2] + i2], axis=1)

    # rigid path: full 3x3
    cdot1_r = vb + cross_sv(wb, data.r_b) - va - cross_sv(wa, data.r_a)
    cdot2_r = wb - wa
    rx, ry, rz = _solve33(data.k11, data.k12, data.k13, data.k22, data.k23,
                          data.k33, -cdot1_r[:, 0], -cdot1_r[:, 1], -cdot2_r)
    imp_rigid = jnp.stack([imp[:, 0] + rx, imp[:, 1] + ry, imp[:, 2] + rz], axis=1)

    imp_new = jnp.where(data.soft[:, None], imp_soft, imp_rigid)
    imp_new = jnp.where(m[:, None], imp_new, imp)
    d_imp = imp_new - imp
    p = d_imp[:, :2]
    va = va - com.m_a[:, None] * p
    wa = wa - com.i_a * (cross_vv(data.r_a, p) + d_imp[:, 2])
    vb = vb + com.m_b[:, None] * p
    wb = wb + com.i_b * (cross_vv(data.r_b, p) + d_imp[:, 2])
    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return {**st, "impulse": imp_new}, v, w


def _weld_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    ca, aa = c[com.body_a], a[com.body_a]
    cb, ab = c[com.body_b], a[com.body_b]
    qa = rot_from_angle(aa)
    qb = rot_from_angle(ab)
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b
    k11 = mA + mB + r_a[:, 1] ** 2 * iA + r_b[:, 1] ** 2 * iB
    k12 = -r_a[:, 1] * r_a[:, 0] * iA - r_b[:, 1] * r_b[:, 0] * iB
    k13 = -r_a[:, 1] * iA - r_b[:, 1] * iB
    k22 = mA + mB + r_a[:, 0] ** 2 * iA + r_b[:, 0] ** 2 * iB
    k23 = r_a[:, 0] * iA + r_b[:, 0] * iB
    k33 = iA + iB
    c1 = cb + r_b - ca - r_a
    c2 = ab - aa - blk.reference_angle
    pos_err = jnp.sqrt(dot(c1, c1))
    # rigid: 3x3 (or 2x2 if k33 == 0); soft: 2x2, no angular correction
    r3x, r3y, r3z = _solve33(k11, k12, k13, k22, k23, k33,
                             -c1[:, 0], -c1[:, 1], -c2)
    r2x, r2y = _solve22(k11, k12, k22, -c1[:, 0], -c1[:, 1])
    use2 = data.soft | (k33 == 0.0)
    px = jnp.where(use2, r2x, r3x)
    py = jnp.where(use2, r2y, r3y)
    pz = jnp.where(use2, 0.0, r3z)
    ang_err = jnp.where(data.soft, 0.0, jnp.abs(c2))
    p = jnp.stack([px, py], axis=1)
    p = jnp.where(m[:, None], p, 0.0)
    pz = jnp.where(m, pz, 0.0)
    c = c.at[com.body_a].add(-mA[:, None] * p)
    a = a.at[com.body_a].add(-iA * (cross_vv(r_a, p) + pz))
    c = c.at[com.body_b].add(mB[:, None] * p)
    a = a.at[com.body_b].add(iB * (cross_vv(r_b, p) + pz))
    ok = ((pos_err <= settings.LINEAR_SLOP) &
          (ang_err <= settings.ANGULAR_SLOP)) | ~m
    return c, a, ok




# ==========================================================================
# wheel (b2WheelJoint.cpp) — suspension axis + spring + motor
# ==========================================================================


class WheelData(NamedTuple):
    com: _Common
    ax: jax.Array
    ay: jax.Array
    s_ax: jax.Array
    s_bx: jax.Array
    s_ay: jax.Array
    s_by: jax.Array
    mass: jax.Array
    spring_mass: jax.Array
    motor_mass: jax.Array
    bias: jax.Array
    gamma: jax.Array


def _wheel_init(blk, bodies, awake, color, dt_ratio, warm, dt):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    d = bodies.c[com.body_b] + r_b - bodies.c[com.body_a] - r_a
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b

    local_y = jnp.stack([-blk.local_axis_a[:, 1], blk.local_axis_a[:, 0]], axis=1)
    ay = rot_vec(qa, local_y)
    s_ay = cross_vv(d + r_a, ay)
    s_by = cross_vv(r_b, ay)
    mass_raw = mA + mB + iA * s_ay ** 2 + iB * s_by ** 2
    mass = jnp.where(mass_raw > 0.0, 1.0 / jnp.where(mass_raw > 0.0, mass_raw, 1.0), 0.0)

    ax = rot_vec(qa, blk.local_axis_a)
    s_ax = cross_vv(d + r_a, ax)
    s_bx = cross_vv(r_b, ax)
    inv_m = mA + mB + iA * s_ax ** 2 + iB * s_bx ** 2
    sm0 = jnp.where(inv_m > 0.0, 1.0 / jnp.where(inv_m > 0.0, inv_m, 1.0), 0.0)
    cc = dot(d, ax)
    omega = 2.0 * jnp.pi * blk.frequency
    damp = 2.0 * sm0 * blk.damping_ratio * omega
    k = sm0 * omega * omega
    gamma_raw = dt * (damp + dt * k)
    gamma = jnp.where(gamma_raw > 0.0, 1.0 / jnp.where(gamma_raw > 0.0, gamma_raw, 1.0), 0.0)
    bias = cc * dt * k * gamma
    sm_raw = inv_m + gamma
    spring_mass = jnp.where(sm_raw > 0.0, 1.0 / jnp.where(sm_raw > 0.0, sm_raw, 1.0), 0.0)
    has_spring = (blk.frequency > 0.0) & (inv_m > 0.0)
    spring_mass = jnp.where(has_spring, spring_mass, 0.0)
    bias = jnp.where(has_spring, bias, 0.0)
    gamma = jnp.where(has_spring, gamma, 0.0)

    mm_raw = iA + iB
    motor_mass = jnp.where(blk.enable_motor & (mm_raw > 0.0),
                           1.0 / jnp.where(mm_raw > 0.0, mm_raw, 1.0), 0.0)

    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    si = blk.spring_impulse * dt_ratio if warm else jnp.zeros_like(blk.spring_impulse)
    si = jnp.where(blk.frequency > 0.0, si, 0.0)
    mi = blk.motor_impulse * dt_ratio if warm else jnp.zeros_like(blk.motor_impulse)
    mi = jnp.where(blk.enable_motor, mi, 0.0)
    data = WheelData(com, ax, ay, s_ax, s_bx, s_ay, s_by, mass, spring_mass,
                     motor_mass, bias, gamma)
    return data, {"impulse": imp, "spring_impulse": si, "motor_impulse": mi}


def _wheel_warm(data, st, v, w, mask=None):
    com = data.com
    p = st["impulse"][:, None] * data.ay + st["spring_impulse"][:, None] * data.ax
    l_a = st["impulse"] * data.s_ay + st["spring_impulse"] * data.s_ax + st["motor_impulse"]
    l_b = st["impulse"] * data.s_by + st["spring_impulse"] * data.s_bx + st["motor_impulse"]
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  -com.m_a[:, None] * p, -com.i_a * l_a,
                  com.m_b[:, None] * p, com.i_b * l_b)


def _wheel_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    va, wa = v[com.body_a], w[com.body_a]
    vb, wb = v[com.body_b], w[com.body_b]
    mA, mB, iA, iB = com.m_a, com.m_b, com.i_a, com.i_b

    # spring
    cdot = dot(data.ax, vb - va) + data.s_bx * wb - data.s_ax * wa
    lam = -data.spring_mass * (cdot + data.bias + data.gamma * st["spring_impulse"])
    lam = jnp.where(m, lam, 0.0)
    si = st["spring_impulse"] + lam
    p = lam[:, None] * data.ax
    va = va - mA[:, None] * p
    wa = wa - iA * lam * data.s_ax
    vb = vb + mB[:, None] * p
    wb = wb + iB * lam * data.s_bx

    # motor
    cdot = wb - wa - blk.motor_speed
    lam = -data.motor_mass * cdot
    max_i = dt * blk.max_motor_torque
    mi_new = jnp.clip(st["motor_impulse"] + lam, -max_i, max_i)
    dlam = jnp.where(m & blk.enable_motor, mi_new - st["motor_impulse"], 0.0)
    mi = jnp.where(m & blk.enable_motor, mi_new, st["motor_impulse"])
    wa = wa - iA * dlam
    wb = wb + iB * dlam

    # point-on-line
    cdot = dot(data.ay, vb - va) + data.s_by * wb - data.s_ay * wa
    lam = jnp.where(m, -data.mass * cdot, 0.0)
    imp = st["impulse"] + lam
    p = lam[:, None] * data.ay
    va = va - mA[:, None] * p
    wa = wa - iA * lam * data.s_ay
    vb = vb + mB[:, None] * p
    wb = wb + iB * lam * data.s_by

    v, w = _apply(com, v, w, mask,
                  va - v[com.body_a], wa - w[com.body_a],
                  vb - v[com.body_b], wb - w[com.body_b])
    return {**st, "impulse": imp, "spring_impulse": si, "motor_impulse": mi}, v, w


def _wheel_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    qa = rot_from_angle(a[com.body_a])
    qb = rot_from_angle(a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    d = c[com.body_b] - c[com.body_a] + r_b - r_a
    local_y = jnp.stack([-blk.local_axis_a[:, 1], blk.local_axis_a[:, 0]], axis=1)
    ay = rot_vec(qa, local_y)
    s_ay = cross_vv(d + r_a, ay)
    s_by = cross_vv(r_b, ay)
    cc = dot(d, ay)
    k = com.m_a + com.m_b + com.i_a * data.s_ay ** 2 + com.i_b * data.s_by ** 2
    lam = jnp.where(m & (k != 0.0), -cc / jnp.where(k != 0.0, k, 1.0), 0.0)
    p = lam[:, None] * ay
    c = c.at[com.body_a].add(jnp.where(m[:, None], -com.m_a[:, None] * p, 0.0))
    a = a.at[com.body_a].add(jnp.where(m, -com.i_a * lam * s_ay, 0.0))
    c = c.at[com.body_b].add(jnp.where(m[:, None], com.m_b[:, None] * p, 0.0))
    a = a.at[com.body_b].add(jnp.where(m, com.i_b * lam * s_by, 0.0))
    ok = (jnp.abs(cc) <= settings.LINEAR_SLOP) | ~m
    return c, a, ok


# ==========================================================================
# pulley (b2PulleyJoint.cpp) — two-anchor ratio rope
# ==========================================================================


class PulleyData(NamedTuple):
    com: _Common
    r_a: jax.Array
    r_b: jax.Array
    u_a: jax.Array
    u_b: jax.Array
    mass: jax.Array


def _pulley_init(blk, bodies, awake, color, dt_ratio, warm):
    com = _common(blk, bodies, awake, color)
    qa = rot_from_angle(bodies.a[com.body_a])
    qb = rot_from_angle(bodies.a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u_a = bodies.c[com.body_a] + r_a - blk.ground_anchor_a
    u_b = bodies.c[com.body_b] + r_b - blk.ground_anchor_b
    la = jnp.sqrt(dot(u_a, u_a))
    lb = jnp.sqrt(dot(u_b, u_b))
    u_a = jnp.where((la > 10.0 * settings.LINEAR_SLOP)[:, None],
                    u_a / jnp.where(la > 0, la, 1.0)[:, None], 0.0)
    u_b = jnp.where((lb > 10.0 * settings.LINEAR_SLOP)[:, None],
                    u_b / jnp.where(lb > 0, lb, 1.0)[:, None], 0.0)
    ru_a = cross_vv(r_a, u_a)
    ru_b = cross_vv(r_b, u_b)
    m_a = com.m_a + com.i_a * ru_a ** 2
    m_b = com.m_b + com.i_b * ru_b ** 2
    mass_raw = m_a + blk.ratio ** 2 * m_b
    mass = jnp.where(mass_raw > 0.0, 1.0 / jnp.where(mass_raw > 0.0, mass_raw, 1.0), 0.0)
    imp = blk.impulse * dt_ratio if warm else jnp.zeros_like(blk.impulse)
    return (PulleyData(com, r_a, r_b, u_a, u_b, mass),
            {"impulse": imp, "ratio": blk.ratio})


def _pulley_warm(data, st, v, w, mask=None):
    com = data.com
    pa = -st["impulse"][:, None] * data.u_a
    pb = (-st["ratio"] * st["impulse"])[:, None] * data.u_b
    return _apply(com, v, w,
                  jnp.ones_like(com.active) if mask is None else mask,
                  com.m_a[:, None] * pa, com.i_a * cross_vv(data.r_a, pa),
                  com.m_b[:, None] * pb, com.i_b * cross_vv(data.r_b, pb))


def _pulley_velocity(blk, data, st, v, w, dt, mask):
    com = data.com
    m = mask & com.active
    vp_a = v[com.body_a] + cross_sv(w[com.body_a], data.r_a)
    vp_b = v[com.body_b] + cross_sv(w[com.body_b], data.r_b)
    cdot = -dot(data.u_a, vp_a) - blk.ratio * dot(data.u_b, vp_b)
    lam = jnp.where(m, -data.mass * cdot, 0.0)
    imp = st["impulse"] + lam
    pa = -lam[:, None] * data.u_a
    pb = (-blk.ratio * lam)[:, None] * data.u_b
    v, w = _apply(com, v, w, mask,
                  com.m_a[:, None] * pa, com.i_a * cross_vv(data.r_a, pa),
                  com.m_b[:, None] * pb, com.i_b * cross_vv(data.r_b, pb))
    return {**st, "impulse": imp}, v, w


def _pulley_position(blk, data, st, c, a, mask):
    com = data.com
    m = mask & com.active
    qa = rot_from_angle(a[com.body_a])
    qb = rot_from_angle(a[com.body_b])
    r_a = rot_vec(qa, blk.local_anchor_a - com.lc_a)
    r_b = rot_vec(qb, blk.local_anchor_b - com.lc_b)
    u_a = c[com.body_a] + r_a - blk.ground_anchor_a
    u_b = c[com.body_b] + r_b - blk.ground_anchor_b
    la = jnp.sqrt(dot(u_a, u_a))
    lb = jnp.sqrt(dot(u_b, u_b))
    u_a = jnp.where((la > 10.0 * settings.LINEAR_SLOP)[:, None],
                    u_a / jnp.where(la > 0, la, 1.0)[:, None], 0.0)
    u_b = jnp.where((lb > 10.0 * settings.LINEAR_SLOP)[:, None],
                    u_b / jnp.where(lb > 0, lb, 1.0)[:, None], 0.0)
    ru_a = cross_vv(r_a, u_a)
    ru_b = cross_vv(r_b, u_b)
    m_a = com.m_a + com.i_a * ru_a ** 2
    m_b = com.m_b + com.i_b * ru_b ** 2
    mass_raw = m_a + blk.ratio ** 2 * m_b
    mass = jnp.where(mass_raw > 0.0, 1.0 / jnp.where(mass_raw > 0.0, mass_raw, 1.0), 0.0)
    cc = (blk.length_a + blk.ratio * blk.length_b) - la - blk.ratio * lb
    lam = jnp.where(m, -mass * cc, 0.0)
    pa = -lam[:, None] * u_a
    pb = (-blk.ratio * lam)[:, None] * u_b
    c = c.at[com.body_a].add(jnp.where(m[:, None], com.m_a[:, None] * pa, 0.0))
    a = a.at[com.body_a].add(jnp.where(m, com.i_a * cross_vv(r_a, pa), 0.0))
    c = c.at[com.body_b].add(jnp.where(m[:, None], com.m_b[:, None] * pb, 0.0))
    a = a.at[com.body_b].add(jnp.where(m, com.i_b * cross_vv(r_b, pb), 0.0))
    ok = (jnp.abs(cc) < settings.LINEAR_SLOP) | ~m
    return c, a, ok


# ==========================================================================
# gear (b2GearJoint.cpp) — 4-body ratio coupling of two revolute/prismatic
# joints: C = (coordinate1 + ratio * coordinate2) - C0 = 0
# ==========================================================================
#
# The gear writes to four bodies (A = joint1.bodyB, C = joint1.bodyA,
# B = joint2.bodyB, D = joint2.bodyA) and shares bodies with the very joints
# it couples, so it cannot join the 2-body coloring. Gear counts are tiny
# (a handful per scene), so gears are applied *sequentially in slot order*
# after the colored blocks each iteration — the same Gauss-Seidel semantics
# as the reference's in-island creation-order walk.


class GearData(NamedTuple):
    active: jax.Array   # (J,)
    ba: jax.Array
    bb: jax.Array
    bc: jax.Array
    bd: jax.Array
    m_a: jax.Array
    m_b: jax.Array
    m_c: jax.Array
    m_d: jax.Array
    i_a: jax.Array
    i_b: jax.Array
    i_c: jax.Array
    i_d: jax.Array
    lc_a: jax.Array     # (J,2)
    lc_b: jax.Array
    lc_c: jax.Array
    lc_d: jax.Array
    jv_ac: jax.Array    # (J,2)
    jv_bd: jax.Array
    jw_a: jax.Array
    jw_b: jax.Array
    jw_c: jax.Array
    jw_d: jax.Array
    mass: jax.Array


def _gear_jacobian(blk, lc_a, lc_b, lc_c, lc_d, a_a, a_b, a_c, a_d):
    """Per-slot gear Jacobian terms at the given angles
    (b2GearJoint::InitVelocityConstraints, b2GearJoint.cpp:169-208)."""
    rev1 = blk.joint1_type == 0
    rev2 = blk.joint2_type == 0
    qa = rot_from_angle(a_a)
    qb = rot_from_angle(a_b)
    qc = rot_from_angle(a_c)
    qd = rot_from_angle(a_d)

    # joint1 (A/C) prismatic branch
    u1 = rot_vec(qc, blk.local_axis_c)
    r_c = rot_vec(qc, blk.local_anchor_c - lc_c)
    r_a = rot_vec(qa, blk.local_anchor_a - lc_a)
    jw_c_p = cross_vv(r_c, u1)
    jw_a_p = cross_vv(r_a, u1)

    jv_ac = jnp.where(rev1[:, None], 0.0, u1)
    jw_a = jnp.where(rev1, 1.0, jw_a_p)
    jw_c = jnp.where(rev1, 1.0, jw_c_p)

    # joint2 (B/D) prismatic branch
    u2 = rot_vec(qd, blk.local_axis_d)
    r_d = rot_vec(qd, blk.local_anchor_d - lc_d)
    r_b = rot_vec(qb, blk.local_anchor_b - lc_b)
    jw_d_p = cross_vv(r_d, u2)
    jw_b_p = cross_vv(r_b, u2)

    jv_bd = jnp.where(rev2[:, None], 0.0, blk.ratio[:, None] * u2)
    jw_b = jnp.where(rev2, blk.ratio, blk.ratio * jw_b_p)
    jw_d = jnp.where(rev2, blk.ratio, blk.ratio * jw_d_p)
    return jv_ac, jv_bd, jw_a, jw_b, jw_c, jw_d, rev1, rev2, r_a, r_b


def _gear_init(blk, bodies, awake, dt_ratio, warm):
    ba = jnp.clip(blk.body_a, 0)
    bb = jnp.clip(blk.body_b, 0)
    bc = jnp.clip(blk.body_c, 0)
    bd = jnp.clip(blk.body_d, 0)
    dyn = bodies.is_dynamic
    active = blk.active & ((dyn[ba] & awake[ba]) | (dyn[bb] & awake[bb]))

    lc_a, lc_b = bodies.local_center[ba], bodies.local_center[bb]
    lc_c, lc_d = bodies.local_center[bc], bodies.local_center[bd]
    jv_ac, jv_bd, jw_a, jw_b, jw_c, jw_d, rev1, rev2, _, _ = _gear_jacobian(
        blk, lc_a, lc_b, lc_c, lc_d,
        bodies.a[ba], bodies.a[bb], bodies.a[bc], bodies.a[bd])

    m_a, m_b = bodies.inv_mass[ba], bodies.inv_mass[bb]
    m_c, m_d = bodies.inv_mass[bc], bodies.inv_mass[bd]
    i_a, i_b = bodies.inv_inertia[ba], bodies.inv_inertia[bb]
    i_c, i_d = bodies.inv_inertia[bc], bodies.inv_inertia[bd]

    mass1 = jnp.where(rev1, i_a + i_c,
                      m_c + m_a + i_c * jw_c ** 2 + i_a * jw_a ** 2)
    mass2 = jnp.where(rev2, blk.ratio ** 2 * (i_b + i_d),
                      blk.ratio ** 2 * (m_d + m_b)
                      + i_d * jw_d ** 2 + i_b * jw_b ** 2)
    mass_raw = mass1 + mass2
    mass = jnp.where(mass_raw > 0.0,
                     1.0 / jnp.where(mass_raw > 0.0, mass_raw, 1.0), 0.0)
    # the reference gear does NOT scale its impulse by dtRatio
    # (b2GearJoint.cpp:210-224)
    imp = blk.impulse if warm else jnp.zeros_like(blk.impulse)
    data = GearData(active, ba, bb, bc, bd, m_a, m_b, m_c, m_d,
                    i_a, i_b, i_c, i_d, lc_a, lc_b, lc_c, lc_d,
                    jv_ac, jv_bd, jw_a, jw_b, jw_c, jw_d, mass)
    return data, {"impulse": imp}


def _gear_apply_one(d: GearData, j: int, imp, v, w):
    """Apply one gear's impulse to its four bodies (scalar slot j)."""
    ba, bb, bc, bd = d.ba[j], d.bb[j], d.bc[j], d.bd[j]
    v = v.at[ba].add(d.m_a[j] * imp * d.jv_ac[j])
    w = w.at[ba].add(d.i_a[j] * imp * d.jw_a[j])
    v = v.at[bb].add(d.m_b[j] * imp * d.jv_bd[j])
    w = w.at[bb].add(d.i_b[j] * imp * d.jw_b[j])
    v = v.at[bc].add(-d.m_c[j] * imp * d.jv_ac[j])
    w = w.at[bc].add(-d.i_c[j] * imp * d.jw_c[j])
    v = v.at[bd].add(-d.m_d[j] * imp * d.jv_bd[j])
    w = w.at[bd].add(-d.i_d[j] * imp * d.jw_d[j])
    return v, w


def _gear_warm(data: GearData, st, v, w):
    for j in range(data.ba.shape[0]):
        imp = jnp.where(data.active[j], st["impulse"][j], 0.0)
        v, w = _gear_apply_one(data, j, imp, v, w)
    return v, w


def _gear_velocity(blk, data: GearData, st, v, w):
    """Sequential slot-order velocity solve
    (b2GearJoint::SolveVelocityConstraints, b2GearJoint.cpp:236-270)."""
    impulse = st["impulse"]
    for j in range(data.ba.shape[0]):
        ba, bb, bc, bd = data.ba[j], data.bb[j], data.bc[j], data.bd[j]
        cdot = (jnp.dot(data.jv_ac[j], v[ba] - v[bc])
                + jnp.dot(data.jv_bd[j], v[bb] - v[bd])
                + (data.jw_a[j] * w[ba] - data.jw_c[j] * w[bc])
                + (data.jw_b[j] * w[bb] - data.jw_d[j] * w[bd]))
        imp = jnp.where(data.active[j], -data.mass[j] * cdot, 0.0)
        impulse = impulse.at[j].add(imp)
        v, w = _gear_apply_one(data, j, imp, v, w)
    return {"impulse": impulse}, v, w


def _gear_position(blk, data: GearData, st, c, a):
    """Sequential slot-order NGS pass
    (b2GearJoint::SolvePositionConstraints, b2GearJoint.cpp:272-369)."""
    for j in range(data.ba.shape[0]):
        ba, bb, bc, bd = data.ba[j], data.bb[j], data.bc[j], data.bd[j]
        blk_j = jax.tree.map(lambda x: x[j:j + 1], blk)
        jv_ac, jv_bd, jw_a, jw_b, jw_c, jw_d, rev1, rev2, r_a, r_b = \
            _gear_jacobian(blk_j,
                           data.lc_a[j:j + 1], data.lc_b[j:j + 1],
                           data.lc_c[j:j + 1], data.lc_d[j:j + 1],
                           a[ba][None], a[bb][None], a[bc][None], a[bd][None])
        mass1 = jnp.where(rev1, data.i_a[j] + data.i_c[j],
                          data.m_c[j] + data.m_a[j]
                          + data.i_c[j] * jw_c ** 2 + data.i_a[j] * jw_a ** 2)
        mass2 = jnp.where(
            rev2, blk_j.ratio ** 2 * (data.i_b[j] + data.i_d[j]),
            blk_j.ratio ** 2 * (data.m_d[j] + data.m_b[j])
            + data.i_d[j] * jw_d ** 2 + data.i_b[j] * jw_b ** 2)
        mass = mass1 + mass2

        # coordinates at current positions (b2GearJoint.cpp:300,314,324,338)
        qc = rot_from_angle(a[bc][None])
        pc1 = blk_j.local_anchor_c - data.lc_c[j:j + 1]
        pa1 = rot_t_vec(qc, r_a + (c[ba] - c[bc])[None])
        coord_a = jnp.where(
            rev1, a[ba] - a[bc] - blk_j.reference_angle_a,
            dot(pa1 - pc1, blk_j.local_axis_c))
        qd = rot_from_angle(a[bd][None])
        pd2 = blk_j.local_anchor_d - data.lc_d[j:j + 1]
        pb2 = rot_t_vec(qd, r_b + (c[bb] - c[bd])[None])
        coord_b = jnp.where(
            rev2, a[bb] - a[bd] - blk_j.reference_angle_b,
            dot(pb2 - pd2, blk_j.local_axis_d))

        cc = (coord_a + blk_j.ratio * coord_b) - blk_j.constant
        imp = jnp.where(data.active[j] & (mass[0] > 0.0),
                        -cc[0] / jnp.where(mass[0] > 0.0, mass[0], 1.0), 0.0)
        c = c.at[ba].add(data.m_a[j] * imp * jv_ac[0])
        a = a.at[ba].add(data.i_a[j] * imp * jw_a[0])
        c = c.at[bb].add(data.m_b[j] * imp * jv_bd[0])
        a = a.at[bb].add(data.i_b[j] * imp * jw_b[0])
        c = c.at[bc].add(-data.m_c[j] * imp * jv_ac[0])
        a = a.at[bc].add(-data.i_c[j] * imp * jw_c[0])
        c = c.at[bd].add(-data.m_d[j] * imp * jv_bd[0])
        a = a.at[bd].add(-data.i_d[j] * imp * jw_d[0])
    return c, a


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
    for name in ("revolute", "distance", "prismatic", "mouse", "weld",
                 "friction", "rope", "motor", "wheel", "pulley"):
        blk = getattr(joints, name)
        if blk.body_a.shape[0] > 0:
            blocks.append((name, blk))
    colors = {}
    if blocks:
        ba = jnp.concatenate([b.body_a for _, b in blocks])
        bb = jnp.concatenate([b.body_b for _, b in blocks])
        act = jnp.concatenate([b.active for _, b in blocks])
        dyn = bodies.is_dynamic
        col, _ = coloring.color_constraints(
            jnp.clip(ba, 0), jnp.clip(bb, 0),
            dyn[jnp.clip(ba, 0)], dyn[jnp.clip(bb, 0)], act, nb, max_colors)
        # slice colors back per block
        off = 0
        for name, b in blocks:
            n = b.body_a.shape[0]
            colors[name] = col[off:off + n]
            off += n

    data = {}
    state = {}
    # gears are 4-body and share bodies with the joints they couple, so
    # they bypass coloring and solve sequentially (see the gear section)
    if joints.gear.body_a.shape[0] > 0:
        d, s = _gear_init(joints.gear, bodies, awake, dt_ratio, warm_starting)
        data["gear"] = (joints.gear, d)
        state["gear"] = s
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
        elif name == "mouse":
            d, s = _mouse_init(blk, bodies, awake, colors[name], dt_ratio,
                               warm_starting, dt)
        elif name == "weld":
            d, s = _weld_init(blk, bodies, awake, colors[name], dt_ratio,
                              warm_starting, dt)
        elif name == "friction":
            d, s = _friction_init(blk, bodies, awake, colors[name], dt_ratio,
                                  warm_starting)
        elif name == "rope":
            d, s = _rope_init(blk, bodies, awake, colors[name], dt_ratio,
                              warm_starting)
        elif name == "motor":
            d, s = _motor_init(blk, bodies, awake, colors[name], dt_ratio,
                               warm_starting)
        elif name == "wheel":
            d, s = _wheel_init(blk, bodies, awake, colors[name], dt_ratio,
                               warm_starting, dt)
        elif name == "pulley":
            d, s = _pulley_init(blk, bodies, awake, colors[name], dt_ratio,
                                warm_starting)
        data[name] = (blk, d)
        state[name] = s
    return data, state


_SOLVE_ORDER = ("revolute", "distance", "prismatic", "mouse", "weld",
                "friction", "rope", "motor", "wheel", "pulley")


def _block_names(jdata):
    """Static block-name order recovered from the (pytree-safe) data dict —
    dict keys are not traced, so this survives vmap boundaries."""
    return tuple(n for n in _SOLVE_ORDER if n in jdata)


def warm_start_joints(jdata, jstate, v, w):
    for name in _block_names(jdata):
        blk, d = jdata[name]
        fn = {"revolute": _revolute_warm, "distance": _distance_warm,
              "prismatic": _prismatic_warm, "mouse": _mouse_warm,
              "weld": _weld_warm, "friction": _friction_warm,
              "rope": _rope_warm, "motor": _motor_warm,
              "wheel": _wheel_warm, "pulley": _pulley_warm}[name]
        v, w = fn(d, jstate[name], v, w)
    if "gear" in jdata:
        v, w = _gear_warm(jdata["gear"][1], jstate["gear"], v, w)
    return v, w


def solve_joint_velocity(jdata, jstate, v, w, dt, max_colors=settings.MAX_COLORS):
    """One velocity iteration over all joints, color by color."""
    fns = {"revolute": _revolute_velocity, "distance": _distance_velocity,
           "prismatic": _prismatic_velocity, "mouse": _mouse_velocity,
           "weld": _weld_velocity, "friction": _friction_velocity,
           "rope": _rope_velocity, "motor": _motor_velocity,
           "wheel": _wheel_velocity, "pulley": _pulley_velocity}

    def color_pass(ci, carry):
        jstate, v, w = carry
        for name in _block_names(jdata):
            blk, d = jdata[name]
            st, v, w = fns[name](blk, d, jstate[name], v, w, dt,
                                 d.com.color == ci)
            jstate = {**jstate, name: st}
        return jstate, v, w

    if _block_names(jdata):
        jstate, v, w = jax.lax.fori_loop(0, max_colors, color_pass,
                                         (jstate, v, w))
    if "gear" in jdata:
        blk, d = jdata["gear"]
        st, v, w = _gear_velocity(blk, d, jstate["gear"], v, w)
        jstate = {**jstate, "gear": st}
    return jstate, v, w


def solve_joint_position(jdata, jstate, c, a, max_colors=settings.MAX_COLORS):
    """One NGS iteration over all joints. Returns (c, a, ok_body)."""
    fns = {"revolute": _revolute_position, "distance": _distance_position,
           "prismatic": _prismatic_position, "mouse": _mouse_position,
           "weld": _weld_position, "friction": _friction_position,
           "rope": _rope_position, "motor": _motor_position,
           "wheel": _wheel_position, "pulley": _pulley_position}
    nb = c.shape[0]
    ok_body = jnp.ones(nb, bool)

    def color_pass(ci, carry):
        c, a, ok_body = carry
        for name in _block_names(jdata):
            blk, d = jdata[name]
            c, a, ok = fns[name](blk, d, jstate[name], c, a, d.com.color == ci)
            okm = ok | (d.com.color != ci)
            ok_i = ok_body.astype(jnp.int32)
            ok_i = ok_i.at[d.com.body_a].min(okm.astype(jnp.int32))
            ok_i = ok_i.at[d.com.body_b].min(okm.astype(jnp.int32))
            ok_body = ok_i.astype(bool)
        return c, a, ok_body

    if _block_names(jdata):
        c, a, ok_body = jax.lax.fori_loop(0, max_colors, color_pass,
                                          (c, a, ok_body))
    if "gear" in jdata:
        blk, d = jdata["gear"]
        c, a = _gear_position(blk, d, jstate["gear"], c, a)
    return c, a, ok_body


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
    if "mouse" in jstate:
        out = dc.replace(out, mouse=dc.replace(
            out.mouse, impulse=jstate["mouse"]["impulse"]))
    if "weld" in jstate:
        out = dc.replace(out, weld=dc.replace(
            out.weld, impulse=jstate["weld"]["impulse"]))
    if "friction" in jstate:
        s = jstate["friction"]
        out = dc.replace(out, friction=dc.replace(
            out.friction, linear_impulse=s["linear_impulse"],
            angular_impulse=s["angular_impulse"]))
    if "rope" in jstate:
        out = dc.replace(out, rope=dc.replace(
            out.rope, impulse=jstate["rope"]["impulse"]))
    if "motor" in jstate:
        s = jstate["motor"]
        out = dc.replace(out, motor=dc.replace(
            out.motor, linear_impulse=s["linear_impulse"],
            angular_impulse=s["angular_impulse"]))
    if "wheel" in jstate:
        s = jstate["wheel"]
        out = dc.replace(out, wheel=dc.replace(
            out.wheel, impulse=s["impulse"],
            spring_impulse=s["spring_impulse"],
            motor_impulse=s["motor_impulse"]))
    if "pulley" in jstate:
        out = dc.replace(out, pulley=dc.replace(
            out.pulley, impulse=jstate["pulley"]["impulse"]))
    if "gear" in jstate:
        out = dc.replace(out, gear=dc.replace(
            out.gear, impulse=jstate["gear"]["impulse"]))
    return out
