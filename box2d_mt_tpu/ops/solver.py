"""Sequential-impulse contact solver, colored Gauss-Seidel.

Re-implements the reference b2ContactSolver (Contacts/b2ContactSolver.cpp)
over the whole contact table at once:

  * constraint init + restitution bias   (.cpp:142-249)
  * warm starting scaled by dtRatio      (.cpp:253-291, :113-117)
  * friction-then-normal velocity solve with the 2x2 block LCP by total
    enumeration and its condition-number guard (.cpp:293-603, :220-249)
  * NGS position correction with Baumgarte/slop/max-correction clamps
    (.cpp:676-752)

Velocity/position iterations walk color classes (see coloring.py) so that
within a color all scatters are conflict-free and across colors the
Gauss-Seidel ordering is deterministic — the island/thread decomposition of
the reference collapses into a fixed color order inside one XLA program.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import cross_sv, cross_vv, dot, normalize, rot_from_angle, rot_vec, transform_point

EPS = 1.1920929e-7


class ContactConstraints(NamedTuple):
    """Per-contact solver data (b2ContactVelocityConstraint +
    b2ContactPositionConstraint, b2ContactSolver.cpp:32-45)."""
    active: jax.Array        # (C,) bool
    body_a: jax.Array        # (C,) i32
    body_b: jax.Array        # (C,) i32
    point_count: jax.Array   # (C,) i32 (may drop 2->1 on ill-conditioned K)
    friction: jax.Array      # (C,)
    restitution: jax.Array   # (C,)
    tangent_speed: jax.Array  # (C,)
    inv_mass_a: jax.Array
    inv_mass_b: jax.Array
    inv_i_a: jax.Array
    inv_i_b: jax.Array
    normal: jax.Array        # (C,2)
    r_a: jax.Array           # (C,2,2) point j anchor rel. center A
    r_b: jax.Array           # (C,2,2)
    normal_mass: jax.Array   # (C,2)
    tangent_mass: jax.Array  # (C,2)
    velocity_bias: jax.Array  # (C,2)
    k11: jax.Array           # (C,) block-solver K and inverse
    k12: jax.Array
    k22: jax.Array
    nm11: jax.Array
    nm12: jax.Array
    nm22: jax.Array
    # position-solver fields
    local_points: jax.Array  # (C,2,2)
    local_normal: jax.Array  # (C,2)
    local_point: jax.Array   # (C,2)
    radius_a: jax.Array      # (C,)
    radius_b: jax.Array      # (C,)
    local_center_a: jax.Array  # (C,2)
    local_center_b: jax.Array  # (C,2)
    mtype: jax.Array         # (C,) i32


def world_manifold(mtype, local_point, local_normal, points, count,
                   pa, qa, ra, pb, qb, rb):
    """b2WorldManifold::Initialize (b2Collision.cpp): world-space normal,
    contact points, separations for one manifold."""
    # circles
    point_a = transform_point(pa, qa, local_point)
    point_b = transform_point(pb, qb, points[0])
    d = point_b - point_a
    far = dot(d, d) > EPS * EPS
    n_c = jnp.where(far, normalize(d)[0], jnp.array([1.0, 0.0]))
    ca_c = point_a + ra * n_c
    cb_c = point_b - rb * n_c
    pts_c = jnp.stack([0.5 * (ca_c + cb_c), jnp.zeros(2)])
    sep_c = jnp.stack([dot(cb_c - ca_c, n_c), jnp.float32(0.0)])

    # faceA
    n_a = rot_vec(qa, local_normal)
    plane_a = transform_point(pa, qa, local_point)
    clip_a = jax.vmap(lambda lp: transform_point(pb, qb, lp))(points)  # (2,2)
    ca_a = clip_a + (ra - dot(clip_a - plane_a, n_a))[:, None] * n_a
    cb_a = clip_a - rb * n_a
    pts_a = 0.5 * (ca_a + cb_a)
    sep_a = dot(cb_a - ca_a, n_a)

    # faceB
    n_b = rot_vec(qb, local_normal)
    plane_b = transform_point(pb, qb, local_point)
    clip_b = jax.vmap(lambda lp: transform_point(pa, qa, lp))(points)
    cb_b = clip_b + (rb - dot(clip_b - plane_b, n_b))[:, None] * n_b
    ca_b = clip_b - ra * n_b
    pts_b = 0.5 * (ca_b + cb_b)
    sep_b = dot(ca_b - cb_b, n_b)

    is_a = mtype == settings.MANIFOLD_FACE_A
    is_b = mtype == settings.MANIFOLD_FACE_B
    normal = jnp.where(is_a, n_a, jnp.where(is_b, -n_b, n_c))
    pts = jnp.where(is_a, pts_a, jnp.where(is_b, pts_b, pts_c))
    seps = jnp.where(is_a, sep_a, jnp.where(is_b, sep_b, sep_c))
    return normal, pts, seps


def _gather_xf(c, a, local_center):
    q = rot_from_angle(a)
    p = c - rot_vec(q, local_center)
    return p, q


def init_contact_constraints(contacts, fx, bodies, c_pos, a_pos, v, w,
                             active) -> ContactConstraints:
    """Init per-contact constraint data from current positions/velocities
    (b2ContactSolver ctor + InitializeVelocityConstraints)."""
    ia = jnp.clip(contacts.f_a, 0)
    ib = jnp.clip(contacts.f_b, 0)
    ba = jnp.clip(fx.body[ia], 0)
    bb = jnp.clip(fx.body[ib], 0)

    friction = jnp.sqrt(fx.friction[ia] * fx.friction[ib])
    restitution = jnp.maximum(fx.restitution[ia], fx.restitution[ib])

    m_a = bodies.inv_mass[ba]
    m_b = bodies.inv_mass[bb]
    i_a = bodies.inv_inertia[ba]
    i_b = bodies.inv_inertia[bb]
    lc_a = bodies.local_center[ba]
    lc_b = bodies.local_center[bb]
    ra_shape = fx.radius[ia]
    rb_shape = fx.radius[ib]

    pa, qa = jax.vmap(_gather_xf)(c_pos[ba], a_pos[ba], lc_a)
    pb, qb = jax.vmap(_gather_xf)(c_pos[bb], a_pos[bb], lc_b)

    normal, pts, _ = jax.vmap(world_manifold)(
        contacts.m_type, contacts.m_local_point, contacts.m_local_normal,
        contacts.m_points, contacts.m_count, pa, qa, ra_shape, pb, qb, rb_shape)

    r_a = pts - c_pos[ba][:, None, :]
    r_b = pts - c_pos[bb][:, None, :]

    rn_a = cross_vv(r_a, normal[:, None, :])      # (C,2)
    rn_b = cross_vv(r_b, normal[:, None, :])
    k_normal = (m_a + m_b)[:, None] + i_a[:, None] * rn_a ** 2 + i_b[:, None] * rn_b ** 2
    normal_mass = jnp.where(k_normal > 0.0, 1.0 / k_normal, 0.0)

    tangent = jnp.stack([normal[:, 1], -normal[:, 0]], axis=-1)
    rt_a = cross_vv(r_a, tangent[:, None, :])
    rt_b = cross_vv(r_b, tangent[:, None, :])
    k_tangent = (m_a + m_b)[:, None] + i_a[:, None] * rt_a ** 2 + i_b[:, None] * rt_b ** 2
    tangent_mass = jnp.where(k_tangent > 0.0, 1.0 / k_tangent, 0.0)

    dv = (v[bb][:, None, :] + cross_sv(w[bb][:, None], r_b)
          - v[ba][:, None, :] - cross_sv(w[ba][:, None], r_a))
    v_rel = dot(dv, normal[:, None, :])
    velocity_bias = jnp.where(v_rel < -settings.VELOCITY_THRESHOLD,
                              -restitution[:, None] * v_rel, 0.0)

    # 2-point block solver setup with condition-number guard
    point_count = contacts.m_count
    k11 = k_normal[:, 0]
    k22 = k_normal[:, 1]
    k12 = m_a + m_b + i_a * rn_a[:, 0] * rn_a[:, 1] + i_b * rn_b[:, 0] * rn_b[:, 1]
    det = k11 * k22 - k12 * k12
    well_conditioned = k11 * k11 < 1000.0 * det
    two = point_count == 2
    point_count = jnp.where(two & ~well_conditioned, 1, point_count)
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    nm11 = inv_det * k22
    nm12 = -inv_det * k12
    nm22 = inv_det * k11

    return ContactConstraints(
        active=active,
        body_a=ba.astype(jnp.int32), body_b=bb.astype(jnp.int32),
        point_count=point_count.astype(jnp.int32),
        friction=friction, restitution=restitution,
        tangent_speed=jnp.zeros_like(friction),
        inv_mass_a=m_a, inv_mass_b=m_b, inv_i_a=i_a, inv_i_b=i_b,
        normal=normal, r_a=r_a, r_b=r_b,
        normal_mass=normal_mass, tangent_mass=tangent_mass,
        velocity_bias=velocity_bias,
        k11=k11, k12=k12, k22=k22, nm11=nm11, nm12=nm12, nm22=nm22,
        local_points=contacts.m_points,
        local_normal=contacts.m_local_normal,
        local_point=contacts.m_local_point,
        radius_a=ra_shape, radius_b=rb_shape,
        local_center_a=lc_a, local_center_b=lc_b,
        mtype=contacts.m_type,
    )


def warm_start(cc: ContactConstraints, ni, ti, v, w):
    """Apply accumulated impulses (b2ContactSolver::WarmStart). Order-free
    scatter-add over all active contacts."""
    tangent = jnp.stack([cc.normal[:, 1], -cc.normal[:, 0]], axis=-1)
    pmask = (jnp.arange(2)[None, :] < cc.point_count[:, None]) & cc.active[:, None]
    p_imp = jnp.where(pmask[..., None],
                      ni[..., None] * cc.normal[:, None, :]
                      + ti[..., None] * tangent[:, None, :], 0.0)
    p_sum = jnp.sum(p_imp, axis=1)                      # (C,2)
    ang_a = jnp.sum(jnp.where(pmask, cross_vv(cc.r_a, p_imp), 0.0), axis=1)
    ang_b = jnp.sum(jnp.where(pmask, cross_vv(cc.r_b, p_imp), 0.0), axis=1)

    v = v.at[cc.body_a].add(-cc.inv_mass_a[:, None] * p_sum)
    w = w.at[cc.body_a].add(-cc.inv_i_a * ang_a)
    v = v.at[cc.body_b].add(cc.inv_mass_b[:, None] * p_sum)
    w = w.at[cc.body_b].add(cc.inv_i_b * ang_b)
    return v, w


def solve_velocity_color(cc: ContactConstraints, ni, ti, v, w, mask):
    """One color pass of SolveVelocityConstraints (b2ContactSolver.cpp:293-603).
    Contacts in `mask` touch disjoint dynamic bodies."""
    m = mask & cc.active
    va = v[cc.body_a]
    wa = w[cc.body_a]
    vb = v[cc.body_b]
    wb = w[cc.body_b]
    normal = cc.normal
    tangent = jnp.stack([normal[:, 1], -normal[:, 0]], axis=-1)

    ni_new = ni
    ti_new = ti

    # friction, point by point (reference order: j = 0 then 1)
    for j in range(2):
        has = m & (j < cc.point_count)
        dv = vb + cross_sv(wb, cc.r_b[:, j]) - va - cross_sv(wa, cc.r_a[:, j])
        vt = dot(dv, tangent) - cc.tangent_speed
        lam = cc.tangent_mass[:, j] * (-vt)
        max_f = cc.friction * ni_new[:, j]
        new_imp = jnp.clip(ti_new[:, j] + lam, -max_f, max_f)
        lam = jnp.where(has, new_imp - ti_new[:, j], 0.0)
        ti_new = ti_new.at[:, j].set(jnp.where(has, new_imp, ti_new[:, j]))
        p = lam[:, None] * tangent
        va = va - cc.inv_mass_a[:, None] * p
        wa = wa - cc.inv_i_a * cross_vv(cc.r_a[:, j], p)
        vb = vb + cc.inv_mass_b[:, None] * p
        wb = wb + cc.inv_i_b * cross_vv(cc.r_b[:, j], p)

    # normal: 1-point scalar path
    one_pt = m & (cc.point_count == 1)
    dv0 = vb + cross_sv(wb, cc.r_b[:, 0]) - va - cross_sv(wa, cc.r_a[:, 0])
    vn0 = dot(dv0, normal)
    lam0 = -cc.normal_mass[:, 0] * (vn0 - cc.velocity_bias[:, 0])
    new0 = jnp.maximum(ni_new[:, 0] + lam0, 0.0)
    dlam0 = jnp.where(one_pt, new0 - ni_new[:, 0], 0.0)
    p0 = dlam0[:, None] * normal
    va = va - cc.inv_mass_a[:, None] * p0
    wa = wa - cc.inv_i_a * cross_vv(cc.r_a[:, 0], p0)
    vb = vb + cc.inv_mass_b[:, None] * p0
    wb = wb + cc.inv_i_b * cross_vv(cc.r_b[:, 0], p0)
    ni_new = ni_new.at[:, 0].set(jnp.where(one_pt, new0, ni_new[:, 0]))

    # normal: 2-point block LCP by total enumeration
    two_pt = m & (cc.point_count == 2)
    a1 = ni_new[:, 0]
    a2 = ni_new[:, 1]
    dv1 = vb + cross_sv(wb, cc.r_b[:, 0]) - va - cross_sv(wa, cc.r_a[:, 0])
    dv2 = vb + cross_sv(wb, cc.r_b[:, 1]) - va - cross_sv(wa, cc.r_a[:, 1])
    vn1 = dot(dv1, normal)
    vn2 = dot(dv2, normal)
    b1 = vn1 - cc.velocity_bias[:, 0] - (cc.k11 * a1 + cc.k12 * a2)
    b2 = vn2 - cc.velocity_bias[:, 1] - (cc.k12 * a1 + cc.k22 * a2)

    # case 1: both points at vn=0
    x1_1 = -(cc.nm11 * b1 + cc.nm12 * b2)
    x2_1 = -(cc.nm12 * b1 + cc.nm22 * b2)
    ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
    # case 2: x2 = 0
    x1_2 = -cc.normal_mass[:, 0] * b1
    vn2_2 = cc.k12 * x1_2 + b2
    ok2 = (x1_2 >= 0.0) & (vn2_2 >= 0.0)
    # case 3: x1 = 0
    x2_3 = -cc.normal_mass[:, 1] * b2
    vn1_3 = cc.k12 * x2_3 + b1
    ok3 = (x2_3 >= 0.0) & (vn1_3 >= 0.0)
    # case 4: x = 0
    ok4 = (b1 >= 0.0) & (b2 >= 0.0)

    x1 = jnp.where(ok1, x1_1, jnp.where(ok2, x1_2, jnp.where(ok3, 0.0, jnp.where(ok4, 0.0, a1))))
    x2 = jnp.where(ok1, x2_1, jnp.where(ok2, 0.0, jnp.where(ok3, x2_3, jnp.where(ok4, 0.0, a2))))
    # "no solution, give up" keeps the accumulated impulse (d = 0)

    d1 = jnp.where(two_pt, x1 - a1, 0.0)
    d2 = jnp.where(two_pt, x2 - a2, 0.0)
    p1 = d1[:, None] * normal
    p2 = d2[:, None] * normal
    va = va - cc.inv_mass_a[:, None] * (p1 + p2)
    wa = wa - cc.inv_i_a * (cross_vv(cc.r_a[:, 0], p1) + cross_vv(cc.r_a[:, 1], p2))
    vb = vb + cc.inv_mass_b[:, None] * (p1 + p2)
    wb = wb + cc.inv_i_b * (cross_vv(cc.r_b[:, 0], p1) + cross_vv(cc.r_b[:, 1], p2))
    ni_new = ni_new.at[:, 0].set(jnp.where(two_pt, x1, ni_new[:, 0]))
    ni_new = ni_new.at[:, 1].set(jnp.where(two_pt, x2, ni_new[:, 1]))

    # scatter velocity deltas (disjoint within a color)
    dva = jnp.where(m[:, None], va - v[cc.body_a], 0.0)
    dwa = jnp.where(m, wa - w[cc.body_a], 0.0)
    dvb = jnp.where(m[:, None], vb - v[cc.body_b], 0.0)
    dwb = jnp.where(m, wb - w[cc.body_b], 0.0)
    v = v.at[cc.body_a].add(dva)
    w = w.at[cc.body_a].add(dwa)
    v = v.at[cc.body_b].add(dvb)
    w = w.at[cc.body_b].add(dwb)
    return ni_new, ti_new, v, w


def solve_position_color(cc: ContactConstraints, c, a, mask, baumgarte,
                         max_correction):
    """One color pass of SolvePositionConstraints (b2ContactSolver.cpp:676-752).
    Returns updated (c, a, min_separation_per_contact)."""
    m = mask & cc.active
    ca = c[cc.body_a]
    aa = a[cc.body_a]
    cb = c[cc.body_b]
    ab = a[cc.body_b]
    min_sep = jnp.zeros(cc.friction.shape[0], jnp.float32)

    for j in range(2):
        has = m & (j < cc.point_count)
        pa, qa = jax.vmap(_gather_xf)(ca, aa, cc.local_center_a)
        pb, qb = jax.vmap(_gather_xf)(cb, ab, cc.local_center_b)
        normal, point, sep = jax.vmap(_psm)(
            cc.mtype, cc.local_point, cc.local_normal, cc.local_points,
            pa, qa, cc.radius_a, pb, qb, cc.radius_b, jnp.full_like(cc.mtype, j))
        r_a = point - ca
        r_b = point - cb
        min_sep = jnp.where(has, jnp.minimum(min_sep, sep), min_sep)
        corr = jnp.clip(baumgarte * (sep + settings.LINEAR_SLOP),
                        -max_correction, 0.0)
        rn_a = cross_vv(r_a, normal)
        rn_b = cross_vv(r_b, normal)
        k = cc.inv_mass_a + cc.inv_mass_b + cc.inv_i_a * rn_a ** 2 + cc.inv_i_b * rn_b ** 2
        impulse = jnp.where(has & (k > 0.0), -corr / jnp.where(k > 0.0, k, 1.0), 0.0)
        p = impulse[:, None] * normal
        ca = ca - cc.inv_mass_a[:, None] * p
        aa = aa - cc.inv_i_a * cross_vv(r_a, p)
        cb = cb + cc.inv_mass_b[:, None] * p
        ab = ab + cc.inv_i_b * cross_vv(r_b, p)

    dca = jnp.where(m[:, None], ca - c[cc.body_a], 0.0)
    daa = jnp.where(m, aa - a[cc.body_a], 0.0)
    dcb = jnp.where(m[:, None], cb - c[cc.body_b], 0.0)
    dab = jnp.where(m, ab - a[cc.body_b], 0.0)
    c = c.at[cc.body_a].add(dca)
    a = a.at[cc.body_a].add(daa)
    c = c.at[cc.body_b].add(dcb)
    a = a.at[cc.body_b].add(dab)
    return c, a, jnp.where(m, min_sep, 0.0)


def _psm(mtype, local_point, local_normal, local_points, pa, qa, ra, pb, qb, rb, j):
    """b2PositionSolverManifold::Initialize (b2ContactSolver.cpp:620-672)."""
    # circles
    pA = transform_point(pa, qa, local_point)
    pB = transform_point(pb, qb, local_points[0])
    d = pB - pA
    n_c, _ = normalize(d)
    pt_c = 0.5 * (pA + pB)
    sep_c = dot(d, n_c) - ra - rb

    lp_j = local_points[jnp.clip(j, 0, 1)]
    # faceA
    n_a = rot_vec(qa, local_normal)
    plane_a = transform_point(pa, qa, local_point)
    clip_a = transform_point(pb, qb, lp_j)
    sep_a = dot(clip_a - plane_a, n_a) - ra - rb
    # faceB
    n_b = rot_vec(qb, local_normal)
    plane_b = transform_point(pb, qb, local_point)
    clip_b = transform_point(pa, qa, lp_j)
    sep_b = dot(clip_b - plane_b, n_b) - ra - rb

    is_a = mtype == settings.MANIFOLD_FACE_A
    is_b = mtype == settings.MANIFOLD_FACE_B
    normal = jnp.where(is_a, n_a, jnp.where(is_b, -n_b, n_c))
    point = jnp.where(is_a, clip_a, jnp.where(is_b, clip_b, pt_c))
    sep = jnp.where(is_a, sep_a, jnp.where(is_b, sep_b, sep_c))
    return normal, point, sep
