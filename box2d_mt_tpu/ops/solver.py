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
from .gather import (gather_cols, gather_rows, gather_scalar,
                     scatter_add, scatter_add_cols)

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
    (b2ContactSolver ctor + InitializeVelocityConstraints). All per-fixture
    and per-body reads are packed into three gathers."""
    n_c = contacts.capacity
    iab = jnp.concatenate([jnp.clip(contacts.f_a, 0), jnp.clip(contacts.f_b, 0)])

    fpack = jnp.stack([fx.friction, fx.restitution, fx.radius,
                       jnp.clip(fx.body, 0).astype(jnp.float32)], axis=1)
    fg = gather_rows(fpack, iab)                        # gather 1: (2C, 4)
    bab = fg[:, 3].astype(jnp.int32)
    ba, bb = bab[:n_c], bab[n_c:]

    # default mixing (b2Contact.h:40-50) with per-contact overrides
    # (b2Contact::SetFriction/SetRestitution, b2Contact.h:126-150)
    friction = jnp.sqrt(fg[:n_c, 0] * fg[n_c:, 0])
    friction = jnp.where(contacts.friction_override >= 0.0,
                         contacts.friction_override, friction)
    restitution = jnp.maximum(fg[:n_c, 1], fg[n_c:, 1])
    restitution = jnp.where(contacts.restitution_override >= 0.0,
                            contacts.restitution_override, restitution)
    ra_shape = fg[:n_c, 2]
    rb_shape = fg[n_c:, 2]

    bpack = jnp.concatenate([
        bodies.inv_mass[:, None], bodies.inv_inertia[:, None],
        bodies.local_center, c_pos, a_pos[:, None], v, w[:, None],
    ], axis=1)                                          # (N, 10)
    bg = gather_rows(bpack, bab)                        # gather 2: (2C, 10)
    m_a, m_b = bg[:n_c, 0], bg[n_c:, 0]
    i_a, i_b = bg[:n_c, 1], bg[n_c:, 1]
    lc_a, lc_b = bg[:n_c, 2:4], bg[n_c:, 2:4]
    ca_pos, cb_pos = bg[:n_c, 4:6], bg[n_c:, 4:6]
    aa_pos, ab_pos = bg[:n_c, 6], bg[n_c:, 6]
    va, vb = bg[:n_c, 7:9], bg[n_c:, 7:9]
    wa, wb = bg[:n_c, 9], bg[n_c:, 9]

    # ---- everything below is LANE-MAJOR: all arrays are (C,) components
    # riding the 128-wide vector axis. The previous vmapped/row-major form
    # carried (C, 2, 2) arrays whose 2-wide minor axis wasted ~98% of the
    # VPU (measured ~10 ms of the 21 ms constraint init at 64x991-body
    # worlds). Formulas mirror world_manifold / the reference
    # (b2WorldManifold::Initialize + b2ContactSolver ctor) term for term.
    cax, cay = ca_pos[:, 0], ca_pos[:, 1]
    cbx, cby = cb_pos[:, 0], cb_pos[:, 1]
    lcax, lcay = lc_a[:, 0], lc_a[:, 1]
    lcbx, lcby = lc_b[:, 0], lc_b[:, 1]
    qas, qac = jnp.sin(aa_pos), jnp.cos(aa_pos)
    qbs, qbc = jnp.sin(ab_pos), jnp.cos(ab_pos)
    pax = cax - (qac * lcax - qas * lcay)
    pay = cay - (qas * lcax + qac * lcay)
    pbx = cbx - (qbc * lcbx - qbs * lcby)
    pby = cby - (qbs * lcbx + qbc * lcby)

    lpx = contacts.m_local_point[:, 0]
    lpy = contacts.m_local_point[:, 1]
    lnx = contacts.m_local_normal[:, 0]
    lny = contacts.m_local_normal[:, 1]
    pjx = (contacts.m_points[:, 0, 0], contacts.m_points[:, 1, 0])
    pjy = (contacts.m_points[:, 0, 1], contacts.m_points[:, 1, 1])

    # circles (b2Manifold::e_circles)
    pAx = pax + (qac * lpx - qas * lpy)
    pAy = pay + (qas * lpx + qac * lpy)
    pBx = pbx + (qbc * pjx[0] - qbs * pjy[0])
    pBy = pby + (qbs * pjx[0] + qbc * pjy[0])
    dx_, dy_ = pBx - pAx, pBy - pAy
    dd = dx_ * dx_ + dy_ * dy_
    far = dd > EPS * EPS
    ln_ = jnp.sqrt(dd)
    neps = 1.1754943508222875e-38
    safe = jnp.where(ln_ < neps, 1.0, ln_)
    ux = jnp.where(ln_ < neps, 0.0, dx_ / safe)
    uy = jnp.where(ln_ < neps, 0.0, dy_ / safe)
    ncx = jnp.where(far, ux, 1.0)
    ncy = jnp.where(far, uy, 0.0)
    caCx, caCy = pAx + ra_shape * ncx, pAy + ra_shape * ncy
    cbCx, cbCy = pBx - rb_shape * ncx, pBy - rb_shape * ncy
    ptsC = ((0.5 * (caCx + cbCx), 0.5 * (caCy + cbCy)),
            (jnp.zeros_like(pAx), jnp.zeros_like(pAx)))

    # faceA
    nax = qac * lnx - qas * lny
    nay = qas * lnx + qac * lny
    planex = pax + (qac * lpx - qas * lpy)
    planey = pay + (qas * lpx + qac * lpy)
    ptsA = []
    for j in range(2):
        clx = pbx + (qbc * pjx[j] - qbs * pjy[j])
        cly = pby + (qbs * pjx[j] + qbc * pjy[j])
        da_ = (clx - planex) * nax + (cly - planey) * nay
        caAx = clx + (ra_shape - da_) * nax
        caAy = cly + (ra_shape - da_) * nay
        cbAx = clx - rb_shape * nax
        cbAy = cly - rb_shape * nay
        ptsA.append((0.5 * (caAx + cbAx), 0.5 * (caAy + cbAy)))

    # faceB (world normal flips at selection)
    nbx = qbc * lnx - qbs * lny
    nby = qbs * lnx + qbc * lny
    planbx = pbx + (qbc * lpx - qbs * lpy)
    planby = pby + (qbs * lpx + qbc * lpy)
    ptsB = []
    for j in range(2):
        clx = pax + (qac * pjx[j] - qas * pjy[j])
        cly = pay + (qas * pjx[j] + qac * pjy[j])
        db_ = (clx - planbx) * nbx + (cly - planby) * nby
        cbBx = clx + (rb_shape - db_) * nbx
        cbBy = cly + (rb_shape - db_) * nby
        caBx = clx - ra_shape * nbx
        caBy = cly - ra_shape * nby
        ptsB.append((0.5 * (caBx + cbBx), 0.5 * (caBy + cbBy)))

    is_a = contacts.m_type == settings.MANIFOLD_FACE_A
    is_b = contacts.m_type == settings.MANIFOLD_FACE_B
    nx = jnp.where(is_a, nax, jnp.where(is_b, -nbx, ncx))
    ny = jnp.where(is_a, nay, jnp.where(is_b, -nby, ncy))
    ptx = [jnp.where(is_a, ptsA[j][0], jnp.where(is_b, ptsB[j][0],
                                                 ptsC[j][0]))
           for j in range(2)]
    pty = [jnp.where(is_a, ptsA[j][1], jnp.where(is_b, ptsB[j][1],
                                                 ptsC[j][1]))
           for j in range(2)]

    rax = [ptx[j] - cax for j in range(2)]
    ray = [pty[j] - cay for j in range(2)]
    rbx = [ptx[j] - cbx for j in range(2)]
    rby = [pty[j] - cby for j in range(2)]

    msum = m_a + m_b
    rn_a = [rax[j] * ny - ray[j] * nx for j in range(2)]
    rn_b = [rbx[j] * ny - rby[j] * nx for j in range(2)]
    k_n = [msum + i_a * rn_a[j] ** 2 + i_b * rn_b[j] ** 2 for j in range(2)]
    nmass = [jnp.where(k > 0.0, 1.0 / k, 0.0) for k in k_n]

    tx, ty = ny, -nx
    rt_a = [rax[j] * ty - ray[j] * tx for j in range(2)]
    rt_b = [rbx[j] * ty - rby[j] * tx for j in range(2)]
    k_t = [msum + i_a * rt_a[j] ** 2 + i_b * rt_b[j] ** 2 for j in range(2)]
    tmass = [jnp.where(k > 0.0, 1.0 / k, 0.0) for k in k_t]

    vax_, vay_ = va[:, 0], va[:, 1]
    vbx_, vby_ = vb[:, 0], vb[:, 1]
    vbias = []
    for j in range(2):
        dvx = vbx_ - wb * rby[j] - vax_ + wa * ray[j]
        dvy = vby_ + wb * rbx[j] - vay_ - wa * rax[j]
        v_rel = dvx * nx + dvy * ny
        vbias.append(jnp.where(v_rel < -settings.VELOCITY_THRESHOLD,
                               -restitution * v_rel, 0.0))

    # 2-point block solver setup with condition-number guard
    point_count = contacts.m_count
    k11 = k_n[0]
    k22 = k_n[1]
    k12 = msum + i_a * rn_a[0] * rn_a[1] + i_b * rn_b[0] * rn_b[1]
    det = k11 * k22 - k12 * k12
    well_conditioned = k11 * k11 < 1000.0 * det
    two = point_count == 2
    point_count = jnp.where(two & ~well_conditioned, 1, point_count)
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    nm11 = inv_det * k22
    nm12 = -inv_det * k12
    nm22 = inv_det * k11

    normal = jnp.stack([nx, ny], axis=-1)
    r_a = jnp.stack([jnp.stack([rax[0], ray[0]], axis=-1),
                     jnp.stack([rax[1], ray[1]], axis=-1)], axis=1)
    r_b = jnp.stack([jnp.stack([rbx[0], rby[0]], axis=-1),
                     jnp.stack([rbx[1], rby[1]], axis=-1)], axis=1)
    normal_mass = jnp.stack(nmass, axis=-1)
    tangent_mass = jnp.stack(tmass, axis=-1)
    velocity_bias = jnp.stack(vbias, axis=-1)

    return ContactConstraints(
        active=active,
        body_a=ba.astype(jnp.int32), body_b=bb.astype(jnp.int32),
        point_count=point_count.astype(jnp.int32),
        friction=friction, restitution=restitution,
        tangent_speed=contacts.tangent_speed,
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


def warm_start(cc: ContactConstraints, ni, ti, bst):
    """Apply accumulated impulses (b2ContactSolver::WarmStart). Order-free
    scatter-add over all active contacts.

    `bst` is the plane-major body velocity state (3, N): rows [vx, vy, w] —
    one gather/scatter per pass with bodies in the 128-wide lane axis."""
    tangent = jnp.stack([cc.normal[:, 1], -cc.normal[:, 0]], axis=-1)
    pmask = (jnp.arange(2)[None, :] < cc.point_count[:, None]) & cc.active[:, None]
    p_imp = jnp.where(pmask[..., None],
                      ni[..., None] * cc.normal[:, None, :]
                      + ti[..., None] * tangent[:, None, :], 0.0)
    p_sum = jnp.sum(p_imp, axis=1)                      # (C,2)
    ang_a = jnp.sum(jnp.where(pmask, cross_vv(cc.r_a, p_imp), 0.0), axis=1)
    ang_b = jnp.sum(jnp.where(pmask, cross_vv(cc.r_b, p_imp), 0.0), axis=1)

    da = jnp.stack([-cc.inv_mass_a * p_sum[:, 0],
                    -cc.inv_mass_a * p_sum[:, 1],
                    -cc.inv_i_a * ang_a])               # (3, C)
    db = jnp.stack([cc.inv_mass_b * p_sum[:, 0],
                    cc.inv_mass_b * p_sum[:, 1],
                    cc.inv_i_b * ang_b])
    idx2 = jnp.concatenate([cc.body_a, cc.body_b])
    return scatter_add_cols(bst, idx2, jnp.concatenate([da, db], axis=1))


def velocity_contact_math_s(fr, ts, ma, mb, ia_, ib_, nx, ny,
                            rax, ray, rbx, rby,  # ((C,),(C,)) per point j
                            nm, tm, bias, k11, k12, k22, nm11, nm12, nm22,
                            pc, ni, ti, vax, vay, wa, vbx, vby, wb, m):
    """Scalarized SolveVelocityConstraints math (b2ContactSolver.cpp:293-603).
    All args are component arrays of identical batch shape; per-point data is
    passed as 2-tuples (point 0, point 1). Pure elementwise — lowers cleanly
    both in XLA and Mosaic. Returns updated (ni, ti, vax..wb) as tuples."""
    tx, ty = ny, -nx
    ni = list(ni)
    ti = list(ti)

    # friction, point by point (reference order: j = 0 then 1)
    for j in range(2):
        has = m & (j < pc)
        dvx = vbx - wb * rby[j] - vax + wa * ray[j]
        dvy = vby + wb * rbx[j] - vay - wa * rax[j]
        vt = dvx * tx + dvy * ty - ts
        lam = tm[j] * (-vt)
        max_f = fr * ni[j]
        new_imp = jnp.clip(ti[j] + lam, -max_f, max_f)
        lam = jnp.where(has, new_imp - ti[j], 0.0)
        ti[j] = jnp.where(has, new_imp, ti[j])
        px, py = lam * tx, lam * ty
        vax -= ma * px
        vay -= ma * py
        wa -= ia_ * (rax[j] * py - ray[j] * px)
        vbx += mb * px
        vby += mb * py
        wb += ib_ * (rbx[j] * py - rby[j] * px)

    # normal: 1-point scalar path
    one_pt = m & (pc == 1)
    dvx = vbx - wb * rby[0] - vax + wa * ray[0]
    dvy = vby + wb * rbx[0] - vay - wa * rax[0]
    vn0 = dvx * nx + dvy * ny
    lam0 = -nm[0] * (vn0 - bias[0])
    new0 = jnp.maximum(ni[0] + lam0, 0.0)
    dlam0 = jnp.where(one_pt, new0 - ni[0], 0.0)
    px, py = dlam0 * nx, dlam0 * ny
    vax -= ma * px
    vay -= ma * py
    wa -= ia_ * (rax[0] * py - ray[0] * px)
    vbx += mb * px
    vby += mb * py
    wb += ib_ * (rbx[0] * py - rby[0] * px)
    ni[0] = jnp.where(one_pt, new0, ni[0])

    # normal: 2-point block LCP by total enumeration
    two_pt = m & (pc == 2)
    a1, a2 = ni[0], ni[1]
    dv1x = vbx - wb * rby[0] - vax + wa * ray[0]
    dv1y = vby + wb * rbx[0] - vay - wa * rax[0]
    dv2x = vbx - wb * rby[1] - vax + wa * ray[1]
    dv2y = vby + wb * rbx[1] - vay - wa * rax[1]
    vn1 = dv1x * nx + dv1y * ny
    vn2 = dv2x * nx + dv2y * ny
    b1 = vn1 - bias[0] - (k11 * a1 + k12 * a2)
    b2 = vn2 - bias[1] - (k12 * a1 + k22 * a2)

    x1_1 = -(nm11 * b1 + nm12 * b2)
    x2_1 = -(nm12 * b1 + nm22 * b2)
    ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
    x1_2 = -nm[0] * b1
    vn2_2 = k12 * x1_2 + b2
    ok2 = (x1_2 >= 0.0) & (vn2_2 >= 0.0)
    x2_3 = -nm[1] * b2
    vn1_3 = k12 * x2_3 + b1
    ok3 = (x2_3 >= 0.0) & (vn1_3 >= 0.0)
    ok4 = (b1 >= 0.0) & (b2 >= 0.0)

    x1 = jnp.where(ok1, x1_1, jnp.where(ok2, x1_2, jnp.where(ok3, 0.0, jnp.where(ok4, 0.0, a1))))
    x2 = jnp.where(ok1, x2_1, jnp.where(ok2, 0.0, jnp.where(ok3, x2_3, jnp.where(ok4, 0.0, a2))))
    # "no solution, give up" keeps the accumulated impulse (d = 0)

    d1 = jnp.where(two_pt, x1 - a1, 0.0)
    d2 = jnp.where(two_pt, x2 - a2, 0.0)
    p1x, p1y = d1 * nx, d1 * ny
    p2x, p2y = d2 * nx, d2 * ny
    vax -= ma * (p1x + p2x)
    vay -= ma * (p1y + p2y)
    wa -= ia_ * ((rax[0] * p1y - ray[0] * p1x) + (rax[1] * p2y - ray[1] * p2x))
    vbx += mb * (p1x + p2x)
    vby += mb * (p1y + p2y)
    wb += ib_ * ((rbx[0] * p1y - rby[0] * p1x) + (rbx[1] * p2y - rby[1] * p2x))
    ni[0] = jnp.where(two_pt, x1, ni[0])
    ni[1] = jnp.where(two_pt, x2, ni[1])
    return tuple(ni), tuple(ti), vax, vay, wa, vbx, vby, wb



# --------------------------------------------------------------------------
# color compaction: the velocity/position loops run per color; processing
# the whole contact table per color costs n_colors * C * N one-hot traffic.
# Compacting contacts into a padded (max_colors, CK) layout (CK = min(C, N):
# within a color every contact holds at least one distinct dynamic body, so
# a color can never exceed the dynamic body count) makes each pass touch CK
# lanes — the TPU analog of the reference packing islands into fixed-cost
# solve tasks (b2World.cpp:1332-1378).
# --------------------------------------------------------------------------


def pack_cc_blob(cc: ContactConstraints, ni, ti):
    """Pack the solve-relevant constraint fields + impulses into one (C, K)
    f32 blob so the color permutation is a single gather. Body slots and
    counts ride as f32 (exact for < 2^24)."""
    f32 = lambda x: x.astype(jnp.float32)[:, None]
    return jnp.concatenate([
        f32(cc.active), f32(cc.body_a), f32(cc.body_b), f32(cc.point_count),
        cc.friction[:, None], cc.tangent_speed[:, None],
        cc.inv_mass_a[:, None], cc.inv_mass_b[:, None],
        cc.inv_i_a[:, None], cc.inv_i_b[:, None],
        cc.normal, cc.r_a.reshape(-1, 4), cc.r_b.reshape(-1, 4),
        cc.normal_mass, cc.tangent_mass, cc.velocity_bias,
        cc.k11[:, None], cc.k12[:, None], cc.k22[:, None],
        cc.nm11[:, None], cc.nm12[:, None], cc.nm22[:, None],
        cc.local_points.reshape(-1, 4), cc.local_normal, cc.local_point,
        cc.radius_a[:, None], cc.radius_b[:, None],
        cc.local_center_a, cc.local_center_b, f32(cc.mtype),
        ni, ti,
    ], axis=-1)                                         # (C, 51)


CC_BLOB_K = 51


def pack_cc_blob_t(cc: ContactConstraints, ni, ti):
    """pack_cc_blob emitted PLANE-MAJOR (K, C): row k holds field k across
    all contact lanes. Same row order as pack_cc_blob's columns (the
    Pallas kernel indexes rows by these numbers). Building rows directly
    avoids the (C, K) minor-axis-padded build + swapaxes copy."""
    f = lambda x: x.astype(jnp.float32)
    rows = [f(cc.active), f(cc.body_a), f(cc.body_b), f(cc.point_count),
            cc.friction, cc.tangent_speed,
            cc.inv_mass_a, cc.inv_mass_b, cc.inv_i_a, cc.inv_i_b,
            cc.normal[:, 0], cc.normal[:, 1],
            cc.r_a[:, 0, 0], cc.r_a[:, 0, 1],
            cc.r_a[:, 1, 0], cc.r_a[:, 1, 1],
            cc.r_b[:, 0, 0], cc.r_b[:, 0, 1],
            cc.r_b[:, 1, 0], cc.r_b[:, 1, 1],
            cc.normal_mass[:, 0], cc.normal_mass[:, 1],
            cc.tangent_mass[:, 0], cc.tangent_mass[:, 1],
            cc.velocity_bias[:, 0], cc.velocity_bias[:, 1],
            cc.k11, cc.k12, cc.k22, cc.nm11, cc.nm12, cc.nm22,
            cc.local_points[:, 0, 0], cc.local_points[:, 0, 1],
            cc.local_points[:, 1, 0], cc.local_points[:, 1, 1],
            cc.local_normal[:, 0], cc.local_normal[:, 1],
            cc.local_point[:, 0], cc.local_point[:, 1],
            cc.radius_a, cc.radius_b,
            cc.local_center_a[:, 0], cc.local_center_a[:, 1],
            cc.local_center_b[:, 0], cc.local_center_b[:, 1],
            f(cc.mtype), ni[:, 0], ni[:, 1], ti[:, 0], ti[:, 1]]
    assert len(rows) == CC_BLOB_K
    return jnp.stack(rows, axis=0)                      # (51, C)


def unpack_cc_blob(blob):
    """Inverse of pack_cc_blob. Returns (cc, ni, ti)."""
    i32 = lambda x: x.astype(jnp.int32)
    cc = ContactConstraints(
        active=blob[..., 0] > 0.5,
        body_a=i32(blob[..., 1]), body_b=i32(blob[..., 2]),
        point_count=i32(blob[..., 3]),
        friction=blob[..., 4], restitution=jnp.zeros_like(blob[..., 4]),
        tangent_speed=blob[..., 5],
        inv_mass_a=blob[..., 6], inv_mass_b=blob[..., 7],
        inv_i_a=blob[..., 8], inv_i_b=blob[..., 9],
        normal=blob[..., 10:12],
        r_a=blob[..., 12:16].reshape(blob.shape[:-1] + (2, 2)),
        r_b=blob[..., 16:20].reshape(blob.shape[:-1] + (2, 2)),
        normal_mass=blob[..., 20:22], tangent_mass=blob[..., 22:24],
        velocity_bias=blob[..., 24:26],
        k11=blob[..., 26], k12=blob[..., 27], k22=blob[..., 28],
        nm11=blob[..., 29], nm12=blob[..., 30], nm22=blob[..., 31],
        local_points=blob[..., 32:36].reshape(blob.shape[:-1] + (2, 2)),
        local_normal=blob[..., 36:38], local_point=blob[..., 38:40],
        radius_a=blob[..., 40], radius_b=blob[..., 41],
        local_center_a=blob[..., 42:44], local_center_b=blob[..., 44:46],
        mtype=i32(blob[..., 46]),
    )
    return cc, blob[..., 47:49], blob[..., 49:51]


def solve_velocity_color(cc: ContactConstraints, ni, ti, bst, mask):
    """One color pass of SolveVelocityConstraints (b2ContactSolver.cpp:293-603).
    Contacts in `mask` touch disjoint dynamic bodies. `bst` = plane-major
    (3, N) body velocity state [vx; vy; w]."""
    m = mask & cc.active
    idx2 = jnp.concatenate([cc.body_a, cc.body_b])
    g = gather_cols(bst, idx2)                     # single gather (3, 2C)
    n_c = cc.body_a.shape[0]
    vax0, vay0, wa0 = g[0, :n_c], g[1, :n_c], g[2, :n_c]
    vbx0, vby0, wb0 = g[0, n_c:], g[1, n_c:], g[2, n_c:]

    nis, tis, vax, vay, wa, vbx, vby, wb = velocity_contact_math_s(
        cc.friction, cc.tangent_speed,
        cc.inv_mass_a, cc.inv_mass_b, cc.inv_i_a, cc.inv_i_b,
        cc.normal[..., 0], cc.normal[..., 1],
        (cc.r_a[..., 0, 0], cc.r_a[..., 1, 0]),
        (cc.r_a[..., 0, 1], cc.r_a[..., 1, 1]),
        (cc.r_b[..., 0, 0], cc.r_b[..., 1, 0]),
        (cc.r_b[..., 0, 1], cc.r_b[..., 1, 1]),
        (cc.normal_mass[..., 0], cc.normal_mass[..., 1]),
        (cc.tangent_mass[..., 0], cc.tangent_mass[..., 1]),
        (cc.velocity_bias[..., 0], cc.velocity_bias[..., 1]),
        cc.k11, cc.k12, cc.k22, cc.nm11, cc.nm12, cc.nm22,
        cc.point_count,
        (ni[..., 0], ni[..., 1]), (ti[..., 0], ti[..., 1]),
        vax0, vay0, wa0, vbx0, vby0, wb0, m)

    # single packed scatter of velocity deltas (disjoint within a color)
    zero = jnp.float32(0.0)
    delta = jnp.stack([
        jnp.concatenate([jnp.where(m, vax - vax0, zero),
                         jnp.where(m, vbx - vbx0, zero)]),
        jnp.concatenate([jnp.where(m, vay - vay0, zero),
                         jnp.where(m, vby - vby0, zero)]),
        jnp.concatenate([jnp.where(m, wa - wa0, zero),
                         jnp.where(m, wb - wb0, zero)])])
    bst = scatter_add_cols(bst, idx2, delta)
    return (jnp.stack(nis, axis=-1), jnp.stack(tis, axis=-1), bst)


def _psm_s(mtype, lpx, lpy, lnx, lny, mpx, mpy,
           pax, pay, qas, qac, ra, pbx, pby, qbs, qbc, rb, j: int):
    """Scalarized b2PositionSolverManifold::Initialize
    (b2ContactSolver.cpp:620-672). mpx/mpy are 2-tuples of manifold point
    components; j is the static point index."""
    # circles
    pAx = qac * lpx - qas * lpy + pax
    pAy = qas * lpx + qac * lpy + pay
    pBx = qbc * mpx[0] - qbs * mpy[0] + pbx
    pBy = qbs * mpx[0] + qbc * mpy[0] + pby
    dx, dy = pBx - pAx, pBy - pAy
    dist = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(dist > 0.0, dist, 1.0)
    ncx = jnp.where(dist > 0.0, dx / safe, 0.0)
    ncy = jnp.where(dist > 0.0, dy / safe, 0.0)
    ptcx, ptcy = 0.5 * (pAx + pBx), 0.5 * (pAy + pBy)
    sep_c = dx * ncx + dy * ncy - ra - rb

    jj = min(j, 1)
    clx, cly = mpx[jj], mpy[jj]
    # faceA
    nax = qac * lnx - qas * lny
    nay = qas * lnx + qac * lny
    cax = qbc * clx - qbs * cly + pbx
    cay = qbs * clx + qbc * cly + pby
    sep_a = (cax - pAx) * nax + (cay - pAy) * nay - ra - rb
    # faceB
    nbx = qbc * lnx - qbs * lny
    nby = qbs * lnx + qbc * lny
    planeBx = qbc * lpx - qbs * lpy + pbx
    planeBy = qbs * lpx + qbc * lpy + pby
    cbx = qac * clx - qas * cly + pax
    cby = qas * clx + qac * cly + pay
    sep_b = (cbx - planeBx) * nbx + (cby - planeBy) * nby - ra - rb

    is_a = mtype == settings.MANIFOLD_FACE_A
    is_b = mtype == settings.MANIFOLD_FACE_B
    nx = jnp.where(is_a, nax, jnp.where(is_b, -nbx, ncx))
    ny = jnp.where(is_a, nay, jnp.where(is_b, -nby, ncy))
    px = jnp.where(is_a, cax, jnp.where(is_b, cbx, ptcx))
    py = jnp.where(is_a, cay, jnp.where(is_b, cby, ptcy))
    sep = jnp.where(is_a, sep_a, jnp.where(is_b, sep_b, sep_c))
    return nx, ny, px, py, sep


def position_contact_math_s(mtype, pc, ma, mb, ia_, ib_, ra, rb,
                            lcax, lcay, lcbx, lcby, lpx, lpy, lnx, lny,
                            mpx, mpy, cax, cay, aa, cbx, cby, ab, m,
                            baumgarte, max_correction):
    """Scalarized NGS position pass (both manifold points)."""
    min_sep = jnp.zeros_like(aa)
    for j in range(2):
        has = m & (j < pc)
        qas, qac = jnp.sin(aa), jnp.cos(aa)
        qbs, qbc = jnp.sin(ab), jnp.cos(ab)
        pax = cax - (qac * lcax - qas * lcay)
        pay = cay - (qas * lcax + qac * lcay)
        pbx = cbx - (qbc * lcbx - qbs * lcby)
        pby = cby - (qbs * lcbx + qbc * lcby)
        nx, ny, px, py, sep = _psm_s(
            mtype, lpx, lpy, lnx, lny, mpx, mpy,
            pax, pay, qas, qac, ra, pbx, pby, qbs, qbc, rb, j)
        r_ax, r_ay = px - cax, py - cay
        r_bx, r_by = px - cbx, py - cby
        min_sep = jnp.where(has, jnp.minimum(min_sep, sep), min_sep)
        corr = jnp.clip(baumgarte * (sep + settings.LINEAR_SLOP),
                        -max_correction, 0.0)
        rn_a = r_ax * ny - r_ay * nx
        rn_b = r_bx * ny - r_by * nx
        k = ma + mb + ia_ * rn_a * rn_a + ib_ * rn_b * rn_b
        impulse = jnp.where(has & (k > 0.0), -corr / jnp.where(k > 0.0, k, 1.0), 0.0)
        ix, iy = impulse * nx, impulse * ny
        cax -= ma * ix
        cay -= ma * iy
        aa -= ia_ * (r_ax * iy - r_ay * ix)
        cbx += mb * ix
        cby += mb * iy
        ab += ib_ * (r_bx * iy - r_by * ix)
    return cax, cay, aa, cbx, cby, ab, min_sep



def solve_position_color(cc: ContactConstraints, pst, mask, baumgarte,
                         max_correction):
    """One color pass of SolvePositionConstraints (b2ContactSolver.cpp:676-752).
    `pst` = plane-major (3, N) position state [cx; cy; a]. mask=None means
    the lanes are already a compacted color chunk (gate on active only).
    Returns (pst, min_separation_per_contact)."""
    m = cc.active if mask is None else (mask & cc.active)
    idx2 = jnp.concatenate([cc.body_a, cc.body_b])
    g = gather_cols(pst, idx2)
    n_c = cc.body_a.shape[0]
    cax0, cay0, aa0 = g[0, :n_c], g[1, :n_c], g[2, :n_c]
    cbx0, cby0, ab0 = g[0, n_c:], g[1, n_c:], g[2, n_c:]

    cax, cay, aa, cbx, cby, ab, min_sep = position_contact_math_s(
        cc.mtype, cc.point_count,
        cc.inv_mass_a, cc.inv_mass_b, cc.inv_i_a, cc.inv_i_b,
        cc.radius_a, cc.radius_b,
        cc.local_center_a[..., 0], cc.local_center_a[..., 1],
        cc.local_center_b[..., 0], cc.local_center_b[..., 1],
        cc.local_point[..., 0], cc.local_point[..., 1],
        cc.local_normal[..., 0], cc.local_normal[..., 1],
        (cc.local_points[..., 0, 0], cc.local_points[..., 1, 0]),
        (cc.local_points[..., 0, 1], cc.local_points[..., 1, 1]),
        cax0, cay0, aa0, cbx0, cby0, ab0, m,
        baumgarte, max_correction)

    zero = jnp.float32(0.0)
    delta = jnp.stack([
        jnp.concatenate([jnp.where(m, cax - cax0, zero),
                         jnp.where(m, cbx - cbx0, zero)]),
        jnp.concatenate([jnp.where(m, cay - cay0, zero),
                         jnp.where(m, cby - cby0, zero)]),
        jnp.concatenate([jnp.where(m, aa - aa0, zero),
                         jnp.where(m, ab - ab0, zero)])])
    pst = scatter_add_cols(pst, idx2, delta)
    return pst, jnp.where(m, min_sep, 0.0)
