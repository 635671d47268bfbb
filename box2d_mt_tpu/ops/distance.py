"""GJK distance + conservative-advancement time of impact.

Branch-free re-implementations of the reference's b2Distance
(Box2D/Collision/b2Distance.cpp:452-606) and b2TimeOfImpact
(b2TimeOfImpact.cpp:256-497): every early return becomes a `done` flag
carried through fixed-bound loops, so the functions vmap over contact
tables and lower to straight-line TPU code.

Proxies are (verts (8,2), count, radius) triples — the same rows the
narrow phase uses (b2DistanceProxy, b2Distance.h:29-58).
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import dot, normalize, rot_t_vec, rot_vec, sweep_get_transform

EPS = 1.1920929e-7
_I8 = np.arange(settings.MAX_POLYGON_VERTICES)

# TOI output states (b2TimeOfImpact.h b2TOIOutput::State)
TOI_UNKNOWN = 0
TOI_FAILED = 1
TOI_OVERLAPPED = 2
TOI_TOUCHING = 3
TOI_SEPARATED = 4


def _support(verts, count, d):
    """b2DistanceProxy::GetSupport: index of vertex most along d."""
    dots = dot(verts, d[None, :])
    dots = jnp.where(_I8 < count, dots, -3.4e38)
    return jnp.argmax(dots).astype(jnp.int32)


class _Simplex(NamedTuple):
    wa: jax.Array   # (3,2) support points on A (world)
    wb: jax.Array   # (3,2)
    ia: jax.Array   # (3,) i32
    ib: jax.Array   # (3,)
    bary: jax.Array  # (3,)
    count: jax.Array  # ()


def _solve2(s: _Simplex) -> _Simplex:
    """b2Simplex::Solve2 (b2Distance.cpp:304-341)."""
    w1 = s.wb[0] - s.wa[0]
    w2 = s.wb[1] - s.wa[1]
    e12 = w2 - w1
    d12_2 = -dot(w1, e12)
    d12_1 = dot(w2, e12)
    # region w1 | region w2 | edge
    in_w1 = d12_2 <= 0.0
    in_w2 = ~in_w1 & (d12_1 <= 0.0)
    inv = 1.0 / jnp.where(d12_1 + d12_2 != 0.0, d12_1 + d12_2, 1.0)
    # select slot contents: w2-case moves slot1 -> slot0
    pick1 = in_w2
    wa0 = jnp.where(pick1, s.wa[1], s.wa[0])
    wb0 = jnp.where(pick1, s.wb[1], s.wb[0])
    ia0 = jnp.where(pick1, s.ia[1], s.ia[0])
    ib0 = jnp.where(pick1, s.ib[1], s.ib[0])
    bary0 = jnp.where(in_w1 | in_w2, 1.0, d12_1 * inv)
    bary1 = jnp.where(in_w1 | in_w2, 0.0, d12_2 * inv)
    count = jnp.where(in_w1 | in_w2, 1, 2)
    return _Simplex(
        wa=s.wa.at[0].set(wa0), wb=s.wb.at[0].set(wb0),
        ia=s.ia.at[0].set(ia0), ib=s.ib.at[0].set(ib0),
        bary=jnp.stack([bary0, bary1, s.bary[2]]),
        count=count.astype(jnp.int32))


def _solve3(s: _Simplex) -> _Simplex:
    """b2Simplex::Solve3 (b2Distance.cpp:343-450): 7-region case select."""
    w1 = s.wb[0] - s.wa[0]
    w2 = s.wb[1] - s.wa[1]
    w3 = s.wb[2] - s.wa[2]
    e12 = w2 - w1
    d12_1 = dot(w2, e12)
    d12_2 = -dot(w1, e12)
    e13 = w3 - w1
    d13_1 = dot(w3, e13)
    d13_2 = -dot(w1, e13)
    e23 = w3 - w2
    d23_1 = dot(w3, e23)
    d23_2 = -dot(w2, e23)
    n123 = e12[0] * e13[1] - e12[1] * e13[0]
    d123_1 = n123 * (w2[0] * w3[1] - w2[1] * w3[0])
    d123_2 = n123 * (w3[0] * w1[1] - w3[1] * w1[0])
    d123_3 = n123 * (w1[0] * w2[1] - w1[1] * w2[0])

    c_w1 = (d12_2 <= 0.0) & (d13_2 <= 0.0)
    c_e12 = (d12_1 > 0.0) & (d12_2 > 0.0) & (d123_3 <= 0.0)
    c_e13 = (d13_1 > 0.0) & (d13_2 > 0.0) & (d123_2 <= 0.0)
    c_w2 = (d12_1 <= 0.0) & (d23_2 <= 0.0)
    c_w3 = (d13_1 <= 0.0) & (d23_1 <= 0.0)
    c_e23 = (d23_1 > 0.0) & (d23_2 > 0.0) & (d123_1 <= 0.0)
    # first-match priority (the reference's if-chain order)
    m_w1 = c_w1
    m_e12 = ~m_w1 & c_e12
    m_e13 = ~m_w1 & ~m_e12 & c_e13
    m_w2 = ~m_w1 & ~m_e12 & ~m_e13 & c_w2
    m_w3 = ~m_w1 & ~m_e12 & ~m_e13 & ~m_w2 & c_w3
    m_e23 = ~m_w1 & ~m_e12 & ~m_e13 & ~m_w2 & ~m_w3 & c_e23
    m_tri = ~(m_w1 | m_e12 | m_e13 | m_w2 | m_w3 | m_e23)

    # slot sources for (slot0, slot1): per case
    # w1: (0,-) e12: (0,1) e13: (0,2) w2: (1,-) w3: (2,-) e23: (1,2) tri: (0,1,2)
    src0 = jnp.where(m_w2, 1, jnp.where(m_w3, 2, jnp.where(m_e23, 1, 0)))
    src1 = jnp.where(m_e13 | m_e23, 2, 1)

    inv12 = 1.0 / jnp.where(d12_1 + d12_2 != 0.0, d12_1 + d12_2, 1.0)
    inv13 = 1.0 / jnp.where(d13_1 + d13_2 != 0.0, d13_1 + d13_2, 1.0)
    inv23 = 1.0 / jnp.where(d23_1 + d23_2 != 0.0, d23_1 + d23_2, 1.0)
    s123 = d123_1 + d123_2 + d123_3
    inv123 = 1.0 / jnp.where(s123 != 0.0, s123, 1.0)

    bary0 = jnp.where(m_w1 | m_w2 | m_w3, 1.0,
                      jnp.where(m_e12, d12_1 * inv12,
                                jnp.where(m_e13, d13_1 * inv13,
                                          jnp.where(m_e23, d23_1 * inv23,
                                                    d123_1 * inv123))))
    bary1 = jnp.where(m_e12, d12_2 * inv12,
                      jnp.where(m_e13, d13_2 * inv13,
                                jnp.where(m_e23, d23_2 * inv23,
                                          jnp.where(m_tri, d123_2 * inv123, 0.0))))
    bary2 = jnp.where(m_tri, d123_3 * inv123, 0.0)
    count = jnp.where(m_w1 | m_w2 | m_w3, 1,
                      jnp.where(m_tri, 3, 2)).astype(jnp.int32)

    def pick(arr, src):
        return jnp.where(src == 0, arr[0], jnp.where(src == 1, arr[1], arr[2]))

    return _Simplex(
        wa=jnp.stack([pick(s.wa, src0), pick(s.wa, src1), s.wa[2]]),
        wb=jnp.stack([pick(s.wb, src0), pick(s.wb, src1), s.wb[2]]),
        ia=jnp.stack([pick(s.ia, src0), pick(s.ia, src1), s.ia[2]]),
        ib=jnp.stack([pick(s.ib, src0), pick(s.ib, src1), s.ib[2]]),
        bary=jnp.stack([bary0, bary1, bary2]),
        count=count)


def gjk_distance(verts_a, count_a, radius_a, pa, qa,
                 verts_b, count_b, radius_b, pb, qb,
                 use_radii: bool = False,
                 cache_ia=None, cache_ib=None, cache_count=None):
    """b2Distance for one pair. Returns (point_a, point_b, distance,
    cache_ia (3,), cache_ib (3,), cache_count) — the cache seeds the TOI
    separation function exactly like b2SimplexCache.

    Passing a previous call's cache warm-starts the simplex
    (b2Simplex::ReadCache): on nearly-unchanged transforms GJK then
    terminates in one or two iterations — this is what keeps the TOI
    advancement loop's serial depth down."""
    if cache_ia is not None:
        cia = jnp.clip(cache_ia, 0)
        cib = jnp.clip(cache_ib, 0)
        was = jax.vmap(lambda i: rot_vec(qa, verts_a[i]) + pa)(cia)
        wbs = jax.vmap(lambda i: rot_vec(qb, verts_b[i]) + pb)(cib)
        cnt = jnp.clip(cache_count, 1, 3)
        # degenerate 3-simplex guard (the metric check analog,
        # b2Distance.cpp ReadCache): a near-zero-area cached triangle
        # would break Solve3's region tests — restart from one vertex
        w = wbs - was
        area = ((w[1, 0] - w[0, 0]) * (w[2, 1] - w[0, 1])
                - (w[1, 1] - w[0, 1]) * (w[2, 0] - w[0, 0]))
        cnt = jnp.where((cnt == 3) & (jnp.abs(area) < EPS), 1, cnt)
        simplex = _Simplex(
            wa=was, wb=wbs, ia=cia, ib=cib,
            bary=jnp.array([1.0, 0.0, 0.0], jnp.float32), count=cnt)
    else:
        wa0 = rot_vec(qa, verts_a[0]) + pa
        wb0 = rot_vec(qb, verts_b[0]) + pb
        simplex = _Simplex(
            wa=jnp.stack([wa0, wa0, wa0]), wb=jnp.stack([wb0, wb0, wb0]),
            ia=jnp.zeros(3, jnp.int32), ib=jnp.zeros(3, jnp.int32),
            bary=jnp.array([1.0, 0.0, 0.0], jnp.float32),
            count=jnp.int32(1))

    def body(_, carry):
        s, done = carry
        # save the pre-solve vertex set: the duplicate-support termination
        # below must compare against it (b2Distance.cpp saveA/saveB) — the
        # reduced simplex forgets vertices, and near-degenerate segment
        # configurations then cycle grow/reduce until the iteration cap
        # and masquerade as a 3-simplex overlap
        ia_save, ib_save, count_save = s.ia, s.ib, s.count
        s = jax.lax.cond(s.count == 2, _solve2,
                         lambda x: jax.lax.cond(x.count == 3, _solve3,
                                                lambda y: y, x), s)
        done = done | (s.count == 3)

        # search direction (b2Simplex::GetSearchDirection)
        w1 = s.wb[0] - s.wa[0]
        w2 = s.wb[1] - s.wa[1]
        e12 = w2 - w1
        sgn = e12[0] * (-w1[1]) - e12[1] * (-w1[0])
        d2 = jnp.where(sgn > 0.0,
                       jnp.stack([-e12[1], e12[0]]),
                       jnp.stack([e12[1], -e12[0]]))
        d = jnp.where(s.count == 1, -w1, d2)
        done = done | (dot(d, d) < EPS * EPS)

        ia_new = _support(verts_a, count_a, rot_t_vec(qa, -d))
        ib_new = _support(verts_b, count_b, rot_t_vec(qb, d))
        dup = jnp.any((jnp.arange(3) < count_save)
                      & (ia_save == ia_new) & (ib_save == ib_new))
        done = done | dup

        wa_new = rot_vec(qa, verts_a[ia_new]) + pa
        wb_new = rot_vec(qb, verts_b[ib_new]) + pb
        idx = jnp.clip(s.count, 0, 2)
        grow = ~done
        s = _Simplex(
            wa=jnp.where(grow, s.wa.at[idx].set(wa_new), s.wa),
            wb=jnp.where(grow, s.wb.at[idx].set(wb_new), s.wb),
            ia=jnp.where(grow, s.ia.at[idx].set(ia_new), s.ia),
            ib=jnp.where(grow, s.ib.at[idx].set(ib_new), s.ib),
            bary=s.bary,
            count=jnp.where(grow, s.count + 1, s.count))
        return s, done

    # guard: when already done, the solve2/solve3 must not rerun; reference
    # exits the loop. We emulate by freezing the simplex once done.
    def guarded(i, carry):
        s, done = carry
        s2, done2 = body(i, (s, done))
        s = jax.tree.map(lambda a, b: jnp.where(done, a, b), s, s2)
        return s, jnp.where(done, done, done2)

    def gjk_cond(carry):
        k, (_, done) = carry
        return (k < 20) & ~done

    def gjk_body(carry):
        k, c = carry
        return k + 1, guarded(k, c)

    _, (simplex, _) = jax.lax.while_loop(
        gjk_cond, gjk_body, (jnp.int32(0), (simplex, jnp.bool_(False))))

    valid = (jnp.arange(3) < simplex.count)[:, None]
    bw = jnp.where(valid, simplex.bary[:, None], 0.0)
    point_a = jnp.sum(bw * simplex.wa, axis=0)
    point_b = jnp.sum(bw * simplex.wb, axis=0)
    point_b = jnp.where(simplex.count == 3, point_a, point_b)
    dist = jnp.sqrt(dot(point_b - point_a, point_b - point_a))

    if use_radii:
        r_sum = radius_a + radius_b
        separated = (dist > r_sum) & (dist > EPS)
        n, _ = normalize(point_b - point_a)
        pa_adj = jnp.where(separated, point_a + radius_a * n,
                           0.5 * (point_a + point_b))
        pb_adj = jnp.where(separated, point_b - radius_b * n,
                           0.5 * (point_a + point_b))
        dist = jnp.where(separated, dist - r_sum, 0.0)
        point_a, point_b = pa_adj, pb_adj

    return point_a, point_b, dist, simplex.ia, simplex.ib, simplex.count


def shape_cast(verts_a, count_a, radius_a, pa, qa,
               verts_b, count_b, radius_b, pb, qb, translation_b):
    """b2ShapeCast (b2Distance.cpp:608-745): conservative-advancement cast
    of proxy B translating by `translation_b` against stationary proxy A.

    Returns (hit, point, normal, lambda_, iterations). Branch-free: the
    reference's early returns (miss, lambda > 1, simplex overlap) become a
    `fail`/`done` pair carried through a bounded while loop.
    """
    ra = jnp.maximum(radius_a, settings.POLYGON_RADIUS)
    rb = jnp.maximum(radius_b, settings.POLYGON_RADIUS)
    radius = ra + rb
    r = translation_b

    ia0 = _support(verts_a, count_a, rot_t_vec(qa, -r))
    wa0 = rot_vec(qa, verts_a[ia0]) + pa
    ib0 = _support(verts_b, count_b, rot_t_vec(qb, r))
    wb0 = rot_vec(qb, verts_b[ib0]) + pb
    v0 = wa0 - wb0

    sigma = jnp.maximum(settings.POLYGON_RADIUS,
                        radius - settings.POLYGON_RADIUS)
    tol = 0.5 * settings.LINEAR_SLOP

    z2 = jnp.zeros(2, jnp.float32)
    simplex0 = _Simplex(
        wa=jnp.stack([z2, z2, z2]), wb=jnp.stack([z2, z2, z2]),
        ia=jnp.zeros(3, jnp.int32), ib=jnp.zeros(3, jnp.int32),
        bary=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        count=jnp.int32(0))

    def cond(carry):
        k, s, v, n, lam, fail, done = carry
        return (k < 20) & ~fail & ~done \
            & (jnp.abs(jnp.sqrt(dot(v, v)) - sigma) > tol)

    def body(carry):
        k, s, v, n, lam, fail, done = carry
        # support in -v (A) / v (B)
        ia = _support(verts_a, count_a, rot_t_vec(qa, -v))
        wa = rot_vec(qa, verts_a[ia]) + pa
        ib = _support(verts_b, count_b, rot_t_vec(qb, v))
        wb = rot_vec(qb, verts_b[ib]) + pb
        p = wa - wb

        vu, _ = normalize(v)
        vp = dot(vu, p)
        vr = dot(vu, r)
        advance = vp - sigma > lam * vr
        lam_new = (vp - sigma) / jnp.where(vr != 0.0, vr, 1.0)
        fail = fail | (advance & ((vr <= 0.0) | (lam_new > 1.0)))
        lam = jnp.where(advance & ~fail, lam_new, lam)
        n = jnp.where(advance & ~fail, -vu, n)
        cnt = jnp.where(advance, 0, s.count)

        # reversed simplex vertex: works with B - A, B shifted by lam * r
        idx = jnp.clip(cnt, 0, 2)
        s = _Simplex(
            wa=s.wa.at[idx].set(wb + lam * r),
            wb=s.wb.at[idx].set(wa),
            ia=s.ia.at[idx].set(ib), ib=s.ib.at[idx].set(ia),
            bary=s.bary, count=cnt + 1)
        s = jax.lax.cond(s.count == 2, _solve2,
                         lambda x: jax.lax.cond(x.count == 3, _solve3,
                                                lambda y: y, x), s)
        fail = fail | (s.count == 3)    # overlap

        # v = GetClosestPoint on the reversed simplex
        valid = (jnp.arange(3) < s.count)[:, None]
        bw = jnp.where(valid, s.bary[:, None], 0.0)
        v = jnp.sum(bw * (s.wb - s.wa), axis=0)
        return k + 1, s, v, n, lam, fail, done

    k, simplex, v, n, lam, fail, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), simplex0, v0, z2, jnp.float32(0.0),
                     jnp.bool_(False), jnp.bool_(False)))

    # witness point on A = sum(bary * wb_slot) (slots are reversed)
    valid = (jnp.arange(3) < jnp.maximum(simplex.count, 1))[:, None]
    bw = jnp.where(valid, simplex.bary[:, None], 0.0)
    point_a = jnp.sum(bw * simplex.wb, axis=0)
    point_a = jnp.where(simplex.count == 0, wa0, point_a)
    has_v = dot(v, v) > 0.0
    n = jnp.where(has_v, -normalize(v)[0], n)
    point = point_a + ra * n
    return ~fail, point, n, lam, k


def test_overlap(verts_a, count_a, radius_a, pa, qa,
                 verts_b, count_b, radius_b, pb, qb):
    """b2TestOverlap (b2Collision.cpp:233-252): GJK distance with radii
    < 10 * b2_epsilon — the sensor-touch test (b2Contact.cpp:199-205)."""
    _, _, d, _, _, _ = gjk_distance(verts_a, count_a, radius_a, pa, qa,
                                    verts_b, count_b, radius_b, pb, qb,
                                    use_radii=True)
    return d < 10.0 * EPS


# --------------------------------------------------------------------------
# time of impact
# --------------------------------------------------------------------------


class _SepFn(NamedTuple):
    """b2SeparationFunction (b2TimeOfImpact.cpp:35-252)."""
    ftype: jax.Array       # () i32: 0 points / 1 faceA / 2 faceB
    axis: jax.Array        # (2,)
    local_point: jax.Array  # (2,)


def _sweep_xf(lc, c0, c, a0, a, alpha0, t):
    """b2Sweep::GetTransform with alpha0 (b2Math.h:645-656)."""
    beta = (t - alpha0) / jnp.where(alpha0 < 1.0, 1.0 - alpha0, 1.0)
    return sweep_get_transform(lc, c0, c, a0, a, beta)


def _sep_initialize(cache_ia, cache_ib, cache_count,
                    verts_a, verts_b, xfa, xfb) -> _SepFn:
    pa, qa = xfa
    pb, qb = xfb
    one = cache_count == 1
    face_b = ~one & (cache_ia[0] == cache_ia[1])

    # points
    lpa0 = verts_a[cache_ia[0]]
    lpb0 = verts_b[cache_ib[0]]
    axis_pts, _ = normalize((rot_vec(qb, lpb0) + pb) - (rot_vec(qa, lpa0) + pa))

    # faceB: two points on B
    lpb1 = verts_b[cache_ib[0]]
    lpb2 = verts_b[cache_ib[1]]
    e_b = lpb2 - lpb1
    ax_b, _ = normalize(jnp.stack([e_b[1], -e_b[0]]))
    lp_b = 0.5 * (lpb1 + lpb2)
    s_b = dot((rot_vec(qa, verts_a[cache_ia[0]]) + pa)
              - (rot_vec(qb, lp_b) + pb), rot_vec(qb, ax_b))
    ax_b = jnp.where(s_b < 0.0, -ax_b, ax_b)

    # faceA: two points on A
    lpa1 = verts_a[cache_ia[0]]
    lpa2 = verts_a[cache_ia[1]]
    e_a = lpa2 - lpa1
    ax_a, _ = normalize(jnp.stack([e_a[1], -e_a[0]]))
    lp_a = 0.5 * (lpa1 + lpa2)
    s_a = dot((rot_vec(qb, verts_b[cache_ib[0]]) + pb)
              - (rot_vec(qa, lp_a) + pa), rot_vec(qa, ax_a))
    ax_a = jnp.where(s_a < 0.0, -ax_a, ax_a)

    ftype = jnp.where(one, 0, jnp.where(face_b, 2, 1)).astype(jnp.int32)
    axis = jnp.where(one, axis_pts, jnp.where(face_b, ax_b, ax_a))
    local_point = jnp.where(one, jnp.zeros(2),
                            jnp.where(face_b, lp_b, lp_a))
    return _SepFn(ftype=ftype, axis=axis, local_point=local_point)


def _sep_min(fn: _SepFn, verts_a, count_a, verts_b, count_b, xfa, xfb):
    """FindMinSeparation: support indices + separation at given transforms."""
    pa, qa = xfa
    pb, qb = xfb
    # points
    ia_p = _support(verts_a, count_a, rot_t_vec(qa, fn.axis))
    ib_p = _support(verts_b, count_b, rot_t_vec(qb, -fn.axis))
    # faceA
    n_a = rot_vec(qa, fn.axis)
    ib_a = _support(verts_b, count_b, rot_t_vec(qb, -n_a))
    # faceB
    n_b = rot_vec(qb, fn.axis)
    ia_b = _support(verts_a, count_a, rot_t_vec(qa, -n_b))

    ia = jnp.where(fn.ftype == 0, ia_p, jnp.where(fn.ftype == 1, -1, ia_b))
    ib = jnp.where(fn.ftype == 0, ib_p, jnp.where(fn.ftype == 1, ib_a, -1))
    sep = _sep_eval(fn, verts_a, verts_b, ia, ib, xfa, xfb)
    return ia, ib, sep


def _sep_eval(fn: _SepFn, verts_a, verts_b, ia, ib, xfa, xfb):
    """Evaluate separation of witness pair (ia, ib) at the transforms."""
    pa, qa = xfa
    pb, qb = xfb
    wa = rot_vec(qa, verts_a[jnp.clip(ia, 0)]) + pa
    wb = rot_vec(qb, verts_b[jnp.clip(ib, 0)]) + pb
    # points
    s_pts = dot(wb - wa, fn.axis)
    # faceA
    n_a = rot_vec(qa, fn.axis)
    p_a = rot_vec(qa, fn.local_point) + pa
    s_fa = dot(wb - p_a, n_a)
    # faceB
    n_b = rot_vec(qb, fn.axis)
    p_b = rot_vec(qb, fn.local_point) + pb
    s_fb = dot(wa - p_b, n_b)
    return jnp.where(fn.ftype == 0, s_pts,
                     jnp.where(fn.ftype == 1, s_fa, s_fb))


def time_of_impact(verts_a, count_a, radius_a, lc_a, c0_a, c_a, a0_a, a_a,
                   verts_b, count_b, radius_b, lc_b, c0_b, c_b, a0_b, a_b,
                   t_max, active=True):
    """b2TimeOfImpact (conservative advancement, b2TimeOfImpact.cpp:256-497)
    for one pair with normalized sweeps starting at alpha0 = 0.
    Returns (state, t)."""
    total_radius = radius_a + radius_b
    target = jnp.maximum(settings.LINEAR_SLOP,
                         total_radius - 3.0 * settings.LINEAR_SLOP)
    tolerance = 0.25 * settings.LINEAR_SLOP
    zeros = jnp.float32(0.0)

    def xf_at(t):
        xfa = sweep_get_transform(lc_a, c0_a, c_a, a0_a, a_a, t)
        xfb = sweep_get_transform(lc_b, c0_b, c_b, a0_b, a_b, t)
        return xfa, xfb

    def outer(_, carry):
        t1, state, t_out, done, cache = carry
        xfa, xfb = xf_at(t1)
        _, _, dist, cia, cib, ccount = gjk_distance(
            verts_a, count_a, radius_a, xfa[0], xfa[1],
            verts_b, count_b, radius_b, xfb[0], xfb[1],
            cache_ia=cache[0], cache_ib=cache[1], cache_count=cache[2])

        overlapped = dist <= 0.0
        touching = ~overlapped & (dist < target + tolerance)
        state = jnp.where(done, state,
                          jnp.where(overlapped, TOI_OVERLAPPED,
                                    jnp.where(touching, TOI_TOUCHING, state)))
        t_out = jnp.where(done, t_out,
                          jnp.where(overlapped, 0.0,
                                    jnp.where(touching, t1, t_out)))
        done = done | overlapped | touching

        fn = _sep_initialize(cia, cib, ccount, verts_a, verts_b, xfa, xfb)

        # push-back loop over deepest points (bounded by 8 vertices)
        def push(_, pcarry):
            t1, t2, state, t_out, pdone, odone = pcarry
            xfa2, xfb2 = xf_at(t2)
            wia, wib, s2 = _sep_min(fn, verts_a, count_a, verts_b, count_b,
                                    xfa2, xfb2)
            separated = s2 > target + tolerance
            state = jnp.where(pdone, state,
                              jnp.where(separated, TOI_SEPARATED, state))
            t_out = jnp.where(pdone, t_out,
                              jnp.where(separated, t_max, t_out))
            odone_new = separated
            advance = ~separated & (s2 > target - tolerance)
            t1 = jnp.where(pdone | separated | advance, t1, t1)
            pdone2 = pdone | separated | advance
            t1_next = jnp.where(~pdone & advance, t2, t1)

            xfa1, xfb1 = xf_at(t1)
            s1 = _sep_eval(fn, verts_a, verts_b, wia, wib, xfa1, xfb1)
            failed = ~pdone2 & (s1 < target - tolerance)
            state = jnp.where(failed, TOI_FAILED, state)
            t_out = jnp.where(failed, t1, t_out)
            touch1 = ~pdone2 & ~failed & (s1 <= target + tolerance)
            state = jnp.where(touch1, TOI_TOUCHING, state)
            t_out = jnp.where(touch1, t1, t_out)
            odone_new = odone_new | failed | touch1
            pdone2 = pdone2 | failed | touch1

            # hybrid secant/bisection root find (b2TimeOfImpact.cpp:410-458)
            def root(k, rcarry):
                a1, a2, s1r, s2r, t_root, rdone = rcarry
                t_sec = a1 + (target - s1r) * (a2 - a1) / \
                    jnp.where(s2r != s1r, s2r - s1r, 1.0)
                t_bis = 0.5 * (a1 + a2)
                t = jnp.where(k % 2 == 1, t_sec, t_bis)
                xfa3, xfb3 = xf_at(t)
                sr = _sep_eval(fn, verts_a, verts_b, wia, wib, xfa3, xfb3)
                hit = jnp.abs(sr - target) < tolerance
                t_root = jnp.where(rdone, t_root, jnp.where(hit, t, t_root))
                rdone = rdone | hit
                upd_lo = ~rdone & (sr > target)
                a1 = jnp.where(upd_lo, t, a1)
                s1r = jnp.where(upd_lo, sr, s1r)
                a2 = jnp.where(~rdone & ~upd_lo, t, a2)
                s2r = jnp.where(~rdone & ~upd_lo, sr, s2r)
                return a1, a2, s1r, s2r, t_root, rdone

            def root_cond(rcarry):
                k, (_, _, _, _, _, rdone) = rcarry
                # hybrid secant/bisection converges in <= ~10 ticks at
                # slop/4 tolerance; the reference's 50 cap never binds.
                # Under vmap every lane pays the batch-max trip count, so
                # the cap IS the worst-case cost - keep it tight.
                return (k < 12) & ~rdone

            def root_body(rcarry):
                k, rc = rcarry
                return k + 1, root(k, rc)

            _, (_, _, _, _, t_root, rdone) = jax.lax.while_loop(
                root_cond, root_body,
                (jnp.int32(0), (t1, t2, s1, s2, t2, jnp.bool_(False))))
            t2 = jnp.where(pdone2, t2, t_root)
            return t1_next, t2, state, t_out, pdone2, odone | odone_new

        def push_cond(pcarry):
            k, (_, _, _, _, pdone, _) = pcarry
            return (k < settings.MAX_POLYGON_VERTICES) & ~pdone

        def push_body(pcarry):
            k, pc = pcarry
            return k + 1, push(k, pc)

        _, (t1n, _, state, t_out, _, done2) = jax.lax.while_loop(
            push_cond, push_body,
            (jnp.int32(0), (t1, t_max, state, t_out, done, jnp.bool_(False))))
        t1 = jnp.where(done, t1, t1n)
        done = done | done2
        return t1, state, t_out, done, (cia, cib, ccount)

    def outer_cond(carry):
        k, (_, _, _, done, _) = carry
        # reference conservative-advancement outer cap (b2TimeOfImpact.cpp
        # k_maxIterations = 20); unconverged lanes cost nothing extra under
        # the while_loop once their `done` flag is set
        return (k < 20) & ~done

    def outer_body(carry):
        k, c = carry
        return k + 1, outer(k, c)

    done0 = ~jnp.asarray(active, bool)
    cache0 = (jnp.zeros(3, jnp.int32), jnp.zeros(3, jnp.int32),
              jnp.int32(1))
    _, (t1, state, t_out, done, _) = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), (zeros, jnp.int32(TOI_UNKNOWN), t_max, done0,
                        cache0)))
    # root finder stuck -> failed at t1
    state = jnp.where(done, state, jnp.int32(TOI_FAILED))
    t_out = jnp.where(done, t_out, t1)
    return state, t_out
