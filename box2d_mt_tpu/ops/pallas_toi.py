"""Pallas TPU kernel for conservative-advancement time of impact.

Why a kernel: b2TimeOfImpact is three nested data-dependent loops (GJK
inside conservative advancement outside a secant/bisection root find). As
vmapped XLA, every trip of every loop is a separate dispatch of tiny
(lanes,) ops AND every lane pays the batch-max trip count — measured ~60 ms
per step at 2048 worlds x 32 TOI lanes. In one Pallas kernel the loops run
on vector registers with zero dispatch cost, and each 512-lane grid block
exits as soon as ITS lanes converge, so trip counts stay local.

Math is the same re-derivation as ops/distance.py (b2TimeOfImpact.cpp:
256-497, b2Distance.cpp:452-606), in lane-major component form: vertex data
(8, LB), per-lane scalars (1, LB), the GJK simplex as (3, LB) rows.

Only polygon/circle/edge proxies as packed vertex rows are supported — the
same contract as the XLA version. Validated against it on the reference
fixture set (tests/test_pallas_toi.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import settings

BIG = 3.4e38
EPS = 1.1920929e-7

TOI_UNKNOWN = 0
TOI_FAILED = 1
TOI_OVERLAPPED = 2
TOI_TOUCHING = 3
TOI_SEPARATED = 4

LANE_BLOCK = 512

# sblob row indices
_ROWS = dict(ra=0, rb=1, lcax=2, lcay=3, lcbx=4, lcby=5,
             c0ax=6, c0ay=7, cax=8, cay=9, a0a=10, aa=11,
             c0bx=12, c0by=13, cbx=14, cby=15, a0b=16, ab=17,
             cnta=18, cntb=19, tmax=20, active=21)
SBLOB_ROWS = 24


def _kernel(sblob_ref, vax_ref, vay_ref, vbx_ref, vby_ref, out_ref):
    s = sblob_ref[:]                      # (24, LB)
    vax = vax_ref[:]                      # (8, LB)
    vay = vay_ref[:]
    vbx = vbx_ref[:]
    vby = vby_ref[:]
    lb = s.shape[1]

    def row(name):
        r = _ROWS[name]
        return s[r:r + 1]                 # (1, LB)

    ra, rb = row("ra"), row("rb")
    lcax, lcay = row("lcax"), row("lcay")
    lcbx, lcby = row("lcbx"), row("lcby")
    c0ax, c0ay, cax, cay = row("c0ax"), row("c0ay"), row("cax"), row("cay")
    a0a, aa = row("a0a"), row("aa")
    c0bx, c0by, cbx, cby = row("c0bx"), row("c0by"), row("cbx"), row("cby")
    a0b, ab = row("a0b"), row("ab")
    cnta = row("cnta").astype(jnp.int32)
    cntb = row("cntb").astype(jnp.int32)
    t_max = row("tmax")
    active = row("active") > 0.5

    total_radius = ra + rb
    target = jnp.maximum(settings.LINEAR_SLOP,
                         total_radius - 3.0 * settings.LINEAR_SLOP)
    tolerance = 0.25 * settings.LINEAR_SLOP

    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, lb), 0)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (3, lb), 0)
    valid_a = i8 < cnta
    valid_b = i8 < cntb

    def xf_at(t):
        """Sweep transforms at fraction t (alpha0 = 0 normalized)."""
        a_ta = a0a + t * (aa - a0a)
        qas, qac = jnp.sin(a_ta), jnp.cos(a_ta)
        pax = c0ax + t * (cax - c0ax) - (qac * lcax - qas * lcay)
        pay = c0ay + t * (cay - c0ay) - (qas * lcax + qac * lcay)
        a_tb = a0b + t * (ab - a0b)
        qbs, qbc = jnp.sin(a_tb), jnp.cos(a_tb)
        pbx = c0bx + t * (cbx - c0bx) - (qbc * lcbx - qbs * lcby)
        pby = c0by + t * (cby - c0by) - (qbs * lcbx + qbc * lcby)
        return (pax, pay, qas, qac), (pbx, pby, qbs, qbc)

    def support_a(xfa, dx, dy):
        """argmax_i <v_i, R^T d> for proxy A. Returns (1,LB) i32."""
        pax, pay, qas, qac = xfa
        dlx = qac * dx + qas * dy
        dly = -qas * dx + qac * dy
        dots = vax * dlx + vay * dly
        dots = jnp.where(valid_a, dots, -BIG)
        return jnp.argmax(dots, axis=0, keepdims=True).astype(jnp.int32)

    def support_b(xfb, dx, dy):
        pbx, pby, qbs, qbc = xfb
        dlx = qbc * dx + qbs * dy
        dly = -qbs * dx + qbc * dy
        dots = vbx * dlx + vby * dly
        dots = jnp.where(valid_b, dots, -BIG)
        return jnp.argmax(dots, axis=0, keepdims=True).astype(jnp.int32)

    def vert_at(vx, vy, idx):
        """Select vertex row per lane: idx (k,LB) -> (k,LB) components."""
        k = idx.shape[0]
        out_x = jnp.zeros_like(idx, dtype=jnp.float32)
        out_y = jnp.zeros_like(idx, dtype=jnp.float32)
        for r in range(8):
            hit = idx == r
            out_x = jnp.where(hit, vx[r:r + 1], out_x)
            out_y = jnp.where(hit, vy[r:r + 1], out_y)
        return out_x, out_y

    def world_a(xfa, idx):
        pax, pay, qas, qac = xfa
        lx, ly = vert_at(vax, vay, idx)
        return qac * lx - qas * ly + pax, qas * lx + qac * ly + pay

    def world_b(xfb, idx):
        pbx, pby, qbs, qbc = xfb
        lx, ly = vert_at(vbx, vby, idx)
        return qbc * lx - qbs * ly + pbx, qbs * lx + qbc * ly + pby

    # ---------------- GJK distance at transforms (cached simplex ia/ib) ---
    def gjk(xfa, xfb, cia, cib, ccnt):
        """Returns (dist (1,LB), ia (3,LB), ib (3,LB), count (1,LB))."""
        wax_s, way_s = world_a(xfa, cia)             # (3, LB)
        wbx_s, wby_s = world_b(xfb, cib)
        cnt = jnp.clip(ccnt, 1, 3)
        wx = wbx_s - wax_s
        wy = wby_s - way_s
        area = ((wx[1:2] - wx[0:1]) * (wy[2:3] - wy[0:1])
                - (wy[1:2] - wy[0:1]) * (wx[2:3] - wx[0:1]))
        cnt = jnp.where((cnt == 3) & (jnp.abs(area) < EPS), 1, cnt)

        def body(carry):
            it, wax_s, way_s, wbx_s, wby_s, ia, ib, b0, b1, b2, cnt, done_i \
                = carry
            done = done_i != 0
            ia_save, ib_save, cnt_save = ia, ib, cnt

            # ---- solve2 (on slots 0,1)
            w1x = wbx_s[0:1] - wax_s[0:1]
            w1y = wby_s[0:1] - way_s[0:1]
            w2x = wbx_s[1:2] - wax_s[1:2]
            w2y = wby_s[1:2] - way_s[1:2]
            e12x, e12y = w2x - w1x, w2y - w1y
            d12_2 = -(w1x * e12x + w1y * e12y)
            d12_1 = w2x * e12x + w2y * e12y
            in_w1 = d12_2 <= 0.0
            in_w2 = ~in_w1 & (d12_1 <= 0.0)
            s12 = d12_1 + d12_2
            inv12 = 1.0 / jnp.where(s12 != 0.0, s12, 1.0)
            s2_pick1 = in_w2
            s2_b0 = jnp.where(in_w1 | in_w2, 1.0, d12_1 * inv12)
            s2_b1 = jnp.where(in_w1 | in_w2, 0.0, d12_2 * inv12)
            s2_cnt = jnp.where(in_w1 | in_w2, 1, 2)

            # ---- solve3 (slots 0,1,2)
            w3x = wbx_s[2:3] - wax_s[2:3]
            w3y = wby_s[2:3] - way_s[2:3]
            e13x, e13y = w3x - w1x, w3y - w1y
            d13_1 = w3x * e13x + w3y * e13y
            d13_2 = -(w1x * e13x + w1y * e13y)
            e23x, e23y = w3x - w2x, w3y - w2y
            d23_1 = w3x * e23x + w3y * e23y
            d23_2 = -(w2x * e23x + w2y * e23y)
            n123 = e12x * e13y - e12y * e13x
            d123_1 = n123 * (w2x * w3y - w2y * w3x)
            d123_2 = n123 * (w3x * w1y - w3y * w1x)
            d123_3 = n123 * (w1x * w2y - w1y * w2x)
            c_w1 = (d12_2 <= 0.0) & (d13_2 <= 0.0)
            c_e12 = (d12_1 > 0.0) & (d12_2 > 0.0) & (d123_3 <= 0.0)
            c_e13 = (d13_1 > 0.0) & (d13_2 > 0.0) & (d123_2 <= 0.0)
            c_w2 = (d12_1 <= 0.0) & (d23_2 <= 0.0)
            c_w3 = (d13_1 <= 0.0) & (d23_1 <= 0.0)
            c_e23 = (d23_1 > 0.0) & (d23_2 > 0.0) & (d123_1 <= 0.0)
            m_w1 = c_w1
            m_e12 = ~m_w1 & c_e12
            m_e13 = ~m_w1 & ~m_e12 & c_e13
            m_w2 = ~m_w1 & ~m_e12 & ~m_e13 & c_w2
            m_w3 = ~m_w1 & ~m_e12 & ~m_e13 & ~m_w2 & c_w3
            m_e23 = ~m_w1 & ~m_e12 & ~m_e13 & ~m_w2 & ~m_w3 & c_e23
            m_tri = ~(m_w1 | m_e12 | m_e13 | m_w2 | m_w3 | m_e23)
            src0 = jnp.where(m_w2, 1, jnp.where(m_w3, 2,
                                                jnp.where(m_e23, 1, 0)))
            src1 = jnp.where(m_e13 | m_e23, 2, 1)
            inv12b = inv12
            s13 = d13_1 + d13_2
            inv13 = 1.0 / jnp.where(s13 != 0.0, s13, 1.0)
            s23 = d23_1 + d23_2
            inv23 = 1.0 / jnp.where(s23 != 0.0, s23, 1.0)
            s123 = d123_1 + d123_2 + d123_3
            inv123 = 1.0 / jnp.where(s123 != 0.0, s123, 1.0)
            s3_b0 = jnp.where(m_w1 | m_w2 | m_w3, 1.0,
                              jnp.where(m_e12, d12_1 * inv12b,
                                        jnp.where(m_e13, d13_1 * inv13,
                                                  jnp.where(m_e23,
                                                            d23_1 * inv23,
                                                            d123_1 * inv123))))
            s3_b1 = jnp.where(m_e12, d12_2 * inv12b,
                              jnp.where(m_e13, d13_2 * inv13,
                                        jnp.where(m_e23, d23_2 * inv23,
                                                  jnp.where(m_tri,
                                                            d123_2 * inv123,
                                                            0.0))))
            s3_b2 = jnp.where(m_tri, d123_3 * inv123, 0.0)
            s3_cnt = jnp.where(m_w1 | m_w2 | m_w3, 1,
                               jnp.where(m_tri, 3, 2))

            def pick3(arr0, arr1, arr2, src):
                return jnp.where(src == 0, arr0,
                                 jnp.where(src == 1, arr1, arr2))

            is2 = cnt == 2
            is3 = cnt == 3

            def sel_slot(slot_arrs, s2_new0, s3_src):
                """Per component stack rows 0..2 after the solve."""
                a0_, a1_, a2_ = slot_arrs
                v2_0 = jnp.where(s2_pick1, a1_, a0_)
                v3_0 = pick3(a0_, a1_, a2_, src0)
                v3_1 = pick3(a0_, a1_, a2_, src1)
                r0 = jnp.where(is3, v3_0, jnp.where(is2, v2_0, a0_))
                r1 = jnp.where(is3, v3_1, a1_)
                return jnp.concatenate([r0, r1, a2_], axis=0)

            slots = lambda arr: (arr[0:1], arr[1:2], arr[2:3])
            wax_n = sel_slot(slots(wax_s), None, None)
            way_n = sel_slot(slots(way_s), None, None)
            wbx_n = sel_slot(slots(wbx_s), None, None)
            wby_n = sel_slot(slots(wby_s), None, None)
            ia_n = sel_slot(slots(ia), None, None)
            ib_n = sel_slot(slots(ib), None, None)
            b0n = jnp.where(is3, s3_b0, jnp.where(is2, s2_b0, b0))
            b1n = jnp.where(is3, s3_b1, jnp.where(is2, s2_b1, b1))
            b2n = jnp.where(is3, s3_b2, b2)
            cnt_n = jnp.where(is3, s3_cnt, jnp.where(is2, s2_cnt, cnt))

            done = done | (cnt_n == 3)

            # search direction
            w1x_n = wbx_n[0:1] - wax_n[0:1]
            w1y_n = wby_n[0:1] - way_n[0:1]
            w2x_n = wbx_n[1:2] - wax_n[1:2]
            w2y_n = wby_n[1:2] - way_n[1:2]
            e12x_n = w2x_n - w1x_n
            e12y_n = w2y_n - w1y_n
            sgn = e12x_n * (-w1y_n) - e12y_n * (-w1x_n)
            dx2 = jnp.where(sgn > 0.0, -e12y_n, e12y_n)
            dy2 = jnp.where(sgn > 0.0, e12x_n, -e12x_n)
            dx = jnp.where(cnt_n == 1, -w1x_n, dx2)
            dy = jnp.where(cnt_n == 1, -w1y_n, dy2)
            done = done | (dx * dx + dy * dy < EPS * EPS)

            ia_new = support_a(xfa, -dx, -dy)
            ib_new = support_b(xfb, dx, dy)
            dup = jnp.any((i3 < cnt_save) & (ia_save == ia_new)
                          & (ib_save == ib_new), axis=0, keepdims=True)
            done = done | dup

            wa_nx, wa_ny = world_a(xfa, ia_new)
            wb_nx, wb_ny = world_b(xfb, ib_new)
            grow = ~done
            idx = jnp.clip(cnt_n, 0, 2)
            put = (i3 == idx) & grow

            wax_n = jnp.where(put, wa_nx, wax_n)
            way_n = jnp.where(put, wa_ny, way_n)
            wbx_n = jnp.where(put, wb_nx, wbx_n)
            wby_n = jnp.where(put, wb_ny, wby_n)
            ia_n = jnp.where(put, ia_new, ia_n)
            ib_n = jnp.where(put, ib_new, ib_n)
            cnt_n = jnp.where(grow, cnt_n + 1, cnt_n)
            return (it + 1, wax_n, way_n, wbx_n, wby_n, ia_n, ib_n,
                    b0n, b1n, b2n, cnt_n, done.astype(jnp.int32))

        def cond(carry):
            it, done_i = carry[0], carry[-1]
            # aligned with distance.py's GJK cap (reference b2Distance
            # k_maxIters = 20) so XLA and Pallas lanes converge identically
            return (it < 20) & jnp.any(done_i == 0)

        zb = jnp.zeros((1, lb), jnp.float32)
        init = (jnp.int32(0), wax_s, way_s, wbx_s, wby_s, cia, cib,
                jnp.ones((1, lb), jnp.float32), zb, zb, cnt,
                jnp.zeros((1, lb), jnp.int32))
        (_, wax_s, way_s, wbx_s, wby_s, ia, ib, b0, b1, b2, cnt,
         _) = jax.lax.while_loop(cond, body, init)

        valid = i3 < cnt
        bary = jnp.concatenate([b0, b1, b2], axis=0)
        bw = jnp.where(valid, bary, 0.0)
        pax_w = jnp.sum(bw * wax_s, axis=0, keepdims=True)
        pay_w = jnp.sum(bw * way_s, axis=0, keepdims=True)
        pbx_w = jnp.sum(bw * wbx_s, axis=0, keepdims=True)
        pby_w = jnp.sum(bw * wby_s, axis=0, keepdims=True)
        enclosed = cnt == 3
        dx = jnp.where(enclosed, 0.0, pbx_w - pax_w)
        dy = jnp.where(enclosed, 0.0, pby_w - pay_w)
        dist = jnp.sqrt(dx * dx + dy * dy)
        return dist, ia, ib, cnt

    # ---------------- separation function -------------------------------
    # built from the GJK witness cache at t1, evaluated at later times
    def sep_build(xfa, xfb, ia, ib, cnt):
        """Returns (ftype (1,LB), axx, axy, lpx, lpy) per lane."""
        pax, pay, qas, qac = xfa
        pbx, pby, qbs, qbc = xfb
        one = cnt == 1
        face_b = ~one & (ia[0:1] == ia[1:2])

        # points case
        la0x, la0y = vert_at(vax, vay, ia[0:1])
        lb0x, lb0y = vert_at(vbx, vby, ib[0:1])
        wa0x = qac * la0x - qas * la0y + pax
        wa0y = qas * la0x + qac * la0y + pay
        wb0x = qbc * lb0x - qbs * lb0y + pbx
        wb0y = qbs * lb0x + qbc * lb0y + pby
        dxp = wb0x - wa0x
        dyp = wb0y - wa0y
        lp = jnp.sqrt(dxp * dxp + dyp * dyp)
        sf = jnp.where(lp > 0.0, 1.0 / jnp.where(lp > 0.0, lp, 1.0), 0.0)
        ax_pts, ay_pts = dxp * sf, dyp * sf

        # faceB: two points on B
        lb1x, lb1y = vert_at(vbx, vby, ib[1:2])
        ebx, eby = lb1x - lb0x, lb1y - lb0y
        le = jnp.sqrt(ebx * ebx + eby * eby)
        se = jnp.where(le > 0.0, 1.0 / jnp.where(le > 0.0, le, 1.0), 0.0)
        axbx, axby = eby * se, -ebx * se
        lpbx, lpby = 0.5 * (lb0x + lb1x), 0.5 * (lb0y + lb1y)
        nwx = qbc * axbx - qbs * axby
        nwy = qbs * axbx + qbc * axby
        pwx = qbc * lpbx - qbs * lpby + pbx
        pwy = qbs * lpbx + qbc * lpby + pby
        s_b = (wa0x - pwx) * nwx + (wa0y - pwy) * nwy
        flip_b = s_b < 0.0
        axbx = jnp.where(flip_b, -axbx, axbx)
        axby = jnp.where(flip_b, -axby, axby)

        # faceA: two points on A
        la1x, la1y = vert_at(vax, vay, ia[1:2])
        eax, eay = la1x - la0x, la1y - la0y
        le2 = jnp.sqrt(eax * eax + eay * eay)
        se2 = jnp.where(le2 > 0.0, 1.0 / jnp.where(le2 > 0.0, le2, 1.0), 0.0)
        axax, axay = eay * se2, -eax * se2
        lpax, lpay = 0.5 * (la0x + la1x), 0.5 * (la0y + la1y)
        nwax = qac * axax - qas * axay
        nway = qas * axax + qac * axay
        pwax = qac * lpax - qas * lpay + pax
        pway = qas * lpax + qac * lpay + pay
        s_a = (wb0x - pwax) * nwax + (wb0y - pway) * nway
        flip_a = s_a < 0.0
        axax = jnp.where(flip_a, -axax, axax)
        axay = jnp.where(flip_a, -axay, axay)

        ftype = jnp.where(one, 0, jnp.where(face_b, 2, 1))
        axx = jnp.where(one, ax_pts, jnp.where(face_b, axbx, axax))
        axy = jnp.where(one, ay_pts, jnp.where(face_b, axby, axay))
        lpx = jnp.where(one, 0.0, jnp.where(face_b, lpbx, lpax))
        lpy = jnp.where(one, 0.0, jnp.where(face_b, lpby, lpay))
        return ftype, axx, axy, lpx, lpy

    def sep_min(fn, xfa, xfb):
        """FindMinSeparation: witness pair + separation at xf."""
        ftype, axx, axy, lpx, lpy = fn
        pax, pay, qas, qac = xfa
        pbx, pby, qbs, qbc = xfb
        # points: axis world; support A along axis, B along -axis
        wia_p = support_a(xfa, axx, axy)
        wib_p = support_b(xfb, -axx, -axy)
        # faceA: normal world = Rot(qa, axis)
        nax = qac * axx - qas * axy
        nay = qas * axx + qac * axy
        wib_fa = support_b(xfb, -nax, -nay)
        # faceB: normal world = Rot(qb, axis)
        nbx = qbc * axx - qbs * axy
        nby = qbs * axx + qbc * axy
        wia_fb = support_a(xfa, -nbx, -nby)

        wia = jnp.where(ftype == 0, wia_p,
                        jnp.where(ftype == 1, -1, wia_fb))
        wib = jnp.where(ftype == 0, wib_p,
                        jnp.where(ftype == 1, wib_fa, -1))
        sep = sep_eval(fn, wia, wib, xfa, xfb)
        return wia, wib, sep

    def sep_eval(fn, wia, wib, xfa, xfb):
        ftype, axx, axy, lpx, lpy = fn
        pax, pay, qas, qac = xfa
        pbx, pby, qbs, qbc = xfb
        wax_, way_ = world_a(xfa, jnp.clip(wia, 0, 7))
        wbx_, wby_ = world_b(xfb, jnp.clip(wib, 0, 7))
        # points
        s_pts = (wbx_ - wax_) * axx + (wby_ - way_) * axy
        # faceA
        nax = qac * axx - qas * axy
        nay = qas * axx + qac * axy
        pwx = qac * lpx - qas * lpy + pax
        pwy = qas * lpx + qac * lpy + pay
        s_fa = (wbx_ - pwx) * nax + (wby_ - pwy) * nay
        # faceB
        nbx = qbc * axx - qbs * axy
        nby = qbs * axx + qbc * axy
        pwbx = qbc * lpx - qbs * lpy + pbx
        pwby = qbs * lpx + qbc * lpy + pby
        s_fb = (wax_ - pwbx) * nbx + (way_ - pwby) * nby
        return jnp.where(ftype == 0, s_pts,
                         jnp.where(ftype == 1, s_fa, s_fb))

    # ---------------- outer conservative-advancement loop ----------------
    zb = jnp.zeros((1, lb), jnp.float32)

    def outer_body(carry):
        (it, t1, state, t_out, done_i, cia, cib, ccnt) = carry
        done = done_i != 0
        xfa, xfb = xf_at(t1)
        dist, ia, ib, cnt = gjk(xfa, xfb, cia, cib, ccnt)

        overlapped = dist <= 0.0
        touching = ~overlapped & (dist < target + tolerance)
        state = jnp.where(done, state,
                          jnp.where(overlapped, TOI_OVERLAPPED,
                                    jnp.where(touching, TOI_TOUCHING,
                                              state)))
        t_out = jnp.where(done, t_out,
                          jnp.where(overlapped, 0.0,
                                    jnp.where(touching, t1, t_out)))
        done = done | overlapped | touching

        fn = sep_build(xfa, xfb, ia, ib, cnt)

        def push_body(pcarry):
            (pk, t1p, t2, state, t_out, pdone_i, odone_i) = pcarry
            pdone = pdone_i != 0
            odone = odone_i != 0
            xfa2, xfb2 = xf_at(t2)
            wia, wib, s2 = sep_min(fn, xfa2, xfb2)
            separated = s2 > target + tolerance
            state = jnp.where(pdone, state,
                              jnp.where(separated, TOI_SEPARATED, state))
            t_out = jnp.where(pdone, t_out,
                              jnp.where(separated, t_max, t_out))
            advance = ~separated & (s2 > target - tolerance)
            pdone2 = pdone | separated | advance
            t1_next = jnp.where(~pdone & advance, t2, t1p)

            xfa1, xfb1 = xf_at(t1p)
            s1 = sep_eval(fn, wia, wib, xfa1, xfb1)
            failed = ~pdone2 & (s1 < target - tolerance)
            state = jnp.where(failed, TOI_FAILED, state)
            t_out = jnp.where(failed, t1p, t_out)
            touch1 = ~pdone2 & ~failed & (s1 <= target + tolerance)
            state = jnp.where(touch1, TOI_TOUCHING, state)
            t_out = jnp.where(touch1, t1p, t_out)
            odone_new = separated | failed | touch1
            pdone2 = pdone2 | failed | touch1

            # secant/bisection root find for sep(t) == target
            def root_body(rcarry):
                rk, a1, a2, s1r, s2r, t_root, rdone_i = rcarry
                rdone = rdone_i != 0
                denom = jnp.where(s2r != s1r, s2r - s1r, 1.0)
                t_sec = a1 + (target - s1r) * (a2 - a1) / denom
                t_bis = 0.5 * (a1 + a2)
                t = jnp.where(rk % 2 == 1, t_sec, t_bis)
                xfa3, xfb3 = xf_at(t)
                sr = sep_eval(fn, wia, wib, xfa3, xfb3)
                hit = jnp.abs(sr - target) < tolerance
                t_root = jnp.where(rdone, t_root, jnp.where(hit, t, t_root))
                rdone = rdone | hit
                upd_lo = ~rdone & (sr > target)
                a1 = jnp.where(upd_lo, t, a1)
                s1r = jnp.where(upd_lo, sr, s1r)
                a2 = jnp.where(~rdone & ~upd_lo, t, a2)
                s2r = jnp.where(~rdone & ~upd_lo, sr, s2r)
                return (rk + 1, a1, a2, s1r, s2r, t_root,
                        rdone.astype(jnp.int32))

            def root_cond(rcarry):
                rk, rdone_i = rcarry[0], rcarry[-1]
                return (rk < 12) & jnp.any(rdone_i == 0)

            (_, _, _, _, _, t_root, _) = jax.lax.while_loop(
                root_cond, root_body,
                (jnp.int32(0), t1p, t2, s1, s2, t2,
                 pdone2.astype(jnp.int32)))
            t2 = jnp.where(pdone2, t2, t_root)
            return (pk + 1, t1_next, t2, state, t_out,
                    pdone2.astype(jnp.int32),
                    (odone | odone_new).astype(jnp.int32))

        def push_cond(pcarry):
            pk, pdone_i = pcarry[0], pcarry[5]
            return (pk < 8) & jnp.any(pdone_i == 0)

        (_, t1n, _, state, t_out, _, done2_i) = jax.lax.while_loop(
            push_cond, push_body,
            (jnp.int32(0), t1, t_max, state, t_out, done.astype(jnp.int32),
             jnp.zeros((1, lb), jnp.int32)))
        t1 = jnp.where(done, t1, t1n)
        done = done | (done2_i != 0)
        return (it + 1, t1, state, t_out, done.astype(jnp.int32), ia, ib,
                cnt)

    def outer_cond(carry):
        it, done_i = carry[0], carry[4]
        # reference outer cap 20 (b2TimeOfImpact.cpp), same as distance.py
        return (it < 20) & jnp.any(done_i == 0)

    done0 = (~active).astype(jnp.int32)
    init = (jnp.int32(0), zb, jnp.full((1, lb), TOI_UNKNOWN, jnp.int32),
            t_max, done0, jnp.zeros((3, lb), jnp.int32),
            jnp.zeros((3, lb), jnp.int32), jnp.ones((1, lb), jnp.int32))
    (_, t1, state, t_out, done_i, _, _, _) = jax.lax.while_loop(
        outer_cond, outer_body, init)
    done = done_i != 0
    state = jnp.where(done, state, TOI_FAILED)
    t_out = jnp.where(done, t_out, t1)

    out_ref[0:1, :] = state.astype(jnp.float32)
    out_ref[1:2, :] = t_out


@functools.partial(jax.jit, static_argnames=("interpret",))
def time_of_impact_lanes(sblob, vax, vay, vbx, vby, interpret=False):
    """Batched TOI over L lanes (L a multiple of LANE_BLOCK).

    sblob: (24, L) f32 per-lane scalars (see _ROWS); verts: (8, L) each.
    Returns (state (L,) i32, t (L,) f32)."""
    n_lanes = sblob.shape[1]
    grid = (n_lanes // LANE_BLOCK,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((2, n_lanes), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SBLOB_ROWS, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, LANE_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sblob, vax, vay, vbx, vby)
    return out[0].astype(jnp.int32), out[1]
