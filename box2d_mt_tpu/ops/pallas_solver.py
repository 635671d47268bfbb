"""Fused Pallas TPU kernel for the whole constraint-solve phase.

One `pallas_call` executes, entirely VMEM-resident:

    warm-started velocity iterations (colored Gauss-Seidel)
    -> position integration with velocity clamps
    -> NGS position iterations (colored)

for a tile of worlds per grid step. This replaces ~260 XLA ops per step
(each with ~30-300 us launch/DMA overhead) with ONE kernel launch, and all
body gathers/scatters become one-hot compare-select-reduce on VPU registers
— no HBM round trips inside the iteration loops.

Layout is component-major, the Mosaic-friendly orientation: every logical
field is one (TW, C) or (TW, N) plane of a (TW, K, C/N) blob, so all math
is elementwise on well-tiled (…, C)/(…, N) arrays and the kernel slices only
non-minor axes. The constraint math is the same scalarized core the XLA
path uses (solver.velocity_contact_math_s / position_contact_math_s).

Used by world.step_batched_pallas for joint-free worlds (joints interleave
with contacts per iteration and currently solve in XLA).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import settings
from .solver import (ContactConstraints, position_contact_math_s,
                     velocity_contact_math_s)

# constraint f32 blob rows (component-major: blob[:, ROW, :] is a (TW, C) plane)
_F_ROWS = [
    "friction", "tangent_speed", "inv_mass_a", "inv_mass_b", "inv_i_a",
    "inv_i_b", "nx", "ny",
    "rax0", "rax1", "ray0", "ray1", "rbx0", "rbx1", "rby0", "rby1",
    "nm0", "nm1", "tm0", "tm1", "bias0", "bias1",
    "k11", "k12", "k22", "nm11", "nm12", "nm22",
    "mpx0", "mpx1", "mpy0", "mpy1", "lnx", "lny", "lpx", "lpy",
    "radius_a", "radius_b", "lcax", "lcay", "lcbx", "lcby",
]
_FI = {k: i for i, k in enumerate(_F_ROWS)}
NF = len(_F_ROWS)

# i32 blob rows
_I_ROWS = ["body_a", "body_b", "point_count", "active", "mtype", "color"]
_II = {k: i for i, k in enumerate(_I_ROWS)}
NI = len(_I_ROWS)

# body-state blob rows: [vx, vy, w, move, cx, cy, a, pad]
NB_ROWS = 8


def pack_for_kernel(cc: ContactConstraints, color):
    """Pack one world's ContactConstraints into component-major blobs
    (C-minor). Returns (f (NF, C), i (NI, C))."""
    f = jnp.stack([
        cc.friction, cc.tangent_speed, cc.inv_mass_a, cc.inv_mass_b,
        cc.inv_i_a, cc.inv_i_b, cc.normal[:, 0], cc.normal[:, 1],
        cc.r_a[:, 0, 0], cc.r_a[:, 1, 0], cc.r_a[:, 0, 1], cc.r_a[:, 1, 1],
        cc.r_b[:, 0, 0], cc.r_b[:, 1, 0], cc.r_b[:, 0, 1], cc.r_b[:, 1, 1],
        cc.normal_mass[:, 0], cc.normal_mass[:, 1],
        cc.tangent_mass[:, 0], cc.tangent_mass[:, 1],
        cc.velocity_bias[:, 0], cc.velocity_bias[:, 1],
        cc.k11, cc.k12, cc.k22, cc.nm11, cc.nm12, cc.nm22,
        cc.local_points[:, 0, 0], cc.local_points[:, 1, 0],
        cc.local_points[:, 0, 1], cc.local_points[:, 1, 1],
        cc.local_normal[:, 0], cc.local_normal[:, 1],
        cc.local_point[:, 0], cc.local_point[:, 1],
        cc.radius_a, cc.radius_b,
        cc.local_center_a[:, 0], cc.local_center_a[:, 1],
        cc.local_center_b[:, 0], cc.local_center_b[:, 1],
    ], axis=0)
    i = jnp.stack([
        cc.body_a, cc.body_b, cc.point_count, cc.active.astype(jnp.int32),
        cc.mtype, color,
    ], axis=0)
    return f, i


def _solve_kernel(dt_ref, cf_ref, ci_ref, imp_ref, bsps_ref,
                  imp_out, bsps_out, *,
                  vel_iters, pos_iters, max_colors):
    cf = cf_ref[...]          # (TW, NF, C)
    ci = ci_ref[...]          # (TW, NI, C)
    imp = imp_ref[...]        # (TW, 4, C): ni0, ni1, ti0, ti1
    bsps = bsps_ref[...]      # (TW, 8, N)
    dt = dt_ref[0]

    def F(name):
        return jax.lax.index_in_dim(cf, _FI[name], axis=1, keepdims=False)

    def I(name):
        return jax.lax.index_in_dim(ci, _II[name], axis=1, keepdims=False)

    def B(k):
        return jax.lax.index_in_dim(bsps, k, axis=1, keepdims=False)

    body_a = I("body_a")
    body_b = I("body_b")
    pc = I("point_count")
    active = I("active") > 0
    color = I("color")
    tw = cf.shape[0]
    n_c = cf.shape[2]
    n_b = bsps.shape[2]

    n_iota = jax.lax.broadcasted_iota(jnp.int32, (tw, n_c, n_b), 2)
    oh_a = body_a[..., None] == n_iota          # (TW, C, N)
    oh_b = body_b[..., None] == n_iota

    def gath(plane, oh):
        """plane (TW, N) -> per-contact (TW, C)."""
        return jnp.sum(jnp.where(oh, plane[:, None, :], 0.0), axis=-1)

    def scat(plane, oh, delta):
        """plane (TW, N) += delta (TW, C) routed by oh."""
        return plane + jnp.sum(jnp.where(oh, delta[..., None], 0.0), axis=1)

    vx, vy, w_ = B(0), B(1), B(2)
    move = B(3) > 0.5
    cx, cy, ang = B(4), B(5), B(6)

    fr = F("friction")
    ts = F("tangent_speed")
    ma_, mb_ = F("inv_mass_a"), F("inv_mass_b")
    ia_, ib_ = F("inv_i_a"), F("inv_i_b")
    nx, ny = F("nx"), F("ny")
    rax = (F("rax0"), F("rax1"))
    ray = (F("ray0"), F("ray1"))
    rbx = (F("rbx0"), F("rbx1"))
    rby = (F("rby0"), F("rby1"))
    nm = (F("nm0"), F("nm1"))
    tm = (F("tm0"), F("tm1"))
    bias = (F("bias0"), F("bias1"))
    k11, k12, k22 = F("k11"), F("k12"), F("k22")
    nm11, nm12, nm22 = F("nm11"), F("nm12"), F("nm22")

    # ---- velocity iterations
    def vel_iter(_, carry):
        def color_pass(cidx, inner):
            ni0, ni1, ti0, ti1, vx, vy, w_ = inner
            m = (color == cidx) & active
            vax0, vay0, wa0 = gath(vx, oh_a), gath(vy, oh_a), gath(w_, oh_a)
            vbx0, vby0, wb0 = gath(vx, oh_b), gath(vy, oh_b), gath(w_, oh_b)
            nin, tin, vax, vay, wa, vbx, vby, wb = velocity_contact_math_s(
                fr, ts, ma_, mb_, ia_, ib_, nx, ny, rax, ray, rbx, rby,
                nm, tm, bias, k11, k12, k22, nm11, nm12, nm22, pc,
                (ni0, ni1), (ti0, ti1),
                vax0, vay0, wa0, vbx0, vby0, wb0, m)
            vx = scat(vx, oh_a, jnp.where(m, vax - vax0, 0.0))
            vy = scat(vy, oh_a, jnp.where(m, vay - vay0, 0.0))
            w_n = scat(w_, oh_a, jnp.where(m, wa - wa0, 0.0))
            vx = scat(vx, oh_b, jnp.where(m, vbx - vbx0, 0.0))
            vy = scat(vy, oh_b, jnp.where(m, vby - vby0, 0.0))
            w_n = scat(w_n, oh_b, jnp.where(m, wb - wb0, 0.0))
            return nin[0], nin[1], tin[0], tin[1], vx, vy, w_n

        return jax.lax.fori_loop(0, max_colors, color_pass, carry)

    def IM(k):
        return jax.lax.index_in_dim(imp, k, axis=1, keepdims=False)

    ni0, ni1, ti0, ti1, vx, vy, w_ = jax.lax.fori_loop(
        0, vel_iters, vel_iter, (IM(0), IM(1), IM(2), IM(3), vx, vy, w_))

    # ---- integrate positions (b2Island.cpp:283-313)
    translation2 = dt * dt * (vx * vx + vy * vy)
    tlen = jnp.sqrt(jnp.maximum(translation2, 1e-30))
    ratio_t = jnp.where(translation2 > settings.MAX_TRANSLATION_SQUARED,
                        settings.MAX_TRANSLATION / tlen, 1.0)
    vx = vx * ratio_t
    vy = vy * ratio_t
    rotation = dt * w_
    ratio_r = jnp.where(
        rotation * rotation > settings.MAX_ROTATION_SQUARED,
        settings.MAX_ROTATION / jnp.abs(jnp.where(rotation == 0.0, 1.0, rotation)),
        1.0)
    w_ = w_ * ratio_r
    cx = jnp.where(move, cx + dt * vx, cx)
    cy = jnp.where(move, cy + dt * vy, cy)
    ang = jnp.where(move, ang + dt * w_, ang)

    # ---- position iterations
    # fresh one-hots for this phase (values crossing two long loop nests
    # trip the LLO compiler)
    n_iota2 = jax.lax.broadcasted_iota(jnp.int32, (tw, n_c, n_b), 2)
    oh_a2 = body_a[..., None] == n_iota2
    oh_b2 = body_b[..., None] == n_iota2

    def gath2(plane, oh):
        return jnp.sum(jnp.where(oh, plane[:, None, :], 0.0), axis=-1)

    mtype = I("mtype")
    ra_sh, rb_sh = F("radius_a"), F("radius_b")
    lcax, lcay = F("lcax"), F("lcay")
    lcbx, lcby = F("lcbx"), F("lcby")
    lpx, lpy = F("lpx"), F("lpy")
    lnx, lny = F("lnx"), F("lny")
    mpx = (F("mpx0"), F("mpx1"))
    mpy = (F("mpy0"), F("mpy1"))

    def pos_iter(_, carry):
        cx, cy, ang, _ = carry

        def color_pass(cidx, inner):
            cx, cy, ang, min_sep = inner
            m = (color == cidx) & active
            cax0, cay0, aa0 = gath2(cx, oh_a2), gath2(cy, oh_a2), gath2(ang, oh_a2)
            cbx0, cby0, ab0 = gath2(cx, oh_b2), gath2(cy, oh_b2), gath2(ang, oh_b2)
            cax, cay, aa, cbx, cby, ab, ms = position_contact_math_s(
                mtype, pc, ma_, mb_, ia_, ib_, ra_sh, rb_sh,
                lcax, lcay, lcbx, lcby, lpx, lpy, lnx, lny, mpx, mpy,
                cax0, cay0, aa0, cbx0, cby0, ab0, m,
                settings.BAUMGARTE, settings.MAX_LINEAR_CORRECTION)
            cx = scat(cx, oh_a2, jnp.where(m, cax - cax0, 0.0))
            cy = scat(cy, oh_a2, jnp.where(m, cay - cay0, 0.0))
            ang_n = scat(ang, oh_a2, jnp.where(m, aa - aa0, 0.0))
            cx = scat(cx, oh_b2, jnp.where(m, cbx - cbx0, 0.0))
            cy = scat(cy, oh_b2, jnp.where(m, cby - cby0, 0.0))
            ang_n = scat(ang_n, oh_b2, jnp.where(m, ab - ab0, 0.0))
            min_sep = jnp.where(m, jnp.minimum(min_sep, ms), min_sep)
            return cx, cy, ang_n, min_sep

        return jax.lax.fori_loop(
            0, max_colors, color_pass,
            (cx, cy, ang, jnp.zeros((tw, n_c), jnp.float32)))

    cx, cy, ang, min_sep = jax.lax.fori_loop(
        0, pos_iters, pos_iter,
        (cx, cy, ang, jnp.zeros((tw, n_c), jnp.float32)))

    # min_sep rides along in the impulse blob: writing a loop-carried value
    # through a size-1 middle-dim output crashes the LLO compiler.
    zero_c = jnp.zeros_like(min_sep)
    imp_out[...] = jnp.stack(
        [ni0, ni1, ti0, ti1, min_sep, zero_c, zero_c, zero_c], axis=1)
    bsps_out[...] = jnp.stack([vx, vy, w_, B(3), cx, cy, ang, B(7)], axis=1)


@functools.partial(jax.jit, static_argnames=("vel_iters", "pos_iters",
                                             "max_colors", "tile_worlds",
                                             "interpret"))
def fused_solve(cf, ci, imp, bsps, dt, *, vel_iters, pos_iters, max_colors,
                tile_worlds=8, interpret=False):
    """Run the fused solve phase.

    cf (W,NF,C) f32, ci (W,NI,C) i32, imp (W,4,C) f32, bsps (W,8,N) f32,
    dt scalar. Returns (imp, bsps, min_sep (W,C))."""
    w_total, _, n_c = cf.shape
    n_b = bsps.shape[2]
    tw = min(tile_worlds, w_total)
    while w_total % tw != 0:
        tw //= 2
    grid = (w_total // tw,)

    kern = functools.partial(_solve_kernel, vel_iters=vel_iters,
                             pos_iters=pos_iters, max_colors=max_colors)
    dt_arr = jnp.reshape(jnp.asarray(dt, jnp.float32), (1,))

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tw, NF, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, NI, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, 4, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, NB_ROWS, n_b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tw, 8, n_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, NB_ROWS, n_b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w_total, 8, n_c), jnp.float32),
            jax.ShapeDtypeStruct(bsps.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dt_arr, cf, ci, imp, bsps)
    return out[0][:, 0:4, :], out[1], out[0][:, 4, :]
