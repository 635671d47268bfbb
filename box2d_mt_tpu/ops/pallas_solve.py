"""Fused Pallas solve-middle kernel: the contact velocity/position
iteration loops of b2Island::Solve (Box2D/Dynamics/b2Island.cpp:268-335)
as ONE TPU kernel per world.

Motivation: the XLA color-chunk loops launch a bundle of small kernels per
(iteration x color chunk) — ~150 dispatches per step whose fixed costs
dominate big-world solves (measured 44 ms of a 95 ms step at 16x991-body
worlds, ~0.3 ms per chunk pass). Here the whole solve middle — velocity
Gauss-Seidel over color chunks, position integration with clamps, NGS
position iterations — runs inside one kernel with body state resident in
VMEM, so a chunk pass costs ~1 us instead of ~0.3 ms.

Layouts (per world, grid = worlds):
  blob_t (51, C) f32  SLOT-order constraint rows (pack_cc_blob
                      transposed; impulse rows 47-50 are the warm-start
                      values).
  dest  (1, C) f32    packed color-major position per slot; the kernel
                      gathers slot rows into a VMEM color-packed scratch
                      (chunk-aligned, CK lanes per chunk) and scatters
                      results back to slot order itself, both via exact
                      one-hot MXU contractions — no host-side perm
                      build / take_along_axis (those native DMA ops cost
                      ~31 ms at 64x991-body worlds).
  vel   (8, nb) f32   rows [vx, vy, w] (+5 pad rows for f32 tiling)
  pos   (8, nb) f32   rows [cx, cy, a, movable] (movable = solve_mask)
  aux out (8, C) f32  rows [ni0, ni1, ti0, ti1, min_sep], slot order

Gather/scatter of body state use one-hot matmuls on the MXU. Exactness:
the f32 state is Dekker-split into three bf16 terms (8+8+8 = 24 mantissa
bits) and the one-hot entries are exactly 1.0 in bf16, so each of the three
accumulating passes is exact and their f32 sum reconstructs the operand
bit-exactly; within a color chunk each output row/column has at most one
hit (colors are conflict-free per dynamic body; static bodies only ever
receive exact zeros), so no summation rounding exists either.

Mosaic layout note: vectors sliced from different sublane offsets cannot be
lane-concatenated ("offset mismatch on non-concat dimension"), so the
kernel never concatenates row slices — multi-row tiles are assembled as
select-sums against a sublane iota, and the two contact endpoints use
separate one-hot matrices.

Joints are not handled here — worlds with joints take the XLA path
(world._solve_middle_b), which interleaves joint color passes.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import settings
from . import solver as csolver

# kernel chunk width: narrow chunks waste less padding (the per-pass cost
# inside the kernel is ~us, so pass count no longer matters the way it does
# for XLA dispatch)
CK = 256


def _split3(x):
    """Dekker split of f32 into three bf16 terms summing exactly to x."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(x, oh, dims):
    """Exact f32 x {0,1} contraction via three bf16 MXU passes."""
    hi, mid, lo = _split3(x)
    dn = (dims, ((), ()))
    f = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    return f(hi, oh) + f(mid, oh) + f(lo, oh)


def _rows3(nrows, ncols, r0, r1, r2):
    """Assemble an (nrows, ncols) tile with rows 0..2 = r0, r1, r2 (each
    (1, ncols)) and the rest zero, without concatenation."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (nrows, ncols), 0)
    z = jnp.zeros((nrows, ncols), jnp.float32)
    out = jnp.where(ri == 0, jnp.broadcast_to(r0, (nrows, ncols)), z)
    out = jnp.where(ri == 1, jnp.broadcast_to(r1, (nrows, ncols)), out)
    return jnp.where(ri == 2, jnp.broadcast_to(r2, (nrows, ncols)), out)


def _kernel(nchunks_ref, dt_ref, blob_ref, dest_ref, vel_ref, pos_ref,
            velo_ref, poso_ref, auxs_ref, pblob_ref, aux_ref,
            *, nb, nc, p_total, vi, pi):
    n_chunks = nchunks_ref[0, 0]
    dt = dt_ref[0, 0]
    drow = dest_ref[0]                                    # (1, nc) f32

    def chunk_onehot(ci):
        """(CK, nc) bf16 one-hot: row l hits the slot packed at ci*CK+l.
        Each slot lands in at most one packed position, so every row and
        column has <= 1 hit — gathers and scatter-backs through it are
        exact under the 3x-bf16 Dekker contraction."""
        li = (jax.lax.broadcasted_iota(jnp.int32, (CK, nc), 0)
              + ci * CK).astype(jnp.float32)
        return (jnp.broadcast_to(drow, (CK, nc)) == li).astype(jnp.bfloat16)

    # ---- pack: gather slot-order constraint rows into the color-major
    # packed scratch via the MXU (replaces the host-side perm build +
    # take_along_axis gather, which cost ~25 ms at 64x991-body worlds)
    def gchunk(ci, _):
        oh_t = chunk_onehot(ci)
        g = _dot3(blob_ref[0], oh_t, ((1,), (1,)))        # (51, CK)
        pblob_ref[:, pl.ds(ci * CK, CK)] = g
        return 0

    pblob_ref[:, :] = jnp.zeros((51, p_total), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, gchunk, 0)

    velo_ref[:] = vel_ref[:]
    # warm-start impulses into the aux working rows
    aux_ref[0:4, :] = pblob_ref[47:51, :]
    aux_ref[4:8, :] = jnp.zeros((4, p_total), jnp.float32)

    r1 = lambda b, k: b[k:k + 1, :]                       # (1, CK) row

    def load_chunk(ci):
        off = ci * CK
        blob = pblob_ref[:, pl.ds(off, CK)]               # (51, CK)
        act = blob[0:1] > 0.5
        ia = blob[1:2].astype(jnp.int32)
        ib = blob[2:3].astype(jnp.int32)
        bi = jax.lax.broadcasted_iota(jnp.int32, (nb, CK), 0)
        oh_a = (bi == jnp.broadcast_to(ia, (nb, CK))).astype(jnp.bfloat16)
        oh_b = (bi == jnp.broadcast_to(ib, (nb, CK))).astype(jnp.bfloat16)
        return blob, act, oh_a, oh_b

    def vchunk(ci, _):
        blob, act, oh_a, oh_b = load_chunk(ci)
        off = ci * CK
        ga = _dot3(velo_ref[0], oh_a, ((1,), (0,)))       # (8, CK)
        gb = _dot3(velo_ref[0], oh_b, ((1,), (0,)))
        vax0, vay0, wa0 = ga[0:1], ga[1:2], ga[2:3]
        vbx0, vby0, wb0 = gb[0:1], gb[1:2], gb[2:3]
        ni0 = aux_ref[0:1, pl.ds(off, CK)]
        ni1 = aux_ref[1:2, pl.ds(off, CK)]
        ti0 = aux_ref[2:3, pl.ds(off, CK)]
        ti1 = aux_ref[3:4, pl.ds(off, CK)]

        nis, tis, vax, vay, wa, vbx, vby, wb = \
            csolver.velocity_contact_math_s(
                r1(blob, 4), r1(blob, 5), r1(blob, 6), r1(blob, 7),
                r1(blob, 8), r1(blob, 9), r1(blob, 10), r1(blob, 11),
                (r1(blob, 12), r1(blob, 14)), (r1(blob, 13), r1(blob, 15)),
                (r1(blob, 16), r1(blob, 18)), (r1(blob, 17), r1(blob, 19)),
                (r1(blob, 20), r1(blob, 21)), (r1(blob, 22), r1(blob, 23)),
                (r1(blob, 24), r1(blob, 25)),
                r1(blob, 26), r1(blob, 27), r1(blob, 28),
                r1(blob, 29), r1(blob, 30), r1(blob, 31),
                r1(blob, 3).astype(jnp.int32),
                (ni0, ni1), (ti0, ti1),
                vax0, vay0, wa0, vbx0, vby0, wb0, act)

        aux_ref[0:1, pl.ds(off, CK)] = nis[0]
        aux_ref[1:2, pl.ds(off, CK)] = nis[1]
        aux_ref[2:3, pl.ds(off, CK)] = tis[0]
        aux_ref[3:4, pl.ds(off, CK)] = tis[1]

        zero = jnp.float32(0.0)
        da = _rows3(8, CK, jnp.where(act, vax - vax0, zero),
                    jnp.where(act, vay - vay0, zero),
                    jnp.where(act, wa - wa0, zero))
        db = _rows3(8, CK, jnp.where(act, vbx - vbx0, zero),
                    jnp.where(act, vby - vby0, zero),
                    jnp.where(act, wb - wb0, zero))
        velo_ref[0] = (velo_ref[0] + _dot3(da, oh_a, ((1,), (1,)))
                       + _dot3(db, oh_b, ((1,), (1,))))
        return 0

    def vel_iter(_, carry):
        jax.lax.fori_loop(0, n_chunks, vchunk, 0)
        return carry

    jax.lax.fori_loop(0, vi, vel_iter, 0)

    # ---- integrate positions with translation/rotation clamps
    # (b2Island.cpp:283-313; matches ops/integrate.integrate_positions)
    vel = velo_ref[0]
    vx, vy, w = vel[0:1], vel[1:2], vel[2:3]
    posi = pos_ref[0]
    cx, cy, a, movable = posi[0:1], posi[1:2], posi[2:3], posi[3:4] > 0.5
    translation2 = dt * dt * (vx * vx + vy * vy)
    tlen = jnp.sqrt(jnp.maximum(translation2, 1e-30))
    ratio_t = jnp.where(translation2 > settings.MAX_TRANSLATION_SQUARED,
                        settings.MAX_TRANSLATION / tlen, 1.0)
    vx = vx * ratio_t
    vy = vy * ratio_t
    rotation = dt * w
    ratio_r = jnp.where(
        rotation * rotation > settings.MAX_ROTATION_SQUARED,
        settings.MAX_ROTATION
        / jnp.abs(jnp.where(rotation == 0.0, 1.0, rotation)), 1.0)
    w = w * ratio_r
    cx = jnp.where(movable, cx + dt * vx, cx)
    cy = jnp.where(movable, cy + dt * vy, cy)
    a = jnp.where(movable, a + dt * w, a)
    velo_ref[0] = _rows3(8, nb, vx, vy, w)
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, nb), 0)
    poso_ref[0] = jnp.where(
        ri8 == 3, jnp.broadcast_to(posi[3:4], (8, nb)),
        _rows3(8, nb, cx, cy, a))

    # ---- NGS position iterations (b2ContactSolver.cpp:676-752)
    def pchunk(ci, _):
        blob, act, oh_a, oh_b = load_chunk(ci)
        off = ci * CK
        ga = _dot3(poso_ref[0], oh_a, ((1,), (0,)))
        gb = _dot3(poso_ref[0], oh_b, ((1,), (0,)))
        cax0, cay0, aa0 = ga[0:1], ga[1:2], ga[2:3]
        cbx0, cby0, ab0 = gb[0:1], gb[1:2], gb[2:3]

        cax, cay, aa, cbx, cby, ab, min_sep = \
            csolver.position_contact_math_s(
                r1(blob, 46).astype(jnp.int32),
                r1(blob, 3).astype(jnp.int32),
                r1(blob, 6), r1(blob, 7), r1(blob, 8), r1(blob, 9),
                r1(blob, 40), r1(blob, 41),
                r1(blob, 42), r1(blob, 43), r1(blob, 44), r1(blob, 45),
                r1(blob, 38), r1(blob, 39), r1(blob, 36), r1(blob, 37),
                (r1(blob, 32), r1(blob, 34)), (r1(blob, 33), r1(blob, 35)),
                cax0, cay0, aa0, cbx0, cby0, ab0, act,
                settings.BAUMGARTE, settings.MAX_LINEAR_CORRECTION)

        aux_ref[4:5, pl.ds(off, CK)] = min_sep

        zero = jnp.float32(0.0)
        da = _rows3(8, CK, jnp.where(act, cax - cax0, zero),
                    jnp.where(act, cay - cay0, zero),
                    jnp.where(act, aa - aa0, zero))
        db = _rows3(8, CK, jnp.where(act, cbx - cbx0, zero),
                    jnp.where(act, cby - cby0, zero),
                    jnp.where(act, ab - ab0, zero))
        poso_ref[0] = (poso_ref[0] + _dot3(da, oh_a, ((1,), (1,)))
                       + _dot3(db, oh_b, ((1,), (1,))))
        return 0

    def pos_iter(_, carry):
        jax.lax.fori_loop(0, n_chunks, pchunk, 0)
        return carry

    jax.lax.fori_loop(0, pi, pos_iter, 0)

    # ---- un-pack: impulses + min separation back to SLOT order on the
    # MXU (replaces the host-side take_along_axis unpack); slots in no
    # chunk (inactive) come out 0 and the caller keeps their old values
    auxs_ref[0] = jnp.zeros((8, nc), jnp.float32)

    def schunk(ci, _):
        oh_t = chunk_onehot(ci)
        vals = aux_ref[:, pl.ds(ci * CK, CK)]             # (8, CK)
        auxs_ref[0] = auxs_ref[0] + _dot3(vals, oh_t, ((1,), (0,)))
        return 0

    jax.lax.fori_loop(0, n_chunks, schunk, 0)


def solve_middle_pallas(blob_t, dest, vel, pos, n_chunks, p_total, dt,
                        velocity_iterations: int, position_iterations: int,
                        interpret: bool = False):
    """Run the fused solve middle on slot-order inputs.

    blob_t (W, 51, C) f32 slot-order constraint rows (pack_cc_blob
    transposed; impulse rows 47-50 are the warm-start values).
    dest (W, C) packed color-major position per slot (p_total when the
    lane is inactive) — the kernel builds its own pack/unpack one-hots
    from it, so no host-side permutation materializes.
    vel/pos (W, 8, nb) f32, n_chunks () i32 (global max), dt () f32.
    Returns (vel_out (W,8,nb), pos_out (W,8,nb), aux_slot (W,8,C) with
    rows [ni0, ni1, ti0, ti1, min_sep] in slot order).
    """
    w, _, nc = blob_t.shape
    nb = vel.shape[-1]
    assert p_total % CK == 0
    kern = functools.partial(_kernel, nb=nb, nc=nc, p_total=p_total,
                             vi=velocity_iterations,
                             pi=position_iterations)
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            smem(), smem(),
            pl.BlockSpec((1, 51, nc), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, nb), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, nc), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 8, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 8, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 8, nc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((51, p_total), jnp.float32),
            pltpu.VMEM((8, p_total), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(n_chunks.astype(jnp.int32), (1, 1)),
      jnp.reshape(dt.astype(jnp.float32), (1, 1)),
      blob_t, dest.astype(jnp.float32)[:, None, :], vel, pos)
    return out
