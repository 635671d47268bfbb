"""Fused Pallas solve-middle kernels: the contact velocity/position
iteration loops of b2Island::Solve (Box2D/Dynamics/b2Island.cpp:268-335)
as TPU kernels with body state resident in VMEM.

Motivation: the XLA color-chunk loops launch a bundle of small kernels per
(iteration x color chunk) — ~150 dispatches per step whose fixed costs
dominate big-world solves (measured 44 ms of a 95 ms step at 16x991-body
worlds, ~0.3 ms per chunk pass). Here a chunk pass costs ~1 us.

Two operating modes:

  * contact-only worlds: `solve_middle_pallas` runs the WHOLE middle —
    pack, velocity Gauss-Seidel over color chunks, position integration
    with clamps, NGS position iterations, unpack — as ONE kernel per
    world.
  * worlds WITH joints: the sandwich kernels (`pack_packed`,
    `vel_iter_packed`, `pos_iter_packed`, `unpack_packed`) run ONE
    contact iteration per launch so the XLA joint color passes interleave
    between them exactly like the reference island loop (joints then
    contacts per velocity iteration, contacts then joints per position
    iteration, b2Island.cpp:268-276, 318-335). The packed constraint
    table and impulse planes persist in HBM between launches.

Layouts (per world, grid = worlds):
  blob_t (51, C) f32  SLOT-order constraint rows (pack_cc_blob_t;
                      impulse rows 47-50 are the warm-start values).
  dest  (1, C) f32    packed color-major position per slot; kernels build
                      pack/unpack one-hots from it on the MXU — no
                      host-side permutation materializes (the perm-build
                      scatter + take_along_axis gathers cost ~31 ms at
                      64x991-body worlds).
  pblob (51, P) f32   color-major packed constraints, CK lanes per chunk.
  aux   (8, P) f32    working rows [ni0, ni1, ti0, ti1, min_sep, ...].
  vel   (8, nb) f32   rows [vx, vy, w] (+5 pad rows for f32 tiling)
  pos   (8, nb) f32   rows [cx, cy, a, movable] (movable = solve_mask)
  aux_slot (8, C) f32 rows [ni0, ni1, ti0, ti1, min_sep], slot order

Gather/scatter of body state use one-hot matmuls on the MXU. Exactness:
the f32 state is Dekker-split into three bf16 terms (8+8+8 = 24 mantissa
bits) and the one-hot entries are exactly 1.0 in bf16, so each of the three
accumulating passes is exact and their f32 sum reconstructs the operand
bit-exactly; within a color chunk each output row/column has at most one
hit (colors are conflict-free per dynamic body; static bodies only ever
receive exact zeros), so no summation rounding exists either.

Mosaic layout note: vectors sliced from different sublane offsets cannot be
lane-concatenated ("offset mismatch on non-concat dimension"), so the
kernels never concatenate row slices — multi-row tiles are assembled as
select-sums against a sublane iota, and the two contact endpoints use
separate one-hot matrices.
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
# for XLA dispatch). 512/1024 measured SLOWER (the per-visit one-hot build
# scales with CK x nb while the visit count is color-bound).
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


_r1 = lambda b, k: b[k:k + 1, :]                          # (1, CK) row


def _chunk_onehot(drow, ci, nc):
    """(CK, nc) bf16 one-hot: row l hits the slot packed at ci*CK+l.
    Each slot lands in at most one packed position, so every row and
    column has <= 1 hit — gathers and scatter-backs through it are
    exact under the 3x-bf16 Dekker contraction."""
    li = (jax.lax.broadcasted_iota(jnp.int32, (CK, nc), 0)
          + ci * CK).astype(jnp.float32)
    return (jnp.broadcast_to(drow, (CK, nc)) == li).astype(jnp.bfloat16)


def _pack_loop(n_chunks, blob2d, drow, pblob_ref, nc, p_total):
    """Gather slot-order constraint rows into the color-major packed
    table via the MXU, then seed the warm-start impulse rows."""
    def gchunk(ci, _):
        oh_t = _chunk_onehot(drow, ci, nc)
        g = _dot3(blob2d, oh_t, ((1,), (1,)))             # (51, CK)
        pblob_ref[:, pl.ds(ci * CK, CK)] = g
        return 0

    pblob_ref[:, :] = jnp.zeros((51, p_total), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, gchunk, 0)


def _load_chunk(pblob_ref, ci, nb):
    off = ci * CK
    blob = pblob_ref[:, pl.ds(off, CK)]                   # (51, CK)
    act = blob[0:1] > 0.5
    ia = blob[1:2].astype(jnp.int32)
    ib = blob[2:3].astype(jnp.int32)
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, CK), 0)
    oh_a = (bi == jnp.broadcast_to(ia, (nb, CK))).astype(jnp.bfloat16)
    oh_b = (bi == jnp.broadcast_to(ib, (nb, CK))).astype(jnp.bfloat16)
    return blob, act, oh_a, oh_b


def _vel_sweep(n_chunks, pblob_ref, aux_ref, velo_ref, nb):
    """One velocity Gauss-Seidel pass over all color chunks."""
    def vchunk(ci, _):
        blob, act, oh_a, oh_b = _load_chunk(pblob_ref, ci, nb)
        off = ci * CK
        ga = _dot3(velo_ref[:, :], oh_a, ((1,), (0,)))    # (8, CK)
        gb = _dot3(velo_ref[:, :], oh_b, ((1,), (0,)))
        vax0, vay0, wa0 = ga[0:1], ga[1:2], ga[2:3]
        vbx0, vby0, wb0 = gb[0:1], gb[1:2], gb[2:3]
        ni0 = aux_ref[0:1, pl.ds(off, CK)]
        ni1 = aux_ref[1:2, pl.ds(off, CK)]
        ti0 = aux_ref[2:3, pl.ds(off, CK)]
        ti1 = aux_ref[3:4, pl.ds(off, CK)]

        nis, tis, vax, vay, wa, vbx, vby, wb = \
            csolver.velocity_contact_math_s(
                _r1(blob, 4), _r1(blob, 5), _r1(blob, 6), _r1(blob, 7),
                _r1(blob, 8), _r1(blob, 9), _r1(blob, 10), _r1(blob, 11),
                (_r1(blob, 12), _r1(blob, 14)),
                (_r1(blob, 13), _r1(blob, 15)),
                (_r1(blob, 16), _r1(blob, 18)),
                (_r1(blob, 17), _r1(blob, 19)),
                (_r1(blob, 20), _r1(blob, 21)),
                (_r1(blob, 22), _r1(blob, 23)),
                (_r1(blob, 24), _r1(blob, 25)),
                _r1(blob, 26), _r1(blob, 27), _r1(blob, 28),
                _r1(blob, 29), _r1(blob, 30), _r1(blob, 31),
                _r1(blob, 3).astype(jnp.int32),
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
        velo_ref[:, :] = (velo_ref[:, :]
                          + _dot3(da, oh_a, ((1,), (1,)))
                          + _dot3(db, oh_b, ((1,), (1,))))
        return 0

    jax.lax.fori_loop(0, n_chunks, vchunk, 0)


def _pos_sweep(n_chunks, pblob_ref, aux_ref, poso_ref, nb):
    """One NGS position pass over all color chunks
    (b2ContactSolver.cpp:676-752)."""
    def pchunk(ci, _):
        blob, act, oh_a, oh_b = _load_chunk(pblob_ref, ci, nb)
        off = ci * CK
        ga = _dot3(poso_ref[:, :], oh_a, ((1,), (0,)))
        gb = _dot3(poso_ref[:, :], oh_b, ((1,), (0,)))
        cax0, cay0, aa0 = ga[0:1], ga[1:2], ga[2:3]
        cbx0, cby0, ab0 = gb[0:1], gb[1:2], gb[2:3]

        cax, cay, aa, cbx, cby, ab, min_sep = \
            csolver.position_contact_math_s(
                _r1(blob, 46).astype(jnp.int32),
                _r1(blob, 3).astype(jnp.int32),
                _r1(blob, 6), _r1(blob, 7), _r1(blob, 8), _r1(blob, 9),
                _r1(blob, 40), _r1(blob, 41),
                _r1(blob, 42), _r1(blob, 43), _r1(blob, 44), _r1(blob, 45),
                _r1(blob, 38), _r1(blob, 39), _r1(blob, 36), _r1(blob, 37),
                (_r1(blob, 32), _r1(blob, 34)),
                (_r1(blob, 33), _r1(blob, 35)),
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
        poso_ref[:, :] = (poso_ref[:, :]
                          + _dot3(da, oh_a, ((1,), (1,)))
                          + _dot3(db, oh_b, ((1,), (1,))))
        return 0

    jax.lax.fori_loop(0, n_chunks, pchunk, 0)


def _unpack_loop(n_chunks, drow, aux2d, auxs_ref, nc):
    """Impulses + min separation back to SLOT order on the MXU; slots in
    no chunk (inactive) come out 0 and the caller keeps their old
    values."""
    auxs_ref[:, :] = jnp.zeros((8, nc), jnp.float32)

    def schunk(ci, _):
        oh_t = _chunk_onehot(drow, ci, nc)
        vals = aux2d[:, pl.ds(ci * CK, CK)]               # (8, CK)
        auxs_ref[:, :] = (auxs_ref[:, :]
                          + _dot3(vals, oh_t, ((1,), (0,))))
        return 0

    jax.lax.fori_loop(0, n_chunks, schunk, 0)


def _integrate_rows(velo_ref, pos_ref, poso_ref, dt, nb):
    """Position integration with translation/rotation clamps
    (b2Island.cpp:283-313; matches ops/integrate.integrate_positions)."""
    vel = velo_ref[:, :]
    vx, vy, w = vel[0:1], vel[1:2], vel[2:3]
    posi = pos_ref[:, :]
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
    velo_ref[:, :] = _rows3(8, nb, vx, vy, w)
    ri8 = jax.lax.broadcasted_iota(jnp.int32, (8, nb), 0)
    poso_ref[:, :] = jnp.where(
        ri8 == 3, jnp.broadcast_to(posi[3:4], (8, nb)),
        _rows3(8, nb, cx, cy, a))


def _kernel(nchunks_ref, dt_ref, blob_ref, dest_ref, vel_ref, pos_ref,
            velo_ref, poso_ref, auxs_ref, pblob_ref, aux_ref,
            *, nb, nc, p_total, vi, pi):
    """Whole solve middle in one kernel (contact-only worlds)."""
    n_chunks = nchunks_ref[0, 0]
    dt = dt_ref[0, 0]
    drow = dest_ref[:]                                    # (1, nc) f32

    _pack_loop(n_chunks, blob_ref[:], drow, pblob_ref, nc, p_total)

    velo_ref[:] = vel_ref[:]
    aux_ref[0:4, :] = pblob_ref[47:51, :]
    aux_ref[4:8, :] = jnp.zeros((4, p_total), jnp.float32)

    def vel_iter(_, carry):
        _vel_sweep(n_chunks, pblob_ref, aux_ref, velo_ref, nb)
        return carry

    jax.lax.fori_loop(0, vi, vel_iter, 0)

    _integrate_rows(velo_ref, pos_ref, poso_ref, dt, nb)

    def pos_iter(_, carry):
        _pos_sweep(n_chunks, pblob_ref, aux_ref, poso_ref, nb)
        return carry

    jax.lax.fori_loop(0, pi, pos_iter, 0)

    _unpack_loop(n_chunks, drow, aux_ref, auxs_ref, nc)


def solve_middle_pallas(blob_t, dest, vel, pos, n_chunks, p_total, dt,
                        velocity_iterations: int, position_iterations: int,
                        interpret: bool = False):
    """Run the fused solve middle on slot-order inputs.

    blob_t (W, 51, C) f32 slot-order constraint rows, dest (W, C) packed
    positions (p_total when inactive), vel/pos (W, 8, nb) f32, n_chunks
    () i32 (global max), dt () f32.
    Returns (vel_out (W,8,nb), pos_out (W,8,nb), aux_slot (W,8,C) with
    rows [ni0, ni1, ti0, ti1, min_sep] in slot order).
    """
    w, _, nc = blob_t.shape
    nb = vel.shape[-1]
    assert p_total % CK == 0
    kern = functools.partial(_kernel, nb=nb, nc=nc, p_total=p_total,
                             vi=velocity_iterations,
                             pi=position_iterations)
    out = pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            _smem(), _smem(),
            pl.BlockSpec((None, 51, nc), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, nc), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nc), lambda i: (i, 0, 0)),
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


def _smem():
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


# ---------------------------------------------------------------------------
# sandwich kernels for joint worlds: one contact iteration per launch, the
# packed table + impulse planes persist in HBM between launches so XLA
# joint passes interleave with reference island-loop ordering
# ---------------------------------------------------------------------------


def pack_packed(blob_t, dest, n_chunks, p_total, interpret=False):
    """Build (pblob (W,51,P), aux (W,8,P)): color-packed constraint rows
    + warm-start impulse planes."""
    w, _, nc = blob_t.shape
    assert p_total % CK == 0

    def kern(nchunks_ref, blob_ref, dest_ref, pblob_ref, aux_ref):
        n = nchunks_ref[0, 0]
        _pack_loop(n, blob_ref[:], dest_ref[:], pblob_ref, nc, p_total)
        aux_ref[0:4, :] = pblob_ref[47:51, :]
        aux_ref[4:8, :] = jnp.zeros((4, p_total), jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            _smem(),
            pl.BlockSpec((None, 51, nc), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, nc), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 51, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 51, p_total), jnp.float32),
            jax.ShapeDtypeStruct((w, 8, p_total), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(n_chunks.astype(jnp.int32), (1, 1)),
      blob_t, dest.astype(jnp.float32)[:, None, :])


def vel_iter_packed(pblob, aux, vel, n_chunks, interpret=False):
    """One contact velocity iteration: (vel', aux')."""
    w, _, p_total = pblob.shape
    nb = vel.shape[-1]

    def kern(nchunks_ref, pblob_ref, aux_in_ref, vel_ref,
             velo_ref, aux_out_ref):
        n = nchunks_ref[0, 0]
        velo_ref[:] = vel_ref[:]
        aux_out_ref[:] = aux_in_ref[:]
        _vel_sweep(n, pblob_ref, aux_out_ref, velo_ref, nb)

    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            _smem(),
            pl.BlockSpec((None, 51, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 8, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 8, p_total), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(n_chunks.astype(jnp.int32), (1, 1)), pblob, aux, vel)


def pos_iter_packed(pblob, aux, pos, n_chunks, interpret=False):
    """One contact NGS position iteration: (pos', aux')."""
    w, _, p_total = pblob.shape
    nb = pos.shape[-1]

    def kern(nchunks_ref, pblob_ref, aux_in_ref, pos_ref,
             poso_ref, aux_out_ref):
        n = nchunks_ref[0, 0]
        poso_ref[:] = pos_ref[:]
        aux_out_ref[:] = aux_in_ref[:]
        _pos_sweep(n, pblob_ref, aux_out_ref, poso_ref, nb)

    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            _smem(),
            pl.BlockSpec((None, 51, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 8, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 8, p_total), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(n_chunks.astype(jnp.int32), (1, 1)), pblob, aux, pos)


def unpack_packed(aux, dest, n_chunks, interpret=False):
    """Impulses + min separation back to slot order: (W, 8, C)."""
    w, _, p_total = aux.shape
    nc = dest.shape[-1]

    def kern(nchunks_ref, aux_ref, dest_ref, auxs_ref):
        n = nchunks_ref[0, 0]
        _unpack_loop(n, dest_ref[:], aux_ref, auxs_ref, nc)

    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            _smem(),
            pl.BlockSpec((None, 8, p_total), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, 1, nc), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 8, nc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, 8, nc), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(n_chunks.astype(jnp.int32), (1, 1)), aux,
      dest.astype(jnp.float32)[:, None, :])
