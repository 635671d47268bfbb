"""Narrow-phase manifold generation.

Functional re-implementations of the reference collide kernels
(Box2D/Collision/b2CollideCircle.cpp, b2CollidePolygon.cpp,
b2CollideEdge.cpp, b2Collision.cpp) as branch-free single-pair functions:
every C++ early-return becomes a mask, every if/else a `jnp.where` select.
They are designed to be `jax.vmap`ed over the contact table so one fused XLA
program evaluates every pair's manifold in parallel — the TPU-native
replacement for the reference's per-contact `b2CollideTask` range fan-out
(b2World.cpp:100-118).

Contact feature ids (b2Collision.h:38-57) are packed into one int32 as
indexA | indexB<<8 | typeA<<16 | typeB<<24 and drive warm-start impulse
matching exactly like the reference's b2ContactID key comparison.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import (
    cross_vv, dot, normalize, rot_t_vec, rot_vec, transform_mul_t,
    transform_point, transform_t_point,
)

BIG = 3.402823466e38      # b2_maxFloat
EPS = 1.1920929e-7        # b2_epsilon (FLT_EPSILON)

FEAT_VERTEX = 0
FEAT_FACE = 1

_I8 = jnp.arange(settings.MAX_POLYGON_VERTICES)


class Manifold(NamedTuple):
    """b2Manifold (b2Collision.h:93-107) for one pair."""
    mtype: jax.Array         # () i32: MANIFOLD_CIRCLES / FACE_A / FACE_B
    local_point: jax.Array   # (2,)
    local_normal: jax.Array  # (2,)
    points: jax.Array        # (2, 2) local manifold points
    ids: jax.Array           # (2,) i32 packed feature ids
    count: jax.Array         # () i32


class ShapeRows(NamedTuple):
    """One fixture's shape data as gathered from the Fixtures SoA."""
    verts: jax.Array    # (8, 2)
    normals: jax.Array  # (8, 2)
    nverts: jax.Array   # () i32
    ghosts: jax.Array   # (2,) bool
    radius: jax.Array   # () f32


def pack_id(index_a, index_b, type_a, type_b):
    return (index_a | (index_b << 8) | (type_a << 16) | (type_b << 24)).astype(jnp.int32)


def flip_id(cid):
    ia = cid & 0xFF
    ib = (cid >> 8) & 0xFF
    ta = (cid >> 16) & 0xFF
    tb = (cid >> 24) & 0xFF
    return pack_id(ib, ia, tb, ta)


def _empty_manifold():
    return Manifold(
        mtype=jnp.int32(0),
        local_point=jnp.zeros(2, jnp.float32),
        local_normal=jnp.zeros(2, jnp.float32),
        points=jnp.zeros((2, 2), jnp.float32),
        ids=jnp.zeros(2, jnp.int32),
        count=jnp.int32(0),
    )


# --------------------------------------------------------------------------
# circle vs circle (b2CollideCircle.cpp:23-49)
# --------------------------------------------------------------------------

def collide_circles_core(a, pax, pay, qas, qac,
                         b, pbx, pby, qbs, qbc) -> "ManifoldLanes":
    """Lane-major circle-circle (see the polygon core for the layout note)."""
    cax, cay = a.vx[0], a.vy[0]
    cbx, cby = b.vx[0], b.vy[0]
    wax, way = _rot_s(qas, qac, cax, cay)
    wbx, wby = _rot_s(qbs, qbc, cbx, cby)
    dx = wbx + pbx - wax - pax
    dy = wby + pby - way - pay
    r = a.radius + b.radius
    hit = dx * dx + dy * dy <= r * r
    z = jnp.zeros_like(cax)
    zi = jnp.zeros_like(a.count)
    return ManifoldLanes(
        mtype=jnp.full_like(a.count, settings.MANIFOLD_CIRCLES),
        lpx=cax, lpy=cay, lnx=z, lny=z,
        p0x=cbx, p0y=cby, p1x=z, p1y=z, id0=zi, id1=zi,
        count=hit.astype(jnp.int32))


def collide_circles(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    m = collide_circles_core(
        _rows_to_lanes1(a), pA[0, None], pA[1, None], qA[0, None], qA[1, None],
        _rows_to_lanes1(b), pB[0, None], pB[1, None], qB[0, None], qB[1, None])
    return lanes_to_manifold(jax.tree.map(lambda x: x[0], m))


# --------------------------------------------------------------------------
# polygon vs circle (b2CollideCircle.cpp:51-154)
# --------------------------------------------------------------------------

def collide_polygon_circle_core(a, pax, pay, qas, qac,
                                b, pbx, pby, qbs, qbc) -> "ManifoldLanes":
    """Lane-major polygon-circle (b2CollideCircle.cpp:51-154)."""
    wx, wy = _rot_s(qbs, qbc, b.vx[0], b.vy[0])
    clx, cly = _rot_t_s(qas, qac, wx + pbx - pax, wy + pby - pay)
    r = a.radius + b.radius

    valid = _I8[:, None] < a.count[None, :]
    s = a.nx * (clx - a.vx) + a.ny * (cly - a.vy)          # (8, L)
    separated = jnp.any(valid & (s > r), axis=0)
    s_masked = jnp.where(valid, s, -BIG)
    ni = jnp.argmax(s_masked, axis=0).astype(jnp.int32)
    separation = jnp.max(s_masked, axis=0)

    ni2 = jnp.where(ni + 1 < a.count, ni + 1, 0)
    v1x, v1y, n_ix, n_iy = _sel8(ni, a.vx, a.vy, a.nx, a.ny)
    v2x, v2y = _sel8(ni2, a.vx, a.vy)
    fcx, fcy = 0.5 * (v1x + v2x), 0.5 * (v1y + v2y)

    d1x, d1y = clx - v1x, cly - v1y
    d2x, d2y = clx - v2x, cly - v2y
    u1 = d1x * (v2x - v1x) + d1y * (v2y - v1y)
    u2 = d2x * (v1x - v2x) + d2y * (v1y - v2y)

    inside = separation < EPS
    l1 = jnp.sqrt(d1x * d1x + d1y * d1y)
    s1 = jnp.where(l1 > 1.1754943508222875e-38, l1, 1.0)
    nv1x = jnp.where(l1 > 1.1754943508222875e-38, d1x / s1, 0.0)
    nv1y = jnp.where(l1 > 1.1754943508222875e-38, d1y / s1, 0.0)
    l2 = jnp.sqrt(d2x * d2x + d2y * d2y)
    s2 = jnp.where(l2 > 1.1754943508222875e-38, l2, 1.0)
    nv2x = jnp.where(l2 > 1.1754943508222875e-38, d2x / s2, 0.0)
    nv2y = jnp.where(l2 > 1.1754943508222875e-38, d2y / s2, 0.0)
    reject_v1 = d1x * d1x + d1y * d1y > r * r
    reject_v2 = d2x * d2x + d2y * d2y > r * r
    reject_face = (clx - fcx) * n_ix + (cly - fcy) * n_iy > r

    use_v1 = (~inside) & (u1 <= 0.0)
    use_v2 = (~inside) & ~(u1 <= 0.0) & (u2 <= 0.0)
    use_face = (~inside) & ~(u1 <= 0.0) & ~(u2 <= 0.0)

    lnx = jnp.where(use_v1, nv1x, jnp.where(use_v2, nv2x, n_ix))
    lny = jnp.where(use_v1, nv1y, jnp.where(use_v2, nv2y, n_iy))
    lpx = jnp.where(use_v1, v1x, jnp.where(use_v2, v2x, fcx))
    lpy = jnp.where(use_v1, v1y, jnp.where(use_v2, v2y, fcy))
    rejected = (separated | (use_v1 & reject_v1) | (use_v2 & reject_v2)
                | (use_face & reject_face))
    z = jnp.zeros_like(lpx)
    zi = jnp.zeros_like(a.count)
    return ManifoldLanes(
        mtype=jnp.full_like(a.count, settings.MANIFOLD_FACE_A),
        lpx=lpx, lpy=lpy, lnx=lnx, lny=lny,
        p0x=b.vx[0], p0y=b.vy[0], p1x=z, p1y=z, id0=zi, id1=zi,
        count=jnp.where(rejected, 0, 1).astype(jnp.int32))


def collide_polygon_circle(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    m = collide_polygon_circle_core(
        _rows_to_lanes1(a), pA[0, None], pA[1, None], qA[0, None], qA[1, None],
        _rows_to_lanes1(b), pB[0, None], pB[1, None], qB[0, None], qB[1, None])
    return lanes_to_manifold(jax.tree.map(lambda x: x[0], m))


# --------------------------------------------------------------------------
# polygon vs polygon SAT + clipping (b2CollidePolygon.cpp)
#
# The hot form is the *lane-major component core*: every per-pair quantity
# is an (L,) array and per-vertex data is (8, L), so the TPU's (8, 128)
# vector registers are fully occupied by pair lanes. The naive vmapped form
# would put the tiny trailing dims (2-vectors, 8 verts) in the 128-lane
# axis and waste ~98% of the VPU — measured 20.8 ms vs <2 ms for the same
# math at 131k lanes.
# --------------------------------------------------------------------------


class ShapeLanes(NamedTuple):
    """A batch of fixtures in lane-major component layout."""
    vx: jax.Array      # (8, L) vertex x
    vy: jax.Array      # (8, L)
    nx: jax.Array      # (8, L) normal x
    ny: jax.Array
    count: jax.Array   # (L,) i32
    radius: jax.Array  # (L,)
    g0: jax.Array      # (L,) bool — edge ghost-vertex flags
    g1: jax.Array


class ManifoldLanes(NamedTuple):
    """Manifold components, one lane per pair (assemble with lanes_to_manifold)."""
    mtype: jax.Array   # (L,) i32
    lpx: jax.Array
    lpy: jax.Array
    lnx: jax.Array
    lny: jax.Array
    p0x: jax.Array
    p0y: jax.Array
    p1x: jax.Array
    p1y: jax.Array
    id0: jax.Array     # (L,) i32
    id1: jax.Array
    count: jax.Array   # (L,) i32


def rows_to_lanes(r: ShapeRows) -> ShapeLanes:
    """(L, 8, 2) ShapeRows -> lane-major ShapeLanes (one relayout each)."""
    return ShapeLanes(
        vx=jnp.moveaxis(r.verts[..., 0], -1, 0),
        vy=jnp.moveaxis(r.verts[..., 1], -1, 0),
        nx=jnp.moveaxis(r.normals[..., 0], -1, 0),
        ny=jnp.moveaxis(r.normals[..., 1], -1, 0),
        count=r.nverts, radius=r.radius,
        g0=r.ghosts[..., 0], g1=r.ghosts[..., 1])


def _rows_to_lanes1(r: ShapeRows) -> ShapeLanes:
    """Single-pair ShapeRows ((8,2) arrays) -> one-lane ShapeLanes."""
    return ShapeLanes(
        vx=r.verts[:, 0, None], vy=r.verts[:, 1, None],
        nx=r.normals[:, 0, None], ny=r.normals[:, 1, None],
        count=r.nverts[None], radius=r.radius[None],
        g0=r.ghosts[0][None], g1=r.ghosts[1][None])


def lanes_to_manifold(m: ManifoldLanes) -> Manifold:
    return Manifold(
        mtype=m.mtype,
        local_point=jnp.stack([m.lpx, m.lpy], axis=-1),
        local_normal=jnp.stack([m.lnx, m.lny], axis=-1),
        points=jnp.stack([jnp.stack([m.p0x, m.p0y], axis=-1),
                          jnp.stack([m.p1x, m.p1y], axis=-1)], axis=-2),
        ids=jnp.stack([m.id0, m.id1], axis=-1),
        count=m.count)


def _rot_s(qs, qc, x, y):
    return qc * x - qs * y, qs * x + qc * y


def _rot_t_s(qs, qc, x, y):
    return qc * x + qs * y, -qs * x + qc * y


def _sel8(idx, *arrays):
    """Per-lane row select: arrays (8, L), idx (L,) -> tuple of (L,)."""
    oh = _I8[:, None] == idx[None, :]
    return tuple(jnp.sum(jnp.where(oh, a, 0), axis=0) for a in arrays)


def _find_max_separation_s(a: ShapeLanes, pax, pay, qas, qac,
                           b: ShapeLanes, pbx, pby, qbs, qbc):
    """b2FindMaxSeparation (b2CollidePolygon.cpp:23-62), lane-major."""
    # xf = MulT(xf2, xf1)
    qs = qbc * qas - qbs * qac
    qc = qbc * qac + qbs * qas
    px, py = _rot_t_s(qbs, qbc, pax - pbx, pay - pby)
    nx, ny = _rot_s(qs, qc, a.nx, a.ny)            # (8, L)
    wx, wy = _rot_s(qs, qc, a.vx, a.vy)
    wx = wx + px
    wy = wy + py
    dx = b.vx[None, :, :] - wx[:, None, :]         # (8, 8, L)
    dy = b.vy[None, :, :] - wy[:, None, :]
    sij = nx[:, None] * dx + ny[:, None] * dy
    sij = jnp.where(_I8[None, :, None] < b.count[None, None, :], sij, BIG)
    si = jnp.min(sij, axis=1)                      # (8, L)
    si = jnp.where(_I8[:, None] < a.count[None, :], si, -BIG)
    best = jnp.argmax(si, axis=0).astype(jnp.int32)
    return best, jnp.max(si, axis=0)


def _clip_segment_s(v0x, v0y, v1x, v1y, id0, id1, nx, ny, off, vidx):
    """b2ClipSegmentToLine (b2Collision.cpp:201-232), lane-major. Returns
    two candidate output vertices + the true count; outputs are only used
    when count == 2, matching the reference's `np < 2` bail."""
    d0 = nx * v0x + ny * v0y - off
    d1 = nx * v1x + ny * v1y - off
    denom = d0 - d1
    interp = d0 / jnp.where(denom == 0.0, 1.0, denom)
    vix = v0x + interp * (v1x - v0x)
    viy = v0y + interp * (v1y - v0y)
    idi = pack_id(vidx, (id0 >> 8) & 0xFF,
                  jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_FACE))
    keep0 = d0 <= 0.0
    keep1 = d1 <= 0.0
    both = keep0 & keep1
    o0x = jnp.where(keep0, v0x, v1x)
    o0y = jnp.where(keep0, v0y, v1y)
    oid0 = jnp.where(keep0, id0, id1)
    o1x = jnp.where(both, v1x, vix)
    o1y = jnp.where(both, v1y, viy)
    oid1 = jnp.where(both, id1, idi)
    n = (keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
         + (d0 * d1 < 0.0).astype(jnp.int32))
    return o0x, o0y, o1x, o1y, oid0, oid1, n


def collide_polygons_core(a: ShapeLanes, pax, pay, qas, qac,
                          b: ShapeLanes, pbx, pby, qbs, qbc) -> ManifoldLanes:
    """b2CollidePolygons (b2CollidePolygon.cpp:114-239), lane-major."""
    total_radius = a.radius + b.radius
    edge_a, sep_a = _find_max_separation_s(a, pax, pay, qas, qac,
                                           b, pbx, pby, qbs, qbc)
    edge_b, sep_b = _find_max_separation_s(b, pbx, pby, qbs, qbc,
                                           a, pax, pay, qas, qac)
    separated = (sep_a > total_radius) | (sep_b > total_radius)
    flip = sep_b > sep_a + 0.1 * settings.LINEAR_SLOP

    def pick(xb, xa):
        return jnp.where(flip, xb, xa)

    v1x, v1y = pick(b.vx, a.vx), pick(b.vy, a.vy)
    n1x, n1y = pick(b.nx, a.nx), pick(b.ny, a.ny)
    count1 = pick(b.count, a.count)
    p1x, p1y = pick(pbx, pax), pick(pby, pay)
    q1s, q1c = pick(qbs, qas), pick(qbc, qac)
    v2x, v2y = pick(a.vx, b.vx), pick(a.vy, b.vy)
    n2x, n2y = pick(a.nx, b.nx), pick(a.ny, b.ny)
    count2 = pick(a.count, b.count)
    p2x, p2y = pick(pax, pbx), pick(pay, pby)
    q2s, q2c = pick(qas, qbs), pick(qac, qbc)
    edge1 = jnp.where(flip, edge_b, edge_a)

    # b2FindIncidentEdge (b2CollidePolygon.cpp:64-112)
    en_x, en_y = _sel8(edge1, n1x, n1y)
    wn_x, wn_y = _rot_s(q1s, q1c, en_x, en_y)
    ln_x, ln_y = _rot_t_s(q2s, q2c, wn_x, wn_y)    # poly1 normal in frame2
    dots = ln_x * n2x + ln_y * n2y                 # (8, L)
    dots = jnp.where(_I8[:, None] < count2[None, :], dots, BIG)
    i1 = jnp.argmin(dots, axis=0).astype(jnp.int32)
    i2 = jnp.where(i1 + 1 < count2, i1 + 1, 0)
    iv1x, iv1y = _sel8(i1, v2x, v2y)
    iv2x, iv2y = _sel8(i2, v2x, v2y)
    inc0x, inc0y = _rot_s(q2s, q2c, iv1x, iv1y)
    inc0x, inc0y = inc0x + p2x, inc0y + p2y
    inc1x, inc1y = _rot_s(q2s, q2c, iv2x, iv2y)
    inc1x, inc1y = inc1x + p2x, inc1y + p2y
    iid0 = pack_id(edge1, i1, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX))
    iid1 = pack_id(edge1, i2, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX))

    iv1 = edge1
    iv2 = jnp.where(edge1 + 1 < count1, edge1 + 1, 0)
    v11x, v11y = _sel8(iv1, v1x, v1y)
    v12x, v12y = _sel8(iv2, v1x, v1y)
    tx, ty = v12x - v11x, v12y - v11y
    tl = jnp.sqrt(tx * tx + ty * ty)
    safe = jnp.where(tl > 0.0, tl, 1.0)
    tx = jnp.where(tl > 0.0, tx / safe, 0.0)
    ty = jnp.where(tl > 0.0, ty / safe, 0.0)
    lnx, lny = ty, -tx                              # localNormal = cross(t, 1)
    plane_x, plane_y = 0.5 * (v11x + v12x), 0.5 * (v11y + v12y)
    wtx, wty = _rot_s(q1s, q1c, tx, ty)
    wnx, wny = wty, -wtx
    w11x, w11y = _rot_s(q1s, q1c, v11x, v11y)
    w11x, w11y = w11x + p1x, w11y + p1y
    w12x, w12y = _rot_s(q1s, q1c, v12x, v12y)
    w12x, w12y = w12x + p1x, w12y + p1y
    front = wnx * w11x + wny * w11y
    side1 = -(wtx * w11x + wty * w11y) + total_radius
    side2 = (wtx * w12x + wty * w12y) + total_radius

    c0x, c0y, c1x, c1y, cid0, cid1, np1 = _clip_segment_s(
        inc0x, inc0y, inc1x, inc1y, iid0, iid1, -wtx, -wty, side1, iv1)
    c0x, c0y, c1x, c1y, cid0, cid1, np2 = _clip_segment_s(
        c0x, c0y, c1x, c1y, cid0, cid1, wtx, wty, side2, iv2)
    clip_ok = (np1 >= 2) & (np2 >= 2)

    sep0 = wnx * c0x + wny * c0y - front
    sep1 = wnx * c1x + wny * c1y - front
    keep0 = sep0 <= total_radius
    keep1 = sep1 <= total_radius

    lp0x, lp0y = _rot_t_s(q2s, q2c, c0x - p2x, c0y - p2y)
    lp1x, lp1y = _rot_t_s(q2s, q2c, c1x - p2x, c1y - p2y)
    id0 = jnp.where(flip, flip_id(cid0), cid0)
    id1 = jnp.where(flip, flip_id(cid1), cid1)

    # pack kept points densely (reference appends at points[pointCount])
    count = keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
    count = jnp.where(separated | ~clip_ok, 0, count)
    return ManifoldLanes(
        mtype=jnp.where(flip, settings.MANIFOLD_FACE_B,
                        settings.MANIFOLD_FACE_A).astype(jnp.int32),
        lpx=plane_x, lpy=plane_y, lnx=lnx, lny=lny,
        p0x=jnp.where(keep0, lp0x, lp1x), p0y=jnp.where(keep0, lp0y, lp1y),
        p1x=lp1x, p1y=lp1y,
        id0=jnp.where(keep0, id0, id1), id1=id1,
        count=count.astype(jnp.int32))


def collide_polygons(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    """Single-pair wrapper over the lane-major core."""
    m = collide_polygons_core(
        _rows_to_lanes1(a), pA[0, None], pA[1, None], qA[0, None], qA[1, None],
        _rows_to_lanes1(b), pB[0, None], pB[1, None], qB[0, None], qB[1, None])
    return lanes_to_manifold(jax.tree.map(lambda x: x[0], m))


# --------------------------------------------------------------------------
# edge vs circle (b2CollideEdge.cpp:27-148)
# --------------------------------------------------------------------------

def collide_edge_circle(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    q_pt = transform_t_point(pA, qA, transform_point(pB, qB, b.verts[0]))
    va, vb = a.verts[0], a.verts[1]
    v0, v3 = a.verts[2], a.verts[3]
    has0, has3 = a.ghosts[0], a.ghosts[1]
    e = vb - va
    u = dot(e, vb - q_pt)
    v = dot(e, q_pt - va)
    r = a.radius + b.radius
    r2 = r * r

    # Region A (v <= 0)
    dA = q_pt - va
    rejA = dot(dA, dA) > r2
    e1 = va - v0
    u1 = dot(e1, va - q_pt)
    rejA = rejA | (has0 & (u1 > 0.0))

    # Region B (u <= 0)
    dB = q_pt - vb
    rejB = dot(dB, dB) > r2
    e2 = v3 - vb
    v2_ = dot(e2, q_pt - vb)
    rejB = rejB | (has3 & (v2_ > 0.0))

    # Region AB
    den = dot(e, e)
    p_ab = (u[..., None] * va + v[..., None] * vb) / jnp.where(den == 0.0, 1.0, den)
    dAB = q_pt - p_ab
    rejAB = dot(dAB, dAB) > r2
    n_ab = jnp.stack([-e[1], e[0]])
    n_ab = jnp.where(dot(n_ab, q_pt - va) < 0.0, -n_ab, n_ab)
    n_ab, _ = normalize(n_ab)

    in_a = v <= 0.0
    in_b = (~in_a) & (u <= 0.0)
    in_ab = (~in_a) & (~in_b)

    rejected = (in_a & rejA) | (in_b & rejB) | (in_ab & rejAB)
    mtype = jnp.where(in_ab, settings.MANIFOLD_FACE_A, settings.MANIFOLD_CIRCLES).astype(jnp.int32)
    local_normal = jnp.where(in_ab, n_ab, jnp.zeros(2, jnp.float32))
    local_point = jnp.where(in_a, va, jnp.where(in_b, vb, va))
    # cf: region A -> (0, vertex); region B -> (1, vertex); AB -> (0, face)
    cid = jnp.where(
        in_a, pack_id(0, 0, jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_VERTEX)),
        jnp.where(in_b, pack_id(1, 0, jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_VERTEX)),
                  pack_id(0, 0, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX))))

    return Manifold(
        mtype=mtype,
        local_point=local_point,
        local_normal=local_normal,
        points=jnp.stack([b.verts[0], jnp.zeros(2, jnp.float32)]),
        ids=jnp.stack([cid, jnp.int32(0)]),
        count=jnp.where(rejected, 0, 1).astype(jnp.int32),
    )


def _clip_segment_to_line(v, ids, normal, offset, vertex_index_a):
    """b2ClipSegmentToLine (b2Collision.cpp:201-232), single-pair vector
    form (used by the EPCollider; the polygon path uses _clip_segment_s)."""
    o0x, o0y, o1x, o1y, id0, id1, n = _clip_segment_s(
        v[0, 0], v[0, 1], v[1, 0], v[1, 1], ids[0], ids[1],
        normal[0], normal[1], offset, vertex_index_a)
    return (jnp.stack([jnp.stack([o0x, o0y]), jnp.stack([o1x, o1y])]),
            jnp.stack([id0, id1]), n)


# --------------------------------------------------------------------------
# edge vs polygon: b2EPCollider (b2CollideEdge.cpp:193-698)
# --------------------------------------------------------------------------

def collide_edge_polygon(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    """Single-pair wrapper over the lane-major EPCollider core."""
    m = collide_edge_polygon_core(
        _rows_to_lanes1(a), pA[0, None], pA[1, None], qA[0, None], qA[1, None],
        _rows_to_lanes1(b), pB[0, None], pB[1, None], qB[0, None], qB[1, None])
    return lanes_to_manifold(jax.tree.map(lambda x: x[0], m))


def _sel8_f(idx, arr):
    """arr (8, L), idx (L,) -> (L,)."""
    oh = _I8[:, None] == idx[None, :]
    return jnp.sum(jnp.where(oh, arr, 0), axis=0)


def collide_edge_polygon_core(a: ShapeLanes, pax, pay, qas, qac,
                              b: ShapeLanes, pbx, pby, qbs, qbc
                              ) -> ManifoldLanes:
    """Lane-major b2EPCollider (b2CollideEdge.cpp:193-698): all 9
    ghost-vertex cases, axis hysteresis, reference clipping."""
    # edge frame: xf = MulT(xfA, xfB)
    xqs = qac * qbs - qas * qbc
    xqc = qac * qbc + qas * qbs
    dxp = pbx - pax
    dyp = pby - pay
    xpx = qac * dxp + qas * dyp
    xpy = -qas * dxp + qac * dyp

    valid_b = _I8[:, None] < b.count[None, :]
    nBf = jnp.maximum(b.count, 1).astype(jnp.float32)

    # polygon centroid in B frame, then into edge frame
    bvxm = jnp.where(valid_b, b.vx, 0.0)
    bvym = jnp.where(valid_b, b.vy, 0.0)
    prx = jnp.sum(bvxm, axis=0) / nBf
    pry = jnp.sum(bvym, axis=0) / nBf
    nxt = jnp.where(_I8[:, None] + 1 < b.count[None, :], _I8[:, None] + 1, 0)
    # next-vertex select via one-hot (native take is slow on TPU)
    oh_n = nxt[:, None, :] == _I8[None, :, None]          # (8,8,L)
    bvx_nx = jnp.sum(jnp.where(oh_n, b.vx[None, :, :], 0.0), axis=1)
    bvy_nx = jnp.sum(jnp.where(oh_n, b.vy[None, :, :], 0.0), axis=1)
    p1x, p1y = b.vx - prx, b.vy - pry
    p2x, p2y = bvx_nx - prx, bvy_nx - pry
    d_ = p1x * p2y - p1y * p2x
    tri = jnp.where(valid_b, 0.5 * d_, 0.0)
    area = jnp.sum(tri, axis=0)
    safe_area = jnp.where(area == 0.0, 1.0, area)
    clx = jnp.sum(tri / 3.0 * (p1x + p2x) * valid_b, axis=0) / safe_area + prx
    cly = jnp.sum(tri / 3.0 * (p1y + p2y) * valid_b, axis=0) / safe_area + pry
    cx = xqc * clx - xqs * cly + xpx
    cy = xqs * clx + xqc * cly + xpy

    v0x, v0y = a.vx[2], a.vy[2]
    v1x, v1y = a.vx[0], a.vy[0]
    v2x, v2y = a.vx[1], a.vy[1]
    v3x, v3y = a.vx[3], a.vy[3]
    has0, has3 = a.g0, a.g1

    def norm2(x, y):
        ln = jnp.sqrt(x * x + y * y)
        s = jnp.where(ln > 1.1754943508222875e-38, ln, 1.0)
        ok = ln > 1.1754943508222875e-38
        return jnp.where(ok, x / s, 0.0), jnp.where(ok, y / s, 0.0)

    e1x, e1y = norm2(v2x - v1x, v2y - v1y)
    n1x, n1y = e1y, -e1x
    offset1 = n1x * (cx - v1x) + n1y * (cy - v1y)

    e0x, e0y = norm2(v1x - v0x, v1y - v0y)
    n0x, n0y = e0y, -e0x
    convex1 = e0x * e1y - e0y * e1x >= 0.0
    offset0 = jnp.where(has0, n0x * (cx - v0x) + n0y * (cy - v0y), 0.0)

    e2x, e2y = norm2(v3x - v2x, v3y - v2y)
    n2x, n2y = e2y, -e2x
    convex2 = e1x * e2y - e1y * e2x > 0.0
    offset2 = jnp.where(has3, n2x * (cx - v2x) + n2y * (cy - v2y), 0.0)

    # front/back classification + normal limits, all 9 cases
    # (b2EPCollider::Collide, b2CollideEdge.cpp:273-429)
    def case(front, lofx, lofy, upfx, upfy, lobx, loby, upbx, upby):
        return (front,
                jnp.where(front, lofx, lobx), jnp.where(front, lofy, loby),
                jnp.where(front, upfx, upbx), jnp.where(front, upfy, upby))

    f_cc = (offset0 >= 0.0) | (offset1 >= 0.0) | (offset2 >= 0.0)
    c_cc = case(f_cc, n0x, n0y, n2x, n2y, -n1x, -n1y, -n1x, -n1y)
    f_c1 = (offset0 >= 0.0) | ((offset1 >= 0.0) & (offset2 >= 0.0))
    c_c1 = case(f_c1, n0x, n0y, n1x, n1y, -n2x, -n2y, -n1x, -n1y)
    f_c2 = (offset2 >= 0.0) | ((offset0 >= 0.0) & (offset1 >= 0.0))
    c_c2 = case(f_c2, n1x, n1y, n2x, n2y, -n1x, -n1y, -n0x, -n0y)
    f_nn = (offset0 >= 0.0) & (offset1 >= 0.0) & (offset2 >= 0.0)
    c_nn = case(f_nn, n1x, n1y, n1x, n1y, -n2x, -n2y, -n0x, -n0y)

    def sel5(c, x, y):
        return tuple(jnp.where(c, xi, yi) for xi, yi in zip(x, y))

    both = sel5(convex1 & convex2, c_cc,
                sel5(convex1, c_c1, sel5(convex2, c_c2, c_nn)))
    f_0c = (offset0 >= 0.0) | (offset1 >= 0.0)
    c_0c = case(f_0c, n0x, n0y, -n1x, -n1y, n1x, n1y, -n1x, -n1y)
    f_0n = (offset0 >= 0.0) & (offset1 >= 0.0)
    c_0n = case(f_0n, n1x, n1y, -n1x, -n1y, n1x, n1y, -n0x, -n0y)
    only0 = sel5(convex1, c_0c, c_0n)
    f_3c = (offset1 >= 0.0) | (offset2 >= 0.0)
    c_3c = case(f_3c, -n1x, -n1y, n2x, n2y, -n1x, -n1y, n1x, n1y)
    f_3n = (offset1 >= 0.0) & (offset2 >= 0.0)
    c_3n = case(f_3n, -n1x, -n1y, n1x, n1y, -n2x, -n2y, n1x, n1y)
    only3 = sel5(convex2, c_3c, c_3n)
    f_iso = offset1 >= 0.0
    iso = case(f_iso, -n1x, -n1y, -n1x, -n1y, n1x, n1y, n1x, n1y)

    front, lolx, loly, upx, upy = sel5(
        has0 & has3, both, sel5(has0, only0, sel5(has3, only3, iso)))
    mnx = jnp.where(front, n1x, -n1x)
    mny = jnp.where(front, n1y, -n1y)

    # polygon B in edge frame
    pvx = xqc * b.vx - xqs * b.vy + xpx               # (8, L)
    pvy = xqs * b.vx + xqc * b.vy + xpy
    pnx = xqc * b.nx - xqs * b.ny
    pny = xqs * b.nx + xqc * b.ny
    radius = a.radius + b.radius

    # ComputeEdgeSeparation (b2CollideEdge.cpp:596-613)
    s_edge = mnx * (pvx - v1x) + mny * (pvy - v1y)
    edge_sep = jnp.min(jnp.where(valid_b, s_edge, BIG), axis=0)

    # ComputePolygonSeparation (b2CollideEdge.cpp:615-663)
    px_, py_ = -mny, mnx                              # perp
    nnx, nny = -pnx, -pny
    s1 = nnx * (pvx - v1x) + nny * (pvy - v1y)
    s2 = nnx * (pvx - v2x) + nny * (pvy - v2y)
    s_poly = jnp.minimum(s1, s2)
    poly_separated = jnp.any(valid_b & (s_poly > radius), axis=0)
    adj_upper = nnx * px_ + nny * py_ >= 0.0
    limx = jnp.where(adj_upper, upx, lolx)
    limy = jnp.where(adj_upper, upy, loly)
    adj_ok = (nnx - limx) * mnx + (nny - limy) * mny >= -settings.ANGULAR_SLOP
    s_poly_m = jnp.where(valid_b & adj_ok, s_poly, -BIG)
    poly_index = jnp.argmax(s_poly_m, axis=0).astype(jnp.int32)
    poly_sep = jnp.max(s_poly_m, axis=0)
    poly_axis_known = jnp.any(valid_b & adj_ok, axis=0)

    separated = (edge_sep > radius) | poly_separated
    use_poly = poly_axis_known & (poly_sep > 0.98 * edge_sep + 0.001)

    # --- primary axis = edgeA branch (face A)
    d_best = jnp.where(valid_b, mnx * pnx + mny * pny, BIG)
    best = jnp.argmin(d_best, axis=0).astype(jnp.int32)
    bi2 = jnp.where(best + 1 < b.count, best + 1, 0)
    ieA0x, ieA0y = _sel8_f(best, pvx), _sel8_f(best, pvy)
    ieA1x, ieA1y = _sel8_f(bi2, pvx), _sel8_f(bi2, pvy)
    ieA_id0 = pack_id(0, best, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX))
    ieA_id1 = pack_id(0, bi2, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX))
    rfA_i1 = jnp.where(front, 0, 1)
    rfA_i2 = jnp.where(front, 1, 0)
    rfA_v1x = jnp.where(front, v1x, v2x)
    rfA_v1y = jnp.where(front, v1y, v2y)
    rfA_v2x = jnp.where(front, v2x, v1x)
    rfA_v2y = jnp.where(front, v2y, v1y)

    # --- primary axis = edgeB branch (face B)
    rfB_i2 = jnp.where(poly_index + 1 < b.count, poly_index + 1, 0)
    ieB_id = pack_id(0, poly_index, jnp.int32(FEAT_VERTEX),
                     jnp.int32(FEAT_FACE))
    rfB_v1x, rfB_v1y = _sel8_f(poly_index, pvx), _sel8_f(poly_index, pvy)
    rfB_v2x, rfB_v2y = _sel8_f(rfB_i2, pvx), _sel8_f(rfB_i2, pvy)
    rfB_nx, rfB_ny = _sel8_f(poly_index, pnx), _sel8_f(poly_index, pny)

    ie0x = jnp.where(use_poly, v1x, ieA0x)
    ie0y = jnp.where(use_poly, v1y, ieA0y)
    ie1x = jnp.where(use_poly, v2x, ieA1x)
    ie1y = jnp.where(use_poly, v2y, ieA1y)
    ie_id0 = jnp.where(use_poly, ieB_id, ieA_id0)
    ie_id1 = jnp.where(use_poly, ieB_id, ieA_id1)
    rf_i1 = jnp.where(use_poly, poly_index, rfA_i1)
    rf_i2 = jnp.where(use_poly, rfB_i2, rfA_i2)
    rf_v1x = jnp.where(use_poly, rfB_v1x, rfA_v1x)
    rf_v1y = jnp.where(use_poly, rfB_v1y, rfA_v1y)
    rf_v2x = jnp.where(use_poly, rfB_v2x, rfA_v2x)
    rf_v2y = jnp.where(use_poly, rfB_v2y, rfA_v2y)
    rf_nx = jnp.where(use_poly, rfB_nx, mnx)
    rf_ny = jnp.where(use_poly, rfB_ny, mny)

    sn1x, sn1y = rf_ny, -rf_nx
    so1 = sn1x * rf_v1x + sn1y * rf_v1y
    so2 = -sn1x * rf_v2x - sn1y * rf_v2y

    c0x, c0y, c1x, c1y, cid0, cid1, np1 = _clip_segment_s(
        ie0x, ie0y, ie1x, ie1y, ie_id0, ie_id1, sn1x, sn1y, so1, rf_i1)
    c0x, c0y, c1x, c1y, cid0, cid1, np2 = _clip_segment_s(
        c0x, c0y, c1x, c1y, cid0, cid1, -sn1x, -sn1y, so2, rf_i2)
    clip_ok = (np1 >= 2) & (np2 >= 2)

    lnx = jnp.where(use_poly, _sel8_f(poly_index, b.nx), rf_nx)
    lny = jnp.where(use_poly, _sel8_f(poly_index, b.ny), rf_ny)
    lpx = jnp.where(use_poly, _sel8_f(poly_index, b.vx), rf_v1x)
    lpy = jnp.where(use_poly, _sel8_f(poly_index, b.vy), rf_v1y)

    sep0 = rf_nx * (c0x - rf_v1x) + rf_ny * (c0y - rf_v1y)
    sep1 = rf_nx * (c1x - rf_v1x) + rf_ny * (c1y - rf_v1y)
    keep0 = sep0 <= radius
    keep1 = sep1 <= radius

    # local points: faceA stores B-frame points, faceB stores edge-frame
    lA0x = xqc * (c0x - xpx) + xqs * (c0y - xpy)
    lA0y = -xqs * (c0x - xpx) + xqc * (c0y - xpy)
    lA1x = xqc * (c1x - xpx) + xqs * (c1y - xpy)
    lA1y = -xqs * (c1x - xpx) + xqc * (c1y - xpy)
    lp0x = jnp.where(use_poly, c0x, lA0x)
    lp0y = jnp.where(use_poly, c0y, lA0y)
    lp1x = jnp.where(use_poly, c1x, lA1x)
    lp1y = jnp.where(use_poly, c1y, lA1y)
    id0 = jnp.where(use_poly, flip_id(cid0), cid0)
    id1 = jnp.where(use_poly, flip_id(cid1), cid1)

    count = keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
    count = jnp.where(separated | ~clip_ok, 0, count)
    return ManifoldLanes(
        mtype=jnp.where(use_poly, settings.MANIFOLD_FACE_B,
                        settings.MANIFOLD_FACE_A).astype(jnp.int32),
        lpx=lpx, lpy=lpy, lnx=lnx, lny=lny,
        p0x=jnp.where(keep0, lp0x, lp1x), p0y=jnp.where(keep0, lp0y, lp1y),
        p1x=lp1x, p1y=lp1y,
        id0=jnp.where(keep0, id0, id1), id1=id1,
        count=count.astype(jnp.int32))


def _polygon_centroid_jax(verts, count):
    """Area centroid of the first `count` rows of an (8,2) vertex array —
    matches b2PolygonShape::ComputeCentroid used for m_centroid."""
    valid = _I8 < count
    vm = jnp.where(valid[:, None], verts, 0.0)
    p_ref = jnp.sum(vm, axis=0) / count.astype(jnp.float32)
    nxt = jnp.where(_I8 + 1 < count, _I8 + 1, 0)
    p1 = verts - p_ref
    p2 = verts[nxt] - p_ref
    d = p1[:, 0] * p2[:, 1] - p1[:, 1] * p2[:, 0]
    tri = jnp.where(valid, 0.5 * d, 0.0)
    area = jnp.sum(tri)
    c = jnp.sum(tri[:, None] / 3.0 * (p1 + p2) * valid[:, None], axis=0)
    return c / jnp.where(area == 0.0, 1.0, area) + p_ref


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

# Contact kind codes (dense dispatch table analog of the reference's
# s_registers, b2Contact.cpp:42-53). Fixture A's shape type always comes
# first in this pairing, replicating registration order.
KIND_CIRCLES = 0
KIND_POLYGON_CIRCLE = 1
KIND_POLYGONS = 2
KIND_EDGE_CIRCLE = 3
KIND_EDGE_POLYGON = 4
KIND_INVALID = 5  # e.g. edge-edge: no contact is created

_COLLIDERS = [
    collide_circles,
    collide_polygon_circle,
    collide_polygons,
    collide_edge_circle,
    collide_edge_polygon,
    lambda a, pA, qA, b, pB, qB: _empty_manifold(),
]

# lane-major batch cores (ShapeLanes in, ManifoldLanes out) for the kinds
# that have one; the dense collide pass uses these, everything else falls
# back to the vmapped single-pair form
_CORE_COLLIDERS = {
    KIND_CIRCLES: collide_circles_core,
    KIND_POLYGON_CIRCLE: collide_polygon_circle_core,
    KIND_POLYGONS: collide_polygons_core,
    KIND_EDGE_POLYGON: collide_edge_polygon_core,
}


def contact_kind(type_a, type_b):
    """Map a (role-ordered) shape-type pair to a collider kind."""
    c, e, p = settings.SHAPE_CIRCLE, settings.SHAPE_EDGE, settings.SHAPE_POLYGON
    kind = jnp.full_like(type_a, KIND_INVALID)
    kind = jnp.where((type_a == c) & (type_b == c), KIND_CIRCLES, kind)
    kind = jnp.where((type_a == p) & (type_b == c), KIND_POLYGON_CIRCLE, kind)
    kind = jnp.where((type_a == p) & (type_b == p), KIND_POLYGONS, kind)
    kind = jnp.where((type_a == e) & (type_b == c), KIND_EDGE_CIRCLE, kind)
    kind = jnp.where((type_a == e) & (type_b == p), KIND_EDGE_POLYGON, kind)
    return kind.astype(jnp.int32)


def needs_swap(type_i, type_j):
    """True when fixture j must take the A role (reference registration
    order: polygon before circle, edge before circle, edge before polygon)."""
    c, e, p = settings.SHAPE_CIRCLE, settings.SHAPE_EDGE, settings.SHAPE_POLYGON
    return (((type_i == c) & (type_j == p))
            | ((type_i == c) & (type_j == e))
            | ((type_i == p) & (type_j == e)))


ALL_KINDS = (KIND_CIRCLES, KIND_POLYGON_CIRCLE, KIND_POLYGONS,
             KIND_EDGE_CIRCLE, KIND_EDGE_POLYGON)


def collide(kind, a: ShapeRows, pA, qA, b: ShapeRows, pB, qB,
            kinds=ALL_KINDS) -> Manifold:
    """Dispatch one pair to its collider (vmap-friendly lax.switch).

    `kinds` is the *static* tuple of contact kinds that can occur — derived
    from the scene's shape-type set (see world.possible_kinds). Under vmap a
    switch evaluates every branch, so restricting to the kinds that exist
    skips entire colliders (a scene of boxes never pays for the EPCollider).
    """
    kinds = tuple(k for k in kinds if k != KIND_INVALID)
    if len(kinds) == 1:
        man = _COLLIDERS[kinds[0]](a, pA, qA, b, pB, qB)
        ok = kind == kinds[0]
        return man._replace(count=jnp.where(ok, man.count, 0))
    branches = [_COLLIDERS[k] for k in kinds]
    branches.append(_COLLIDERS[KIND_INVALID])
    idx = jnp.full_like(kind, len(kinds))
    for bi, k in enumerate(kinds):
        idx = jnp.where(kind == k, bi, idx)
    return jax.lax.switch(idx, branches, a, pA, qA, b, pB, qB)
