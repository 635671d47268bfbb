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

def collide_circles(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    ca, cb = a.verts[0], b.verts[0]
    wa = transform_point(pA, qA, ca)
    wb = transform_point(pB, qB, cb)
    d = wb - wa
    r = a.radius + b.radius
    hit = dot(d, d) <= r * r
    return Manifold(
        mtype=jnp.int32(settings.MANIFOLD_CIRCLES),
        local_point=ca,
        local_normal=jnp.zeros(2, jnp.float32),
        points=jnp.stack([cb, jnp.zeros(2, jnp.float32)]),
        ids=jnp.zeros(2, jnp.int32),
        count=jnp.where(hit, 1, 0).astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# polygon vs circle (b2CollideCircle.cpp:51-154)
# --------------------------------------------------------------------------

def collide_polygon_circle(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    c = transform_point(pB, qB, b.verts[0])
    c_local = transform_t_point(pA, qA, c)
    r = a.radius + b.radius

    valid = _I8 < a.nverts
    s = dot(a.normals, c_local - a.verts)                  # (8,)
    separated = jnp.any(valid & (s > r))
    s_masked = jnp.where(valid, s, -BIG)
    ni = jnp.argmax(s_masked)
    separation = s_masked[ni]

    ni2 = jnp.where(ni + 1 < a.nverts, ni + 1, 0)
    v1 = a.verts[ni]
    v2 = a.verts[ni2]
    face_center = 0.5 * (v1 + v2)

    u1 = dot(c_local - v1, v2 - v1)
    u2 = dot(c_local - v2, v1 - v2)

    inside = separation < EPS
    # Region selections (each with its own reject test).
    n_v1, _ = normalize(c_local - v1)
    n_v2, _ = normalize(c_local - v2)
    reject_v1 = dot(c_local - v1, c_local - v1) > r * r
    reject_v2 = dot(c_local - v2, c_local - v2) > r * r
    s_face = dot(c_local - face_center, a.normals[ni])
    reject_face = s_face > r

    use_v1 = (~inside) & (u1 <= 0.0)
    use_v2 = (~inside) & (~(u1 <= 0.0)) & (u2 <= 0.0)
    use_face = (~inside) & (~(u1 <= 0.0)) & (~(u2 <= 0.0))

    local_normal = jnp.where(
        use_v1, n_v1, jnp.where(use_v2, n_v2, a.normals[ni]))
    local_point = jnp.where(
        use_v1, v1, jnp.where(use_v2, v2, face_center))
    rejected = separated | (use_v1 & reject_v1) | (use_v2 & reject_v2) | (use_face & reject_face)

    return Manifold(
        mtype=jnp.int32(settings.MANIFOLD_FACE_A),
        local_point=local_point,
        local_normal=local_normal,
        points=jnp.stack([b.verts[0], jnp.zeros(2, jnp.float32)]),
        ids=jnp.zeros(2, jnp.int32),
        count=jnp.where(rejected, 0, 1).astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# polygon vs polygon SAT + clipping (b2CollidePolygon.cpp)
# --------------------------------------------------------------------------

def _find_max_separation(verts1, normals1, count1, p1, q1, verts2, count2, p2, q2):
    """b2FindMaxSeparation (b2CollidePolygon.cpp:23-62): max over poly1's
    face normals of the min projection of poly2's vertices."""
    p, q = transform_mul_t(p2, q2, p1, q1)
    n = rot_vec(q, normals1)                  # (8,2) poly1 normals in frame2
    v1 = rot_vec(q, verts1) + p               # (8,2) poly1 verts in frame2
    diff = verts2[None, :, :] - v1[:, None, :]  # (8,8,2)
    sij = n[:, None, 0] * diff[..., 0] + n[:, None, 1] * diff[..., 1]
    sij = jnp.where(_I8[None, :] < count2, sij, BIG)
    si = jnp.min(sij, axis=1)
    si = jnp.where(_I8 < count1, si, -BIG)
    best = jnp.argmax(si)
    return best, si[best]


def _clip_segment_to_line(v, ids, normal, offset, vertex_index_a):
    """b2ClipSegmentToLine (b2Collision.cpp:201-232). Returns exactly two
    candidate output vertices plus the true output count; callers only use
    the outputs when count == 2, matching the reference's `np < 2` bail."""
    d0 = dot(normal, v[0]) - offset
    d1 = dot(normal, v[1]) - offset
    denom = d0 - d1
    interp = d0 / jnp.where(denom == 0.0, 1.0, denom)
    vi = v[0] + interp * (v[1] - v[0])
    idi = pack_id(vertex_index_a, (ids[0] >> 8) & 0xFF,
                  jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_FACE))
    keep0 = d0 <= 0.0
    keep1 = d1 <= 0.0
    both = keep0 & keep1
    out0 = jnp.where(keep0, v[0], v[1])
    id0 = jnp.where(keep0, ids[0], ids[1])
    out1 = jnp.where(both, v[1], vi)
    id1 = jnp.where(both, ids[1], idi)
    n = keep0.astype(jnp.int32) + keep1.astype(jnp.int32) + (d0 * d1 < 0.0).astype(jnp.int32)
    return jnp.stack([out0, out1]), jnp.stack([id0, id1]), n


def collide_polygons(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    total_radius = a.radius + b.radius
    edge_a, sep_a = _find_max_separation(
        a.verts, a.normals, a.nverts, pA, qA, b.verts, b.nverts, pB, qB)
    edge_b, sep_b = _find_max_separation(
        b.verts, b.normals, b.nverts, pB, qB, a.verts, a.nverts, pA, qA)
    separated = (sep_a > total_radius) | (sep_b > total_radius)

    k_tol = 0.1 * settings.LINEAR_SLOP
    flip = sep_b > sep_a + k_tol

    def pick(xb, xa):
        return jnp.where(flip, xb, xa)

    verts1 = pick(b.verts, a.verts)
    normals1 = pick(b.normals, a.normals)
    count1 = pick(b.nverts, a.nverts)
    p1, q1 = pick(pB, pA), pick(qB, qA)
    verts2 = pick(a.verts, b.verts)
    normals2 = pick(a.normals, b.normals)
    count2 = pick(a.nverts, b.nverts)
    p2, q2 = pick(pA, pB), pick(qA, qB)
    edge1 = pick(edge_b, edge_a)

    # b2FindIncidentEdge (b2CollidePolygon.cpp:64-112)
    normal1 = rot_t_vec(q2, rot_vec(q1, normals1[edge1]))
    dots = dot(normal1, normals2)
    dots = jnp.where(_I8 < count2, dots, BIG)
    index = jnp.argmin(dots)
    i1 = index
    i2 = jnp.where(i1 + 1 < count2, i1 + 1, 0)
    inc_v = jnp.stack([
        transform_point(p2, q2, verts2[i1]),
        transform_point(p2, q2, verts2[i2]),
    ])
    inc_ids = jnp.stack([
        pack_id(edge1, i1, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX)),
        pack_id(edge1, i2, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX)),
    ])

    iv1 = edge1
    iv2 = jnp.where(edge1 + 1 < count1, edge1 + 1, 0)
    v11 = verts1[iv1]
    v12 = verts1[iv2]
    local_tangent, _ = normalize(v12 - v11)
    local_normal = jnp.stack([local_tangent[1], -local_tangent[0]])
    plane_point = 0.5 * (v11 + v12)
    tangent = rot_vec(q1, local_tangent)
    normal = jnp.stack([tangent[1], -tangent[0]])
    w11 = transform_point(p1, q1, v11)
    w12 = transform_point(p1, q1, v12)
    front_offset = dot(normal, w11)
    side_offset1 = -dot(tangent, w11) + total_radius
    side_offset2 = dot(tangent, w12) + total_radius

    clip1_v, clip1_ids, np1 = _clip_segment_to_line(inc_v, inc_ids, -tangent, side_offset1, iv1)
    clip2_v, clip2_ids, np2 = _clip_segment_to_line(clip1_v, clip1_ids, tangent, side_offset2, iv2)
    clip_ok = (np1 >= 2) & (np2 >= 2)

    sep0 = dot(normal, clip2_v[0]) - front_offset
    sep1 = dot(normal, clip2_v[1]) - front_offset
    keep0 = sep0 <= total_radius
    keep1 = sep1 <= total_radius

    lp0 = transform_t_point(p2, q2, clip2_v[0])
    lp1 = transform_t_point(p2, q2, clip2_v[1])
    id0 = jnp.where(flip, flip_id(clip2_ids[0]), clip2_ids[0])
    id1 = jnp.where(flip, flip_id(clip2_ids[1]), clip2_ids[1])

    # Pack kept points densely (reference appends at points[pointCount]).
    first_lp = jnp.where(keep0, lp0, lp1)
    first_id = jnp.where(keep0, id0, id1)
    count = (keep0.astype(jnp.int32) + keep1.astype(jnp.int32))
    count = jnp.where(separated | ~clip_ok, 0, count).astype(jnp.int32)

    return Manifold(
        mtype=jnp.where(flip, settings.MANIFOLD_FACE_B, settings.MANIFOLD_FACE_A).astype(jnp.int32),
        local_point=plane_point,
        local_normal=local_normal,
        points=jnp.stack([first_lp, lp1]),
        ids=jnp.stack([first_id, id1]),
        count=count,
    )


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


# --------------------------------------------------------------------------
# edge vs polygon: b2EPCollider (b2CollideEdge.cpp:193-698)
# --------------------------------------------------------------------------

def collide_edge_polygon(a: ShapeRows, pA, qA, b: ShapeRows, pB, qB) -> Manifold:
    # Work in the edge's frame (m_xf = b2MulT(xfA, xfB)).
    xp, xq = transform_mul_t(pA, qA, pB, qB)
    # centroid of polygon B = mean-free: use stored centroid? Rows carry only
    # verts; the true b2 centroid equals the area centroid, but the collider
    # only uses it for front/back classification, and verts-mean differs.
    # We pack the exact centroid as normals[...] is occupied, so recompute the
    # area centroid here from the (<=8) hull — cheap and exact.
    valid = _I8 < b.nverts
    nB = b.nverts
    centroid_local = _polygon_centroid_jax(b.verts, nB)
    centroid = transform_point(xp, xq, centroid_local)

    v0, v1, v2, v3 = a.verts[2], a.verts[0], a.verts[1], a.verts[3]
    has0, has3 = a.ghosts[0], a.ghosts[1]

    edge1, _ = normalize(v2 - v1)
    normal1 = jnp.stack([edge1[1], -edge1[0]])
    offset1 = dot(normal1, centroid - v1)

    edge0, _ = normalize(v1 - v0)
    normal0 = jnp.stack([edge0[1], -edge0[0]])
    convex1 = cross_vv(edge0, edge1) >= 0.0
    offset0 = jnp.where(has0, dot(normal0, centroid - v0), 0.0)

    edge2, _ = normalize(v3 - v2)
    normal2 = jnp.stack([edge2[1], -edge2[0]])
    convex2 = cross_vv(edge1, edge2) > 0.0
    offset2 = jnp.where(has3, dot(normal2, centroid - v2), 0.0)

    # Front/back classification and normal limits
    # (b2EPCollider::Collide, b2CollideEdge.cpp:273-429) — all 9 cases.
    def case(front, lo_f, up_f, lo_b, up_b):
        return front, jnp.where(front, lo_f, lo_b), jnp.where(front, up_f, up_b)

    # both ghosts
    f_cc = (offset0 >= 0.0) | (offset1 >= 0.0) | (offset2 >= 0.0)
    c_cc = case(f_cc, normal0, normal2, -normal1, -normal1)
    f_c1 = (offset0 >= 0.0) | ((offset1 >= 0.0) & (offset2 >= 0.0))
    c_c1 = case(f_c1, normal0, normal1, -normal2, -normal1)
    f_c2 = (offset2 >= 0.0) | ((offset0 >= 0.0) & (offset1 >= 0.0))
    c_c2 = case(f_c2, normal1, normal2, -normal1, -normal0)
    f_nn = (offset0 >= 0.0) & (offset1 >= 0.0) & (offset2 >= 0.0)
    c_nn = case(f_nn, normal1, normal1, -normal2, -normal0)

    def sel3(c, x, y):
        return (jnp.where(c, x[0], y[0]),
                jnp.where(c, x[1], y[1]),
                jnp.where(c, x[2], y[2]))

    both = sel3(convex1 & convex2, c_cc,
                sel3(convex1, c_c1, sel3(convex2, c_c2, c_nn)))

    # only vertex0 ghost
    f_0c = (offset0 >= 0.0) | (offset1 >= 0.0)
    c_0c = case(f_0c, normal0, -normal1, normal1, -normal1)
    f_0n = (offset0 >= 0.0) & (offset1 >= 0.0)
    c_0n = case(f_0n, normal1, -normal1, normal1, -normal0)
    only0 = sel3(convex1, c_0c, c_0n)

    # only vertex3 ghost
    f_3c = (offset1 >= 0.0) | (offset2 >= 0.0)
    c_3c = case(f_3c, -normal1, normal2, -normal1, normal1)
    f_3n = (offset1 >= 0.0) & (offset2 >= 0.0)
    c_3n = case(f_3n, -normal1, normal1, -normal2, normal1)
    only3 = sel3(convex2, c_3c, c_3n)

    # isolated edge
    f_iso = offset1 >= 0.0
    iso = case(f_iso, -normal1, -normal1, normal1, normal1)

    # Precedence matches the reference's if/else-if chain:
    # (has0 && has3) -> has0 -> has3 -> isolated.
    front, lower_limit, upper_limit = sel3(
        has0 & has3, both, sel3(has0, only0, sel3(has3, only3, iso)))
    m_normal = jnp.where(front, normal1, -normal1)

    # Polygon B in frame A
    pverts = rot_vec(xq, b.verts) + xp        # (8,2)
    pnormals = rot_vec(xq, b.normals)         # (8,2)
    radius = a.radius + b.radius

    # ComputeEdgeSeparation (b2CollideEdge.cpp:596-613)
    s_edge_all = dot(m_normal, pverts - v1)
    edge_sep = jnp.min(jnp.where(valid, s_edge_all, BIG))

    # ComputePolygonSeparation (b2CollideEdge.cpp:615-663)
    perp = jnp.stack([-m_normal[1], m_normal[0]])
    n_neg = -pnormals                         # (8,2)
    s1 = dot(n_neg, pverts - v1)
    s2 = dot(n_neg, pverts - v2)
    s_poly = jnp.minimum(s1, s2)
    poly_separated = jnp.any(valid & (s_poly > radius))
    adj_upper = dot(n_neg, perp) >= 0.0
    lim = jnp.where(adj_upper[:, None], upper_limit[None, :], lower_limit[None, :])
    adj_ok = dot(n_neg - lim, m_normal) >= -settings.ANGULAR_SLOP
    s_poly_m = jnp.where(valid & adj_ok, s_poly, -BIG)
    poly_index = jnp.argmax(s_poly_m)
    poly_sep = s_poly_m[poly_index]
    poly_axis_known = jnp.any(valid & adj_ok)

    separated = (edge_sep > radius) | poly_separated

    # Axis choice with hysteresis (b2CollideEdge.cpp:440-457)
    k_rel, k_abs = 0.98, 0.001
    use_poly = poly_axis_known & (poly_sep > k_rel * edge_sep + k_abs)

    # --- primary axis = edgeA branch (face A) ---
    d_best = dot(m_normal, pnormals)
    d_best = jnp.where(valid, d_best, BIG)
    best = jnp.argmin(d_best)
    bi1 = best
    bi2 = jnp.where(bi1 + 1 < nB, bi1 + 1, 0)
    ieA_v = jnp.stack([pverts[bi1], pverts[bi2]])
    ieA_ids = jnp.stack([
        pack_id(0, bi1, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX)),
        pack_id(0, bi2, jnp.int32(FEAT_FACE), jnp.int32(FEAT_VERTEX)),
    ])
    rfA_i1 = jnp.where(front, 0, 1)
    rfA_i2 = jnp.where(front, 1, 0)
    rfA_v1 = jnp.where(front, v1, v2)
    rfA_v2 = jnp.where(front, v2, v1)
    rfA_normal = jnp.where(front, normal1, -normal1)

    # --- primary axis = edgeB branch (face B) ---
    ieB_v = jnp.stack([v1, v2])
    ieB_ids = jnp.stack([
        pack_id(0, poly_index, jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_FACE)),
        pack_id(0, poly_index, jnp.int32(FEAT_VERTEX), jnp.int32(FEAT_FACE)),
    ])
    rfB_i1 = poly_index
    rfB_i2 = jnp.where(rfB_i1 + 1 < nB, rfB_i1 + 1, 0)
    rfB_v1 = pverts[rfB_i1]
    rfB_v2 = pverts[rfB_i2]
    rfB_normal = pnormals[rfB_i1]

    ie_v = jnp.where(use_poly, ieB_v, ieA_v)
    ie_ids = jnp.where(use_poly, ieB_ids, ieA_ids)
    rf_i1 = jnp.where(use_poly, rfB_i1, rfA_i1)
    rf_i2 = jnp.where(use_poly, rfB_i2, rfA_i2)
    rf_v1 = jnp.where(use_poly, rfB_v1, rfA_v1)
    rf_v2 = jnp.where(use_poly, rfB_v2, rfA_v2)
    rf_normal = jnp.where(use_poly, rfB_normal, rfA_normal)

    side_normal1 = jnp.stack([rf_normal[1], -rf_normal[0]])
    side_normal2 = -side_normal1
    side_offset1 = dot(side_normal1, rf_v1)
    side_offset2 = dot(side_normal2, rf_v2)

    clip1_v, clip1_ids, np1 = _clip_segment_to_line(ie_v, ie_ids, side_normal1, side_offset1, rf_i1)
    clip2_v, clip2_ids, np2 = _clip_segment_to_line(clip1_v, clip1_ids, side_normal2, side_offset2, rf_i2)
    clip_ok = (np1 >= 2) & (np2 >= 2)

    local_normal = jnp.where(use_poly, b.normals[rfB_i1], rf_normal)
    local_point = jnp.where(use_poly, b.verts[rfB_i1], rf_v1)

    sep0 = dot(rf_normal, clip2_v[0] - rf_v1)
    sep1 = dot(rf_normal, clip2_v[1] - rf_v1)
    keep0 = sep0 <= radius
    keep1 = sep1 <= radius

    lpA0 = transform_t_point(xp, xq, clip2_v[0])
    lpA1 = transform_t_point(xp, xq, clip2_v[1])
    lp0 = jnp.where(use_poly, clip2_v[0], lpA0)
    lp1 = jnp.where(use_poly, clip2_v[1], lpA1)
    id0 = jnp.where(use_poly, flip_id(clip2_ids[0]), clip2_ids[0])
    id1 = jnp.where(use_poly, flip_id(clip2_ids[1]), clip2_ids[1])

    first_lp = jnp.where(keep0, lp0, lp1)
    first_id = jnp.where(keep0, id0, id1)
    count = keep0.astype(jnp.int32) + keep1.astype(jnp.int32)
    count = jnp.where(separated | ~clip_ok, 0, count).astype(jnp.int32)

    return Manifold(
        mtype=jnp.where(use_poly, settings.MANIFOLD_FACE_B, settings.MANIFOLD_FACE_A).astype(jnp.int32),
        local_point=local_point,
        local_normal=local_normal,
        points=jnp.stack([first_lp, lp1]),
        ids=jnp.stack([first_id, id1]),
        count=count,
    )


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
