"""Narrow-phase manifolds vs reference fixtures (tests/golden/manifolds.jsonl,
dumped from the reference collide kernels over random shape pairs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2d_mt_tpu import math2d, settings
from box2d_mt_tpu.ops import narrowphase as np_ops


def _rows_from_json(shape):
    verts = np.zeros((8, 2), np.float32)
    normals = np.zeros((8, 2), np.float32)
    ghosts = np.zeros(2, bool)
    if shape["type"] == "circle":
        verts[0] = shape["center"]
        nverts = 1
    elif shape["type"] == "polygon":
        vs = np.asarray(shape["verts"], np.float32)
        verts[: len(vs)] = vs
        normals[: len(vs)] = shape["normals"]
        nverts = len(vs)
    else:  # edge
        verts[0] = shape["v1"]
        verts[1] = shape["v2"]
        verts[2] = shape["v0"]
        verts[3] = shape["v3"]
        ghosts[:] = [shape["has0"], shape["has3"]]
        nverts = 2
    return np_ops.ShapeRows(
        verts=jnp.asarray(verts),
        normals=jnp.asarray(normals),
        nverts=jnp.int32(nverts),
        ghosts=jnp.asarray(ghosts),
        radius=jnp.float32(shape["radius"]),
    )


def _xf(t):
    p = jnp.asarray(t[:2], jnp.float32)
    q = math2d.rot_from_angle(jnp.float32(t[2]))
    return p, q


_FNS = [
    np_ops.collide_circles,
    np_ops.collide_polygon_circle,
    np_ops.collide_polygons,
    np_ops.collide_edge_circle,
    np_ops.collide_edge_polygon,
]


@pytest.mark.parametrize("kind", range(5))
def test_manifolds_match_reference(golden_manifolds, kind):
    cases = [c for c in golden_manifolds if c["kind"] == kind]
    assert cases
    fn = jax.jit(jax.vmap(_FNS[kind]))
    rows_a = jax.tree.map(lambda *xs: jnp.stack(xs), *[_rows_from_json(c["a"]) for c in cases])
    rows_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[_rows_from_json(c["b"]) for c in cases])
    pA, qA = jax.vmap(_xf)(jnp.asarray([c["xfa"] for c in cases], jnp.float32))
    pB, qB = jax.vmap(_xf)(jnp.asarray([c["xfb"] for c in cases], jnp.float32))
    m = fn(rows_a, pA, qA, rows_b, pB, qB)

    count_mismatch = 0
    value_mismatch = 0
    for i, c in enumerate(cases):
        ref = c["m"]
        got_count = int(m.count[i])
        if got_count != ref["count"]:
            count_mismatch += 1
            continue
        if ref["count"] == 0:
            continue
        ok = int(m.mtype[i]) == ref["mtype"]
        ok &= np.allclose(np.asarray(m.local_normal[i]), ref["ln"], atol=2e-5)
        ok &= np.allclose(np.asarray(m.local_point[i]), ref["lp"], atol=2e-4)
        for j in range(ref["count"]):
            ok &= np.allclose(np.asarray(m.points[i, j]), ref["pts"][j], atol=2e-4)
            ok &= int(np.uint32(m.ids[i, j])) == ref["ids"][j]
        if not ok:
            value_mismatch += 1
    n = len(cases)
    # Borderline pairs (separation within float noise of the threshold) may
    # legitimately flip; demand near-perfect agreement.
    assert count_mismatch <= max(1, n // 100), f"{count_mismatch}/{n} count mismatches"
    assert value_mismatch <= max(1, n // 100), f"{value_mismatch}/{n} value mismatches"
