"""GJK distance + TOI vs reference fixtures (tests/golden/toi.jsonl)."""

import numpy as np
import jax
import jax.numpy as jnp

from box2d_mt_tpu import math2d
from box2d_mt_tpu.ops import distance as dst

from conftest import load_jsonl


def _proxy(p):
    verts = np.zeros((8, 2), np.float32)
    vs = np.asarray(p["verts"], np.float32)
    verts[: len(vs)] = vs
    return (jnp.asarray(verts), jnp.int32(len(vs)), jnp.float32(p["radius"]))


def _cases():
    rows = load_jsonl("toi.jsonl")
    return rows


def test_gjk_distance_matches_reference():
    rows = _cases()
    va, ca, ra = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["a"]) for r in rows])
    vb, cb, rb = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["b"]) for r in rows])
    sa = np.asarray([r["sweepA"] for r in rows], np.float32)
    sb = np.asarray([r["sweepB"] for r in rows], np.float32)
    pa = jnp.asarray(sa[:, 0:2])
    qa = math2d.rot_from_angle(jnp.asarray(sa[:, 4]))
    pb = jnp.asarray(sb[:, 0:2])
    qb = math2d.rot_from_angle(jnp.asarray(sb[:, 4]))

    fn = jax.jit(jax.vmap(
        lambda va, ca, ra, pa, qa, vb, cb, rb, pb, qb: dst.gjk_distance(
            va, ca, ra, pa, qa, vb, cb, rb, pb, qb)[2]))
    d = np.asarray(fn(va, ca, ra, pa, qa, vb, cb, rb, pb, qb))
    ref = np.asarray([r["dist"] for r in rows])
    bad = np.abs(d - ref) > 1e-4 + 1e-3 * np.abs(ref)
    assert bad.sum() <= max(1, len(rows) // 100), \
        f"{bad.sum()}/{len(rows)} distance mismatches; worst {np.abs(d-ref).max()}"


def test_shape_cast_matches_reference():
    """b2ShapeCast fixtures (tests/golden/shapecast.jsonl): hit flag,
    lambda, and (where hit at positive distance) cast normal."""
    rows = load_jsonl("shapecast.jsonl")
    va, ca, ra = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["a"]) for r in rows])
    vb, cb, rb = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["b"]) for r in rows])
    xfa = np.asarray([r["xfa"] for r in rows], np.float32)
    xfb = np.asarray([r["xfb"] for r in rows], np.float32)
    tr = jnp.asarray([r["tr"] for r in rows], dtype=jnp.float32)
    pa = jnp.asarray(xfa[:, 0:2])
    qa = math2d.rot_from_angle(jnp.asarray(xfa[:, 2]))
    pb = jnp.asarray(xfb[:, 0:2])
    qb = math2d.rot_from_angle(jnp.asarray(xfb[:, 2]))

    fn = jax.jit(jax.vmap(dst.shape_cast))
    hit, point, normal, lam, _ = fn(va, ca, ra, pa, qa, vb, cb, rb, pb, qb, tr)
    hit = np.asarray(hit)
    lam = np.asarray(lam)
    normal = np.asarray(normal)
    ref_hit = np.asarray([r["hit"] for r in rows]) > 0
    ref_lam = np.asarray([r["lambda"] for r in rows])
    ref_n = np.asarray([r["normal"] for r in rows])

    hit_bad = hit != ref_hit
    both = hit & ref_hit & (ref_lam > 0)
    lam_bad = hit & ref_hit & (np.abs(lam - ref_lam) > 5e-3)
    n_bad = both & (np.abs(normal - ref_n).max(axis=1) > 1e-2)
    assert hit_bad.sum() <= max(2, len(rows) // 50), \
        f"{hit_bad.sum()}/{len(rows)} hit mismatches"
    assert lam_bad.sum() <= max(2, int(both.sum()) // 50), \
        f"{lam_bad.sum()} lambda mismatches; worst {np.abs(lam-ref_lam)[hit & ref_hit].max()}"
    assert n_bad.sum() <= max(2, int(both.sum()) // 50), \
        f"{n_bad.sum()} normal mismatches"


def test_toi_matches_reference():
    rows = _cases()
    va, ca, ra = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["a"]) for r in rows])
    vb, cb, rb = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy(r["b"]) for r in rows])
    sa = np.asarray([r["sweepA"] for r in rows], np.float32)
    sb = np.asarray([r["sweepB"] for r in rows], np.float32)
    zc = jnp.zeros((len(rows), 2), jnp.float32)

    fn = jax.jit(jax.vmap(
        lambda va, ca, ra, vb, cb, rb, s_a, s_b: dst.time_of_impact(
            va, ca, ra, zc[0], s_a[0:2], s_a[2:4], s_a[4], s_a[5],
            vb, cb, rb, zc[0], s_b[0:2], s_b[2:4], s_b[4], s_b[5],
            jnp.float32(1.0))))
    state, t = fn(va, ca, ra, vb, cb, rb, jnp.asarray(sa), jnp.asarray(sb))
    state = np.asarray(state)
    t = np.asarray(t)
    ref_state = np.asarray([r["toi_state"] for r in rows])
    ref_t = np.asarray([r["toi_t"] for r in rows])

    state_bad = state != ref_state
    # t must match closely where the reference found touching
    touch = ref_state == 3
    t_bad = touch & (np.abs(t - ref_t) > 5e-3)
    assert state_bad.sum() <= max(2, len(rows) // 50), \
        f"{state_bad.sum()}/{len(rows)} state mismatches"
    assert t_bad.sum() <= max(2, touch.sum() // 50), \
        f"{t_bad.sum()}/{touch.sum()} toi-t mismatches; worst {np.abs(t-ref_t)[touch].max()}"
