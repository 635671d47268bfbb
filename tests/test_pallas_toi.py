"""Pallas TOI kernel vs the XLA implementation on the reference fixtures.

Runs the kernel in interpreter mode (no TPU needed); the driver bench runs
it compiled on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from box2d_mt_tpu.ops import distance as dst
from box2d_mt_tpu.ops import pallas_toi as ptoi

from conftest import load_jsonl


def _proxy(p):
    verts = np.zeros((8, 2), np.float32)
    vs = np.asarray(p["verts"], np.float32)
    verts[: len(vs)] = vs
    return verts, len(vs), float(p["radius"])


def _build_lanes(rows):
    n = len(rows)
    n_pad = ((n + ptoi.LANE_BLOCK - 1) // ptoi.LANE_BLOCK) * ptoi.LANE_BLOCK
    sblob = np.zeros((ptoi.SBLOB_ROWS, n_pad), np.float32)
    vax = np.zeros((8, n_pad), np.float32)
    vay = np.zeros((8, n_pad), np.float32)
    vbx = np.zeros((8, n_pad), np.float32)
    vby = np.zeros((8, n_pad), np.float32)
    R = ptoi._ROWS
    for i, r in enumerate(rows):
        va, ca, ra = _proxy(r["a"])
        vb, cb, rb = _proxy(r["b"])
        vax[:, i], vay[:, i] = va[:, 0], va[:, 1]
        vbx[:, i], vby[:, i] = vb[:, 0], vb[:, 1]
        sa = r["sweepA"]
        sb = r["sweepB"]
        sblob[R["ra"], i] = ra
        sblob[R["rb"], i] = rb
        sblob[R["c0ax"], i], sblob[R["c0ay"], i] = sa[0], sa[1]
        sblob[R["cax"], i], sblob[R["cay"], i] = sa[2], sa[3]
        sblob[R["a0a"], i], sblob[R["aa"], i] = sa[4], sa[5]
        sblob[R["c0bx"], i], sblob[R["c0by"], i] = sb[0], sb[1]
        sblob[R["cbx"], i], sblob[R["cby"], i] = sb[2], sb[3]
        sblob[R["a0b"], i], sblob[R["ab"], i] = sb[4], sb[5]
        sblob[R["cnta"], i] = ca
        sblob[R["cntb"], i] = cb
        sblob[R["tmax"], i] = 1.0
        sblob[R["active"], i] = 1.0
    return (jnp.asarray(sblob), jnp.asarray(vax), jnp.asarray(vay),
            jnp.asarray(vbx), jnp.asarray(vby), n)


def test_pallas_toi_matches_xla():
    rows = load_jsonl("toi.jsonl")
    sblob, vax, vay, vbx, vby, n = _build_lanes(rows)
    state_p, t_p = ptoi.time_of_impact_lanes(sblob, vax, vay, vbx, vby,
                                             interpret=True)
    state_p = np.asarray(state_p)[:n]
    t_p = np.asarray(t_p)[:n]

    # XLA reference implementation on the same lanes
    va, ca, ra = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy_arrays(r["a"]) for r in rows])
    vb, cb, rb = jax.tree.map(lambda *x: jnp.stack(x),
                              *[_proxy_arrays(r["b"]) for r in rows])
    sa = np.asarray([r["sweepA"] for r in rows], np.float32)
    sb = np.asarray([r["sweepB"] for r in rows], np.float32)
    zc = jnp.zeros(2, jnp.float32)
    fn = jax.jit(jax.vmap(
        lambda va, ca, ra, vb, cb, rb, s_a, s_b: dst.time_of_impact(
            va, ca, ra, zc, s_a[0:2], s_a[2:4], s_a[4], s_a[5],
            vb, cb, rb, zc, s_b[0:2], s_b[2:4], s_b[4], s_b[5],
            jnp.float32(1.0))))
    state_x, t_x = fn(va, ca, ra, vb, cb, rb, jnp.asarray(sa),
                      jnp.asarray(sb))
    state_x = np.asarray(state_x)
    t_x = np.asarray(t_x)

    state_bad = state_p != state_x
    touch = state_x == dst.TOI_TOUCHING
    t_bad = touch & (np.abs(t_p - t_x) > 5e-3)
    assert state_bad.sum() <= max(2, n // 50), \
        f"{state_bad.sum()}/{n} state mismatches vs XLA"
    assert t_bad.sum() <= max(2, int(touch.sum()) // 50), \
        f"{t_bad.sum()} t mismatches; worst {np.abs(t_p-t_x)[touch].max()}"


def _proxy_arrays(p):
    verts = np.zeros((8, 2), np.float32)
    vs = np.asarray(p["verts"], np.float32)
    verts[: len(vs)] = vs
    return (jnp.asarray(verts), jnp.int32(len(vs)), jnp.float32(p["radius"]))


def test_pallas_toi_inactive_lanes():
    rows = load_jsonl("toi.jsonl")[:8]
    sblob, vax, vay, vbx, vby, n = _build_lanes(rows)
    sblob = sblob.at[ptoi._ROWS["active"]].set(0.0)
    state_p, t_p = ptoi.time_of_impact_lanes(sblob, vax, vay, vbx, vby,
                                             interpret=True)
    assert np.all(np.asarray(state_p)[:n] == dst.TOI_UNKNOWN)
    assert np.allclose(np.asarray(t_p)[:n], 1.0)
