"""World construction and the fused step program.

`WorldBuilder` mirrors the reference's construction API (b2World::CreateBody,
b2Body::CreateFixture, b2World::CreateJoint — b2World.cpp:549-832) on the
host, then `freeze()` packs everything into the immutable `State` pytree.

`step(state, dt, ...)` is the TPU-native equivalent of b2World::Step
(b2World.cpp:1613-1710): one pure function tracing to a single fused XLA
program — no host round-trips, no callbacks. Phase order preserved:

  1. Collide: narrow-phase manifolds for the persistent pair set, warm-start
     impulse matching by feature id, touch transitions wake bodies
     (b2ContactManager::Collide + b2Contact::Update).
  2. Solve: island labels + awake propagation, velocity integration,
     constraint coloring, warm start, velocity iterations (joints then
     contacts), position NGS, sleep (b2World::Solve + b2Island::Solve).
  3. Synchronize + pair update: swept fat AABBs with move hysteresis, new
     canonical pair table, warm-start carry-over
     (b2ContactManager::SynchronizeFixtures + FindNewContacts).

Events (begin/end touch) come out as arrays, replacing listener callbacks.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import settings, shapes
from .math2d import rot_from_angle, rot_vec
from .state import (Bodies, Contacts, Fixtures, Joints, State,
                    SolverCache, make_empty_cache)
from .joints import make_empty_joints, joints_present, build_joint_arrays
from .ops import broadphase, coloring, distance, islands, integrate
from .ops.gather import gather_rows, gather_scalar, scatter_add, scatter_min_scalar, scatter_max_scalar
from .ops import narrowphase as nph
from .ops import solver as csolver
from .ops import pallas_solve


class Events(NamedTuple):
    """Per-step outputs replacing b2ContactListener callbacks
    (b2WorldCallbacks.h:96-173). The impulse arrays are the PostSolve
    analog (b2WorldCallbacks.h:120-129): applied normal/tangent impulses
    per contact point for this step, indexed like f_a/f_b."""
    begin_touch: jax.Array    # (C,) bool — BeginContact analog
    end_touch: jax.Array      # (C,) bool — EndContact analog
    f_a: jax.Array            # (C,) i32 pair fixtures the masks refer to
    f_b: jax.Array
    pair_overflow: jax.Array  # () i32 — pairs dropped by capacity
    color_overflow: jax.Array  # () i32 — constraints past MAX_COLORS-1
    toi_overflow: jax.Array   # () i32 — TOI candidates past toi_capacity
    normal_impulse: jax.Array   # (C,2) — PostSolve impulses
    tangent_impulse: jax.Array  # (C,2)
    touching: jax.Array         # (C,) bool
    # TOI sub-steps run AFTER the pair-table refresh, so BeginContact
    # events they create index the refreshed table — a different slot
    # basis than begin_touch/f_a/f_b above. They are exported on their own
    # basis (toi_f_a/toi_f_b = the refreshed pair table, identical to
    # new_state.contacts.f_a/f_b) instead of being OR-ed into begin_touch
    # (b2World::StepSolveTOI's Contact::Update BeginContact analog).
    toi_begin: jax.Array      # (C,) bool — on the refreshed slot basis
    toi_f_a: jax.Array        # (C,) i32 refreshed pair fixtures
    toi_f_b: jax.Array


class PreSolveView(NamedTuple):
    """What a `pre_solve_fn` sees, per world — the TPU analog of
    b2ContactListener::PreSolve(contact, oldManifold)
    (b2WorldCallbacks.h:110-118): the fresh manifold for each contact slot
    plus the previous step's manifold.

    Return either a (C,) bool mask (False disables that contact for this
    step's solve — SetEnabled(false), the one-sided-platform idiom,
    Testbed/Tests/OneSidedPlatform.h), or a dict with any of:
      "enabled":      (C,) bool  — as above
      "tangent_speed": (C,) f32  — b2Contact::SetTangentSpeed
                                   (ConveyorBelt.h idiom)
      "friction":     (C,) f32   — b2Contact::SetFriction (-1 = default mix)
      "restitution":  (C,) f32   — b2Contact::SetRestitution (-1 = default)
    Returned arrays are written to the persistent per-contact fields
    (matching the reference, where these setters persist on the contact)."""
    f_a: jax.Array            # (C,) i32
    f_b: jax.Array
    body_a: jax.Array         # (C,) i32
    body_b: jax.Array
    touching: jax.Array       # (C,) bool (this step)
    manifold: object          # ops.narrowphase.Manifold, (C,...) leaves
    old_mtype: jax.Array      # previous manifold (warm-start source)
    old_local_normal: jax.Array
    old_count: jax.Array
    tangent_speed: jax.Array        # (C,) current per-contact values
    friction_override: jax.Array    # (C,) -1 = unset
    restitution_override: jax.Array  # (C,) -1 = unset


# --------------------------------------------------------------------------
# step
# --------------------------------------------------------------------------


def _gather_rows(fx: Fixtures, idx) -> nph.ShapeRows:
    return nph.ShapeRows(
        verts=fx.verts[idx], normals=fx.normals[idx], nverts=fx.nverts[idx],
        ghosts=fx.ghosts[idx], radius=fx.radius[idx])


def _body_xf(bodies: Bodies):
    q = rot_from_angle(bodies.a)
    p = bodies.c - rot_vec(q, bodies.local_center)
    return p, q


class _PreSolve(NamedTuple):
    """Intermediate state between the collide/prepare phase and the solver
    middle phase (which is swappable: XLA color loops or the fused Pallas
    kernel)."""
    contacts: Contacts
    awake: jax.Array
    labels: jax.Array
    non_static: jax.Array
    solve_mask: jax.Array
    c0: jax.Array
    a0: jax.Array
    cc: object
    color: jax.Array
    rank: jax.Array
    color_overflow: jax.Array
    ni_it: jax.Array
    ti_it: jax.Array
    bs: jax.Array
    ba: jax.Array
    bb: jax.Array
    cc_active: jax.Array
    dt_ratio: jax.Array
    begin_touch: jax.Array
    end_touch: jax.Array


def _collide_b(states: State, kinds):
    """Batched narrow phase (b2ContactManager::Collide fan-out analog,
    b2World.cpp:100-118). The first (statically dominant) kind runs dense
    over the whole contact table; every other kind is compacted to its own
    lanes and processed in fixed-size chunks under a while loop sized by the
    actual per-step count — a scene with 10 edge contacts pays for one
    32-lane EPCollider chunk instead of a capacity-wide pass.

    Returns (manifold (W,C,...), sensor, ba, bb)."""
    fx = states.fixtures
    contacts = states.contacts
    bodies = states.bodies
    n_worlds = fx.body.shape[0]
    nf = fx.capacity
    nc = contacts.capacity
    vgather = jax.vmap(gather_rows)

    ia = jnp.clip(contacts.f_a, 0)
    ib = jnp.clip(contacts.f_b, 0)
    pair_exists = contacts.f_a >= 0
    iab = jnp.concatenate([ia, ib], axis=1)             # (W,2C)

    # pack all per-fixture shape data into one blob: ONE gather for the
    # whole narrow phase (TPU gathers dominate otherwise)
    fblob = jnp.concatenate([
        fx.verts.reshape(n_worlds, nf, 16),
        fx.normals.reshape(n_worlds, nf, 16),
        fx.radius[..., None], fx.nverts.astype(jnp.float32)[..., None],
        fx.ghosts.astype(jnp.float32),
        fx.shape_type.astype(jnp.float32)[..., None],
        fx.body.astype(jnp.float32)[..., None],
        fx.is_sensor.astype(jnp.float32)[..., None],
    ], axis=-1)                                         # (W,F,39)
    g = vgather(fblob, iab)                             # (W,2C,39)

    def unpack_rows(r):
        return nph.ShapeRows(
            verts=r[..., 0:16].reshape(-1, 8, 2),
            normals=r[..., 16:32].reshape(-1, 8, 2),
            nverts=r[..., 33].astype(jnp.int32),
            ghosts=r[..., 34:36] > 0.5,
            radius=r[..., 32])

    type_ab = g[..., 36].astype(jnp.int32)
    body_ab = jnp.clip(g[..., 37].astype(jnp.int32), 0)
    ba, bb = body_ab[:, :nc], body_ab[:, nc:]
    sensor = (g[:, :nc, 38] > 0.5) | (g[:, nc:, 38] > 0.5)
    kind = nph.contact_kind(type_ab[:, :nc], type_ab[:, nc:])

    p_all, q_all = jax.vmap(_body_xf)(bodies)
    pq = jnp.concatenate([p_all, q_all], axis=-1)       # (W,N,4)
    pq_ab = vgather(pq, body_ab)                        # (W,2C,4)

    # ---- sensor touch via GJK overlap (b2Contact::Update sensor branch,
    # b2Contact.cpp:193-202; b2TestOverlap, b2Collision.cpp:233-252).
    # Compacted to the actual sensor-pair count and gated on any existing —
    # sensor-free scenes pay one jnp.any.
    smask = sensor & pair_exists
    sck = min(32, nc)

    def sensor_overlap(_):
        sorder = jnp.argsort(jnp.where(smask, 0, 1).astype(jnp.int32),
                             axis=1, stable=True)
        scnt = jnp.sum(smask, axis=1)
        smax = jnp.max(scnt)

        def s_cond(carry):
            return carry[1] * sck < smax

        def s_body(carry):
            touch, c = carry
            idx = jax.lax.dynamic_slice(
                sorder, (jnp.int32(0), c * sck), (n_worlds, sck))
            valid = (c * sck + jnp.arange(sck))[None, :] < scnt[:, None]
            gl = vgather(g, jnp.concatenate([idx, idx + nc], axis=1))
            pql = vgather(pq_ab.reshape(n_worlds, 2 * nc, 4),
                          jnp.concatenate([idx, idx + nc], axis=1))
            flatk = lambda x: x.reshape((n_worlds * sck,) + x.shape[2:])
            ra = unpack_rows(flatk(gl[:, :sck]))
            rb = unpack_rows(flatk(gl[:, sck:]))
            ov = jax.vmap(distance.test_overlap)(
                ra.verts, ra.nverts, ra.radius,
                flatk(pql[:, :sck, 0:2]), flatk(pql[:, :sck, 2:4]),
                rb.verts, rb.nverts, rb.radius,
                flatk(pql[:, sck:, 0:2]), flatk(pql[:, sck:, 2:4]))
            ov = ov.reshape(n_worlds, sck) & valid
            oh = ((idx[:, :, None] == jnp.arange(nc)[None, None, :])
                  & ov[:, :, None])
            return touch | jnp.any(oh, axis=1), c + 1

        touch, _ = jax.lax.while_loop(
            s_cond, s_body,
            (jnp.zeros((n_worlds, nc), bool), jnp.int32(0)))
        return touch

    sensor_touch = jax.lax.cond(
        jnp.any(smask), sensor_overlap,
        lambda _: jnp.zeros((n_worlds, nc), bool), 0)

    # ---- dense pass for the dominant kind. Kinds with a lane-major core
    # run with pair lanes in the 128-wide vector axis (the vmapped rows
    # form puts the tiny 2-vector/8-vertex dims there instead and wastes
    # ~98% of the VPU — measured 20.8 ms vs ~2 ms at 131k lanes).
    primary = kinds[0]
    flat2 = lambda x: x.reshape((n_worlds * nc,) + x.shape[2:])

    def lanes_from_blob(gh, pqh):
        n_ = gh.shape[0] * gh.shape[1]
        g2 = gh.reshape(n_, gh.shape[-1])
        pq2 = pqh.reshape(n_, 4)
        lanes = nph.ShapeLanes(
            vx=g2[:, 0:16:2].T, vy=g2[:, 1:16:2].T,
            nx=g2[:, 16:32:2].T, ny=g2[:, 17:32:2].T,
            count=g2[:, 33].astype(jnp.int32), radius=g2[:, 32],
            g0=g2[:, 34] > 0.5, g1=g2[:, 35] > 0.5)
        return lanes, pq2[:, 0], pq2[:, 1], pq2[:, 2], pq2[:, 3]

    if primary in nph._CORE_COLLIDERS:
        la, pax, pay, qas, qac = lanes_from_blob(g[:, :nc], pq_ab[:, :nc])
        lb, pbx, pby, qbs, qbc = lanes_from_blob(g[:, nc:], pq_ab[:, nc:])
        man_p = nph.lanes_to_manifold(nph._CORE_COLLIDERS[primary](
            la, pax, pay, qas, qac, lb, pbx, pby, qbs, qbc))
    else:
        man_p = jax.vmap(nph._COLLIDERS[primary])(
            unpack_rows(flat2(g[:, :nc])),
            flat2(pq_ab[:, :nc, 0:2]), flat2(pq_ab[:, :nc, 2:4]),
            unpack_rows(flat2(g[:, nc:])),
            flat2(pq_ab[:, nc:, 0:2]), flat2(pq_ab[:, nc:, 2:4]))
    man_p = jax.tree.map(
        lambda x: x.reshape((n_worlds, nc) + x.shape[1:]), man_p)
    is_primary = kind == primary
    manifold = man_p._replace(
        count=jnp.where(is_primary & pair_exists, man_p.count, 0))
    if len(kinds) == 1:
        return manifold, sensor, sensor_touch, ba, bb

    # ---- chunked compacted passes for the remaining kinds
    # manifold accumulator blob:
    # [mtype, lp(2), ln(2), pts(4), count, ids_lo(2), ids_hi(2)] = 14
    acc = jnp.zeros((n_worlds, nc, 14), jnp.float32)
    any_secondary = jnp.zeros((n_worlds, nc), bool)
    ck = max(32, nc // 8)

    for k in kinds[1:]:
        mask = (kind == k) & pair_exists
        order = jnp.argsort(jnp.where(mask, 0, 1).astype(jnp.int32),
                            axis=1, stable=True)        # (W,C) actives first
        cnt = jnp.sum(mask, axis=1)                     # (W,)
        maxc = jnp.max(cnt)
        coll = nph._COLLIDERS[k]

        def chunk_body(carry, k=k, coll=coll, order=order, cnt=cnt):
            acc, any_sec, c = carry
            idx = jax.lax.dynamic_slice(
                order, (jnp.int32(0), c * ck), (n_worlds, ck))  # (W,ck)
            valid = (c * ck + jnp.arange(ck))[None, :] < cnt[:, None]
            gl = vgather(g, jnp.concatenate([idx, idx + nc], axis=1))
            pql = vgather(pq_ab.reshape(n_worlds, 2 * nc, 4),
                          jnp.concatenate([idx, idx + nc], axis=1))
            flatk = lambda x: x.reshape((n_worlds * ck,) + x.shape[2:])
            if k in nph._CORE_COLLIDERS:
                la_, pax_, pay_, qas_, qac_ = lanes_from_blob(
                    gl[:, :ck], pql[:, :ck])
                lb_, pbx_, pby_, qbs_, qbc_ = lanes_from_blob(
                    gl[:, ck:], pql[:, ck:])
                man = nph.lanes_to_manifold(nph._CORE_COLLIDERS[k](
                    la_, pax_, pay_, qas_, qac_, lb_, pbx_, pby_, qbs_,
                    qbc_))
            else:
                man = jax.vmap(coll)(
                    unpack_rows(flatk(gl[:, :ck])),
                    flatk(pql[:, :ck, 0:2]), flatk(pql[:, :ck, 2:4]),
                    unpack_rows(flatk(gl[:, ck:])),
                    flatk(pql[:, ck:, 0:2]), flatk(pql[:, ck:, 2:4]))
            man = jax.tree.map(
                lambda x: x.reshape((n_worlds, ck) + x.shape[1:]), man)
            lane_blob = jnp.concatenate([
                man.mtype.astype(jnp.float32)[..., None],
                man.local_point, man.local_normal,
                man.points.reshape(n_worlds, ck, 4),
                man.count.astype(jnp.float32)[..., None],
                (man.ids & 0xFFFF).astype(jnp.float32),
                ((man.ids >> 16) & 0xFFFF).astype(jnp.float32),
            ], axis=-1) * valid[..., None]              # (W,ck,14)
            # scatter-add into the accumulator (lanes are unique slots)
            oh = ((idx[:, :, None] == jnp.arange(nc)[None, None, :])
                  & valid[:, :, None]).astype(jnp.float32)  # (W,ck,C)
            acc = acc + jnp.einsum(
                "wkc,wkd->wcd", oh, lane_blob,
                precision=jax.lax.Precision.HIGHEST)
            any_sec = any_sec | (jnp.sum(oh, axis=1) > 0.5)
            return (acc, any_sec, c + 1)

        def chunk_cond(carry, maxc=maxc):
            return carry[2] * ck < maxc

        acc, any_secondary, _ = jax.lax.while_loop(
            chunk_cond, lambda c: chunk_body(c),
            (acc, any_secondary, jnp.int32(0)))

    sec_ids = (acc[..., 10:12].astype(jnp.int32)
               | (acc[..., 12:14].astype(jnp.int32) << 16))
    sec = nph.Manifold(
        mtype=acc[..., 0].astype(jnp.int32),
        local_point=acc[..., 1:3], local_normal=acc[..., 3:5],
        points=acc[..., 5:9].reshape(n_worlds, nc, 2, 2),
        ids=sec_ids, count=acc[..., 9].astype(jnp.int32))
    w2 = any_secondary
    manifold = nph.Manifold(
        mtype=jnp.where(w2, sec.mtype, manifold.mtype),
        local_point=jnp.where(w2[..., None], sec.local_point,
                              manifold.local_point),
        local_normal=jnp.where(w2[..., None], sec.local_normal,
                               manifold.local_normal),
        points=jnp.where(w2[..., None, None], sec.points, manifold.points),
        ids=jnp.where(w2[..., None], sec.ids, manifold.ids),
        count=jnp.where(w2, sec.count, manifold.count))
    return manifold, sensor, sensor_touch, ba, bb


class _PreTouch(NamedTuple):
    """Stage-A products of the solve preamble (see _pre_touch)."""
    contacts: Contacts
    awake0: jax.Array         # (N,) pre-island-propagation awake
    non_static: jax.Array     # (N,)
    solvable: jax.Array       # (C,) solvable_contact
    dyn_a: jax.Array          # (C,) conflicting endpoints
    dyn_b: jax.Array
    begin_touch: jax.Array
    end_touch: jax.Array


def _pre_touch(state: State, manifold: nph.Manifold, sensor, sensor_touch,
               enabled, ba, bb) -> _PreTouch:
    """Touch transitions + warm-start id matching + wake hits (the
    b2Contact::Update tail) — everything of the solve preamble that does
    NOT depend on the island labels. The graph passes (islands, coloring)
    are hoisted to _step_active and gated cross-step on graph signatures."""
    bodies = state.bodies
    contacts = state.contacts
    nb = bodies.capacity
    nc = contacts.capacity
    pair_exists = contacts.f_a >= 0

    # sensors report touch via GJK overlap and generate no manifold
    # (b2Contact.cpp:193-205)
    touching = pair_exists & jnp.where(sensor, sensor_touch,
                                       manifold.count > 0)
    m_count = jnp.where(sensor, 0, manifold.count)

    # warm-start impulse matching by feature id (b2Contact.cpp:210-230)
    new_valid = jnp.arange(2)[None, :] < manifold.count[:, None]
    old_valid = jnp.arange(2)[None, :] < contacts.m_count[:, None]
    same = (manifold.ids[:, :, None] == contacts.m_ids[:, None, :]) \
        & new_valid[:, :, None] & old_valid[:, None, :]
    match0 = same[:, :, 0]
    match1 = same[:, :, 1] & ~match0
    ni = jnp.where(match0, contacts.normal_impulse[:, 0:1],
                   jnp.where(match1, contacts.normal_impulse[:, 1:2], 0.0))
    ti = jnp.where(match0, contacts.tangent_impulse[:, 0:1],
                   jnp.where(match1, contacts.tangent_impulse[:, 1:2], 0.0))

    # touch transitions wake both bodies (non-sensor)
    changed = pair_exists & ~sensor & (touching != contacts.touching)
    wake_hits = scatter_max_scalar(
        nb, jnp.where(jnp.concatenate([changed, changed]),
                      jnp.concatenate([ba, bb]), nb),
        jnp.ones(2 * nc, jnp.int32), 0) > 0
    awake0 = bodies.awake | wake_hits
    begin_touch = pair_exists & touching & ~contacts.touching
    end_touch = pair_exists & ~touching & contacts.touching

    contacts = dataclasses.replace(
        contacts,
        m_type=manifold.mtype, m_local_point=manifold.local_point,
        m_local_normal=manifold.local_normal, m_points=manifold.points,
        m_ids=manifold.ids, m_count=m_count,
        normal_impulse=ni, tangent_impulse=ti, touching=touching)

    non_static = bodies.exists & ~bodies.is_static & bodies.enabled
    dyn = bodies.is_dynamic & bodies.enabled
    solvable = touching & ~sensor & pair_exists & enabled
    # conflicting (dynamic) endpoints — one one-hot gather each (native
    # batched gather costs ~25ns/element on TPU)
    dyn_a = gather_scalar(dyn.astype(jnp.float32), ba) > 0.5
    dyn_b = gather_scalar(dyn.astype(jnp.float32), bb) > 0.5

    return _PreTouch(contacts=contacts, awake0=awake0,
                     non_static=non_static, solvable=solvable,
                     dyn_a=dyn_a, dyn_b=dyn_b,
                     begin_touch=begin_touch, end_touch=end_touch)


def _pre_finish(state: State, pt: _PreTouch, labels, awake, cc_active,
                color, rank, color_overflow, dt, warm_starting: bool,
                ba, bb) -> _PreSolve:
    """Stage B of the solve preamble: velocity integration + constraint
    init + warm start, with the (possibly cache-reused) island labels and
    coloring injected."""
    bodies = state.bodies
    contacts = pt.contacts

    solve_mask = awake & pt.non_static
    # sweep start for CCD / broad-phase sweep (b2Island.cpp:203-207)
    c0 = jnp.where(solve_mask[:, None], bodies.c, bodies.c0)
    a0 = jnp.where(solve_mask, bodies.a, bodies.a0)

    v, w = integrate.integrate_velocities(
        dataclasses.replace(bodies, awake=awake), state.gravity, dt,
        solve_mask)

    cc = csolver.init_contact_constraints(
        contacts, state.fixtures, bodies, bodies.c, bodies.a, v, w,
        cc_active)

    dt_ratio = jnp.where(dt > 0, state.inv_dt0 * dt, 0.0)
    # plane-major body velocity state (3, N) [vx; vy; w] — one gather + one
    # scatter per solver pass, with bodies riding the 128-wide lane axis
    bs = jnp.stack([v[:, 0], v[:, 1], w])
    if warm_starting:
        ni_it = dt_ratio * contacts.normal_impulse
        ti_it = dt_ratio * contacts.tangent_impulse
        bs = csolver.warm_start(cc, ni_it, ti_it, bs)
    else:
        ni_it = jnp.zeros_like(contacts.normal_impulse)
        ti_it = jnp.zeros_like(contacts.tangent_impulse)

    return _PreSolve(
        contacts=contacts, awake=awake, labels=labels,
        non_static=pt.non_static, solve_mask=solve_mask, c0=c0, a0=a0,
        cc=cc, color=color, rank=rank, color_overflow=color_overflow,
        ni_it=ni_it, ti_it=ti_it, bs=bs, ba=ba, bb=bb,
        cc_active=cc_active, dt_ratio=dt_ratio,
        begin_touch=pt.begin_touch, end_touch=pt.end_touch)


def _cc_active_of(pt: _PreTouch, labels, ba, bb):
    """Awake propagation + the solvable-and-someone-awake-dynamic mask."""
    awake = islands.propagate_awake(pt.awake0, labels, pt.non_static)
    aw_f = awake.astype(jnp.float32)
    awake_a = gather_scalar(aw_f, ba) > 0.5
    awake_b = gather_scalar(aw_f, bb) > 0.5
    cc_active = pt.solvable & ((pt.dyn_a & awake_a) | (pt.dyn_b & awake_b))
    return awake, cc_active


def _pre_solve(state: State, dt, warm_starting: bool, max_colors: int,
               manifold: nph.Manifold, sensor, sensor_touch, enabled,
               ba, bb) -> _PreSolve:
    """Ungated single-world preamble (tools/profiling entry): stage A +
    islands + coloring + stage B, no cross-step cache."""
    nb = state.bodies.capacity
    pt = _pre_touch(state, manifold, sensor, sensor_touch, enabled, ba, bb)
    jb_a, jb_b, j_active = build_joint_arrays(state.joints)
    if jb_a is not None:
        edges_a = jnp.concatenate([ba, jb_a])
        edges_b = jnp.concatenate([bb, jb_b])
        edges_on = jnp.concatenate([pt.solvable, j_active])
    else:
        edges_a, edges_b, edges_on = ba, bb, pt.solvable
    labels = islands.island_labels(nb, edges_a, edges_b, edges_on,
                                   pt.non_static)
    awake, cc_active = _cc_active_of(pt, labels, ba, bb)
    color, color_overflow, rank = coloring.color_constraints(
        ba, bb, pt.dyn_a, pt.dyn_b, cc_active, nb, max_colors,
        with_rank=True)
    return _pre_finish(state, pt, labels, awake, cc_active, color, rank,
                       color_overflow, dt, warm_starting, ba, bb)


def _solve_middle_b(states: State, pre: _PreSolve, dt,
                    velocity_iterations, position_iterations,
                    warm_starting, max_colors):
    """Velocity/position iteration loops over batched worlds.

    The iteration loops live ABOVE the world batch (not under vmap), so the
    contact color loop can run a *dynamic* trip count — the global maximum
    color actually used — instead of the static max_colors worst case.

    Contacts are compacted into a padded color-major layout (CK lanes per
    color, CK = min(C, N)) so each color pass gathers/solves/scatters CK
    lanes instead of the whole contact table — the compaction removes the
    n_colors× factor from the solver's one-hot traffic (the TPU analog of
    the reference packing islands into fixed-cost b2SolveTasks,
    b2World.cpp:1332-1378). Within a color all scatters are conflict-free
    per world (coloring.py)."""
    bodies = states.bodies
    nb = bodies.capacity
    n_worlds = bodies.body_type.shape[0]
    nc = pre.contacts.capacity
    cc, color = pre.cc, pre.color
    bs = pre.bs                                          # (W, 3, N)
    v = jnp.stack([bs[:, 0], bs[:, 1]], axis=-1)
    w = bs[:, 2]

    have_joints = joints_present(states.joints)
    # fused Pallas middle for big worlds: the XLA chunk loops below cost a
    # fixed dispatch bundle per (iteration x color chunk), which dominates
    # once chunks are many (see ops/pallas_solve.py). Joint-free worlds
    # run the whole middle as ONE kernel; worlds WITH joints run the
    # sandwich (one contact-iteration kernel per launch, XLA joint color
    # passes interleaved in reference island order).
    _min_nb = int(os.environ.get("BOX2D_TPU_PALLAS_SOLVE_MIN_NB", "512"))
    _pallas_on = (_use_pallas_toi()
                  or os.environ.get("BOX2D_TPU_FORCE_PALLAS_SOLVE"))
    use_pallas_mid = not have_joints and nb >= _min_nb and _pallas_on
    use_pallas_hyb = have_joints and nb >= _min_nb and _pallas_on

    # ---- compact constraints into chunk-aligned color-packed lanes. The
    # color and within-color rank come straight out of the coloring rounds,
    # so the permutation is pure arithmetic + one scatter (no sort).
    # Colors pack back to back, each padded to a multiple of the chunk
    # width `ck`; a color larger than ck simply spans several passes
    # (sub-chunks of a conflict-free set stay conflict-free, so Gauss-
    # Seidel semantics are exact and nothing is ever dropped). Pass COUNT
    # dominates cost (each pass is a fixed bundle of small kernels), so ck
    # stays wide: passes ~= number of colors. Capped for huge single
    # worlds where a full-width pass would thrash (giant colors just take
    # several passes). The Pallas middle prefers narrow chunks (pass count
    # is nearly free inside the kernel; padding is not).
    _pk = use_pallas_mid or use_pallas_hyb
    ck = pallas_solve.CK if _pk else min(nc, nb, 2048)
    p_total = nc + max_colors * ck
    if _pk:
        # kernel blocks are CK-wide: round the packed table up to a CK
        # multiple (pad lanes map to the zero dump row -> inactive)
        p_total = -(-p_total // pallas_solve.CK) * pallas_solve.CK
    # within-color rank among ACTIVE lanes, computed here (not taken from
    # the coloring): the coloring runs on the pair-graph superset so its
    # cache survives touch churn, while the packed table stays dense over
    # the lanes actually solved this step
    lane_ok = cc.active & (color >= 0)
    mc_iota = jnp.arange(max_colors)
    col_oh = lane_ok[:, :, None] & (color[:, :, None] == mc_iota)
    col_cnt = jnp.cumsum(col_oh.astype(jnp.int32), axis=1)   # (W, C, MC)
    rank = jnp.sum(jnp.where(col_oh, col_cnt - 1, 0), axis=2)
    sizes = col_cnt[:, -1, :]                                # (W, MC)
    chunks_c = (sizes + ck - 1) // ck
    starts = (jnp.cumsum(chunks_c, axis=1) - chunks_c) * ck  # (W, MC)
    my_start = jnp.sum(jnp.where(col_oh, starts[:, None, :], 0), axis=2)
    dest = jnp.where(lane_ok, my_start + rank, p_total)      # (W, C)
    n_chunks = jnp.max(jnp.sum(chunks_c, axis=1))
    dropped = jnp.zeros((n_worlds,), jnp.int32)

    if use_pallas_mid:
        # slot-order handoff: the kernel builds its own pack/unpack
        # one-hots from `dest` on the MXU, so no host-side permutation
        # (perm-build scatter + take_along_axis gather + unpack gather
        # cost ~31 ms of native DMA at 64x991-body worlds)
        blob_t = jax.vmap(csolver.pack_cc_blob_t)(cc, pre.ni_it, pre.ti_it)
        zeros5 = jnp.zeros((n_worlds, 5, nb), jnp.float32)
        vel_in = jnp.concatenate([bs, zeros5], axis=1)    # (W, 8, N)
        pos_in = jnp.concatenate([
            bodies.c[..., 0][:, None], bodies.c[..., 1][:, None],
            bodies.a[:, None], pre.solve_mask.astype(jnp.float32)[:, None],
            jnp.zeros((n_worlds, 4, nb), jnp.float32)], axis=1)
        velo, poso, auxs = pallas_solve.solve_middle_pallas(
            blob_t, dest, vel_in, pos_in, n_chunks, p_total, dt,
            velocity_iterations, position_iterations,
            interpret=not _use_pallas_toi())
        v = jnp.stack([velo[:, 0], velo[:, 1]], axis=-1)
        w = velo[:, 2]
        c = jnp.stack([poso[:, 0], poso[:, 1]], axis=-1)
        a = poso[:, 2]
        solved = dest < p_total
        ni_it = jnp.where(solved[..., None],
                          jnp.stack([auxs[:, 0], auxs[:, 1]], axis=-1),
                          pre.ni_it)
        ti_it = jnp.where(solved[..., None],
                          jnp.stack([auxs[:, 2], auxs[:, 3]], axis=-1),
                          pre.ti_it)
        min_sep = jnp.where(solved, auxs[:, 4], 0.0)
        jok = jnp.ones((n_worlds, nb), bool)
        return (ni_it, ti_it, c, a, v, w, min_sep, jok,
                states.joints), dropped

    if use_pallas_hyb:
        # sandwich: packed constraint table + impulse planes persist in
        # HBM; one contact-iteration kernel per launch with the XLA joint
        # color passes interleaved in reference island order (joints then
        # contacts per velocity iteration, contacts then joints per
        # position iteration, b2Island.cpp:268-276, 318-335)
        from .joints import (init_joints, warm_start_joints,
                             solve_joint_velocity, solve_joint_position,
                             store_joint_impulses)
        interp = not _use_pallas_toi()
        blob_t = jax.vmap(csolver.pack_cc_blob_t)(cc, pre.ni_it, pre.ti_it)
        pblob, aux = pallas_solve.pack_packed(blob_t, dest, n_chunks,
                                              p_total, interpret=interp)
        jdata, jstate = jax.vmap(
            lambda j, b, aw, vv, ww, dtr: init_joints(
                j, b, aw, vv, ww, dt, dtr, warm_starting, nb, max_colors)
        )(states.joints, bodies, pre.awake, v, w, pre.dt_ratio)
        v, w = jax.vmap(warm_start_joints)(jdata, jstate, v, w)
        zeros5 = jnp.zeros((n_worlds, 5, nb), jnp.float32)

        def to_rows(v, w):
            return jnp.concatenate(
                [jnp.stack([v[..., 0], v[..., 1], w], axis=-2), zeros5],
                axis=1)

        vel = to_rows(v, w)
        for _ in range(velocity_iterations):
            v = jnp.stack([vel[:, 0], vel[:, 1]], axis=-1)
            w = vel[:, 2]
            jstate, v, w = jax.vmap(
                lambda jd, js, vv, ww: solve_joint_velocity(
                    jd, js, vv, ww, dt, max_colors))(jdata, jstate, v, w)
            vel = to_rows(v, w)
            vel, aux = pallas_solve.vel_iter_packed(
                pblob, aux, vel, n_chunks, interpret=interp)
        v = jnp.stack([vel[:, 0], vel[:, 1]], axis=-1)
        w = vel[:, 2]

        c, a, v, w = jax.vmap(
            lambda c_, a_, vv, ww, m_: integrate.integrate_positions(
                c_, a_, vv, ww, dt, m_))(bodies.c, bodies.a, v, w,
                                         pre.solve_mask)
        movable_row = pre.solve_mask.astype(jnp.float32)[:, None]
        zeros4 = jnp.zeros((n_worlds, 4, nb), jnp.float32)

        def pos_rows(c_, a_):
            return jnp.concatenate(
                [c_[..., 0][:, None], c_[..., 1][:, None], a_[:, None],
                 movable_row, zeros4], axis=1)

        pos = pos_rows(c, a)
        jok = jnp.ones((n_worlds, nb), bool)
        for _ in range(position_iterations):
            pos, aux = pallas_solve.pos_iter_packed(
                pblob, aux, pos, n_chunks, interpret=interp)
            c_ = jnp.stack([pos[:, 0], pos[:, 1]], axis=-1)
            a_ = pos[:, 2]
            c_, a_, jok = jax.vmap(
                lambda jd, js, cx, ax: solve_joint_position(
                    jd, js, cx, ax, max_colors))(jdata, jstate, c_, a_)
            pos = pos_rows(c_, a_)
        c = jnp.stack([pos[:, 0], pos[:, 1]], axis=-1)
        a = pos[:, 2]

        auxs = pallas_solve.unpack_packed(aux, dest, n_chunks,
                                          interpret=interp)
        solved = dest < p_total
        ni_it = jnp.where(solved[..., None],
                          jnp.stack([auxs[:, 0], auxs[:, 1]], axis=-1),
                          pre.ni_it)
        ti_it = jnp.where(solved[..., None],
                          jnp.stack([auxs[:, 2], auxs[:, 3]], axis=-1),
                          pre.ti_it)
        min_sep = jnp.where(solved, auxs[:, 4], 0.0)
        joints_new = jax.vmap(store_joint_impulses)(states.joints, jstate)
        return (ni_it, ti_it, c, a, v, w, min_sep, jok,
                joints_new), dropped

    slot_ids = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32),
                                (n_worlds, nc))
    perm = jax.vmap(
        lambda d, s: jnp.full(p_total + 1, nc, jnp.int32).at[d].set(
            jnp.where(d < p_total, s, nc))[:p_total])(dest, slot_ids)
    blob = jax.vmap(csolver.pack_cc_blob)(cc, pre.ni_it, pre.ti_it)
    blob = jnp.concatenate(
        [blob, jnp.zeros((n_worlds, 1, csolver.CC_BLOB_K), blob.dtype)],
        axis=1)                                          # dump row = nc

    # one-hot einsum, not take_along_axis: the native batched gather's DMA
    # pattern costs ~25x more at 4096 worlds (measured 257 ms vs 11 ms)
    perm_oh = (perm[:, :, None] == jnp.arange(nc + 1)[None, None, :]
               ).astype(blob.dtype)
    pblob = jnp.einsum("wpc,wck->wpk", perm_oh, blob,
                       precision=jax.lax.Precision.HIGHEST)  # (W, P, K)
    # impulses evolve across iterations: carry them as one (W, 4, P) plane
    # stack [ni0; ni1; ti0; ti1] — a single dynamic slice/update per chunk
    # pass (per-pass kernel count is the solve loop's cost driver). The
    # constraint blob stays packed and is unpacked per chunk inside the
    # loop bodies so no wide (W, P, k) invariants materialize.
    pimp = jnp.stack([pblob[..., 47], pblob[..., 48],
                      pblob[..., 49], pblob[..., 50]], axis=1)  # (W, 4, P)

    def pack(v, w):
        return jnp.stack([v[..., 0], v[..., 1], w], axis=-2)

    if have_joints:
        from .joints import (init_joints, warm_start_joints,
                             solve_joint_velocity, solve_joint_position,
                             store_joint_impulses)
        jdata, jstate = jax.vmap(
            lambda j, b, aw, vv, ww, dtr: init_joints(
                j, b, aw, vv, ww, dt, dtr, warm_starting, nb, max_colors)
        )(states.joints, bodies, pre.awake, v, w, pre.dt_ratio)
        v, w = jax.vmap(warm_start_joints)(jdata, jstate, v, w)
        bs = pack(v, w)
    else:
        jdata = jstate = None

    ones_ck = jnp.ones((n_worlds, ck), bool)

    def chunk(x, ci):
        return jax.lax.dynamic_slice_in_dim(x, ci * ck, ck, axis=1)

    def unchunk(x, part, ci):
        return jax.lax.dynamic_update_slice_in_dim(x, part, ci * ck, axis=1)

    def contact_vel_colors(imp, bs):
        def cond(carry):
            return carry[0] < n_chunks

        def body(carry):
            ci, (imp, b_) = carry
            ccc, _, _ = csolver.unpack_cc_blob(chunk(pblob, ci))
            impc = jax.lax.dynamic_slice_in_dim(imp, ci * ck, ck, axis=2)
            ni = jnp.stack([impc[:, 0], impc[:, 1]], axis=-1)
            ti = jnp.stack([impc[:, 2], impc[:, 3]], axis=-1)
            nic, tic, b_ = jax.vmap(csolver.solve_velocity_color)(
                ccc, ni, ti, b_, ones_ck)
            impc = jnp.stack([nic[..., 0], nic[..., 1],
                              tic[..., 0], tic[..., 1]], axis=1)
            imp = jax.lax.dynamic_update_slice_in_dim(imp, impc, ci * ck,
                                                      axis=2)
            return ci + 1, (imp, b_)

        _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), (imp, bs)))
        return out

    def vel_iter(_, carry):
        imp, bs, jstate = carry
        if have_joints:
            v = jnp.stack([bs[:, 0], bs[:, 1]], axis=-1)
            w = bs[:, 2]
            jstate, v, w = jax.vmap(
                lambda jd, js, vv, ww: solve_joint_velocity(
                    jd, js, vv, ww, dt, max_colors))(jdata, jstate, v, w)
            bs = pack(v, w)
        imp, bs = contact_vel_colors(imp, bs)
        return imp, bs, jstate

    pimp, bs, jstate = jax.lax.fori_loop(
        0, velocity_iterations, vel_iter, (pimp, bs, jstate))
    v = jnp.stack([bs[:, 0], bs[:, 1]], axis=-1)
    w = bs[:, 2]

    c, a, v, w = jax.vmap(
        lambda c_, a_, vv, ww, m_: integrate.integrate_positions(
            c_, a_, vv, ww, dt, m_))(bodies.c, bodies.a, v, w, pre.solve_mask)

    ps = pack(c, a)                                      # (W, 3, N)

    def contact_pos_colors(ps, min_sep):
        def cond(carry):
            return carry[0] < n_chunks

        def body(carry):
            ci, (p_, ms_) = carry
            ccc, _, _ = csolver.unpack_cc_blob(chunk(pblob, ci))
            p_, ms = jax.vmap(
                lambda cc_, pp_: csolver.solve_position_color(
                    cc_, pp_, None, settings.BAUMGARTE,
                    settings.MAX_LINEAR_CORRECTION))(ccc, p_)
            return ci + 1, (p_, unchunk(ms_, jnp.minimum(chunk(ms_, ci), ms),
                                        ci))

        _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), (ps, min_sep)))
        return out

    def pos_iter(_, carry):
        ps, min_sep, jok = carry
        ps, min_sep = contact_pos_colors(ps, jnp.zeros_like(min_sep))
        if have_joints:
            c_ = jnp.stack([ps[:, 0], ps[:, 1]], axis=-1)
            a_ = ps[:, 2]
            c_, a_, jok = jax.vmap(
                lambda jd, js, cx, ax: solve_joint_position(
                    jd, js, cx, ax, max_colors))(jdata, jstate, c_, a_)
            ps = pack(c_, a_)
        return ps, min_sep, jok

    min_sep0 = jnp.zeros((n_worlds, p_total), jnp.float32)
    jok0 = jnp.ones((n_worlds, nb), bool)
    ps, pmin_sep, jok = jax.lax.fori_loop(
        0, position_iterations, pos_iter, (ps, min_sep0, jok0))
    c = jnp.stack([ps[:, 0], ps[:, 1]], axis=-1)
    a = ps[:, 2]

    # ---- un-compact: impulses + min separation back to contact-slot order.
    # dest and perm are inverse permutations, so the back-transfer one-hot
    # is perm_oh transposed — reuse it instead of materializing a second
    # (W, C, P) one-hot (halves the permutation-matrix traffic).
    out_blob = jnp.stack([pimp[:, 0], pimp[:, 1], pimp[:, 2], pimp[:, 3],
                          pmin_sep], axis=-1)               # (W, P, 5)
    back = jnp.einsum("wpc,wpk->wck", perm_oh[..., :nc], out_blob,
                      precision=jax.lax.Precision.HIGHEST)  # (W, C, 5)
    solved = (dest < p_total)[..., None]
    ni_it = jnp.where(solved, back[..., 0:2], pre.ni_it)
    ti_it = jnp.where(solved, back[..., 2:4], pre.ti_it)
    min_sep = jnp.where(solved[..., 0], back[..., 4], 0.0)

    if have_joints:
        joints_new = jax.vmap(store_joint_impulses)(states.joints, jstate)
    else:
        joints_new = states.joints

    return (ni_it, ti_it, c, a, v, w, min_sep, jok, joints_new), dropped


def _post_sleep_sync(state: State, pre: _PreSolve, dt, allow_sleep,
                     ni_it, ti_it, c, a, v, w, min_sep, jok, joints_new):
    """Per-world: impulse store, sleep, fixture synchronize. Returns the
    intermediate state (without pair refresh) plus the per-fixture `moved`
    mask (the move-buffer analog)."""
    bodies = state.bodies
    nb = bodies.capacity
    contacts = dataclasses.replace(
        pre.contacts, normal_impulse=ni_it, tangent_impulse=ti_it)
    labels, non_static = pre.labels, pre.non_static
    ba, bb, cc_active = pre.ba, pre.bb, pre.cc_active
    awake, c0, a0 = pre.awake, pre.c0, pre.a0

    # per-island convergence for sleep (positionSolved analog)
    contact_ok = min_sep >= -3.0 * settings.LINEAR_SLOP
    ns_a = gather_scalar(non_static.astype(jnp.int32), ba) > 0
    c_label = gather_scalar(labels, jnp.where(ns_a, ba, bb))
    island_ok = scatter_min_scalar(
        nb, jnp.where(cc_active, c_label, nb),
        jnp.where(cc_active, contact_ok, True).astype(jnp.int32), 1) > 0
    island_ok &= scatter_min_scalar(nb, labels, jok.astype(jnp.int32), 1) > 0

    bodies = dataclasses.replace(
        bodies, c=c, a=a, c0=c0, a0=a0, v=v, w=w, awake=awake,
        force=jnp.zeros_like(bodies.force), torque=jnp.zeros_like(bodies.torque))

    new_awake, sleep_time = islands.update_sleep(
        bodies, labels, island_ok, dt, allow_sleep)
    fell_asleep = bodies.awake & ~new_awake
    bodies = dataclasses.replace(
        bodies, awake=new_awake, sleep_time=sleep_time,
        v=jnp.where(fell_asleep[:, None], 0.0, bodies.v),
        w=jnp.where(fell_asleep, 0.0, bodies.w))

    # --------------------------------------- 3. Synchronize (swept fat AABBs)
    p0, q0 = _body_xf(dataclasses.replace(bodies, c=c0, a=a0))
    p1, q1 = _body_xf(bodies)
    fx = state.fixtures
    fb = jnp.clip(fx.body, 0)
    xf_pack = jnp.concatenate([p0, q0, p1, q1], axis=1)   # (N, 8)
    g8 = gather_rows(xf_pack, fb)                         # one one-hot gather
    aabb_lo, aabb_hi, moved = broadphase.synchronize(
        fx, g8[:, 0:2], g8[:, 2:4], g8[:, 4:6], g8[:, 6:8])
    fx = dataclasses.replace(fx, aabb_lo=aabb_lo, aabb_hi=aabb_hi)

    inv_dt0 = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), state.inv_dt0)
    state_mid = dataclasses.replace(state, bodies=bodies, fixtures=fx,
                                    contacts=contacts, joints=joints_new,
                                    inv_dt0=inv_dt0)
    return state_mid, moved


def _post_solve_b(states: State, pre: _PreSolve, dt, allow_sleep, mids,
                  filter_fn=None) -> Tuple[State, Events]:
    """Batched post phase: sleep/sync per world, then a *globally gated*
    pair-table refresh. Fat AABBs only change when a fixture's swept tight
    AABB escapes them (b2DynamicTree::MoveProxy hysteresis), so when no
    fixture in any world moved — and nothing set pairs_dirty — the overlap
    set is provably unchanged and the whole broad-phase recompute is skipped
    (the reference's move-buffer incrementality, b2BroadPhase.h:211-267)."""
    nf = states.fixtures.capacity
    nc = states.contacts.capacity
    n_worlds = states.bodies.body_type.shape[0]

    state_mid, moved = jax.vmap(
        lambda s, p, *m: _post_sleep_sync(s, p, dt, allow_sleep, *m)
    )(states, pre, *mids)

    refresh_needed = jnp.any(moved) | jnp.any(states.pairs_dirty)

    def do_refresh(sm):
        f_a, f_b, overflow = jax.vmap(
            lambda s: broadphase.find_pairs(s, nc, filter_fn))(sm)

        # identity gate: during coherent motion (a pile falling or
        # jiggling in place) the refreshed pair LIST usually equals the
        # old one — then the key-match transfer is the identity and the
        # whole carry-over is skipped for a reduction
        def carry(_):
            return jax.vmap(
                lambda c_, fa, fb: broadphase.carry_over_contacts(
                    c_, fa, fb, nf))(sm.contacts, f_a, f_b)

        def keep_c(_):
            return dataclasses.replace(
                sm.contacts, toi_count=jnp.zeros_like(sm.contacts.toi_count))

        same = jnp.all(f_a == sm.contacts.f_a) \
            & jnp.all(f_b == sm.contacts.f_b)
        contacts = jax.lax.cond(same, keep_c, carry, 0)
        return contacts, overflow.astype(jnp.int32)

    def keep(sm):
        contacts = dataclasses.replace(
            sm.contacts, toi_count=jnp.zeros_like(sm.contacts.toi_count))
        return contacts, jnp.zeros((n_worlds,), jnp.int32)

    contacts, pair_overflow = jax.lax.cond(
        refresh_needed, do_refresh, keep, state_mid)

    new_state = dataclasses.replace(
        state_mid, contacts=contacts,
        pairs_dirty=jnp.zeros((n_worlds,), bool))
    events = Events(
        begin_touch=pre.begin_touch, end_touch=pre.end_touch,
        f_a=states.contacts.f_a, f_b=states.contacts.f_b,
        pair_overflow=pair_overflow,
        color_overflow=pre.color_overflow.astype(jnp.int32),
        toi_overflow=jnp.zeros((n_worlds,), jnp.int32),
        normal_impulse=mids[0], tangent_impulse=mids[1],
        touching=pre.contacts.touching,
        toi_begin=jnp.zeros(contacts.f_a.shape, bool),
        toi_f_a=contacts.f_a, toi_f_b=contacts.f_b)
    return new_state, events




def _use_pallas_toi() -> bool:
    """The TOI advancement runs as a Pallas kernel on TPU backends (its
    nested data-dependent loops cost ~10x more as vmapped XLA dispatches);
    CPU (tests, dryrun) uses the XLA reference implementation."""
    if os.environ.get("BOX2D_TPU_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _solve_toi_b(states: State, dt, velocity_iterations: int,
                 toi_rounds: int, kinds, toi_capacity: int,
                 enabled=None, toi_neighbors: bool = True,
                 pre_solve_fn=None):
    """Continuous physics over batched worlds
    (b2World::SolveTOI, b2World.cpp:1026-1093).

    TPU-native restructuring of the reference's strictly sequential
    min-TOI event loop:

      * **Candidate compaction**: TOI candidates (b2Contact::IsToiCandidate,
        b2Contact.cpp:300-324) are sorted to the front of the contact table
        and only the first `toi_capacity` lanes per world enter the solve —
        the analog of b2_maxTOIContacts (b2Settings.h:95). Overflow is
        counted in Events.toi_overflow.
      * **Parallel disjoint resolution**: each round computes every active
        lane's impact time (conservative advancement over the remaining
        sweep window), then resolves ALL events whose body pairs are
        disjoint in one pass. Per non-static body, the earliest-alpha event
        wins, ties broken by canonical contact slot (ToiLessThan,
        b2Contact.cpp:326-334). Events sharing a body with an earlier event
        wait for the next round. Because resolving a pair moves only its own
        (non-static) bodies, other pairs' impact times are unaffected — the
        round-parallel schedule computes the same resolution sequence the
        reference's one-at-a-time loop would.
      * **Motion gating**: lanes whose relative sweep motion bound is below
        half a linear slop cannot produce a tunneling event and are skipped;
        when nothing anywhere is moving fast the whole phase costs one
        (empty) round.
      * Each resolved pair gets the reference sub-step: advance both bodies
        to alpha, re-evaluate the manifold (restore-and-skip when it comes
        up empty, b2World.cpp:928-940), 20-iteration TOI position solve at
        beta=0.75, velocity solve with no warm start (b2Island::SolveTOI,
        b2Island.cpp:398-530), "leap of faith" sweep reset, then complete
        the remainder of the step. `toi_count` counts real sub-steps against
        MAX_SUB_STEPS (b2_maxSubSteps).

      * **Mini-island expansion** (`toi_neighbors`): each resolved pair
        pulls its TOI bodies' other contacts into the sub-solve as extra
        constraints, with the reference's admission rule — the neighbor
        endpoint must be static, kinematic, or a bullet (b2World.cpp:
        922-928: "Only add static, kinematic, or bullet bodies") — and
        tentative advance-then-keep-if-touching (b2World.cpp:938-961).
        As in b2ContactSolver::SolveTOIPositionConstraints, only the TOI
        pair bodies move in the position pass; neighbor velocity
        constraints transfer impulse into the TOI bodies.

    The velocity pass uses REAL masses on every island body
    (b2Island.cpp:476-483), so dynamic (bullet-admitted) neighbors receive
    impulses, and kept dynamic neighbors are committed like the
    reference's island write-back (tentative sweep advance + remainder
    integration). Remaining deviations (tracked in PARITY.md): a neighbor
    that is itself a selected TOI pair body in the same batched round is
    not re-moved (impossible in the reference's sequential loop); the
    pair table is not refreshed after TOI moves (safe: TOI points lie on
    the sweep path, so pre-TOI swept fat AABBs are a superset).
    """
    from .ops.solver import (position_contact_math_s, velocity_contact_math_s)
    dst = distance

    bodies = states.bodies
    fx = states.fixtures
    contacts = states.contacts
    n_worlds = bodies.body_type.shape[0]
    nb = bodies.capacity
    nc = contacts.capacity
    kcap = min(toi_capacity, nc)

    vgather = jax.vmap(gather_rows)
    vscatter = jax.vmap(scatter_add)
    vgs = jax.vmap(gather_scalar)
    vmin = jax.vmap(scatter_min_scalar, in_axes=(None, 0, 0, None))

    f_a, f_b = contacts.f_a, contacts.f_b          # (W,C)
    ia = jnp.clip(f_a, 0)
    ib = jnp.clip(f_b, 0)
    pair_exists = f_a >= 0

    # ---- candidacy (one fixture-scalar gather + one body-scalar gather)
    fsb = jnp.stack([
        jnp.clip(fx.body, 0).astype(jnp.float32),
        fx.is_sensor.astype(jnp.float32),
        fx.thick_shape.astype(jnp.float32)], axis=-1)   # (W,F,3)
    g = vgather(fsb, jnp.concatenate([ia, ib], axis=1))  # (W,2C,3)
    ba = g[:, :nc, 0].astype(jnp.int32)
    bb = g[:, nc:, 0].astype(jnp.int32)
    sensor = (g[:, :nc, 1] > 0.5) | (g[:, nc:, 1] > 0.5)
    thick = (g[:, :nc, 2] > 0.5) | (g[:, nc:, 2] > 0.5)

    bsb = jnp.stack([bodies.body_type.astype(jnp.float32),
                     bodies.bullet.astype(jnp.float32),
                     bodies.awake.astype(jnp.float32)], axis=-1)  # (W,N,3)
    bg = vgather(bsb, jnp.concatenate([ba, bb], axis=1))  # (W,2C,3)
    type_a = bg[:, :nc, 0].astype(jnp.int32)
    type_b = bg[:, nc:, 0].astype(jnp.int32)
    bul_a = bg[:, :nc, 1] > 0.5
    bul_b = bg[:, nc:, 1] > 0.5
    bullet = bul_a | bul_b
    ns_a_full = type_a != settings.STATIC_BODY
    ns_b_full = type_b != settings.STATIC_BODY
    awake_pair = ((bg[:, :nc, 2] > 0.5) & ns_a_full) | \
                 ((bg[:, nc:, 2] > 0.5) & ns_b_full)
    both_dyn = (type_a == settings.DYNAMIC_BODY) & \
               (type_b == settings.DYNAMIC_BODY)

    # b2Contact::IsToiCandidate + awake gate (b2World.cpp:1534-1541);
    # PreSolve-disabled contacts skip the TOI sub-step (b2World.cpp:871-874)
    cand = pair_exists & ~sensor & (bullet | (~both_dyn & ~thick))
    if enabled is not None:
        cand &= enabled
    active0 = cand & awake_pair                     # (W,C)

    # ---- compaction: actives first, canonical slot order — via cumsum
    # ranks + a dense masked-max select (a stable argsort costs ~5.6 ms
    # at 64x4096 lanes; this costs ~0.5 ms). Ranks past the active count
    # select slot 0; lane_on masks them off below.
    c_rank = jnp.cumsum(active0.astype(jnp.int32), axis=1) - 1
    n_active = jnp.sum(active0, axis=1)             # (W,)
    rr = jnp.arange(kcap)
    slot_iota = jnp.arange(nc, dtype=jnp.int32)
    sel_oh = active0[:, :, None] & (c_rank[:, :, None] == rr[None, None, :])
    sel = jnp.max(jnp.where(sel_oh, slot_iota[None, :, None], 0), axis=1)
    lane_valid = rr[None, :] < n_active[:, None]    # (W,K)
    # one packed one-hot gather for all per-slot lane data (native batched
    # take costs ~25ns/element here)
    slot_blob = jnp.stack([
        active0.astype(jnp.float32), ia.astype(jnp.float32),
        ib.astype(jnp.float32), ba.astype(jnp.float32),
        bb.astype(jnp.float32), type_a.astype(jnp.float32),
        type_b.astype(jnp.float32), contacts.toi_count.astype(jnp.float32),
        contacts.tangent_speed, contacts.friction_override,
        contacts.restitution_override,
    ], axis=-1)                                     # (W,C,11)
    sg = vgather(slot_blob, sel)                    # (W,K,11)
    lane_on = (sg[..., 0] > 0.5) & lane_valid
    toi_overflow = (jnp.sum(active0, axis=1)
                    - jnp.sum(lane_on, axis=1)).astype(jnp.int32)

    # nothing is a TOI candidate anywhere (every free-fall step before
    # first impact, and any step whose candidates the awake/motion
    # masks killed): skip the shape/body gathers and the whole round
    # loop instead of running them fully masked
    def _toi_rounds(_):
        kia = sg[..., 1].astype(jnp.int32)
        kib = sg[..., 2].astype(jnp.int32)
        kba = sg[..., 3].astype(jnp.int32)
        kbb = sg[..., 4].astype(jnp.int32)
        ktype_a = sg[..., 5].astype(jnp.int32)
        ktype_b = sg[..., 6].astype(jnp.int32)
        ns_a = ktype_a != settings.STATIC_BODY          # endpoints moved by resolve
        ns_b = ktype_b != settings.STATIC_BODY
        dyn_a = ktype_a == settings.DYNAMIC_BODY
        dyn_b = ktype_b == settings.DYNAMIC_BODY
        kiab = jnp.concatenate([kia, kib], axis=1)      # (W,2K)
        kbab = jnp.concatenate([kba, kbb], axis=1)

        # ---- per-lane fixture shape data (gathered once per step)
        nf = fx.capacity
        valid8 = jnp.arange(8)[None, None, :] < fx.nverts[..., None]
        vlen = jnp.sqrt(jnp.sum(fx.verts ** 2, axis=-1))
        rmax = jnp.max(jnp.where(valid8, vlen, 0.0), axis=-1) + fx.radius  # (W,F)
        fblob = jnp.concatenate([
            fx.verts.reshape(n_worlds, nf, 16),
            fx.normals.reshape(n_worlds, nf, 16),
            fx.nverts.astype(jnp.float32)[..., None],
            fx.radius[..., None],
            fx.friction[..., None],
            fx.restitution[..., None],
            fx.shape_type.astype(jnp.float32)[..., None],
            rmax[..., None],
            fx.ghosts.astype(jnp.float32)], axis=-1)    # (W,F,40)
        fg = vgather(fblob, kiab)                       # (W,2K,40)

        def unpack_shape(h):
            return dict(
                verts=h[..., 0:16].reshape(n_worlds, kcap, 8, 2),
                normals=h[..., 16:32].reshape(n_worlds, kcap, 8, 2),
                nverts=h[..., 32].astype(jnp.int32),
                radius=h[..., 33],
                friction=h[..., 34],
                restitution=h[..., 35],
                shape_type=h[..., 36].astype(jnp.int32),
                rmax=h[..., 37],
                ghosts=h[..., 38:40] > 0.5)

        sa = unpack_shape(fg[:, :kcap])
        sb = unpack_shape(fg[:, kcap:])
        kind = nph.contact_kind(sa["shape_type"], sb["shape_type"])
        lane_ts = sg[..., 8]
        fric = jnp.sqrt(sa["friction"] * sb["friction"])
        fric = jnp.where(sg[..., 9] >= 0.0, sg[..., 9], fric)
        rest = jnp.maximum(sa["restitution"], sb["restitution"])
        rest = jnp.where(sg[..., 10] >= 0.0, sg[..., 10], rest)

        # ---- per-lane body constants
        bstat = jnp.concatenate([bodies.inv_mass[..., None],
                                 bodies.inv_inertia[..., None],
                                 bodies.local_center], axis=-1)  # (W,N,4)
        bsg = vgather(bstat, kbab)
        mA = jnp.where(dyn_a, bsg[:, :kcap, 0], 0.0)
        iA = jnp.where(dyn_a, bsg[:, :kcap, 1], 0.0)
        lcA = bsg[:, :kcap, 2:4]
        mB = jnp.where(dyn_b, bsg[:, kcap:, 0], 0.0)
        iB = jnp.where(dyn_b, bsg[:, kcap:, 1], 0.0)
        lcB = bsg[:, kcap:, 2:4]

        def flat(x):
            return x.reshape((n_worlds * kcap,) + x.shape[2:])

        def unflat(x):
            return x.reshape((n_worlds, kcap) + x.shape[1:])

        rows_a = nph.ShapeRows(verts=flat(sa["verts"]), normals=flat(sa["normals"]),
                               nverts=flat(sa["nverts"]), ghosts=flat(sa["ghosts"]),
                               radius=flat(sa["radius"]))
        rows_b = nph.ShapeRows(verts=flat(sb["verts"]), normals=flat(sb["normals"]),
                               nverts=flat(sb["nverts"]), ghosts=flat(sb["ghosts"]),
                               radius=flat(sb["radius"]))

        # packed per-body dynamic state:
        # [cx, cy, a, c0x, c0y, a0, alpha0, vx, vy, w, awake]
        body_pack0 = jnp.concatenate([
            bodies.c, bodies.a[..., None], bodies.c0, bodies.a0[..., None],
            jnp.zeros((n_worlds, nb, 1), jnp.float32),
            bodies.v, bodies.w[..., None],
            bodies.awake.astype(jnp.float32)[..., None]], axis=-1)  # (W,N,11)
        lane_tc0 = sg[..., 7]

        def round_body(carry):
            bp, lane_tc, lane_touch, ntouch, k, _ = carry
            bgd = vgather(bp, kbab)                     # (W,2K,11)
            cA, aA = bgd[:, :kcap, 0:2], bgd[:, :kcap, 2]
            c0A, a0A = bgd[:, :kcap, 3:5], bgd[:, :kcap, 5]
            al0A = bgd[:, :kcap, 6]
            vA, wA = bgd[:, :kcap, 7:9], bgd[:, :kcap, 9]
            awA = bgd[:, :kcap, 10] > 0.5
            cB, aB = bgd[:, kcap:, 0:2], bgd[:, kcap:, 2]
            c0B, a0B = bgd[:, kcap:, 3:5], bgd[:, kcap:, 5]
            al0B = bgd[:, kcap:, 6]
            vB, wB = bgd[:, kcap:, 7:9], bgd[:, kcap:, 9]
            awB = bgd[:, kcap:, 10] > 0.5

            blocked = lane_tc >= settings.MAX_SUB_STEPS
            al0 = jnp.maximum(al0A, al0B)

            # sync both sweeps to the later alpha0 (b2TimeOfImpact preamble)
            def sync(c0x, cx, a0x, ax, alpha0x):
                beta = (al0 - alpha0x) / jnp.where(alpha0x < 1.0,
                                                   1.0 - alpha0x, 1.0)
                return (c0x + beta[..., None] * (cx - c0x),
                        a0x + beta * (ax - a0x))

            c0As, a0As = sync(c0A, cA, a0A, aA, al0A)
            c0Bs, a0Bs = sync(c0B, cB, a0B, aB, al0B)

            # conservative relative-motion bound over the remaining window: a
            # pair moving less than half a slop cannot tunnel this step
            dmov = (cA - c0As) - (cB - c0Bs)
            mb = (jnp.sqrt(jnp.sum(dmov ** 2, axis=-1))
                  + jnp.abs(aA - a0As) * sa["rmax"]
                  + jnp.abs(aB - a0Bs) * sb["rmax"])
            awake_now = (awA & ns_a) | (awB & ns_b)
            run = (lane_on & ~blocked & awake_now & (al0 < 1.0)
                   & (mb > 0.5 * settings.LINEAR_SLOP))

            if _use_pallas_toi():
                from .ops import pallas_toi as ptoi
                n_lanes = n_worlds * kcap
                pad = (-n_lanes) % ptoi.LANE_BLOCK
                r = ptoi._ROWS

                def fl(x):
                    return jnp.pad(flat(x), (0, pad))

                rows = [jnp.zeros(n_lanes + pad, jnp.float32)] * ptoi.SBLOB_ROWS
                for name, val in (
                        ("ra", rows_a.radius), ("rb", rows_b.radius)):
                    rows[r[name]] = jnp.pad(val, (0, pad))
                for name, val in (
                        ("lcax", lcA[..., 0]), ("lcay", lcA[..., 1]),
                        ("lcbx", lcB[..., 0]), ("lcby", lcB[..., 1]),
                        ("c0ax", c0As[..., 0]), ("c0ay", c0As[..., 1]),
                        ("cax", cA[..., 0]), ("cay", cA[..., 1]),
                        ("a0a", a0As), ("aa", aA),
                        ("c0bx", c0Bs[..., 0]), ("c0by", c0Bs[..., 1]),
                        ("cbx", cB[..., 0]), ("cby", cB[..., 1]),
                        ("a0b", a0Bs), ("ab", aB)):
                    rows[r[name]] = fl(val)
                rows[r["cnta"]] = jnp.pad(rows_a.nverts.astype(jnp.float32),
                                          (0, pad))
                rows[r["cntb"]] = jnp.pad(rows_b.nverts.astype(jnp.float32),
                                          (0, pad))
                rows[r["tmax"]] = jnp.pad(
                    jnp.ones(n_lanes, jnp.float32), (0, pad))
                rows[r["active"]] = fl(run.astype(jnp.float32))
                sblob = jnp.stack(rows)
                padv = lambda v: jnp.pad(v.T, ((0, 0), (0, pad)))
                tstate, t = ptoi.time_of_impact_lanes(
                    sblob, padv(rows_a.verts[..., 0]), padv(rows_a.verts[..., 1]),
                    padv(rows_b.verts[..., 0]), padv(rows_b.verts[..., 1]))
                tstate = tstate[:n_lanes]
                t = t[:n_lanes]
            else:
                tstate, t = jax.vmap(dst.time_of_impact)(
                    rows_a.verts, rows_a.nverts, rows_a.radius,
                    flat(lcA), flat(c0As), flat(cA), flat(a0As), flat(aA),
                    rows_b.verts, rows_b.nverts, rows_b.radius,
                    flat(lcB), flat(c0Bs), flat(cB), flat(a0Bs), flat(aB),
                    jnp.ones(n_worlds * kcap, jnp.float32), flat(run))
            tstate = unflat(tstate)
            t = unflat(t)
            alpha = jnp.where(tstate == dst.TOI_TOUCHING,
                              jnp.minimum(al0 + (1.0 - al0) * t, 1.0), 1.0)
            alpha = jnp.where(run, alpha, jnp.inf)
            has_ev = alpha < 1.0 - 10.0 * 1.1920929e-7

            # ---- disjoint selection: per non-static body, earliest alpha wins;
            # ties broken by canonical contact slot (ToiLessThan analog)
            eidx = jnp.concatenate([jnp.where(ns_a & has_ev, kba, nb),
                                    jnp.where(ns_b & has_ev, kbb, nb)], axis=1)
            av = jnp.where(has_ev, alpha, jnp.inf)
            amin = vmin(nb + 1, eidx, jnp.concatenate([av, av], axis=1), jnp.inf)
            win1 = has_ev & (~ns_a | (alpha <= vgs(amin, kba))) \
                & (~ns_b | (alpha <= vgs(amin, kbb)))
            selp = sel.astype(jnp.float32)
            sv = jnp.where(win1, selp, jnp.inf)
            eidx2 = jnp.concatenate([jnp.where(ns_a & win1, kba, nb),
                                     jnp.where(ns_b & win1, kbb, nb)], axis=1)
            smin = vmin(nb + 1, eidx2, jnp.concatenate([sv, sv], axis=1), jnp.inf)
            selwin = win1 & (~ns_a | (selp == vgs(smin, kba))) \
                & (~ns_b | (selp == vgs(smin, kbb)))
            again = jnp.any(selwin)
            alpha_s = jnp.where(selwin, alpha, 1.0)

            lane_tc = lane_tc + selwin.astype(jnp.float32)

            # no event selected anywhere (the common case once a scene
            # settles): skip the whole sub-step body — manifold re-eval,
            # neighbor expansion, 20 NGS iterations, velocity solve — 
            # instead of running it as masked no-ops (~20-30 ms at
            # 64x991-body worlds)
            def _substep(op):
                bp, ntouch = op
                # ---- advance both bodies of each selected pair to its alpha
                def advance(c0x, cx, a0x, ax, alpha0x):
                    beta = (alpha_s - alpha0x) / jnp.where(alpha0x < 1.0,
                                                           1.0 - alpha0x, 1.0)
                    return (c0x + beta[..., None] * (cx - c0x),
                            a0x + beta * (ax - a0x))

                cAn, aAn = advance(c0A, cA, a0A, aA, al0A)
                cBn, aBn = advance(c0B, cB, a0B, aB, al0B)

                # ---- re-evaluate the manifold at the advanced transforms
                qA1 = rot_from_angle(aAn)
                pA1 = cAn - rot_vec(qA1, lcA)
                qB1 = rot_from_angle(aBn)
                pB1 = cBn - rot_vec(qB1, lcB)
                man = jax.vmap(lambda *ar: nph.collide(*ar, kinds=kinds))(
                    flat(kind), rows_a, flat(pA1), flat(qA1),
                    rows_b, flat(pB1), flat(qB1))
                man = jax.tree.map(unflat, man)
                hit = man.count > 0
                if pre_solve_fn is not None:
                    # the reference re-runs Contact::Update -> PreSolve at every
                    # TOI sub-step (b2World.cpp:871-874); a contact the hook
                    # disables at the TOI configuration consumes the event
                    # without a sub-step, exactly like an empty manifold
                    def _bc(m, v):
                        return m.reshape(m.shape + (1,) * (v.ndim - m.ndim))

                    def lane_to_slot(cur, lane_val):
                        cur_l = jax.vmap(lambda c_, i: c_[i])(cur, sel)
                        v = jnp.where(_bc(selwin, lane_val), lane_val, cur_l)
                        return jax.vmap(lambda c_, i, vv: c_.at[i].set(vv))(
                            cur, sel, v)

                    man_slot = nph.Manifold(
                        mtype=lane_to_slot(contacts.m_type, man.mtype),
                        local_point=lane_to_slot(contacts.m_local_point,
                                                 man.local_point),
                        local_normal=lane_to_slot(contacts.m_local_normal,
                                                  man.local_normal),
                        points=lane_to_slot(contacts.m_points, man.points),
                        ids=lane_to_slot(contacts.m_ids, man.ids),
                        count=lane_to_slot(contacts.m_count, man.count))
                    view = PreSolveView(
                        f_a=f_a, f_b=f_b, body_a=ba, body_b=bb,
                        touching=lane_to_slot(contacts.touching, hit),
                        manifold=man_slot,
                        old_mtype=contacts.m_type,
                        old_local_normal=contacts.m_local_normal,
                        old_count=contacts.m_count,
                        tangent_speed=contacts.tangent_speed,
                        friction_override=contacts.friction_override,
                        restitution_override=contacts.restitution_override)
                    ho = jax.vmap(pre_solve_fn)(states, view)
                    en_slot = ho.get("enabled", None) if isinstance(ho, dict) \
                        else ho
                    if en_slot is not None:
                        hit &= jax.vmap(lambda e, i: e[i])(en_slot, sel)
                # no manifold at the TOI (or PreSolve-disabled): restore (skip all
                # writes) and mark the pair consumed (b2World.cpp:928-940)
                solve = selwin & hit

                if toi_neighbors:
                    # ---- mini-island expansion (b2World.cpp:895-985): pull the
                    # TOI bodies' other contacts in as extra constraints. Admission
                    # follows the reference exactly: the neighbor endpoint must be
                    # static/kinematic, or a bullet is involved.
                    NK = kcap
                    lane_f = jnp.broadcast_to(
                        jnp.arange(kcap, dtype=jnp.float32)[None, :],
                        (n_worlds, kcap))
                    ends_on = jnp.concatenate([ns_a & solve, ns_b & solve], axis=1)
                    # body -> owning lane (resolved pairs are body-disjoint)
                    body_lane = vmin(
                        nb + 1, jnp.where(ends_on, kbab, nb),
                        jnp.concatenate([lane_f, lane_f], axis=1),
                        jnp.inf)[:, :nb]
                    is_toi_body = body_lane < jnp.inf
                    tb_a = vgs(is_toi_body, ba)
                    tb_b = vgs(is_toi_body, bb)
                    dyn_at = type_a == settings.DYNAMIC_BODY
                    dyn_bt = type_b == settings.DYNAMIC_BODY
                    adm_a = tb_a & (~dyn_bt | bul_a | bul_b)
                    adm_b = tb_b & (~dyn_at | bul_a | bul_b)
                    sel_slot = vscatter(
                        jnp.zeros((n_worlds, nc, 1), jnp.float32), sel,
                        selwin.astype(jnp.float32)[..., None])[..., 0] > 0.5
                    nbm = pair_exists & ~sensor & (adm_a | adm_b) & ~sel_slot
                    if enabled is not None:
                        nbm &= enabled
                    parent_f = jnp.where(adm_a, vgs(body_lane, ba),
                                         vgs(body_lane, bb))
                    norder = jnp.argsort(jnp.where(nbm, 0, 1).astype(jnp.int32),
                                         axis=1, stable=True)
                    nsel = norder[:, :NK]                   # (W,NK) contact slots
                    nblob = jnp.stack([
                        nbm.astype(jnp.float32), ia.astype(jnp.float32),
                        ib.astype(jnp.float32), ba.astype(jnp.float32),
                        bb.astype(jnp.float32), adm_a.astype(jnp.float32),
                        jnp.where(jnp.isfinite(parent_f), parent_f, 0.0),
                        contacts.tangent_speed, contacts.friction_override,
                        contacts.restitution_override,
                        type_a.astype(jnp.float32), type_b.astype(jnp.float32),
                    ], axis=-1)                             # (W,C,12)
                    ng = vgather(nblob, nsel)               # (W,NK,12)
                    nl_on = ng[..., 0] > 0.5
                    nia = ng[..., 1].astype(jnp.int32)
                    nib = ng[..., 2].astype(jnp.int32)
                    nba_ = ng[..., 3].astype(jnp.int32)
                    nbb_ = ng[..., 4].astype(jnp.int32)
                    n_toi_a = ng[..., 5] > 0.5              # TOI body is endpoint A
                    nparent = jnp.clip(ng[..., 6], 0, kcap - 1).astype(jnp.int32)
                    n_ts = ng[..., 7]
                    n_dyn_a = ng[..., 10] == settings.DYNAMIC_BODY
                    n_dyn_b = ng[..., 11] == settings.DYNAMIC_BODY

                    nfg = vgather(fblob, jnp.concatenate([nia, nib], axis=1))
                    sna = unpack_shape(nfg[:, :NK])
                    snb = unpack_shape(nfg[:, NK:])
                    nkind = nph.contact_kind(sna["shape_type"], snb["shape_type"])
                    nfric = jnp.sqrt(sna["friction"] * snb["friction"])
                    nfric = jnp.where(ng[..., 8] >= 0.0, ng[..., 8], nfric)
                    nrest = jnp.maximum(sna["restitution"], snb["restitution"])
                    nrest = jnp.where(ng[..., 9] >= 0.0, ng[..., 9], nrest)

                    nbsg = vgather(bstat, jnp.concatenate([nba_, nbb_], axis=1))
                    # position pass: only the TOI body moves (exact —
                    # SolveTOIPositionConstraints zeroes every island body's mass
                    # except toiIndexA/B, b2ContactSolver.cpp:780-806)
                    n_mA = jnp.where(n_toi_a & n_dyn_a, nbsg[:, :NK, 0], 0.0)
                    n_iA = jnp.where(n_toi_a & n_dyn_a, nbsg[:, :NK, 1], 0.0)
                    n_lcA = nbsg[:, :NK, 2:4]
                    n_mB = jnp.where(~n_toi_a & n_dyn_b, nbsg[:, NK:, 0], 0.0)
                    n_iB = jnp.where(~n_toi_a & n_dyn_b, nbsg[:, NK:, 1], 0.0)
                    n_lcB = nbsg[:, NK:, 2:4]
                    # velocity pass: every island body keeps its real inverse mass
                    # (b2Island.cpp:476-483 runs the plain velocity solver over the
                    # mini island, so dynamic neighbors receive impulses too)
                    nv_mA = jnp.where(n_dyn_a, nbsg[:, :NK, 0], 0.0)
                    nv_iA = jnp.where(n_dyn_a, nbsg[:, :NK, 1], 0.0)
                    nv_mB = jnp.where(n_dyn_b, nbsg[:, NK:, 0], 0.0)
                    nv_iB = jnp.where(n_dyn_b, nbsg[:, NK:, 1], 0.0)
                    o_dyn = jnp.where(n_toi_a, n_dyn_b, n_dyn_a)

                    # tentative advance of the neighbor endpoint to the parent's
                    # alpha (b2Body::Advance; kept only for manifold evaluation —
                    # static endpoints are unaffected, c0 == c)
                    n_alpha = vgs(alpha_s, nparent)
                    other_body = jnp.where(n_toi_a, nbb_, nba_)
                    og = vgather(bp, other_body)            # (W,NK,11)
                    o_al0 = og[..., 6]
                    beta_o = (n_alpha - o_al0) / jnp.where(o_al0 < 1.0,
                                                           1.0 - o_al0, 1.0)
                    o_ce = og[..., 3:5] + beta_o[..., None] * (og[..., 0:2]
                                                               - og[..., 3:5])
                    o_ae = og[..., 5] + beta_o * (og[..., 2] - og[..., 5])
                    o_v = og[..., 7:9]
                    o_w = og[..., 9]

                    # TOI-side evaluation pose: the parent lane's advanced pose
                    adv_pose = jnp.concatenate([cAn, aAn[..., None],
                                                cBn, aBn[..., None]], axis=-1)
                    gl0 = vgather(adv_pose, nparent)        # (W,NK,6)
                    toi_body = jnp.where(n_toi_a, nba_, nbb_)
                    side_a = toi_body == vgs(kba, nparent)  # parent's A endpoint?
                    tpos0 = jnp.where(side_a[..., None], gl0[..., 0:3],
                                      gl0[..., 3:6])
                    neA_c = jnp.where(n_toi_a[..., None], tpos0[..., 0:2], o_ce)
                    neA_a = jnp.where(n_toi_a, tpos0[..., 2], o_ae)
                    neB_c = jnp.where(n_toi_a[..., None], o_ce, tpos0[..., 0:2])
                    neB_a = jnp.where(n_toi_a, o_ae, tpos0[..., 2])
                    nqA1 = rot_from_angle(neA_a)
                    npA1 = neA_c - rot_vec(nqA1, n_lcA)
                    nqB1 = rot_from_angle(neB_a)
                    npB1 = neB_c - rot_vec(nqB1, n_lcB)
                    nrows_a = nph.ShapeRows(
                        verts=flat(sna["verts"]), normals=flat(sna["normals"]),
                        nverts=flat(sna["nverts"]), ghosts=flat(sna["ghosts"]),
                        radius=flat(sna["radius"]))
                    nrows_b = nph.ShapeRows(
                        verts=flat(snb["verts"]), normals=flat(snb["normals"]),
                        nverts=flat(snb["nverts"]), ghosts=flat(snb["ghosts"]),
                        radius=flat(snb["radius"]))
                    nman = jax.vmap(lambda *ar: nph.collide(*ar, kinds=kinds))(
                        flat(nkind), nrows_a, flat(npA1), flat(nqA1),
                        nrows_b, flat(npB1), flat(nqB1))
                    nman = jax.tree.map(unflat, nman)
                    # keep-if-touching (b2World.cpp:955-961); empty-manifold pairs
                    # are dropped without side effects
                    n_keep = nl_on & (nman.count > 0) & vgs(solve, nparent)
                    ncnt = vscatter(
                        jnp.zeros((n_worlds, kcap, 1), jnp.float32), nparent,
                        n_keep.astype(jnp.float32)[..., None])[..., 0]
                    # sequential-application rank: the reference's island solver
                    # runs mini-island contacts one at a time, so kept neighbors
                    # of one parent lane apply their corrections sequentially in
                    # slot order — rank r applies after rank r-1 sees its update.
                    # Within a rank every parent has at most one neighbor, so the
                    # scatters stay conflict-free and exact.
                    lane_iota = jnp.broadcast_to(
                        jnp.arange(NK, dtype=jnp.int32)[None, :], (n_worlds, NK))
                    seq_key = jnp.where(n_keep, nparent * NK + lane_iota,
                                        jnp.iinfo(jnp.int32).max)
                    seq_sorted = jnp.sort(seq_key, axis=1)
                    vss = jax.vmap(jnp.searchsorted)
                    n_rank = (vss(seq_sorted, seq_key)
                              - vss(seq_sorted, nparent * NK)).astype(jnp.int32)
                    n_maxrank = jnp.max(ncnt).astype(jnp.int32)
                    nmpx = (nman.points[..., 0, 0], nman.points[..., 1, 0])
                    nmpy = (nman.points[..., 0, 1], nman.points[..., 1, 1])

                # ---- TOI position sub-solve: 20 iterations, beta = 0.75
                mpx = (man.points[..., 0, 0], man.points[..., 1, 0])
                mpy = (man.points[..., 0, 1], man.points[..., 1, 1])

                def pos_pass(_, pc):
                    cax, cay, aa_, cbx, cby, ab_ = pc
                    cax, cay, aa_, cbx, cby, ab_, _ = position_contact_math_s(
                        man.mtype, man.count, mA, mB, iA, iB,
                        sa["radius"], sb["radius"],
                        lcA[..., 0], lcA[..., 1], lcB[..., 0], lcB[..., 1],
                        man.local_point[..., 0], man.local_point[..., 1],
                        man.local_normal[..., 0], man.local_normal[..., 1],
                        mpx, mpy, cax, cay, aa_, cbx, cby, ab_, solve,
                        settings.TOI_BAUMGARTE, settings.MAX_LINEAR_CORRECTION)
                    if toi_neighbors:
                        # neighbor constraints against the live TOI-body position,
                        # applied sequentially by rank (neighbor endpoint immobile
                        # — zero mass in the position pass)
                        lane_pos = jnp.stack([cax, cay, aa_, cbx, cby, ab_],
                                             axis=-1)

                        def seq_pos(carry):
                            r, lane_pos = carry
                            act_r = n_keep & (n_rank == r)
                            gl = vgather(lane_pos, nparent)
                            tp = jnp.where(side_a[..., None], gl[..., 0:3],
                                           gl[..., 3:6])
                            pcax = jnp.where(n_toi_a, tp[..., 0], o_ce[..., 0])
                            pcay = jnp.where(n_toi_a, tp[..., 1], o_ce[..., 1])
                            paa = jnp.where(n_toi_a, tp[..., 2], o_ae)
                            pcbx = jnp.where(n_toi_a, o_ce[..., 0], tp[..., 0])
                            pcby = jnp.where(n_toi_a, o_ce[..., 1], tp[..., 1])
                            pab = jnp.where(n_toi_a, o_ae, tp[..., 2])
                            ncax, ncay, naa, ncbx, ncby, nab, _ = \
                                position_contact_math_s(
                                    nman.mtype, nman.count, n_mA, n_mB, n_iA, n_iB,
                                    sna["radius"], snb["radius"],
                                    n_lcA[..., 0], n_lcA[..., 1],
                                    n_lcB[..., 0], n_lcB[..., 1],
                                    nman.local_point[..., 0],
                                    nman.local_point[..., 1],
                                    nman.local_normal[..., 0],
                                    nman.local_normal[..., 1],
                                    nmpx, nmpy, pcax, pcay, paa, pcbx, pcby, pab,
                                    act_r, settings.TOI_BAUMGARTE,
                                    settings.MAX_LINEAR_CORRECTION)
                            dx = jnp.where(n_toi_a, ncax - pcax, ncbx - pcbx)
                            dy = jnp.where(n_toi_a, ncay - pcay, ncby - pcby)
                            da = jnp.where(n_toi_a, naa - paa, nab - pab)
                            z3 = jnp.zeros_like(dx)
                            d6 = jnp.where(
                                side_a[..., None],
                                jnp.stack([dx, dy, da, z3, z3, z3], axis=-1),
                                jnp.stack([z3, z3, z3, dx, dy, da], axis=-1))
                            return r + 1, vscatter(lane_pos, nparent, d6)

                        _, lane_pos = jax.lax.while_loop(
                            lambda c: c[0] < n_maxrank, seq_pos,
                            (jnp.int32(0), lane_pos))
                        cax, cay, aa_ = (lane_pos[..., 0], lane_pos[..., 1],
                                         lane_pos[..., 2])
                        cbx, cby, ab_ = (lane_pos[..., 3], lane_pos[..., 4],
                                         lane_pos[..., 5])
                    return cax, cay, aa_, cbx, cby, ab_

                cax, cay, aa_, cbx, cby, ab_ = jax.lax.fori_loop(
                    0, 20, pos_pass,
                    (cAn[..., 0], cAn[..., 1], aAn, cBn[..., 0], cBn[..., 1], aBn))

                # ---- velocity sub-solve (no warm start) at the solved configuration
                qA2 = rot_from_angle(aa_)
                cA2 = jnp.stack([cax, cay], axis=-1)
                pA2 = cA2 - rot_vec(qA2, lcA)
                qB2 = rot_from_angle(ab_)
                cB2 = jnp.stack([cbx, cby], axis=-1)
                pB2 = cB2 - rot_vec(qB2, lcB)
                normal, pts, _ = jax.vmap(csolver.world_manifold)(
                    flat(man.mtype), flat(man.local_point), flat(man.local_normal),
                    flat(man.points), flat(man.count), flat(pA2), flat(qA2),
                    rows_a.radius, flat(pB2), flat(qB2), rows_b.radius)
                normal = unflat(normal)
                pts = unflat(pts)

                r_a = pts - cA2[:, :, None, :]              # (W,K,2,2)
                r_b = pts - cB2[:, :, None, :]
                nx, ny = normal[..., 0], normal[..., 1]
                rn_a = r_a[..., 0] * ny[..., None] - r_a[..., 1] * nx[..., None]
                rn_b = r_b[..., 0] * ny[..., None] - r_b[..., 1] * nx[..., None]
                k_n = (mA + mB)[..., None] + iA[..., None] * rn_a ** 2 \
                    + iB[..., None] * rn_b ** 2
                nm = jnp.where(k_n > 0.0, 1.0 / jnp.where(k_n > 0.0, k_n, 1.0), 0.0)
                tx, ty = ny, -nx
                rt_a = r_a[..., 0] * ty[..., None] - r_a[..., 1] * tx[..., None]
                rt_b = r_b[..., 0] * ty[..., None] - r_b[..., 1] * tx[..., None]
                k_t = (mA + mB)[..., None] + iA[..., None] * rt_a ** 2 \
                    + iB[..., None] * rt_b ** 2
                tm = jnp.where(k_t > 0.0, 1.0 / jnp.where(k_t > 0.0, k_t, 1.0), 0.0)
                dvx = (vB[..., 0:1] - wB[..., None] * r_b[..., 1]
                       - vA[..., 0:1] + wA[..., None] * r_a[..., 1])
                dvy = (vB[..., 1:2] + wB[..., None] * r_b[..., 0]
                       - vA[..., 1:2] - wA[..., None] * r_a[..., 0])
                v_rel = dvx * nx[..., None] + dvy * ny[..., None]
                bias = jnp.where(v_rel < -settings.VELOCITY_THRESHOLD,
                                 -rest[..., None] * v_rel, 0.0)
                k11 = k_n[..., 0]
                k22 = k_n[..., 1]
                k12 = mA + mB + iA * rn_a[..., 0] * rn_a[..., 1] \
                    + iB * rn_b[..., 0] * rn_b[..., 1]
                det = k11 * k22 - k12 * k12
                well = k11 * k11 < 1000.0 * det
                pc2 = jnp.where((man.count == 2) & ~well, 1, man.count)
                inv_det = jnp.where(det != 0.0,
                                    1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)

                if toi_neighbors:
                    # ---- neighbor velocity-constraint prep at the position-solved
                    # TOI-body pose (island velocity pass, b2Island.cpp:474-483)
                    # with REAL masses on both endpoints — dynamic neighbors
                    # receive impulses and are committed below, as the reference's
                    # mini island does
                    lane_pos_f = jnp.stack([cax, cay, aa_, cbx, cby, ab_], axis=-1)
                    glf = vgather(lane_pos_f, nparent)
                    tpf = jnp.where(side_a[..., None], glf[..., 0:3],
                                    glf[..., 3:6])
                    nfA_c = jnp.where(n_toi_a[..., None], tpf[..., 0:2], o_ce)
                    nfA_a = jnp.where(n_toi_a, tpf[..., 2], o_ae)
                    nfB_c = jnp.where(n_toi_a[..., None], o_ce, tpf[..., 0:2])
                    nfB_a = jnp.where(n_toi_a, o_ae, tpf[..., 2])
                    nqA2 = rot_from_angle(nfA_a)
                    npA2 = nfA_c - rot_vec(nqA2, n_lcA)
                    nqB2 = rot_from_angle(nfB_a)
                    npB2 = nfB_c - rot_vec(nqB2, n_lcB)
                    nnormal, npts, _ = jax.vmap(csolver.world_manifold)(
                        flat(nman.mtype), flat(nman.local_point),
                        flat(nman.local_normal), flat(nman.points),
                        flat(nman.count), flat(npA2), flat(nqA2), nrows_a.radius,
                        flat(npB2), flat(nqB2), nrows_b.radius)
                    nnormal = unflat(nnormal)
                    npts = unflat(npts)
                    n_r_a = npts - nfA_c[:, :, None, :]
                    n_r_b = npts - nfB_c[:, :, None, :]
                    nnx, nny = nnormal[..., 0], nnormal[..., 1]
                    nrn_a = (n_r_a[..., 0] * nny[..., None]
                             - n_r_a[..., 1] * nnx[..., None])
                    nrn_b = (n_r_b[..., 0] * nny[..., None]
                             - n_r_b[..., 1] * nnx[..., None])
                    nk_n = ((nv_mA + nv_mB)[..., None]
                            + nv_iA[..., None] * nrn_a ** 2
                            + nv_iB[..., None] * nrn_b ** 2)
                    nnm = jnp.where(nk_n > 0.0,
                                    1.0 / jnp.where(nk_n > 0.0, nk_n, 1.0), 0.0)
                    ntx, nty = nny, -nnx
                    nrt_a = (n_r_a[..., 0] * nty[..., None]
                             - n_r_a[..., 1] * ntx[..., None])
                    nrt_b = (n_r_b[..., 0] * nty[..., None]
                             - n_r_b[..., 1] * ntx[..., None])
                    nk_t = ((nv_mA + nv_mB)[..., None]
                            + nv_iA[..., None] * nrt_a ** 2
                            + nv_iB[..., None] * nrt_b ** 2)
                    ntm = jnp.where(nk_t > 0.0,
                                    1.0 / jnp.where(nk_t > 0.0, nk_t, 1.0), 0.0)
                    lane_vel0 = jnp.stack([vA[..., 0], vA[..., 1], wA,
                                           vB[..., 0], vB[..., 1], wB], axis=-1)
                    gv0 = vgather(lane_vel0, nparent)
                    tv0 = jnp.where(side_a[..., None], gv0[..., 0:3],
                                    gv0[..., 3:6])
                    nvA0 = jnp.where(n_toi_a[..., None], tv0[..., 0:2], o_v)
                    nwA0 = jnp.where(n_toi_a, tv0[..., 2], o_w)
                    nvB0 = jnp.where(n_toi_a[..., None], o_v, tv0[..., 0:2])
                    nwB0 = jnp.where(n_toi_a, o_w, tv0[..., 2])
                    ndvx = (nvB0[..., 0:1] - nwB0[..., None] * n_r_b[..., 1]
                            - nvA0[..., 0:1] + nwA0[..., None] * n_r_a[..., 1])
                    ndvy = (nvB0[..., 1:2] + nwB0[..., None] * n_r_b[..., 0]
                            - nvA0[..., 1:2] - nwA0[..., None] * n_r_a[..., 0])
                    nv_rel = ndvx * nnx[..., None] + ndvy * nny[..., None]
                    nbias = jnp.where(nv_rel < -settings.VELOCITY_THRESHOLD,
                                      -nrest[..., None] * nv_rel, 0.0)
                    nk11 = nk_n[..., 0]
                    nk22 = nk_n[..., 1]
                    nk12 = (nv_mA + nv_mB + nv_iA * nrn_a[..., 0] * nrn_a[..., 1]
                            + nv_iB * nrn_b[..., 0] * nrn_b[..., 1])
                    ndet = nk11 * nk22 - nk12 * nk12
                    nwell = nk11 * nk11 < 1000.0 * ndet
                    npc2 = jnp.where((nman.count == 2) & ~nwell, 1, nman.count)
                    ninv_det = jnp.where(ndet != 0.0,
                                         1.0 / jnp.where(ndet != 0.0, ndet, 1.0),
                                         0.0)

                def vel_pass(_, vc):
                    if toi_neighbors:
                        (ni0, ni1, ti0, ti1, vax, vay, wa_, vbx, vby, wb_,
                         nn0, nn1, nt0, nt1, ovx, ovy, ow) = vc
                    else:
                        ni0, ni1, ti0, ti1, vax, vay, wa_, vbx, vby, wb_ = vc
                    (ni0, ni1), (ti0, ti1), vax, vay, wa_, vbx, vby, wb_ = \
                        velocity_contact_math_s(
                            fric, lane_ts, mA, mB, iA, iB, nx, ny,
                            (r_a[..., 0, 0], r_a[..., 1, 0]),
                            (r_a[..., 0, 1], r_a[..., 1, 1]),
                            (r_b[..., 0, 0], r_b[..., 1, 0]),
                            (r_b[..., 0, 1], r_b[..., 1, 1]),
                            (nm[..., 0], nm[..., 1]), (tm[..., 0], tm[..., 1]),
                            (bias[..., 0], bias[..., 1]),
                            k11, k12, k22, inv_det * k22, -inv_det * k12,
                            inv_det * k11, pc2,
                            (ni0, ni1), (ti0, ti1),
                            vax, vay, wa_, vbx, vby, wb_, solve)
                    if not toi_neighbors:
                        return ni0, ni1, ti0, ti1, vax, vay, wa_, vbx, vby, wb_
                    # neighbor impulses against the live TOI-body velocity,
                    # applied sequentially by rank; the other endpoint carries
                    # its own live velocity copy and receives impulses too
                    lane_vel = jnp.stack([vax, vay, wa_, vbx, vby, wb_], axis=-1)

                    def seq_vel(carry):
                        r, lane_vel, nn0, nn1, nt0, nt1, ovx, ovy, ow = carry
                        act_r = n_keep & (n_rank == r)
                        gv = vgather(lane_vel, nparent)
                        tv = jnp.where(side_a[..., None], gv[..., 0:3],
                                       gv[..., 3:6])
                        nvax = jnp.where(n_toi_a, tv[..., 0], ovx)
                        nvay = jnp.where(n_toi_a, tv[..., 1], ovy)
                        nwa = jnp.where(n_toi_a, tv[..., 2], ow)
                        nvbx = jnp.where(n_toi_a, ovx, tv[..., 0])
                        nvby = jnp.where(n_toi_a, ovy, tv[..., 1])
                        nwb = jnp.where(n_toi_a, ow, tv[..., 2])
                        (nn0, nn1), (nt0, nt1), nvax2, nvay2, nwa2, nvbx2, \
                            nvby2, nwb2 = velocity_contact_math_s(
                                nfric, n_ts, nv_mA, nv_mB, nv_iA, nv_iB, nnx, nny,
                                (n_r_a[..., 0, 0], n_r_a[..., 1, 0]),
                                (n_r_a[..., 0, 1], n_r_a[..., 1, 1]),
                                (n_r_b[..., 0, 0], n_r_b[..., 1, 0]),
                                (n_r_b[..., 0, 1], n_r_b[..., 1, 1]),
                                (nnm[..., 0], nnm[..., 1]),
                                (ntm[..., 0], ntm[..., 1]),
                                (nbias[..., 0], nbias[..., 1]),
                                nk11, nk12, nk22, ninv_det * nk22,
                                -ninv_det * nk12, ninv_det * nk11, npc2,
                                (nn0, nn1), (nt0, nt1),
                                nvax, nvay, nwa, nvbx, nvby, nwb, act_r)
                        dvx_ = jnp.where(n_toi_a, nvax2 - nvax, nvbx2 - nvbx)
                        dvy_ = jnp.where(n_toi_a, nvay2 - nvay, nvby2 - nvby)
                        dw_ = jnp.where(n_toi_a, nwa2 - nwa, nwb2 - nwb)
                        z3 = jnp.zeros_like(dvx_)
                        d6 = jnp.where(
                            side_a[..., None],
                            jnp.stack([dvx_, dvy_, dw_, z3, z3, z3], axis=-1),
                            jnp.stack([z3, z3, z3, dvx_, dvy_, dw_], axis=-1))
                        lane_vel = vscatter(lane_vel, nparent, d6)
                        ovx = jnp.where(act_r & n_toi_a, nvbx2, ovx)
                        ovx = jnp.where(act_r & ~n_toi_a, nvax2, ovx)
                        ovy = jnp.where(act_r & n_toi_a, nvby2, ovy)
                        ovy = jnp.where(act_r & ~n_toi_a, nvay2, ovy)
                        ow = jnp.where(act_r & n_toi_a, nwb2, ow)
                        ow = jnp.where(act_r & ~n_toi_a, nwa2, ow)
                        return r + 1, lane_vel, nn0, nn1, nt0, nt1, ovx, ovy, ow

                    (_, lane_vel, nn0, nn1, nt0, nt1, ovx, ovy, ow) = \
                        jax.lax.while_loop(
                            lambda c: c[0] < n_maxrank, seq_vel,
                            (jnp.int32(0), lane_vel, nn0, nn1, nt0, nt1,
                             ovx, ovy, ow))
                    return (ni0, ni1, ti0, ti1,
                            lane_vel[..., 0], lane_vel[..., 1], lane_vel[..., 2],
                            lane_vel[..., 3], lane_vel[..., 4], lane_vel[..., 5],
                            nn0, nn1, nt0, nt1, ovx, ovy, ow)

                z = jnp.zeros_like(fric)
                vinit = (z, z, z, z, vA[..., 0], vA[..., 1], wA,
                         vB[..., 0], vB[..., 1], wB)
                if toi_neighbors:
                    zn = jnp.zeros_like(nfric)
                    vinit = vinit + (zn, zn, zn, zn,
                                     o_v[..., 0], o_v[..., 1], o_w)
                vout = jax.lax.fori_loop(0, velocity_iterations, vel_pass, vinit)
                vax, vay, wa_, vbx, vby, wb_ = vout[4:10]

                # ---- complete the remainder of the step for the pair
                h = (1.0 - jnp.where(selwin, alpha_s, 1.0)) * dt

                def integrate_lane(cx, cy, a_, vx, vy, w_, movable, h=h):
                    t2 = h * h * (vx ** 2 + vy ** 2)
                    rat = jnp.where(
                        t2 > settings.MAX_TRANSLATION_SQUARED,
                        settings.MAX_TRANSLATION / jnp.sqrt(jnp.maximum(t2, 1e-30)),
                        1.0)
                    vx = vx * rat
                    vy = vy * rat
                    rot = h * w_
                    ratr = jnp.where(
                        rot * rot > settings.MAX_ROTATION_SQUARED,
                        settings.MAX_ROTATION
                        / jnp.abs(jnp.where(rot == 0.0, 1.0, rot)), 1.0)
                    w_ = w_ * ratr
                    return (jnp.where(movable, cx + h * vx, cx),
                            jnp.where(movable, cy + h * vy, cy),
                            jnp.where(movable, a_ + h * w_, a_), vx, vy, w_)

                cAfx, cAfy, aAf, vax, vay, wa_ = integrate_lane(
                    cax, cay, aa_, vax, vay, wa_, ns_a)
                cBfx, cBfy, aBf, vbx, vby, wb_ = integrate_lane(
                    cbx, cby, ab_, vbx, vby, wb_, ns_b)

                # ---- one packed scatter of body deltas (selected pairs are
                # body-disjoint, so add == set)
                def mk_delta(on, cfx, cfy, af, c0fx, c0fy, a0f, vfx, vfy, wf,
                             c_o, a_o, c0_o, a0_o, al0_o, v_o, w_o, aw_o):
                    onf = on.astype(jnp.float32)[..., None]
                    d = jnp.stack([
                        cfx - c_o[..., 0], cfy - c_o[..., 1], af - a_o,
                        c0fx - c0_o[..., 0], c0fy - c0_o[..., 1], a0f - a0_o,
                        alpha_s - al0_o,
                        vfx - v_o[..., 0], vfy - v_o[..., 1], wf - w_o,
                        (~aw_o).astype(jnp.float32)], axis=-1)
                    return d * onf

                # leap of faith: sweep restarts at the position-solved configuration
                dA = mk_delta(solve & ns_a, cAfx, cAfy, aAf, cax, cay, aa_,
                              vax, vay, wa_, cA, aA, c0A, a0A, al0A, vA, wA, awA)
                dB = mk_delta(solve & ns_b, cBfx, cBfy, aBf, cbx, cby, ab_,
                              vbx, vby, wb_, cB, aB, c0B, a0B, al0B, vB, wB, awB)
                bp = vscatter(bp, kbab, jnp.concatenate([dA, dB], axis=1))
                if toi_neighbors:
                    # kept neighbor contacts become touching (their Contact::Update
                    # found a manifold — b2World.cpp:955-967)
                    ntouch = ntouch | (vscatter(
                        jnp.zeros((n_worlds, nc, 1), jnp.float32), nsel,
                        n_keep.astype(jnp.float32)[..., None])[..., 0] > 0.5)
                    # ---- commit kept dynamic neighbors (b2Island.cpp:489-523
                    # integrates and writes back EVERY island body): sweep keeps
                    # the tentative advance (no leap of faith for neighbors,
                    # b2Island.cpp:468-474 touches only toiIndexA/B), velocity
                    # from the island solve, position integrated by the remainder.
                    # A body that is itself a selected TOI body this round is
                    # excluded (its own pair's write wins; the reference's island
                    # flag makes this case impossible in its sequential loop).
                    ovx_f, ovy_f, ow_f = vout[14], vout[15], vout[16]
                    nh = vgs(h, nparent)
                    commit = n_keep & o_dyn & ~vgs(is_toi_body, other_body)
                    o_cfx, o_cfy, o_af, ovx_f, ovy_f, ow_f = integrate_lane(
                        o_ce[..., 0], o_ce[..., 1], o_ae, ovx_f, ovy_f, ow_f,
                        commit, h=nh)
                    # positions commit once per body (first kept slot); velocity
                    # deltas accumulate across slots (Jacobi sum of the impulses
                    # the reference applies sequentially)
                    slot_f = jnp.broadcast_to(
                        jnp.arange(NK, dtype=jnp.float32)[None, :], (n_worlds, NK))
                    min_slot = vmin(nb + 1, jnp.where(commit, other_body, nb),
                                    slot_f, jnp.inf)
                    primary = commit & (slot_f == vgs(min_slot, other_body))
                    pf = primary.astype(jnp.float32)
                    cf = commit.astype(jnp.float32)
                    d_pos = jnp.stack([
                        o_cfx - og[..., 0], o_cfy - og[..., 1], o_af - og[..., 2],
                        o_ce[..., 0] - og[..., 3], o_ce[..., 1] - og[..., 4],
                        o_ae - og[..., 5], n_alpha - og[..., 6]],
                        axis=-1) * pf[..., None]
                    d_vel = jnp.stack([
                        ovx_f - o_v[..., 0], ovy_f - o_v[..., 1], ow_f - o_w],
                        axis=-1) * cf[..., None]
                    d_awk = (pf * (1.0 - og[..., 10]))[..., None]
                    bp = vscatter(bp, other_body,
                                  jnp.concatenate([d_pos, d_vel, d_awk], axis=-1))
                return bp, lane_touch | solve, ntouch

            def _no_substep(op):
                bp, ntouch = op
                return bp, lane_touch, ntouch

            bp2, lane_touch2, ntouch2 = jax.lax.cond(
                again, _substep, _no_substep, (bp, ntouch))
            return bp2, lane_tc, lane_touch2, ntouch2, k + 1, again

        def toi_cond(carry):
            return (carry[4] < toi_rounds) & carry[5]

        bp, lane_tc, lane_touch, ntouch_all, _, _ = jax.lax.while_loop(
            toi_cond, round_body,
            (body_pack0, lane_tc0, jnp.zeros((n_worlds, kcap), bool),
             jnp.zeros((n_worlds, nc), bool),
             jnp.int32(0), jnp.bool_(True)))

        # scatter the lane sub-step counts + TOI touches back to contact slots;
        # a TOI sub-step that found a manifold makes the pair touching NOW and
        # fires BeginContact this step (b2World::StepSolveTOI's Contact::Update)
        tc_add = vscatter(jnp.zeros((n_worlds, nc, 2), jnp.float32), sel,
                          jnp.stack([lane_tc - lane_tc0,
                                     lane_touch.astype(jnp.float32)], axis=-1))
        toi_touch = (tc_add[..., 1] > 0.5) | ntouch_all
        contacts2 = dataclasses.replace(
            contacts,
            toi_count=contacts.toi_count + tc_add[..., 0].astype(jnp.int32),
            touching=contacts.touching | toi_touch)
        bodies2 = dataclasses.replace(
            bodies, c=bp[..., 0:2], a=bp[..., 2], c0=bp[..., 3:5], a0=bp[..., 5],
            alpha0=jnp.zeros((n_worlds, nb), jnp.float32),
            v=bp[..., 7:9], w=bp[..., 9], awake=bp[..., 10] > 0.5)
        new_states = dataclasses.replace(states, bodies=bodies2,
                                         contacts=contacts2)
        toi_begin = toi_touch & ~contacts.touching
        return new_states, toi_begin

    def _toi_none(_):
        bodies0 = dataclasses.replace(
            bodies, alpha0=jnp.zeros((n_worlds, nb), jnp.float32))
        return (dataclasses.replace(states, bodies=bodies0),
                jnp.zeros((n_worlds, nc), bool))

    new_states, toi_begin = jax.lax.cond(
        jnp.any(lane_on), _toi_rounds, _toi_none, 0)
    return new_states, toi_overflow, toi_begin


def possible_kinds(state: State) -> tuple:
    """Host helper: the static tuple of contact kinds this world's shape
    types can produce. Pass to step/step_batched/make_rollout so absent
    colliders compile away entirely (a boxes-only scene never runs the
    EPCollider). Works on single or batched states."""
    st = np.asarray(state.fixtures.shape_type).reshape(-1)
    bd = np.asarray(state.fixtures.body).reshape(-1)
    types = {int(t) for t, b in zip(st.tolist(), bd.tolist()) if b >= 0}
    c, e, p = (settings.SHAPE_CIRCLE, settings.SHAPE_EDGE,
               settings.SHAPE_POLYGON)
    kinds = []
    if c in types:
        kinds.append(nph.KIND_CIRCLES)
    if p in types and c in types:
        kinds.append(nph.KIND_POLYGON_CIRCLE)
    if p in types:
        kinds.append(nph.KIND_POLYGONS)
    if e in types and c in types:
        kinds.append(nph.KIND_EDGE_CIRCLE)
    if e in types and p in types:
        kinds.append(nph.KIND_EDGE_POLYGON)
    return tuple(kinds) if kinds else (nph.KIND_CIRCLES,)


@partial(jax.jit, static_argnames=(
    "velocity_iterations", "position_iterations", "warm_starting",
    "allow_sleep", "max_colors", "continuous", "toi_rounds", "kinds",
    "toi_capacity", "pre_solve_fn", "filter_fn", "toi_neighbors"))
def step_batched(states: State, dt, velocity_iterations: int = 8,
                 position_iterations: int = 3, warm_starting: bool = True,
                 allow_sleep: bool = True,
                 max_colors: int = settings.MAX_COLORS,
                 continuous: bool = True, toi_rounds: int = 8,
                 kinds=nph.ALL_KINDS, toi_capacity=None,
                 pre_solve_fn=None, filter_fn=None,
                 toi_neighbors: bool = True) -> Tuple[State, Events]:
    """One world-step over a batch of worlds (leading axis on every State
    leaf). This is the production entry point: control flow (iteration
    loops, the dynamic color count, the TOI round loop, the gated pair
    refresh) lives ABOVE the world batch so the whole batch shares one
    scalar-predicated program — the fused-XLA analog of b2World::Step
    driving every phase (b2World.cpp:1613-1710).

    `pre_solve_fn(state, view: PreSolveView) -> (C,) bool` is the PreSolve
    callback analog: traced into the program per world between collide and
    solve; False disables that contact slot for this step.

    `filter_fn(state, fi, fj) -> bool` is the custom contact-filter hook
    (b2ContactFilter::ShouldCollide override, b2WorldCallbacks.h:52-62):
    consulted during pair admission in every pair refresh, on top of the
    built-in category/mask/group filters. Pass the same fn to
    WorldBuilder.freeze(filter_fn=...) so the construction-time pair pass
    agrees."""
    if not 1 <= max_colors <= 32:
        raise ValueError(
            f"max_colors must be in [1, 32] (got {max_colors}): the "
            "large-world coloring tier tracks per-body colors as 32-bit "
            "masks (ops/coloring.py)")
    dt = jnp.asarray(dt, jnp.float32)
    if toi_capacity is None:
        toi_capacity = max(32, states.contacts.capacity // 8)
    n_worlds = states.bodies.body_type.shape[0]

    # between-step mutations (add/remove body/fixture, filter changes) set
    # pairs_dirty; the reference finds those pairs at the START of Step
    # (e_newFixture -> FindNewContacts, b2World.cpp:1628-1639)
    nc_ = states.contacts.capacity
    nf_ = states.fixtures.capacity

    def _refresh_entry(sm):
        f_a, f_b, _ = jax.vmap(
            lambda s: broadphase.find_pairs(s, nc_, filter_fn))(sm)
        return jax.vmap(
            lambda c_, fa, fb: broadphase.carry_over_contacts(c_, fa, fb,
                                                              nf_)
        )(sm.contacts, f_a, f_b)
    contacts0 = jax.lax.cond(jnp.any(states.pairs_dirty), _refresh_entry,
                             lambda sm: sm.contacts, states)
    states = dataclasses.replace(
        states, contacts=contacts0,
        pairs_dirty=jnp.zeros_like(states.pairs_dirty))

    # all-asleep fast path: when no non-static body in ANY world is awake,
    # nothing can move or change touch state — the whole step is identity
    # (the batched analog of the reference skipping sleeping islands,
    # b2World.cpp:1219-1224). Settled scenes then cost one reduction.
    b0 = states.bodies
    any_active = jnp.any(b0.awake & (b0.body_type >= 0)
                         & (b0.body_type != settings.STATIC_BODY))

    def _skip_step(states):
        c = states.contacts
        zc = jnp.zeros(c.f_a.shape, bool)
        zw = jnp.zeros((n_worlds,), jnp.int32)
        return states, Events(
            begin_touch=zc, end_touch=zc, f_a=c.f_a, f_b=c.f_b,
            pair_overflow=zw, color_overflow=zw, toi_overflow=zw,
            normal_impulse=jnp.zeros(c.f_a.shape + (2,), jnp.float32),
            tangent_impulse=jnp.zeros(c.f_a.shape + (2,), jnp.float32),
            touching=c.touching, toi_begin=zc, toi_f_a=c.f_a,
            toi_f_b=c.f_b)

    def _active_step(states):
        return _step_active(
            states, dt, velocity_iterations, position_iterations,
            warm_starting, allow_sleep, max_colors, continuous, toi_rounds,
            kinds, toi_capacity, pre_solve_fn, n_worlds, filter_fn,
            toi_neighbors)

    return jax.lax.cond(any_active, _active_step, _skip_step, states)


def _step_active(states, dt, velocity_iterations, position_iterations,
                 warm_starting, allow_sleep, max_colors, continuous,
                 toi_rounds, kinds, toi_capacity, pre_solve_fn, n_worlds,
                 filter_fn=None, toi_neighbors=True):
    """The full phase pipeline (see step_batched)."""
    manifold, sensor, sensor_touch, ba, bb = _collide_b(states, kinds)
    if pre_solve_fn is not None:
        pair_exists = states.contacts.f_a >= 0
        touching_now = pair_exists & jnp.where(sensor, sensor_touch,
                                               manifold.count > 0)
        view = PreSolveView(
            f_a=states.contacts.f_a, f_b=states.contacts.f_b,
            body_a=ba, body_b=bb, touching=touching_now, manifold=manifold,
            old_mtype=states.contacts.m_type,
            old_local_normal=states.contacts.m_local_normal,
            old_count=states.contacts.m_count,
            tangent_speed=states.contacts.tangent_speed,
            friction_override=states.contacts.friction_override,
            restitution_override=states.contacts.restitution_override)
        hook_out = jax.vmap(pre_solve_fn)(states, view)
        if isinstance(hook_out, dict):
            enabled = hook_out.get(
                "enabled", jnp.ones(states.contacts.f_a.shape, bool))
            # the setters persist on the contact (b2Contact.h:126-157)
            c_upd = {}
            if "tangent_speed" in hook_out:
                c_upd["tangent_speed"] = hook_out["tangent_speed"]
            if "friction" in hook_out:
                c_upd["friction_override"] = hook_out["friction"]
            if "restitution" in hook_out:
                c_upd["restitution_override"] = hook_out["restitution"]
            if c_upd:
                states = dataclasses.replace(
                    states, contacts=dataclasses.replace(
                        states.contacts, **c_upd))
        else:
            enabled = hook_out
    else:
        enabled = jnp.ones(states.contacts.f_a.shape, bool)
    # ---- solve preamble with cross-step graph-pass caching: the island
    # labels and constraint coloring depend only on the contact/joint
    # graph, which between begin/end events is identical step to step.
    # Compare batch-global signatures against state.cache and skip the
    # recompute on a match (both branches are outside vmap, so lax.cond
    # executes only one).
    nb_ = states.bodies.capacity
    cache = states.cache
    pt = jax.vmap(
        lambda s, m, sn, st_, en, a_, b_: _pre_touch(s, m, sn, st_, en,
                                                     a_, b_)
    )(states, manifold, sensor, sensor_touch, enabled, ba, bb)
    jb_a, jb_b, j_active = jax.vmap(
        lambda s: build_joint_arrays(s.joints))(states) \
        if joints_present(states.joints) else (None, None, None)

    valid_all = jnp.all(cache.valid)
    labels_same = valid_all \
        & jnp.all(pt.solvable == cache.sig_solv) \
        & jnp.all(pt.non_static == cache.sig_ns) \
        & jnp.all(states.contacts.f_a == cache.sig_f_a) \
        & jnp.all(states.contacts.f_b == cache.sig_f_b)
    if jb_a is not None:
        labels_same = labels_same \
            & jnp.all(j_active == cache.sig_jact) \
            & jnp.all(jb_a == cache.sig_jba) \
            & jnp.all(jb_b == cache.sig_jbb)

    def _labels_fresh(_):
        if jb_a is not None:
            ea = jnp.concatenate([ba, jb_a], axis=1)
            eb = jnp.concatenate([bb, jb_b], axis=1)
            eo = jnp.concatenate([pt.solvable, j_active], axis=1)
        else:
            ea, eb, eo = ba, bb, pt.solvable
        return jax.vmap(
            lambda a, b, o, n: islands.island_labels(nb_, a, b, o, n)
        )(ea, eb, eo, pt.non_static)

    labels = jax.lax.cond(labels_same, lambda _: cache.labels,
                          _labels_fresh, 0)

    awake, cc_active = jax.vmap(
        lambda p, l, a_, b_: _cc_active_of(p, l, a_, b_)
    )(pt, labels, ba, bb)

    # colors are computed on the PAIR graph (every existing pair with a
    # dynamic endpoint), not the touch graph: a coloring of a supergraph
    # stays conflict-free for any subgraph, so touch churn (begin/end
    # events every few steps while a pile settles) does NOT invalidate
    # it — only an actual pair-table change does. The solve middle ranks
    # the active lanes within each color itself.
    # colors are computed on the ACTIVE constraint graph; the cross-step
    # cache keys on (pair table, active mask, dynamic masks). Coloring the
    # pair-graph superset was tried (cache survives touch churn) but lost:
    # the superset needs ~2x the colors, and every extra color costs a
    # 256-lane chunk pass in the solve middle each of 11 iterations —
    # measured 823 vs 848 worlds*steps/s at 128x991-body worlds.
    cgr = cc_active
    colors_same = valid_all \
        & jnp.all(states.contacts.f_a == cache.sig_f_a) \
        & jnp.all(states.contacts.f_b == cache.sig_f_b) \
        & jnp.all(cgr == cache.sig_cc) \
        & jnp.all(pt.dyn_a == cache.sig_dyn_a) \
        & jnp.all(pt.dyn_b == cache.sig_dyn_b)

    def _colors_fresh(_):
        return jax.vmap(
            lambda a, b, da, db, pa: coloring.color_constraints(
                a, b, da, db, pa, nb_, max_colors, with_rank=True)
        )(ba, bb, pt.dyn_a, pt.dyn_b, cgr)

    color, color_overflow, rank = jax.lax.cond(
        colors_same, lambda _: (cache.color, cache.color_overflow,
                                cache.rank),
        _colors_fresh, 0)

    new_cache = SolverCache(
        valid=jnp.ones(cache.valid.shape, bool),
        labels=labels, color=color, rank=rank,
        color_overflow=color_overflow,
        sig_solv=pt.solvable, sig_ns=pt.non_static,
        sig_jact=j_active if jb_a is not None else cache.sig_jact,
        sig_jba=jb_a if jb_a is not None else cache.sig_jba,
        sig_jbb=jb_b if jb_a is not None else cache.sig_jbb,
        sig_f_a=states.contacts.f_a, sig_f_b=states.contacts.f_b,
        sig_cc=cgr, sig_dyn_a=pt.dyn_a, sig_dyn_b=pt.dyn_b)

    pre = jax.vmap(
        lambda s, p, l, aw, cca, co, rk, ov, a_, b_: _pre_finish(
            s, p, l, aw, cca, co, rk, ov, dt, warm_starting, a_, b_)
    )(states, pt, labels, awake, cc_active, color, rank, color_overflow,
      ba, bb)
    mids, dropped = _solve_middle_b(states, pre, dt, velocity_iterations,
                                    position_iterations, warm_starting,
                                    max_colors)
    new_state, events = _post_solve_b(states, pre, dt, allow_sleep, mids,
                                      filter_fn)
    new_state = dataclasses.replace(new_state, cache=new_cache)
    events = events._replace(
        color_overflow=events.color_overflow + dropped.astype(jnp.int32))
    if continuous and toi_rounds > 0:
        if pre_solve_fn is not None:
            # re-consult the hook for the refreshed pair table (the
            # reference's TOI Update fires PreSolve again and skips the
            # sub-step when disabled, b2World.cpp:871-874)
            c2 = new_state.contacts
            fb2 = jnp.clip(new_state.fixtures.body, 0)
            man2 = nph.Manifold(
                mtype=c2.m_type, local_point=c2.m_local_point,
                local_normal=c2.m_local_normal, points=c2.m_points,
                ids=c2.m_ids, count=c2.m_count)
            view2 = PreSolveView(
                f_a=c2.f_a, f_b=c2.f_b,
                body_a=jnp.take_along_axis(fb2, jnp.clip(c2.f_a, 0), axis=1),
                body_b=jnp.take_along_axis(fb2, jnp.clip(c2.f_b, 0), axis=1),
                touching=c2.touching, manifold=man2,
                old_mtype=c2.m_type, old_local_normal=c2.m_local_normal,
                old_count=c2.m_count,
                tangent_speed=c2.tangent_speed,
                friction_override=c2.friction_override,
                restitution_override=c2.restitution_override)
            hook_out2 = jax.vmap(pre_solve_fn)(new_state, view2)
            if isinstance(hook_out2, dict):
                enabled_toi = hook_out2.get(
                    "enabled", jnp.ones(c2.f_a.shape, bool))
            else:
                enabled_toi = hook_out2
        else:
            enabled_toi = None
        # body-motion pre-gate: a TOI event needs a pair with relative
        # sweep motion above half a linear slop; motion per pair is
        # bounded by twice the max single-body sweep motion, so when
        # every awake body moved < slop/4 this step the whole continuous
        # phase is provably eventless and skipped (b2World.cpp:1534-1541
        # skips per contact; the batched analog gates the phase)
        b_ = new_state.bodies
        fx_ = new_state.fixtures
        v8 = jnp.arange(8)[None, None, :] < fx_.nverts[..., None]
        vlen = jnp.sqrt(jnp.sum(fx_.verts ** 2, axis=-1))
        f_rmax = jnp.max(jnp.where(v8, vlen, 0.0), axis=-1) + fx_.radius
        b_rmax = jax.vmap(
            lambda fb, fr: scatter_max_scalar(
                b_.capacity, jnp.where(fb >= 0, fb, b_.capacity),
                jnp.where(fb >= 0, fr, 0.0), 0.0)
        )(fx_.body, f_rmax)
        lin = jnp.sqrt(jnp.sum((b_.c - b_.c0) ** 2, axis=-1))
        motion = jnp.where(
            b_.awake & (b_.body_type >= 0)
            & (b_.body_type != settings.STATIC_BODY),
            lin + jnp.abs(b_.a - b_.a0) * b_rmax, 0.0)
        could_tunnel = jnp.max(motion) > 0.25 * settings.LINEAR_SLOP

        def _toi_run(st):
            return _solve_toi_b(
                st, dt, velocity_iterations, toi_rounds, kinds,
                toi_capacity, enabled=enabled_toi,
                toi_neighbors=toi_neighbors, pre_solve_fn=pre_solve_fn)

        def _toi_skip(st):
            zw = jnp.zeros((n_worlds,), jnp.int32)
            zc = jnp.zeros(st.contacts.f_a.shape, bool)
            # alpha0 reset still applies (b2World.cpp:1069-1078)
            bodies0 = dataclasses.replace(
                st.bodies, alpha0=jnp.zeros_like(st.bodies.alpha0))
            return dataclasses.replace(st, bodies=bodies0), zw, zc

        new_state, toi_overflow, toi_begin = jax.lax.cond(
            could_tunnel, _toi_run, _toi_skip, new_state)
        # TOI-created touches fire BeginContact this step, but toi_begin
        # indexes the *refreshed* pair table while begin_touch/f_a/f_b
        # index the pre-refresh table — export it on its own slot basis
        # (Events.toi_begin + toi_f_a/toi_f_b) rather than OR-ing across
        # bases. A consumer's full begin set for the step is
        # begin_touch@(f_a,f_b) plus toi_begin@(toi_f_a,toi_f_b).
        events = events._replace(toi_begin=toi_begin)
    else:
        toi_overflow = jnp.zeros((n_worlds,), jnp.int32)
    return new_state, events._replace(toi_overflow=toi_overflow)


@partial(jax.jit, static_argnames=(
    "velocity_iterations", "position_iterations", "warm_starting",
    "allow_sleep", "max_colors", "continuous", "toi_rounds", "kinds",
    "toi_capacity", "pre_solve_fn", "filter_fn", "toi_neighbors"))
def step(state: State, dt, velocity_iterations: int = 8,
         position_iterations: int = 3, warm_starting: bool = True,
         allow_sleep: bool = True, max_colors: int = settings.MAX_COLORS,
         continuous: bool = True, toi_rounds: int = 8,
         kinds=nph.ALL_KINDS, toi_capacity=None,
         pre_solve_fn=None, filter_fn=None,
         toi_neighbors: bool = True) -> Tuple[State, Events]:
    """Single-world step: batch of one through step_batched."""
    states = jax.tree.map(lambda x: x[None], state)
    out, ev = step_batched(
        states, dt, velocity_iterations=velocity_iterations,
        position_iterations=position_iterations, warm_starting=warm_starting,
        allow_sleep=allow_sleep, max_colors=max_colors, continuous=continuous,
        toi_rounds=toi_rounds, kinds=kinds, toi_capacity=toi_capacity,
        pre_solve_fn=pre_solve_fn, filter_fn=filter_fn,
        toi_neighbors=toi_neighbors)
    return (jax.tree.map(lambda x: x[0], out),
            jax.tree.map(lambda x: x[0], ev))


# --------------------------------------------------------------------------
# host-side builder
# --------------------------------------------------------------------------


def _next_pow2(n):
    return max(8, 1 << (int(n - 1)).bit_length()) if n > 0 else 8


@dataclasses.dataclass
class _BodyDef:
    body_type: int
    position: Tuple[float, float]
    angle: float
    linear_velocity: Tuple[float, float]
    angular_velocity: float
    linear_damping: float
    angular_damping: float
    allow_sleep: bool
    awake: bool
    fixed_rotation: bool
    bullet: bool
    enabled: bool
    gravity_scale: float


@dataclasses.dataclass
class _FixtureDef:
    body: int
    shape: object
    density: float
    friction: float
    restitution: float
    is_sensor: bool
    filter_category: int
    filter_mask: int
    filter_group: int
    thick_shape: bool


class WorldBuilder:
    """Host-side world construction; `freeze()` yields the device State."""

    def __init__(self, gravity=(0.0, -10.0)):
        self.gravity = tuple(gravity)
        self._bodies: list = []
        self._fixtures: list = []
        self._joints: dict = {}   # name -> list of dicts

    # -- bodies ------------------------------------------------------------
    def create_body(self, body_type=settings.STATIC_BODY, position=(0.0, 0.0),
                    angle=0.0, linear_velocity=(0.0, 0.0), angular_velocity=0.0,
                    linear_damping=0.0, angular_damping=0.0, allow_sleep=True,
                    awake=True, fixed_rotation=False, bullet=False,
                    enabled=True, gravity_scale=1.0) -> int:
        self._bodies.append(_BodyDef(
            body_type, tuple(position), angle, tuple(linear_velocity),
            angular_velocity, linear_damping, angular_damping, allow_sleep,
            awake, fixed_rotation, bullet, enabled, gravity_scale))
        return len(self._bodies) - 1

    # -- fixtures ----------------------------------------------------------
    def create_fixture(self, body: int, shape, density=0.0, friction=0.2,
                       restitution=0.0, is_sensor=False, filter_category=1,
                       filter_mask=0xFFFF, filter_group=0,
                       thick_shape=False):
        """Returns the fixture index (first child index for chains)."""
        first = len(self._fixtures)
        children = shape.children() if isinstance(shape, shapes.Chain) else [shape]
        for child in children:
            self._fixtures.append(_FixtureDef(
                body, child, density, friction, restitution, is_sensor,
                filter_category, filter_mask, filter_group, thick_shape))
        return first

    # -- joints ------------------------------------------------------------
    def _add_joint(self, kind: str, **kw) -> int:
        lst = self._joints.setdefault(kind, [])
        lst.append(kw)
        return len(lst) - 1

    def create_joint_raw(self, kind: str, **fields) -> int:
        """Append a joint from raw local-frame def fields (local anchors,
        axes, reference angles, ...), bypassing the world-anchor helpers.
        This is how `diagnostics.dump_source` replays a world — the analog
        of the raw `jd.localAnchorA.Set(...)` lines in a b2World::Dump
        (b2World.h:246-248, per-joint Dump methods in Joints/*.cpp)."""
        from .joints import _BLOCK_NAMES
        if kind not in _BLOCK_NAMES:
            raise ValueError(f"unknown joint kind: {kind}")
        return self._add_joint(kind, **fields)

    def create_revolute_joint(self, body_a, body_b, anchor, *,
                              collide_connected=False, enable_limit=False,
                              lower_angle=0.0, upper_angle=0.0,
                              enable_motor=False, motor_speed=0.0,
                              max_motor_torque=0.0, reference_angle=None):
        """b2RevoluteJointDef::Initialize (world anchor)."""
        la = self._to_local(body_a, anchor)
        lb = self._to_local(body_b, anchor)
        if reference_angle is None:
            reference_angle = self._bodies[body_b].angle - self._bodies[body_a].angle
        return self._add_joint(
            "revolute", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, reference_angle=reference_angle,
            collide_connected=collide_connected, enable_limit=enable_limit,
            lower_angle=lower_angle, upper_angle=upper_angle,
            enable_motor=enable_motor, motor_speed=motor_speed,
            max_motor_torque=max_motor_torque)

    def create_distance_joint(self, body_a, body_b, anchor_a, anchor_b, *,
                              collide_connected=False, frequency=0.0,
                              damping_ratio=0.0, length=None):
        la = self._to_local(body_a, anchor_a)
        lb = self._to_local(body_b, anchor_b)
        if length is None:
            length = math.dist(anchor_a, anchor_b)
        return self._add_joint(
            "distance", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, length=max(length, settings.LINEAR_SLOP),
            frequency=frequency, damping_ratio=damping_ratio,
            collide_connected=collide_connected)

    def create_prismatic_joint(self, body_a, body_b, anchor, axis, *,
                               collide_connected=False, enable_limit=False,
                               lower_translation=0.0, upper_translation=0.0,
                               enable_motor=False, motor_speed=0.0,
                               max_motor_force=0.0, reference_angle=None):
        la = self._to_local(body_a, anchor)
        lb = self._to_local(body_b, anchor)
        ax = self._to_local_vector(body_a, axis)
        if reference_angle is None:
            reference_angle = self._bodies[body_b].angle - self._bodies[body_a].angle
        return self._add_joint(
            "prismatic", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, local_axis_a=ax, reference_angle=reference_angle,
            collide_connected=collide_connected, enable_limit=enable_limit,
            lower_translation=lower_translation,
            upper_translation=upper_translation, enable_motor=enable_motor,
            motor_speed=motor_speed, max_motor_force=max_motor_force)

    def create_weld_joint(self, body_a, body_b, anchor, *,
                          collide_connected=False, frequency=0.0,
                          damping_ratio=0.0, reference_angle=None):
        la = self._to_local(body_a, anchor)
        lb = self._to_local(body_b, anchor)
        if reference_angle is None:
            reference_angle = self._bodies[body_b].angle - self._bodies[body_a].angle
        return self._add_joint(
            "weld", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, reference_angle=reference_angle,
            frequency=frequency, damping_ratio=damping_ratio,
            collide_connected=collide_connected)

    def create_friction_joint(self, body_a, body_b, anchor, *,
                              collide_connected=False, max_force=0.0,
                              max_torque=0.0):
        la = self._to_local(body_a, anchor)
        lb = self._to_local(body_b, anchor)
        return self._add_joint(
            "friction", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, max_force=max_force, max_torque=max_torque,
            collide_connected=collide_connected)

    def create_rope_joint(self, body_a, body_b, local_anchor_a,
                          local_anchor_b, max_length, *,
                          collide_connected=False):
        return self._add_joint(
            "rope", body_a=body_a, body_b=body_b,
            local_anchor_a=tuple(local_anchor_a),
            local_anchor_b=tuple(local_anchor_b), max_length=max_length,
            collide_connected=collide_connected)

    def create_motor_joint(self, body_a, body_b, *, collide_connected=False,
                           max_force=1.0, max_torque=1.0,
                           correction_factor=0.3, linear_offset=None,
                           angular_offset=None):
        """b2MotorJointDef::Initialize defaults: current relative transform."""
        if linear_offset is None:
            bb_ = self._bodies[body_b]
            linear_offset = self._to_local(body_a, bb_.position)
        if angular_offset is None:
            angular_offset = (self._bodies[body_b].angle
                              - self._bodies[body_a].angle)
        return self._add_joint(
            "motor", body_a=body_a, body_b=body_b,
            linear_offset=tuple(linear_offset), angular_offset=angular_offset,
            max_force=max_force, max_torque=max_torque,
            correction_factor=correction_factor,
            collide_connected=collide_connected)

    def create_mouse_joint(self, body_b, target, *, max_force=0.0,
                           frequency=5.0, damping_ratio=0.7):
        """b2MouseJoint: soft drag of body_b toward a world target."""
        lb = self._to_local(body_b, target)
        return self._add_joint(
            "mouse", body_a=body_b, body_b=body_b, target=tuple(target),
            local_anchor_b=lb, max_force=max_force, frequency=frequency,
            damping_ratio=damping_ratio, collide_connected=True)

    def create_wheel_joint(self, body_a, body_b, anchor, axis, *,
                           collide_connected=False, enable_motor=False,
                           motor_speed=0.0, max_motor_torque=0.0,
                           frequency=2.0, damping_ratio=0.7):
        la = self._to_local(body_a, anchor)
        lb = self._to_local(body_b, anchor)
        ax = self._to_local_vector(body_a, axis)
        return self._add_joint(
            "wheel", body_a=body_a, body_b=body_b, local_anchor_a=la,
            local_anchor_b=lb, local_axis_a=ax, enable_motor=enable_motor,
            motor_speed=motor_speed, max_motor_torque=max_motor_torque,
            frequency=frequency, damping_ratio=damping_ratio,
            collide_connected=collide_connected)

    def create_pulley_joint(self, body_a, body_b, ground_anchor_a,
                            ground_anchor_b, anchor_a, anchor_b, ratio=1.0, *,
                            collide_connected=True):
        la = self._to_local(body_a, anchor_a)
        lb = self._to_local(body_b, anchor_b)
        length_a = math.dist(anchor_a, ground_anchor_a)
        length_b = math.dist(anchor_b, ground_anchor_b)
        return self._add_joint(
            "pulley", body_a=body_a, body_b=body_b,
            ground_anchor_a=tuple(ground_anchor_a),
            ground_anchor_b=tuple(ground_anchor_b),
            local_anchor_a=la, local_anchor_b=lb,
            length_a=length_a, length_b=length_b, ratio=ratio,
            constant=length_a + ratio * length_b,
            collide_connected=collide_connected)

    def create_gear_joint(self, joint1, joint2, ratio=1.0, *,
                          collide_connected=False):
        """b2GearJoint (b2GearJoint.cpp:45-130): couples two revolute/
        prismatic joints so C = coordinate1 + ratio * coordinate2 stays at
        its initial value. joint1/joint2 are ("revolute"|"prismatic", index)
        pairs as returned by create_revolute_joint / create_prismatic_joint.
        Body roles per the reference ctor: A = joint1.bodyB, C = joint1.bodyA,
        B = joint2.bodyB, D = joint2.bodyA."""
        kind1, i1 = joint1
        kind2, i2 = joint2
        assert kind1 in ("revolute", "prismatic"), kind1
        assert kind2 in ("revolute", "prismatic"), kind2
        j1 = self._joints[kind1][i1]
        j2 = self._joints[kind2][i2]
        coord_a, geo1 = self._gear_coordinate(kind1, j1)
        coord_b, geo2 = self._gear_coordinate(kind2, j2)
        return self._add_joint(
            "gear",
            body_a=j1["body_b"], body_b=j2["body_b"],
            body_c=j1["body_a"], body_d=j2["body_a"],
            joint1_type=0 if kind1 == "revolute" else 1, joint1_index=i1,
            joint2_type=0 if kind2 == "revolute" else 1, joint2_index=i2,
            local_anchor_a=geo1["anchor_b"], local_anchor_c=geo1["anchor_a"],
            local_anchor_b=geo2["anchor_b"], local_anchor_d=geo2["anchor_a"],
            local_axis_c=geo1["axis"], local_axis_d=geo2["axis"],
            reference_angle_a=geo1["ref"], reference_angle_b=geo2["ref"],
            ratio=ratio, constant=coord_a + ratio * coord_b,
            collide_connected=collide_connected)

    def _gear_coordinate(self, kind, j):
        """Initial gear coordinate of one coupled joint at build time
        (b2GearJoint.cpp:70-91 and :102-123; body transforms are the
        build-time defs, exactly like the reference ctor reads m_xf)."""
        bda = self._bodies[j["body_a"]]
        bdb = self._bodies[j["body_b"]]
        geo = dict(anchor_a=j["local_anchor_a"], anchor_b=j["local_anchor_b"],
                   ref=j["reference_angle"])
        if kind == "revolute":
            geo["axis"] = (0.0, 0.0)
            return bdb.angle - bda.angle - j["reference_angle"], geo
        geo["axis"] = j["local_axis_a"]
        # pA in C's frame: MulT(xfC.q, Mul(xfA.q, anchorB) + (xfA.p - xfC.p))
        s_c, c_c = math.sin(bda.angle), math.cos(bda.angle)
        s_a, c_a = math.sin(bdb.angle), math.cos(bdb.angle)
        lax_, lay_ = j["local_anchor_b"]
        wx = c_a * lax_ - s_a * lay_ + bdb.position[0] - bda.position[0]
        wy = s_a * lax_ + c_a * lay_ + bdb.position[1] - bda.position[1]
        px = c_c * wx + s_c * wy
        py = -s_c * wx + c_c * wy
        ax_, ay_ = j["local_axis_a"]
        coord = ((px - j["local_anchor_a"][0]) * ax_
                 + (py - j["local_anchor_a"][1]) * ay_)
        return coord, geo

    def _to_local(self, body: int, world_point):
        b = self._bodies[body]
        s, c = math.sin(b.angle), math.cos(b.angle)
        dx = world_point[0] - b.position[0]
        dy = world_point[1] - b.position[1]
        return (c * dx + s * dy, -s * dx + c * dy)

    def _to_local_vector(self, body: int, world_vec):
        b = self._bodies[body]
        s, c = math.sin(b.angle), math.cos(b.angle)
        return (c * world_vec[0] + s * world_vec[1],
                -s * world_vec[0] + c * world_vec[1])

    # -- freeze ------------------------------------------------------------
    def freeze(self, body_capacity: Optional[int] = None,
               fixture_capacity: Optional[int] = None,
               contact_capacity: Optional[int] = None,
               joint_capacity: Optional[dict] = None,
               filter_fn=None) -> State:
        """`joint_capacity` maps joint kind -> slot count to preallocate for
        runtime joint creation (mutate.add_*_joint, the b2World::CreateJoint
        analog). Preallocating any slots for a kind compiles that kind's
        solver into the step program even while no joint is active.

        `filter_fn` is the custom contact-filter hook (see step_batched);
        pass it here too so the construction-time pair pass applies it."""
        nb = body_capacity or _next_pow2(len(self._bodies))
        nf = fixture_capacity or _next_pow2(len(self._fixtures))
        nc = contact_capacity or _next_pow2(max(64, 4 * len(self._fixtures)))
        assert nb >= len(self._bodies) and nf >= len(self._fixtures)

        bodies = _pack_bodies(self._bodies, self._fixtures, nb)
        fixtures = _pack_fixtures(self._fixtures, nf)
        contacts = _empty_contacts(nc)
        joints = build_joints(self._joints, joint_capacity)

        jb_a, _, _ = build_joint_arrays(joints)
        nj = 0 if jb_a is None else jb_a.shape[0]
        state = State(
            bodies=bodies, fixtures=fixtures, contacts=contacts,
            joints=joints,
            gravity=jnp.asarray(self.gravity, jnp.float32),
            inv_dt0=jnp.float32(0.0),
            pairs_dirty=jnp.asarray(False),
            cache=make_empty_cache(nb, nc, nj),
        )
        return _init_broadphase(state, filter_fn=filter_fn)


@partial(jax.jit, static_argnames=("filter_fn",))
def _init_broadphase(state: State, filter_fn=None) -> State:
    """Create initial fat AABBs + pair table (the construction-time
    FindNewContacts pass, b2World.cpp:1628-1639)."""
    p, q = _body_xf(state.bodies)
    fb = jnp.clip(state.fixtures.body, 0)
    lo, hi = broadphase.initial_fat_aabbs(state.fixtures, p[fb], q[fb])
    fx = dataclasses.replace(state.fixtures, aabb_lo=lo, aabb_hi=hi)
    state = dataclasses.replace(state, fixtures=fx)
    f_a, f_b, _ = broadphase.find_pairs(state, state.contacts.capacity,
                                        filter_fn)
    contacts = broadphase.carry_over_contacts(state.contacts, f_a, f_b,
                                              fx.capacity)
    return dataclasses.replace(state, contacts=contacts)


def _pack_bodies(defs, fixture_defs, nb) -> Bodies:
    n = len(defs)
    z = lambda *s: np.zeros(s, np.float32)
    body_type = np.full(nb, -1, np.int32)
    c = z(nb, 2); a = z(nb); local_center = z(nb, 2)
    v = z(nb, 2); w = z(nb)
    inv_mass = z(nb); inv_inertia = z(nb)
    lin_damp = z(nb); ang_damp = z(nb); grav = z(nb)
    awake = np.zeros(nb, bool); allow_sleep = np.zeros(nb, bool)
    fixed_rot = np.zeros(nb, bool); bullet = np.zeros(nb, bool)
    enabled = np.zeros(nb, bool)

    # per-body mass data from fixtures (b2Body::ResetMassData)
    for i, bd in enumerate(defs):
        body_type[i] = bd.body_type
        lin_damp[i] = bd.linear_damping
        ang_damp[i] = bd.angular_damping
        grav[i] = bd.gravity_scale
        awake[i] = bd.awake
        allow_sleep[i] = bd.allow_sleep
        fixed_rot[i] = bd.fixed_rotation
        bullet[i] = bd.bullet
        enabled[i] = bd.enabled
        a[i] = bd.angle

        mass = 0.0
        center = np.zeros(2)
        inertia = 0.0
        if bd.body_type == settings.DYNAMIC_BODY:
            for fd in fixture_defs:
                if fd.body != i or fd.density == 0.0:
                    continue
                md = fd.shape.compute_mass(fd.density)
                mass += md.mass
                center += md.mass * np.asarray(md.center)
                inertia += md.inertia
            if mass > 0.0:
                center /= mass
                inertia -= mass * float(center @ center)
            else:
                mass = 1.0
                inertia = 0.0
            if bd.fixed_rotation:
                inertia = 0.0
            inv_mass[i] = 1.0 / mass
            inv_inertia[i] = 1.0 / inertia if inertia > 0.0 else 0.0

        local_center[i] = center
        s_, c_ = math.sin(bd.angle), math.cos(bd.angle)
        world_center = (bd.position[0] + c_ * center[0] - s_ * center[1],
                        bd.position[1] + s_ * center[0] + c_ * center[1])
        c[i] = world_center
        # velocity given at origin; shift to center of mass:
        # v += cross(w, c - origin) (b2Body::ResetMassData, b2Body.cpp)
        v[i] = (bd.linear_velocity[0] - bd.angular_velocity * (world_center[1] - bd.position[1]),
                bd.linear_velocity[1] + bd.angular_velocity * (world_center[0] - bd.position[0]))
        w[i] = bd.angular_velocity

    return Bodies(
        body_type=jnp.asarray(body_type),
        c=jnp.asarray(c), a=jnp.asarray(a),
        c0=jnp.asarray(c), a0=jnp.asarray(a),
        alpha0=jnp.zeros(nb, jnp.float32),
        local_center=jnp.asarray(local_center),
        v=jnp.asarray(v), w=jnp.asarray(w),
        force=jnp.zeros((nb, 2), jnp.float32),
        torque=jnp.zeros(nb, jnp.float32),
        inv_mass=jnp.asarray(inv_mass), inv_inertia=jnp.asarray(inv_inertia),
        linear_damping=jnp.asarray(lin_damp),
        angular_damping=jnp.asarray(ang_damp),
        gravity_scale=jnp.asarray(grav),
        awake=jnp.asarray(awake), allow_sleep=jnp.asarray(allow_sleep),
        fixed_rotation=jnp.asarray(fixed_rot), bullet=jnp.asarray(bullet),
        enabled=jnp.asarray(enabled),
        sleep_time=jnp.zeros(nb, jnp.float32),
    )


def _pack_fixtures(defs, nf) -> Fixtures:
    body = np.full(nf, -1, np.int32)
    shape_type = np.zeros(nf, np.int32)
    radius = np.zeros(nf, np.float32)
    verts = np.zeros((nf, 8, 2), np.float32)
    normals = np.zeros((nf, 8, 2), np.float32)
    nverts = np.zeros(nf, np.int32)
    ghosts = np.zeros((nf, 2), bool)
    friction = np.zeros(nf, np.float32)
    restitution = np.zeros(nf, np.float32)
    density = np.zeros(nf, np.float32)
    is_sensor = np.zeros(nf, bool)
    cat = np.ones(nf, np.int32)
    mask = np.full(nf, 0xFFFF, np.int32)
    group = np.zeros(nf, np.int32)
    thick = np.zeros(nf, bool)

    for i, fd in enumerate(defs):
        body[i] = fd.body
        friction[i] = fd.friction
        restitution[i] = fd.restitution
        density[i] = fd.density
        is_sensor[i] = fd.is_sensor
        cat[i] = fd.filter_category
        mask[i] = fd.filter_mask
        group[i] = fd.filter_group
        thick[i] = fd.thick_shape
        s = fd.shape
        if isinstance(s, shapes.Circle):
            shape_type[i] = settings.SHAPE_CIRCLE
            radius[i] = s.radius
            verts[i, 0] = s.center
            nverts[i] = 1
        elif isinstance(s, shapes.Edge):
            shape_type[i] = settings.SHAPE_EDGE
            radius[i] = s.radius
            verts[i, 0] = s.v1
            verts[i, 1] = s.v2
            if s.v0 is not None:
                verts[i, 2] = s.v0
                ghosts[i, 0] = True
            if s.v3 is not None:
                verts[i, 3] = s.v3
                ghosts[i, 1] = True
            nverts[i] = 2
        elif isinstance(s, shapes.Polygon):
            shape_type[i] = settings.SHAPE_POLYGON
            radius[i] = s.radius
            m = len(s.vertices)
            verts[i, :m] = s.vertices
            normals[i, :m] = s.normals
            nverts[i] = m
        else:
            raise TypeError(f"unknown shape {type(s)}")

    return Fixtures(
        body=jnp.asarray(body), shape_type=jnp.asarray(shape_type),
        radius=jnp.asarray(radius), verts=jnp.asarray(verts),
        normals=jnp.asarray(normals), nverts=jnp.asarray(nverts),
        ghosts=jnp.asarray(ghosts), friction=jnp.asarray(friction),
        restitution=jnp.asarray(restitution), density=jnp.asarray(density),
        is_sensor=jnp.asarray(is_sensor), filter_category=jnp.asarray(cat),
        filter_mask=jnp.asarray(mask), filter_group=jnp.asarray(group),
        thick_shape=jnp.asarray(thick),
        aabb_lo=jnp.zeros((nf, 2), jnp.float32),
        aabb_hi=jnp.zeros((nf, 2), jnp.float32),
    )


def _empty_contacts(nc) -> Contacts:
    return Contacts(
        f_a=jnp.full(nc, -1, jnp.int32), f_b=jnp.full(nc, -1, jnp.int32),
        m_type=jnp.zeros(nc, jnp.int32),
        m_local_point=jnp.zeros((nc, 2), jnp.float32),
        m_local_normal=jnp.zeros((nc, 2), jnp.float32),
        m_points=jnp.zeros((nc, 2, 2), jnp.float32),
        m_ids=jnp.zeros((nc, 2), jnp.int32),
        m_count=jnp.zeros(nc, jnp.int32),
        normal_impulse=jnp.zeros((nc, 2), jnp.float32),
        tangent_impulse=jnp.zeros((nc, 2), jnp.float32),
        touching=jnp.zeros(nc, bool),
        toi_count=jnp.zeros(nc, jnp.int32),
        tangent_speed=jnp.zeros(nc, jnp.float32),
        friction_override=jnp.full(nc, -1.0, jnp.float32),
        restitution_override=jnp.full(nc, -1.0, jnp.float32),
    )


def build_joints(joint_defs: dict, joint_capacity: dict = None) -> Joints:
    from .joints import build_joints as _bj
    return _bj(joint_defs, joint_capacity)
