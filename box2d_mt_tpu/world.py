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
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import settings, shapes
from .math2d import rot_from_angle, rot_vec
from .state import (Bodies, Contacts, Fixtures, Joints, State)
from .joints import make_empty_joints, joints_present, build_joint_arrays
from .ops import broadphase, coloring, distance, islands, integrate
from .ops.gather import gather_rows, gather_scalar, scatter_add, scatter_min_scalar, scatter_max_scalar
from .ops import narrowphase as nph
from .ops import solver as csolver


class Events(NamedTuple):
    """Per-step outputs replacing b2ContactListener callbacks
    (b2WorldCallbacks.h:96-173)."""
    begin_touch: jax.Array    # (C,) bool — BeginContact analog
    end_touch: jax.Array      # (C,) bool — EndContact analog
    f_a: jax.Array            # (C,) i32 pair fixtures the masks refer to
    f_b: jax.Array
    pair_overflow: jax.Array  # () i32 — pairs dropped by capacity
    color_overflow: jax.Array  # () i32 — constraints past MAX_COLORS-1


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


def _pre_solve(state: State, dt, warm_starting: bool, max_colors: int) -> _PreSolve:
    """Collide phase + island/coloring/constraint prep + contact warm start
    (b2World Collide + the head of Solve)."""
    bodies = state.bodies
    fx = state.fixtures
    contacts = state.contacts
    nb = bodies.capacity
    nf = fx.capacity

    # ---------------------------------------------------------- 1. Collide
    ia = jnp.clip(contacts.f_a, 0)
    ib = jnp.clip(contacts.f_b, 0)
    pair_exists = contacts.f_a >= 0
    iab = jnp.concatenate([ia, ib])
    nc = contacts.capacity

    # pack all per-fixture shape data into one blob so the narrow phase does
    # a single gather per step (TPU gathers dominate otherwise)
    fblob = jnp.concatenate([
        fx.verts.reshape(nf, 16), fx.normals.reshape(nf, 16),
        fx.radius[:, None], fx.nverts.astype(jnp.float32)[:, None],
        fx.ghosts.astype(jnp.float32),
        fx.shape_type.astype(jnp.float32)[:, None],
        fx.body.astype(jnp.float32)[:, None],
        fx.is_sensor.astype(jnp.float32)[:, None],
    ], axis=1)                                          # (F, 39)
    g = gather_rows(fblob, iab)                         # ONE gather (2C, 39)

    def unpack_rows(r):
        return nph.ShapeRows(
            verts=r[:, 0:16].reshape(-1, 8, 2),
            normals=r[:, 16:32].reshape(-1, 8, 2),
            nverts=r[:, 33].astype(jnp.int32),
            ghosts=r[:, 34:36] > 0.5,
            radius=r[:, 32])

    rows_a = unpack_rows(g[:nc])
    rows_b = unpack_rows(g[nc:])
    type_ab = g[:, 36].astype(jnp.int32)
    body_ab = jnp.clip(g[:, 37].astype(jnp.int32), 0)
    ba = body_ab[:nc]
    bb = body_ab[nc:]

    p_all, q_all = _body_xf(bodies)
    pq = jnp.concatenate([p_all, q_all], axis=1)        # (N,4)
    pq_ab = gather_rows(pq, body_ab)                    # ONE gather (2C, 4)
    kind = nph.contact_kind(type_ab[:nc], type_ab[nc:])
    manifold = jax.vmap(nph.collide)(
        kind, rows_a, pq_ab[:nc, 0:2], pq_ab[:nc, 2:4],
        rows_b, pq_ab[nc:, 0:2], pq_ab[nc:, 2:4])

    sensor = (g[:nc, 38] > 0.5) | (g[nc:, 38] > 0.5)
    touching = pair_exists & (manifold.count > 0)
    # sensors don't generate manifolds (b2Contact.cpp:199-205); overlap for
    # sensor touch reporting is approximated by the manifold test for now.
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
    awake = bodies.awake
    wake_hits = scatter_max_scalar(
        nb, jnp.where(jnp.concatenate([changed, changed]),
                      jnp.concatenate([ba, bb]), nb),
        jnp.ones(2 * nc, jnp.int32), 0) > 0
    awake = awake | wake_hits
    begin_touch = pair_exists & touching & ~contacts.touching
    end_touch = pair_exists & ~touching & contacts.touching

    contacts = dataclasses.replace(
        contacts,
        m_type=manifold.mtype, m_local_point=manifold.local_point,
        m_local_normal=manifold.local_normal, m_points=manifold.points,
        m_ids=manifold.ids, m_count=m_count,
        normal_impulse=ni, tangent_impulse=ti, touching=touching)

    # -------------------------------------------------- 2. Solve preamble
    non_static = bodies.exists & ~bodies.is_static & bodies.enabled
    dyn = bodies.is_dynamic & bodies.enabled

    solvable_contact = touching & ~sensor & pair_exists
    jb_a, jb_b, j_active = build_joint_arrays(state.joints)
    if jb_a is not None:
        edges_a = jnp.concatenate([ba, jb_a])
        edges_b = jnp.concatenate([bb, jb_b])
        edges_on = jnp.concatenate([solvable_contact, j_active])
    else:
        edges_a, edges_b, edges_on = ba, bb, solvable_contact
    labels = islands.island_labels(nb, edges_a, edges_b, edges_on, non_static)

    awake = islands.propagate_awake(awake, labels, non_static)

    solve_mask = awake & non_static
    # sweep start for CCD / broad-phase sweep (b2Island.cpp:203-207)
    c0 = jnp.where(solve_mask[:, None], bodies.c, bodies.c0)
    a0 = jnp.where(solve_mask, bodies.a, bodies.a0)

    v, w = integrate.integrate_velocities(
        dataclasses.replace(bodies, awake=awake), state.gravity, dt, solve_mask)

    cc_active = solvable_contact & ((dyn[ba] & awake[ba]) | (dyn[bb] & awake[bb]))
    color, color_overflow = coloring.color_constraints(
        ba, bb, dyn[ba], dyn[bb], cc_active, nb, max_colors)

    cc = csolver.init_contact_constraints(
        contacts, fx, bodies, bodies.c, bodies.a, v, w, cc_active)

    dt_ratio = jnp.where(dt > 0, state.inv_dt0 * dt, 0.0)
    # packed body velocity state [vx, vy, w, 0] — lets each solver pass run
    # one gather + one scatter (TPU gathers are the step's bottleneck op)
    bs = jnp.concatenate([v, w[:, None], jnp.zeros((nb, 1), v.dtype)], axis=1)
    if warm_starting:
        ni_it = dt_ratio * contacts.normal_impulse
        ti_it = dt_ratio * contacts.tangent_impulse
        bs = csolver.warm_start(cc, ni_it, ti_it, bs)
    else:
        ni_it = jnp.zeros_like(contacts.normal_impulse)
        ti_it = jnp.zeros_like(contacts.tangent_impulse)

    return _PreSolve(
        contacts=contacts, awake=awake, labels=labels, non_static=non_static,
        solve_mask=solve_mask, c0=c0, a0=a0, cc=cc, color=color,
        color_overflow=color_overflow, ni_it=ni_it, ti_it=ti_it, bs=bs,
        ba=ba, bb=bb, cc_active=cc_active, dt_ratio=dt_ratio,
        begin_touch=begin_touch, end_touch=end_touch)


def _solve_middle_xla(state: State, pre: _PreSolve, dt,
                      velocity_iterations, position_iterations,
                      warm_starting, max_colors):
    """Velocity/position iteration loops in XLA (handles joints)."""
    bodies = state.bodies
    nb = bodies.capacity
    cc, color = pre.cc, pre.color
    ni_it, ti_it, bs = pre.ni_it, pre.ti_it, pre.bs
    v, w = bs[:, 0:2], bs[:, 2]

    have_joints = joints_present(state.joints)
    if have_joints:
        from .joints import (init_joints, warm_start_joints,
                             solve_joint_velocity, solve_joint_position,
                             store_joint_impulses)
        jdata, jstate = init_joints(state.joints, bodies, pre.awake, v, w, dt,
                                    pre.dt_ratio, warm_starting, nb, max_colors)
        v, w = warm_start_joints(jdata, jstate, v, w)
        bs = jnp.concatenate([v, w[:, None], jnp.zeros((nb, 1), v.dtype)], axis=1)
    else:
        jdata = jstate = None

    def vel_iter(_, carry):
        ni_it, ti_it, bs, jstate = carry
        if have_joints:
            v, w = bs[:, 0:2], bs[:, 2]
            jstate, v, w = solve_joint_velocity(jdata, jstate, v, w, dt, max_colors)
            bs = jnp.concatenate([v, w[:, None], jnp.zeros((nb, 1), v.dtype)], axis=1)

        def color_pass(ci, inner):
            ni_it, ti_it, bs = inner
            return csolver.solve_velocity_color(cc, ni_it, ti_it, bs,
                                                color == ci)

        ni_it, ti_it, bs = jax.lax.fori_loop(
            0, max_colors, color_pass, (ni_it, ti_it, bs))
        return ni_it, ti_it, bs, jstate

    ni_it, ti_it, bs, jstate = jax.lax.fori_loop(
        0, velocity_iterations, vel_iter, (ni_it, ti_it, bs, jstate))
    v, w = bs[:, 0:2], bs[:, 2]

    c, a, v, w = integrate.integrate_positions(
        bodies.c, bodies.a, v, w, dt, pre.solve_mask)

    ps = jnp.concatenate([c, a[:, None], jnp.zeros((nb, 1), c.dtype)], axis=1)

    def pos_iter(_, carry):
        ps, min_sep, jok = carry

        def color_pass(ci, inner):
            ps, min_sep = inner
            ps, ms = csolver.solve_position_color(
                cc, ps, color == ci, settings.BAUMGARTE,
                settings.MAX_LINEAR_CORRECTION)
            return ps, jnp.minimum(min_sep, ms)

        ps, min_sep = jax.lax.fori_loop(
            0, max_colors, color_pass, (ps, jnp.zeros_like(min_sep)))
        if have_joints:
            c_, a_ = ps[:, 0:2], ps[:, 2]
            c_, a_, jok = solve_joint_position(jdata, jstate, c_, a_, max_colors)
            ps = jnp.concatenate([c_, a_[:, None], jnp.zeros((nb, 1), c_.dtype)], axis=1)
        return ps, min_sep, jok

    min_sep0 = jnp.zeros(pre.contacts.capacity, jnp.float32)
    jok0 = jnp.ones(nb, bool)
    ps, min_sep, jok = jax.lax.fori_loop(
        0, position_iterations, pos_iter, (ps, min_sep0, jok0))
    c, a = ps[:, 0:2], ps[:, 2]

    if have_joints:
        joints_new = store_joint_impulses(state.joints, jstate)
    else:
        joints_new = state.joints

    return ni_it, ti_it, c, a, v, w, min_sep, jok, joints_new


def _post_solve(state: State, pre: _PreSolve, dt, allow_sleep,
                ni_it, ti_it, c, a, v, w, min_sep, jok, joints_new
                ) -> Tuple[State, Events]:
    """Impulse store, sleep, fixture synchronize, pair-table refresh."""
    bodies = state.bodies
    nb = bodies.capacity
    nf = state.fixtures.capacity
    contacts = dataclasses.replace(
        pre.contacts, normal_impulse=ni_it, tangent_impulse=ti_it)
    labels, non_static = pre.labels, pre.non_static
    ba, bb, cc_active = pre.ba, pre.bb, pre.cc_active
    awake, c0, a0 = pre.awake, pre.c0, pre.a0

    # per-island convergence for sleep (positionSolved analog)
    contact_ok = min_sep >= -3.0 * settings.LINEAR_SLOP
    c_label = gather_scalar(labels, jnp.where(non_static[ba], ba, bb))
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

    # --------------------------------------- 3. Synchronize + pair update
    p0, q0 = _body_xf(dataclasses.replace(bodies, c=c0, a=a0))
    p1, q1 = _body_xf(bodies)
    fx = state.fixtures
    fb = jnp.clip(fx.body, 0)
    aabb_lo, aabb_hi, _ = broadphase.synchronize(
        fx, p0[fb], q0[fb], p1[fb], q1[fb])
    fx = dataclasses.replace(fx, aabb_lo=aabb_lo, aabb_hi=aabb_hi)

    state_mid = dataclasses.replace(state, bodies=bodies, fixtures=fx,
                                    contacts=contacts, joints=joints_new)
    f_a, f_b, pair_overflow = broadphase.find_pairs_allpairs(
        state_mid, contacts.capacity)
    contacts = broadphase.carry_over_contacts(contacts, f_a, f_b, nf)

    inv_dt0 = jnp.where(dt > 0, 1.0 / jnp.where(dt > 0, dt, 1.0), state.inv_dt0)
    new_state = dataclasses.replace(
        state_mid, contacts=contacts, inv_dt0=inv_dt0)
    events = Events(
        begin_touch=pre.begin_touch, end_touch=pre.end_touch,
        f_a=state.contacts.f_a, f_b=state.contacts.f_b,
        pair_overflow=pair_overflow.astype(jnp.int32),
        color_overflow=pre.color_overflow.astype(jnp.int32))
    return new_state, events




def _solve_toi(state: State, dt, velocity_iterations: int, toi_rounds: int):
    """Continuous physics (b2World::SolveTOI, b2World.cpp:1026-1093).

    Bounded sub-step loop: each round computes every TOI candidate's impact
    time (conservative advancement over the remaining sweep window), picks
    the earliest (slot order = canonical key order, replicating ToiLessThan
    tie-breaking), advances that pair to the impact time, resolves the pair
    with a no-warm-start position+velocity sub-solve
    (b2Island::SolveTOI, b2Island.cpp:398-530), and completes the remainder
    of the step for the two bodies.

    Deviations from the reference (round-1): the sub-solve covers only the
    impact pair, not the pair's neighbor contacts; neighbor bodies are not
    tentatively advanced. The pair table is NOT refreshed after TOI moves —
    safe because TOI points lie on the sweep path, so the pre-TOI swept fat
    AABBs are a superset.
    """
    from .ops.solver import (position_contact_math_s, velocity_contact_math_s)
    dst = distance

    bodies = state.bodies
    fx = state.fixtures
    contacts = state.contacts
    nb = bodies.capacity
    nc = contacts.capacity

    ia = jnp.clip(contacts.f_a, 0)
    ib = jnp.clip(contacts.f_b, 0)
    ba = jnp.clip(fx.body[ia], 0)
    bb = jnp.clip(fx.body[ib], 0)
    pair_exists = contacts.f_a >= 0

    sensor = fx.is_sensor[ia] | fx.is_sensor[ib]
    bullet = bodies.bullet[ba] | bodies.bullet[bb]
    both_dyn = bodies.is_dynamic[ba] & bodies.is_dynamic[bb]
    thick = fx.thick_shape[ia] | fx.thick_shape[ib]
    # b2Contact::IsToiCandidate (b2Contact.cpp:300-324)
    cand = pair_exists & ~sensor & (bullet | (~both_dyn & ~thick))
    # active: at least one awake non-static body (b2World.cpp:1534-1541)
    ns = ~bodies.is_static
    cand &= (bodies.awake[ba] & ns[ba]) | (bodies.awake[bb] & ns[bb])

    def round_body(_, carry):
        c, a, c0, a0, alpha0, v, w, awake, blocked, done = carry

        # --- per-candidate alpha (sync sweeps to common alpha0, run TOI)
        al0 = jnp.maximum(alpha0[ba], alpha0[bb])

        def adv(c0x, cx, a0x, ax, al0x, tgt):
            beta = (tgt - al0x) / jnp.where(al0x < 1.0, 1.0 - al0x, 1.0)
            return (c0x + beta[:, None] * (cx - c0x), a0x + beta * (ax - a0x))

        c0a, a0a = adv(c0[ba], c[ba], a0[ba], a[ba], alpha0[ba], al0)
        c0b, a0b = adv(c0[bb], c[bb], a0[bb], a[bb], alpha0[bb], al0)

        tstate, t = jax.vmap(dst.time_of_impact)(
            fx.verts[ia], fx.nverts[ia], fx.radius[ia],
            bodies.local_center[ba], c0a, c[ba], a0a, a[ba],
            fx.verts[ib], fx.nverts[ib], fx.radius[ib],
            bodies.local_center[bb], c0b, c[bb], a0b, a[bb],
            jnp.ones(nc, jnp.float32), cand & ~blocked)

        alpha_c = jnp.where(tstate == dst.TOI_TOUCHING,
                            jnp.minimum(al0 + (1.0 - al0) * t, 1.0), 1.0)
        alpha_c = jnp.where(cand & ~blocked, alpha_c, jnp.inf)
        k = jnp.argmin(alpha_c).astype(jnp.int32)
        alpha_min = alpha_c[k]
        act = ~done & (alpha_min < 1.0 - 10.0 * 1.1920929e-7)
        done = done | ~act
        alpha_min = jnp.where(act, alpha_min, 1.0)

        bA = ba[k]
        bB = bb[k]

        # --- advance both bodies to alpha_min (b2Body::Advance)
        def advance_body(bi):
            bet = (alpha_min - alpha0[bi]) / jnp.where(
                alpha0[bi] < 1.0, 1.0 - alpha0[bi], 1.0)
            c0n = c0[bi] + bet * (c[bi] - c0[bi])
            a0n = a0[bi] + bet * (a[bi] - a0[bi])
            return c0n, a0n

        c0A, a0A = advance_body(bA)
        c0B, a0B = advance_body(bB)

        def upd(arr, i, val, on):
            return arr.at[i].set(jnp.where(on, val, arr[i]))

        c = upd(c, bA, c0A, act)
        a = upd(a, bA, a0A, act)
        c0 = upd(c0, bA, c0A, act)
        a0 = upd(a0, bA, a0A, act)
        alpha0 = upd(alpha0, bA, alpha_min, act)
        c = upd(c, bB, c0B, act)
        a = upd(a, bB, a0B, act)
        c0 = upd(c0, bB, c0B, act)
        a0 = upd(a0, bB, a0B, act)
        alpha0 = upd(alpha0, bB, alpha_min, act)

        # --- re-collide the pair at the TOI transforms
        fa_k = ia[k]
        fb_k = ib[k]
        rows_a = _gather_rows(fx, fa_k)
        rows_b = _gather_rows(fx, fb_k)
        kind = nph.contact_kind(fx.shape_type[fa_k], fx.shape_type[fb_k])
        qA = rot_from_angle(a[bA])
        pA = c[bA] - rot_vec(qA, bodies.local_center[bA])
        qB = rot_from_angle(a[bB])
        pB = c[bB] - rot_vec(qB, bodies.local_center[bB])
        man = nph.collide(kind, rows_a, pA, qA, rows_b, pB, qB)
        hit = man.count > 0
        # mark this pair consumed either way (reference bumps m_toiCount /
        # disables non-touching TOI contacts for the rest of the step)
        blocked = blocked.at[k].set(jnp.where(act, True, blocked[k]))

        solve = act & hit
        mA = jnp.where(bodies.is_dynamic[bA], bodies.inv_mass[bA], 0.0)
        iA = jnp.where(bodies.is_dynamic[bA], bodies.inv_inertia[bA], 0.0)
        mB = jnp.where(bodies.is_dynamic[bB], bodies.inv_mass[bB], 0.0)
        iB = jnp.where(bodies.is_dynamic[bB], bodies.inv_inertia[bB], 0.0)
        lcA = bodies.local_center[bA]
        lcB = bodies.local_center[bB]
        raf = fx.radius[fa_k]
        rbf = fx.radius[fb_k]
        pc_k = man.count
        mpx = (man.points[0, 0], man.points[1, 0])
        mpy = (man.points[0, 1], man.points[1, 1])

        # --- TOI position sub-solve: 20 iterations, beta = 0.75
        def pos_pass(_, pcar):
            cax, cay, aa_, cbx, cby, ab_ = pcar
            cax, cay, aa_, cbx, cby, ab_, _ = position_contact_math_s(
                man.mtype, pc_k, mA, mB, iA, iB, raf, rbf,
                lcA[0], lcA[1], lcB[0], lcB[1],
                man.local_point[0], man.local_point[1],
                man.local_normal[0], man.local_normal[1],
                mpx, mpy, cax, cay, aa_, cbx, cby, ab_, solve,
                settings.TOI_BAUMGARTE, settings.MAX_LINEAR_CORRECTION)
            return cax, cay, aa_, cbx, cby, ab_

        cax, cay, aa_, cbx, cby, ab_ = jax.lax.fori_loop(
            0, 20, pos_pass,
            (c[bA, 0], c[bA, 1], a[bA], c[bB, 0], c[bB, 1], a[bB]))

        cA_new = jnp.stack([cax, cay])
        cB_new = jnp.stack([cbx, cby])
        c = upd(c, bA, cA_new, solve)
        a = upd(a, bA, aa_, solve)
        c = upd(c, bB, cB_new, solve)
        a = upd(a, bB, ab_, solve)
        # leap of faith (b2Island.cpp:468-471)
        c0 = upd(c0, bA, cA_new, solve)
        a0 = upd(a0, bA, aa_, solve)
        c0 = upd(c0, bB, cB_new, solve)
        a0 = upd(a0, bB, ab_, solve)

        # --- velocity sub-solve (no warm start) at the TOI configuration
        qA2 = rot_from_angle(a[bA])
        pA2 = c[bA] - rot_vec(qA2, lcA)
        qB2 = rot_from_angle(a[bB])
        pB2 = c[bB] - rot_vec(qB2, lcB)
        normal, pts, _ = csolver.world_manifold(
            man.mtype, man.local_point, man.local_normal, man.points,
            man.count, pA2, qA2, raf, pB2, qB2, rbf)
        r_a = pts - c[bA][None, :]
        r_b = pts - c[bB][None, :]
        nx, ny = normal[0], normal[1]
        rn_a = r_a[:, 0] * ny - r_a[:, 1] * nx
        rn_b = r_b[:, 0] * ny - r_b[:, 1] * nx
        k_n = mA + mB + iA * rn_a ** 2 + iB * rn_b ** 2
        nm = jnp.where(k_n > 0.0, 1.0 / jnp.where(k_n > 0.0, k_n, 1.0), 0.0)
        tx, ty = ny, -nx
        rt_a = r_a[:, 0] * ty - r_a[:, 1] * tx
        rt_b = r_b[:, 0] * ty - r_b[:, 1] * tx
        k_t = mA + mB + iA * rt_a ** 2 + iB * rt_b ** 2
        tm = jnp.where(k_t > 0.0, 1.0 / jnp.where(k_t > 0.0, k_t, 1.0), 0.0)
        fric = jnp.sqrt(fx.friction[fa_k] * fx.friction[fb_k])
        rest = jnp.maximum(fx.restitution[fa_k], fx.restitution[fb_k])
        dvx = v[bB, 0] - w[bB] * r_b[:, 1] - v[bA, 0] + w[bA] * r_a[:, 1]
        dvy = v[bB, 1] + w[bB] * r_b[:, 0] - v[bA, 1] - w[bA] * r_a[:, 0]
        v_rel = dvx * nx + dvy * ny
        bias = jnp.where(v_rel < -settings.VELOCITY_THRESHOLD, -rest * v_rel, 0.0)
        k11 = k_n[0]
        k22 = k_n[1]
        k12 = mA + mB + iA * rn_a[0] * rn_a[1] + iB * rn_b[0] * rn_b[1]
        det = k11 * k22 - k12 * k12
        well = k11 * k11 < 1000.0 * det
        pc2 = jnp.where((pc_k == 2) & ~well, 1, pc_k)
        inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)

        def vel_pass(_, vcar):
            ni0, ni1, ti0, ti1, vax, vay, wa_, vbx, vby, wb_ = vcar
            (ni0n, ni1n), (ti0n, ti1n), vax, vay, wa_, vbx, vby, wb_ = \
                velocity_contact_math_s(
                    fric, jnp.float32(0.0), mA, mB, iA, iB, nx, ny,
                    (r_a[0, 0], r_a[1, 0]), (r_a[0, 1], r_a[1, 1]),
                    (r_b[0, 0], r_b[1, 0]), (r_b[0, 1], r_b[1, 1]),
                    (nm[0], nm[1]), (tm[0], tm[1]), (bias[0], bias[1]),
                    k11, k12, k22, inv_det * k22, -inv_det * k12,
                    inv_det * k11, pc2,
                    (ni0, ni1), (ti0, ti1),
                    vax, vay, wa_, vbx, vby, wb_, solve)
            return ni0n, ni1n, ti0n, ti1n, vax, vay, wa_, vbx, vby, wb_

        z = jnp.float32(0.0)
        _, _, _, _, vax, vay, wa_, vbx, vby, wb_ = jax.lax.fori_loop(
            0, velocity_iterations, vel_pass,
            (z, z, z, z, v[bA, 0], v[bA, 1], w[bA], v[bB, 0], v[bB, 1], w[bB]))
        v = upd(v, bA, jnp.stack([vax, vay]), solve)
        w = upd(w, bA, wa_, solve)
        v = upd(v, bB, jnp.stack([vbx, vby]), solve)
        w = upd(w, bB, wb_, solve)

        # --- complete the remainder of the step for the pair
        h = (1.0 - alpha_min) * dt

        def integrate_one(bi):
            vv, ww = v[bi], w[bi]
            t2 = h * h * (vv[0] ** 2 + vv[1] ** 2)
            rat = jnp.where(t2 > settings.MAX_TRANSLATION_SQUARED,
                            settings.MAX_TRANSLATION / jnp.sqrt(jnp.maximum(t2, 1e-30)), 1.0)
            vv = vv * rat
            rot = h * ww
            ratr = jnp.where(rot * rot > settings.MAX_ROTATION_SQUARED,
                             settings.MAX_ROTATION / jnp.abs(jnp.where(rot == 0.0, 1.0, rot)), 1.0)
            ww = ww * ratr
            dyn_i = bodies.is_dynamic[bi] | (bodies.body_type[bi] == settings.KINEMATIC_BODY)
            return (jnp.where(dyn_i, c[bi] + h * vv, c[bi]),
                    jnp.where(dyn_i, a[bi] + h * ww, a[bi]), vv, ww)

        cA3, aA3, vA3, wA3 = integrate_one(bA)
        cB3, aB3, vB3, wB3 = integrate_one(bB)
        c = upd(c, bA, cA3, solve)
        a = upd(a, bA, aA3, solve)
        v = upd(v, bA, vA3, solve)
        w = upd(w, bA, wA3, solve)
        c = upd(c, bB, cB3, solve)
        a = upd(a, bB, aB3, solve)
        v = upd(v, bB, vB3, solve)
        w = upd(w, bB, wB3, solve)

        # wake the pair on impact
        awake = awake.at[bA].set(jnp.where(solve & ~bodies.is_static[bA], True, awake[bA]))
        awake = awake.at[bB].set(jnp.where(solve & ~bodies.is_static[bB], True, awake[bB]))
        return c, a, c0, a0, alpha0, v, w, awake, blocked, done

    blocked0 = contacts.toi_count >= settings.MAX_SUB_STEPS
    carry = (bodies.c, bodies.a, bodies.c0, bodies.a0,
             jnp.zeros(nb, jnp.float32), bodies.v, bodies.w, bodies.awake,
             blocked0, jnp.bool_(False))
    def toi_cond(rc):
        k, inner = rc
        return (k < toi_rounds) & ~inner[-1]

    def toi_body(rc):
        k, inner = rc
        return k + 1, round_body(k, inner)

    _, (c, a, c0, a0, alpha0, v, w, awake, blocked, _) = jax.lax.while_loop(
        toi_cond, toi_body, (jnp.int32(0), carry))

    bodies = dataclasses.replace(
        state.bodies, c=c, a=a, c0=c0, a0=a0,
        alpha0=jnp.zeros(nb, jnp.float32), v=v, w=w, awake=awake)
    return dataclasses.replace(state, bodies=bodies)


@partial(jax.jit, static_argnames=(
    "velocity_iterations", "position_iterations", "warm_starting",
    "allow_sleep", "max_colors", "continuous", "toi_rounds"))
def step(state: State, dt, velocity_iterations: int = 8,
         position_iterations: int = 3, warm_starting: bool = True,
         allow_sleep: bool = True, max_colors: int = settings.MAX_COLORS,
         continuous: bool = True, toi_rounds: int = 8
         ) -> Tuple[State, Events]:
    dt = jnp.asarray(dt, jnp.float32)
    pre = _pre_solve(state, dt, warm_starting, max_colors)
    mids = _solve_middle_xla(state, pre, dt, velocity_iterations,
                             position_iterations, warm_starting, max_colors)
    new_state, events = _post_solve(state, pre, dt, allow_sleep, *mids)
    if continuous and toi_rounds > 0:
        new_state = _solve_toi(new_state, dt, velocity_iterations, toi_rounds)
    return new_state, events


@partial(jax.jit, static_argnames=(
    "velocity_iterations", "position_iterations", "warm_starting",
    "allow_sleep", "max_colors", "tile_worlds"))
def step_batched_pallas(states: State, dt, velocity_iterations: int = 8,
                        position_iterations: int = 3, warm_starting: bool = True,
                        allow_sleep: bool = True,
                        max_colors: int = settings.MAX_COLORS,
                        tile_worlds: int = 8) -> Tuple[State, Events]:
    """Batched step whose solver middle phase runs as ONE fused Pallas
    kernel across all worlds (ops/pallas_solver.py). Joint-free worlds only
    (joints interleave per iteration and currently solve in XLA)."""
    from .ops import pallas_solver

    assert not joints_present(states.joints), (
        "step_batched_pallas: worlds with joints must use the XLA path")
    dt = jnp.asarray(dt, jnp.float32)

    pre = jax.vmap(lambda s: _pre_solve(s, dt, warm_starting, max_colors))(states)

    cf, ci = jax.vmap(pallas_solver.pack_for_kernel)(pre.cc, pre.color)
    zeros_n = jnp.zeros_like(states.bodies.a)
    bsps = jnp.stack([
        pre.bs[..., 0], pre.bs[..., 1], pre.bs[..., 2],
        pre.solve_mask.astype(jnp.float32),
        states.bodies.c[..., 0], states.bodies.c[..., 1], states.bodies.a,
        zeros_n], axis=1)                                  # (W, 8, N)
    imp = jnp.stack([pre.ni_it[..., 0], pre.ni_it[..., 1],
                     pre.ti_it[..., 0], pre.ti_it[..., 1]], axis=1)  # (W,4,C)

    imp, bsps, min_sep = pallas_solver.fused_solve(
        cf, ci, imp, bsps, dt, vel_iters=velocity_iterations,
        pos_iters=position_iterations, max_colors=max_colors,
        tile_worlds=tile_worlds)

    ni_it = jnp.stack([imp[:, 0], imp[:, 1]], axis=-1)
    ti_it = jnp.stack([imp[:, 2], imp[:, 3]], axis=-1)
    v = jnp.stack([bsps[:, 0], bsps[:, 1]], axis=-1)
    w = bsps[:, 2]
    c = jnp.stack([bsps[:, 4], bsps[:, 5]], axis=-1)
    a = bsps[:, 6]
    nb = states.bodies.capacity
    jok = jnp.ones((pre.bs.shape[0], nb), bool)

    return jax.vmap(
        lambda s, p, nii, tii, cc_, aa_, vv_, ww_, ms_, jk_: _post_solve(
            s, p, dt, allow_sleep, nii, tii, cc_, aa_, vv_, ww_, ms_, jk_,
            s.joints)
    )(states, pre, ni_it, ti_it, c, a, v, w, min_sep, jok)


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
               contact_capacity: Optional[int] = None) -> State:
        nb = body_capacity or _next_pow2(len(self._bodies))
        nf = fixture_capacity or _next_pow2(len(self._fixtures))
        nc = contact_capacity or _next_pow2(max(64, 4 * len(self._fixtures)))
        assert nb >= len(self._bodies) and nf >= len(self._fixtures)

        bodies = _pack_bodies(self._bodies, self._fixtures, nb)
        fixtures = _pack_fixtures(self._fixtures, nf)
        contacts = _empty_contacts(nc)
        joints = build_joints(self._joints)

        state = State(
            bodies=bodies, fixtures=fixtures, contacts=contacts,
            joints=joints,
            gravity=jnp.asarray(self.gravity, jnp.float32),
            inv_dt0=jnp.float32(0.0),
        )
        return _init_broadphase(state)


@jax.jit
def _init_broadphase(state: State) -> State:
    """Create initial fat AABBs + pair table (the construction-time
    FindNewContacts pass, b2World.cpp:1628-1639)."""
    p, q = _body_xf(state.bodies)
    fb = jnp.clip(state.fixtures.body, 0)
    lo, hi = broadphase.initial_fat_aabbs(state.fixtures, p[fb], q[fb])
    fx = dataclasses.replace(state.fixtures, aabb_lo=lo, aabb_hi=hi)
    state = dataclasses.replace(state, fixtures=fx)
    f_a, f_b, _ = broadphase.find_pairs_allpairs(state, state.contacts.capacity)
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
    )


def build_joints(joint_defs: dict) -> Joints:
    from .joints import build_joints as _bj
    return _bj(joint_defs)
