"""Functional between-step mutations — the b2Body/b2World setter API
(reference: b2Body.h:139-430) as pure State -> State transforms.

All functions are jit-friendly and take either scalar body indices or index
arrays; they are the TPU replacement for calling setters on body pointers
between steps.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from . import settings, shapes
from .math2d import cross_sv, rot_from_angle, rot_vec
from .state import State


def _upd_bodies(state, **kw):
    return dataclasses.replace(state, bodies=dataclasses.replace(state.bodies, **kw))


def set_transform(state: State, body, position, angle) -> State:
    """b2Body::SetTransform: origin position + angle; recomputes sweep
    center; resets sweep start. Does NOT wake the body (reference behavior)."""
    b = state.bodies
    position = jnp.asarray(position, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    q = rot_from_angle(angle)
    c = position + rot_vec(q, b.local_center[body])
    bodies = dataclasses.replace(
        b,
        c=b.c.at[body].set(c), a=b.a.at[body].set(angle),
        c0=b.c0.at[body].set(c), a0=b.a0.at[body].set(angle))
    state = dataclasses.replace(state, bodies=bodies)
    return _resync_fixtures(state, body)


def _resync_fixtures(state: State, body) -> State:
    """Refresh fat AABBs of the moved body's fixtures so the next step's
    pair pass sees the teleport (b2Body::SetTransform synchronizes proxies)."""
    from .ops import broadphase
    fx = state.fixtures
    bset = jnp.isin(fx.body, jnp.atleast_1d(jnp.asarray(body)))
    q = rot_from_angle(state.bodies.a)
    p = state.bodies.c - rot_vec(q, state.bodies.local_center)
    fb = jnp.clip(fx.body, 0)
    lo, hi = broadphase.tight_aabbs(fx, p[fb], q[fb])
    lo -= settings.AABB_EXTENSION
    hi += settings.AABB_EXTENSION
    fx = dataclasses.replace(
        fx,
        aabb_lo=jnp.where(bset[:, None], lo, fx.aabb_lo),
        aabb_hi=jnp.where(bset[:, None], hi, fx.aabb_hi))
    return dataclasses.replace(state, fixtures=fx)


def set_linear_velocity(state: State, body, v) -> State:
    b = state.bodies
    return _upd_bodies(state, v=b.v.at[body].set(jnp.asarray(v, jnp.float32)),
                       awake=b.awake.at[body].set(True))


def set_angular_velocity(state: State, body, w) -> State:
    b = state.bodies
    return _upd_bodies(state, w=b.w.at[body].set(jnp.float32(w)),
                       awake=b.awake.at[body].set(True))


def apply_force(state: State, body, force, point=None, wake=True) -> State:
    """b2Body::ApplyForce / ApplyForceToCenter."""
    b = state.bodies
    force = jnp.asarray(force, jnp.float32)
    new_force = b.force.at[body].add(force)
    if point is None:
        new_torque = b.torque
    else:
        point = jnp.asarray(point, jnp.float32)
        r = point - b.c[body]
        new_torque = b.torque.at[body].add(r[..., 0] * force[..., 1]
                                           - r[..., 1] * force[..., 0])
    kw = dict(force=new_force, torque=new_torque)
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_torque(state: State, body, torque, wake=True) -> State:
    b = state.bodies
    kw = dict(torque=b.torque.at[body].add(jnp.float32(torque)))
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_linear_impulse(state: State, body, impulse, point, wake=True) -> State:
    """b2Body::ApplyLinearImpulse."""
    b = state.bodies
    impulse = jnp.asarray(impulse, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    r = point - b.c[body]
    new_v = b.v.at[body].add(b.inv_mass[body, None] * impulse)
    new_w = b.w.at[body].add(b.inv_inertia[body] *
                             (r[..., 0] * impulse[..., 1] - r[..., 1] * impulse[..., 0]))
    kw = dict(v=new_v, w=new_w)
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def apply_angular_impulse(state: State, body, impulse, wake=True) -> State:
    b = state.bodies
    kw = dict(w=b.w.at[body].add(b.inv_inertia[body] * jnp.float32(impulse)))
    if wake:
        kw["awake"] = b.awake.at[body].set(True)
    return _upd_bodies(state, **kw)


def set_type(state: State, body, body_type) -> State:
    """b2Body::SetType (b2Body.cpp): change static/kinematic/dynamic;
    resets mass data, zeroes velocity for static, wakes the body, and
    dirties the pair table (contact filtering depends on types)."""
    b = state.bodies
    static = body_type == settings.STATIC_BODY
    bodies = dataclasses.replace(
        b,
        body_type=b.body_type.at[body].set(body_type),
        v=b.v.at[body].set(jnp.where(static, 0.0, b.v[body])),
        w=b.w.at[body].set(jnp.where(static, 0.0, b.w[body])),
        c0=b.c0.at[body].set(b.c[body]), a0=b.a0.at[body].set(b.a[body]),
        awake=b.awake.at[body].set(True),
        sleep_time=b.sleep_time.at[body].set(0.0))
    state = dataclasses.replace(state, bodies=bodies,
                                pairs_dirty=jnp.asarray(True))
    return _reset_mass_data(state, body)


def set_bullet(state: State, body, flag: bool) -> State:
    """b2Body::SetBullet — toggles CCD candidacy (evaluated per step)."""
    b = state.bodies
    return _upd_bodies(state, bullet=b.bullet.at[body].set(flag))


def set_enabled(state: State, body, flag: bool) -> State:
    """b2Body::SetActive analog: enabled bodies collide; disabling drops
    the body's contacts at the next pair refresh."""
    b = state.bodies
    state = _upd_bodies(state, enabled=b.enabled.at[body].set(flag))
    return dataclasses.replace(state, pairs_dirty=jnp.asarray(True))


def set_fixed_rotation(state: State, body, flag: bool) -> State:
    """b2Body::SetFixedRotation: zeroes angular velocity, resets mass."""
    b = state.bodies
    state = _upd_bodies(
        state, fixed_rotation=b.fixed_rotation.at[body].set(flag),
        w=b.w.at[body].set(0.0))
    return _reset_mass_data(state, body)


def set_linear_damping(state: State, body, value) -> State:
    b = state.bodies
    return _upd_bodies(
        state, linear_damping=b.linear_damping.at[body].set(
            jnp.float32(value)))


def set_angular_damping(state: State, body, value) -> State:
    b = state.bodies
    return _upd_bodies(
        state, angular_damping=b.angular_damping.at[body].set(
            jnp.float32(value)))


def set_gravity_scale(state: State, body, value) -> State:
    b = state.bodies
    return _upd_bodies(
        state, gravity_scale=b.gravity_scale.at[body].set(
            jnp.float32(value)))


def set_sensor(state: State, fixture, flag: bool) -> State:
    """b2Fixture::SetSensor."""
    fx = state.fixtures
    fx = dataclasses.replace(fx, is_sensor=fx.is_sensor.at[fixture].set(flag))
    return dataclasses.replace(state, fixtures=fx)


def set_thick_shape(state: State, fixture, flag: bool) -> State:
    """MT fork b2Fixture::SetThickShape (b2Fixture.cpp:241-258): opts the
    fixture out of non-bullet CCD (candidacy is evaluated per step)."""
    fx = state.fixtures
    fx = dataclasses.replace(fx,
                             thick_shape=fx.thick_shape.at[fixture].set(flag))
    return dataclasses.replace(state, fixtures=fx)


def set_filter(state: State, fixture, category=None, mask=None,
               group=None) -> State:
    """b2Fixture::SetFilterData + Refilter: next step re-finds pairs."""
    fx = state.fixtures
    kw = {}
    if category is not None:
        kw["filter_category"] = fx.filter_category.at[fixture].set(category)
    if mask is not None:
        kw["filter_mask"] = fx.filter_mask.at[fixture].set(mask)
    if group is not None:
        kw["filter_group"] = fx.filter_group.at[fixture].set(group)
    return dataclasses.replace(
        state, fixtures=dataclasses.replace(fx, **kw),
        pairs_dirty=jnp.asarray(True))


# --------------------------------------------------------------------------
# runtime world mutation: alloc/free into capacity slots
# (b2World::CreateBody/DestroyBody/CreateFixture, b2World.cpp:549-832)
# --------------------------------------------------------------------------


def _fixture_mass_all(fx):
    """Per-fixture (mass, center, inertia-about-origin) from the packed
    shape rows — the device form of b2Shape::ComputeMass
    (b2CircleShape.cpp:73-80, b2PolygonShape.cpp ComputeMass,
    b2EdgeShape.cpp:123-129). Returns ((F,), (F,2), (F,))."""
    i8 = jnp.arange(settings.MAX_POLYGON_VERTICES)
    n = jnp.maximum(fx.nverts, 1)
    valid = i8[None, :] < fx.nverts[:, None]
    nf = fx.verts.shape[0]

    # polygon: triangle fan about the vertex mean
    s = (jnp.sum(jnp.where(valid[..., None], fx.verts, 0.0), axis=1)
         / n[:, None].astype(jnp.float32))
    nxt = jnp.where(i8[None, :] + 1 < fx.nverts[:, None], i8[None, :] + 1, 0)
    oh = nxt[:, :, None] == i8[None, None, :]
    vnext = jnp.einsum("fij,fjk->fik", oh.astype(jnp.float32), fx.verts)
    e1 = fx.verts - s[:, None, :]
    e2 = vnext - s[:, None, :]
    d = jnp.where(valid, e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0],
                  0.0)
    tri = 0.5 * d
    area = jnp.sum(tri, axis=1)
    safe_area = jnp.where(area != 0.0, area, 1.0)
    center = jnp.sum((tri / 3.0)[..., None] * (e1 + e2), axis=1) / \
        safe_area[:, None]
    intx2 = e1[..., 0] ** 2 + e2[..., 0] * e1[..., 0] + e2[..., 0] ** 2
    inty2 = e1[..., 1] ** 2 + e2[..., 1] * e1[..., 1] + e2[..., 1] ** 2
    i0 = jnp.sum(jnp.where(valid, 0.25 / 3.0 * d * (intx2 + inty2), 0.0),
                 axis=1)
    mass_p = fx.density * area
    com_p = center + s
    inertia_p = fx.density * i0 + mass_p * (
        jnp.sum(com_p * com_p, axis=1) - jnp.sum(center * center, axis=1))

    # circle
    mass_c = fx.density * jnp.pi * fx.radius ** 2
    com_c = fx.verts[:, 0]
    inertia_c = mass_c * (0.5 * fx.radius ** 2
                          + jnp.sum(com_c * com_c, axis=1))

    is_poly = fx.shape_type == settings.SHAPE_POLYGON
    is_circle = fx.shape_type == settings.SHAPE_CIRCLE
    exists = fx.body >= 0
    mass = jnp.where(exists & is_poly, mass_p,
                     jnp.where(exists & is_circle, mass_c, 0.0))
    com = jnp.where(is_poly[:, None], com_p, com_c)
    inertia = jnp.where(exists & is_poly, inertia_p,
                        jnp.where(exists & is_circle, inertia_c, 0.0))
    return mass, com, inertia


def _reset_mass_data(state: State, body) -> State:
    """b2Body::ResetMassData (b2Body.cpp): recompute mass/center/inertia
    from the body's current fixtures; keeps the origin transform fixed and
    corrects the center velocity."""
    b = state.bodies
    fx = state.fixtures
    fmass, fcom, finertia = _fixture_mass_all(fx)
    mine = fx.body == body
    mass = jnp.sum(jnp.where(mine, fmass, 0.0))
    lc = jnp.sum(jnp.where(mine[:, None], fmass[:, None] * fcom, 0.0),
                 axis=0) / jnp.where(mass > 0.0, mass, 1.0)
    inertia = jnp.sum(jnp.where(mine, finertia, 0.0))

    dyn = b.body_type[body] == settings.DYNAMIC_BODY
    has_mass = dyn & (mass > 0.0)
    mass = jnp.where(dyn, jnp.where(has_mass, mass, 1.0), 0.0)
    lc = jnp.where(has_mass, lc, jnp.zeros(2))
    inertia = jnp.where(
        has_mass & ~b.fixed_rotation[body],
        inertia - mass * jnp.sum(lc * lc), 0.0)
    inv_mass = jnp.where(dyn, 1.0 / mass, 0.0)
    inv_i = jnp.where(inertia > 0.0, 1.0 / jnp.where(inertia > 0.0,
                                                     inertia, 1.0), 0.0)

    # move the sweep center, keep the origin; v += cross(w, c_new - c_old)
    q = rot_from_angle(b.a[body])
    origin = b.c[body] - rot_vec(q, b.local_center[body])
    c_new = origin + rot_vec(q, lc)
    dv = cross_sv(b.w[body], c_new - b.c[body])
    bodies = dataclasses.replace(
        b,
        inv_mass=b.inv_mass.at[body].set(inv_mass),
        inv_inertia=b.inv_inertia.at[body].set(inv_i),
        local_center=b.local_center.at[body].set(lc),
        c=b.c.at[body].set(c_new), c0=b.c0.at[body].set(c_new),
        v=b.v.at[body].add(dv))
    return dataclasses.replace(state, bodies=bodies)


def add_body(state: State, body_type=settings.STATIC_BODY,
             position=(0.0, 0.0), angle=0.0, linear_velocity=(0.0, 0.0),
             angular_velocity=0.0, linear_damping=0.0, angular_damping=0.0,
             allow_sleep=True, awake=True, fixed_rotation=False,
             bullet=False, enabled=True, gravity_scale=1.0):
    """b2World::CreateBody (b2World.cpp:549-583) into the first free body
    slot. Returns (state, index); index is -1 when capacity is full (state
    unchanged). Dynamic bodies start with mass 1 until a fixture with
    density is added (b2Body ctor semantics)."""
    b = state.bodies
    free = b.body_type < 0
    idx = jnp.argmax(free).astype(jnp.int32)
    ok = free[idx]
    position = jnp.asarray(position, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    v = jnp.asarray(linear_velocity, jnp.float32)
    dyn = body_type == settings.DYNAMIC_BODY

    def w(arr, val):
        return arr.at[idx].set(jnp.where(ok, val, arr[idx]))

    bodies = dataclasses.replace(
        b,
        body_type=w(b.body_type, jnp.where(ok, body_type, -1)),
        c=b.c.at[idx].set(jnp.where(ok, position, b.c[idx])),
        a=w(b.a, angle),
        c0=b.c0.at[idx].set(jnp.where(ok, position, b.c0[idx])),
        a0=w(b.a0, angle), alpha0=w(b.alpha0, 0.0),
        local_center=b.local_center.at[idx].set(
            jnp.where(ok, jnp.zeros(2), b.local_center[idx])),
        v=b.v.at[idx].set(jnp.where(ok, v, b.v[idx])),
        w=w(b.w, jnp.float32(angular_velocity)),
        force=b.force.at[idx].set(jnp.where(ok, jnp.zeros(2), b.force[idx])),
        torque=w(b.torque, 0.0),
        inv_mass=w(b.inv_mass, jnp.float32(1.0 if dyn else 0.0)),
        inv_inertia=w(b.inv_inertia, 0.0),
        linear_damping=w(b.linear_damping, jnp.float32(linear_damping)),
        angular_damping=w(b.angular_damping, jnp.float32(angular_damping)),
        gravity_scale=w(b.gravity_scale, jnp.float32(gravity_scale)),
        awake=w(b.awake, awake), allow_sleep=w(b.allow_sleep, allow_sleep),
        fixed_rotation=w(b.fixed_rotation, fixed_rotation),
        bullet=w(b.bullet, bullet), enabled=w(b.enabled, enabled),
        sleep_time=w(b.sleep_time, 0.0))
    state = dataclasses.replace(state, bodies=bodies)
    return state, jnp.where(ok, idx, -1)


def add_fixture(state: State, body, shape, density=0.0, friction=0.2,
                restitution=0.0, is_sensor=False, filter_category=1,
                filter_mask=0xFFFF, filter_group=0, thick_shape=False):
    """b2Body::CreateFixture into the first free fixture slot. `shape` is a
    host shapes.Circle/Edge/Polygon (static under jit). Recomputes the
    body's mass data, fattens the new proxy AABB, and marks the pair table
    dirty. Returns (state, fixture_index); -1 when full."""
    row = _shape_row(shape)
    fx = state.fixtures
    free = fx.body < 0
    idx = jnp.argmax(free).astype(jnp.int32)
    ok = free[idx]
    body = jnp.asarray(body, jnp.int32)

    def w(arr, val):
        return arr.at[idx].set(jnp.where(ok, val, arr[idx]))

    fixtures = dataclasses.replace(
        fx,
        body=w(fx.body, body),
        shape_type=w(fx.shape_type, row["shape_type"]),
        radius=w(fx.radius, row["radius"]),
        verts=fx.verts.at[idx].set(
            jnp.where(ok, row["verts"], fx.verts[idx])),
        normals=fx.normals.at[idx].set(
            jnp.where(ok, row["normals"], fx.normals[idx])),
        nverts=w(fx.nverts, row["nverts"]),
        ghosts=fx.ghosts.at[idx].set(
            jnp.where(ok, row["ghosts"], fx.ghosts[idx])),
        friction=w(fx.friction, jnp.float32(friction)),
        restitution=w(fx.restitution, jnp.float32(restitution)),
        density=w(fx.density, jnp.float32(density)),
        is_sensor=w(fx.is_sensor, is_sensor),
        filter_category=w(fx.filter_category, filter_category),
        filter_mask=w(fx.filter_mask, filter_mask),
        filter_group=w(fx.filter_group, filter_group),
        thick_shape=w(fx.thick_shape, thick_shape))
    state = dataclasses.replace(state, fixtures=fixtures)
    state = _reset_mass_data(state, body)

    # initial fat AABB (b2DynamicTree::CreateProxy) + dirty pair table
    from .ops import broadphase
    b = state.bodies
    q = rot_from_angle(b.a)
    p = b.c - rot_vec(q, b.local_center)
    fb = jnp.clip(state.fixtures.body, 0)
    lo, hi = broadphase.tight_aabbs(state.fixtures, p[fb], q[fb])
    sel = (jnp.arange(fx.capacity) == idx) & ok
    fixtures = dataclasses.replace(
        state.fixtures,
        aabb_lo=jnp.where(sel[:, None], lo - settings.AABB_EXTENSION,
                          state.fixtures.aabb_lo),
        aabb_hi=jnp.where(sel[:, None], hi + settings.AABB_EXTENSION,
                          state.fixtures.aabb_hi))
    state = dataclasses.replace(state, fixtures=fixtures,
                                pairs_dirty=jnp.asarray(True))
    return state, jnp.where(ok, idx, -1)


def _shape_row(shape):
    """Host shape -> packed fixture row values (the single-fixture form of
    WorldBuilder._pack_fixtures)."""
    verts = np.zeros((settings.MAX_POLYGON_VERTICES, 2), np.float32)
    normals = np.zeros((settings.MAX_POLYGON_VERTICES, 2), np.float32)
    ghosts = np.zeros(2, bool)
    if isinstance(shape, shapes.Circle):
        stype, radius, nverts = settings.SHAPE_CIRCLE, shape.radius, 1
        verts[0] = shape.center
    elif isinstance(shape, shapes.Edge):
        stype, radius, nverts = settings.SHAPE_EDGE, shape.radius, 2
        verts[0] = shape.v1
        verts[1] = shape.v2
        if shape.v0 is not None:
            verts[2] = shape.v0
            ghosts[0] = True
        if shape.v3 is not None:
            verts[3] = shape.v3
            ghosts[1] = True
    elif isinstance(shape, shapes.Polygon):
        stype, radius = settings.SHAPE_POLYGON, shape.radius
        nverts = len(shape.vertices)
        verts[:nverts] = shape.vertices
        normals[:nverts] = shape.normals
    else:
        raise TypeError(f"unknown shape {type(shape)}")
    return dict(shape_type=jnp.int32(stype), radius=jnp.float32(radius),
                nverts=jnp.int32(nverts), verts=jnp.asarray(verts),
                normals=jnp.asarray(normals), ghosts=jnp.asarray(ghosts))


def _clear_contacts_of_fixtures(state: State, fmask) -> State:
    """Kill contact slots referencing masked fixtures (DestroyBody clears
    the body's contact list immediately, b2World.cpp:636-649)."""
    c = state.contacts
    dead = fmask[jnp.clip(c.f_a, 0)] | fmask[jnp.clip(c.f_b, 0)]
    contacts = dataclasses.replace(
        c,
        f_a=jnp.where(dead, -1, c.f_a), f_b=jnp.where(dead, -1, c.f_b),
        touching=c.touching & ~dead,
        m_count=jnp.where(dead, 0, c.m_count))
    return dataclasses.replace(state, contacts=contacts,
                               pairs_dirty=jnp.asarray(True))


def remove_fixture(state: State, fixture) -> State:
    """b2Body::DestroyFixture: free the slot, recompute the body's mass,
    drop its contacts, dirty the pair table."""
    fx = state.fixtures
    fixture = jnp.asarray(fixture, jnp.int32)
    owner = fx.body[fixture]
    fixtures = dataclasses.replace(fx, body=fx.body.at[fixture].set(-1))
    state = dataclasses.replace(state, fixtures=fixtures)
    state = _clear_contacts_of_fixtures(
        state, jnp.arange(fx.capacity) == fixture)
    return _reset_mass_data(state, owner)


def remove_body(state: State, body) -> State:
    """b2World::DestroyBody (b2World.cpp:585-677): free the body slot, its
    fixtures, its contacts; deactivate joints attached to it."""
    b = state.bodies
    fx = state.fixtures
    body = jnp.asarray(body, jnp.int32)
    fmask = fx.body == body
    fixtures = dataclasses.replace(
        fx, body=jnp.where(fmask, -1, fx.body))
    bodies = dataclasses.replace(
        b,
        body_type=b.body_type.at[body].set(-1),
        v=b.v.at[body].set(0.0), w=b.w.at[body].set(0.0),
        awake=b.awake.at[body].set(False))
    state = dataclasses.replace(state, bodies=bodies, fixtures=fixtures)
    state = _clear_contacts_of_fixtures(state, fmask)

    # deactivate attached joints (DestroyBody destroys the joint list)
    joints = state.joints
    upd = {}
    for name in ("revolute", "distance", "prismatic", "mouse", "weld",
                 "friction", "rope", "motor", "wheel", "pulley", "gear"):
        blk = getattr(joints, name)
        if blk.body_a.shape[0] == 0:
            continue
        hit = (blk.body_a == body) | (blk.body_b == body)
        if name == "gear":
            hit = hit | (blk.body_c == body) | (blk.body_d == body)
        upd[name] = dataclasses.replace(blk, active=blk.active & ~hit)
    if upd:
        state = dataclasses.replace(
            state, joints=dataclasses.replace(joints, **upd))
    return state


def remove_joint(state: State, kind: str, index) -> State:
    """b2World::DestroyJoint analog: deactivate the joint slot."""
    blk = getattr(state.joints, kind)
    blk = dataclasses.replace(blk, active=blk.active.at[index].set(False))
    return dataclasses.replace(
        state, joints=dataclasses.replace(state.joints, **{kind: blk}),
        pairs_dirty=jnp.asarray(True))


def set_awake(state: State, body, flag: bool) -> State:
    b = state.bodies
    if flag:
        return _upd_bodies(state, awake=b.awake.at[body].set(True),
                           sleep_time=b.sleep_time.at[body].set(0.0))
    return _upd_bodies(
        state,
        awake=b.awake.at[body].set(False),
        sleep_time=b.sleep_time.at[body].set(0.0),
        v=b.v.at[body].set(0.0), w=b.w.at[body].set(0.0),
        force=b.force.at[body].set(0.0), torque=b.torque.at[body].set(0.0))
