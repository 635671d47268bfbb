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


def set_friction(state: State, fixture, value) -> State:
    """b2Fixture::SetFriction (b2Fixture.h:187-194). The solver re-mixes
    contact friction from the fixtures every step, so this takes effect on
    existing contacts immediately (the reference requires
    b2Contact::ResetFriction for that; here it is automatic)."""
    fx = state.fixtures
    return dataclasses.replace(
        state, fixtures=dataclasses.replace(
            fx, friction=fx.friction.at[fixture].set(jnp.float32(value))))


def set_restitution(state: State, fixture, value) -> State:
    """b2Fixture::SetRestitution (b2Fixture.h:326-340); re-mixed per step
    like set_friction."""
    fx = state.fixtures
    return dataclasses.replace(
        state, fixtures=dataclasses.replace(
            fx, restitution=fx.restitution.at[fixture].set(
                jnp.float32(value))))


def set_density(state: State, fixture, value) -> State:
    """b2Fixture::SetDensity + b2Body::ResetMassData (the reference requires
    the explicit ResetMassData call; here it is performed immediately)."""
    fx = state.fixtures
    state = dataclasses.replace(
        state, fixtures=dataclasses.replace(
            fx, density=fx.density.at[fixture].set(jnp.float32(value))))
    return _reset_mass_data(state, state.fixtures.body[fixture])


def _contact_slot(state: State, fixture_a, fixture_b):
    """Locate the contact slot holding the canonical (fixture_a, fixture_b)
    pair; returns (slot, found). Works between steps on the persistent pair
    table."""
    c = state.contacts
    lo = jnp.minimum(jnp.asarray(fixture_a), jnp.asarray(fixture_b))
    hi = jnp.maximum(jnp.asarray(fixture_a), jnp.asarray(fixture_b))
    slot_lo = jnp.minimum(c.f_a, c.f_b)
    slot_hi = jnp.maximum(c.f_a, c.f_b)
    hit = (slot_lo == lo) & (slot_hi == hi) & (c.f_a >= 0)
    return jnp.argmax(hit).astype(jnp.int32), jnp.any(hit)


def set_contact_tangent_speed(state: State, fixture_a, fixture_b,
                              speed) -> State:
    """b2Contact::SetTangentSpeed (b2Contact.h:157): conveyor-belt surface
    speed in m/s along the contact tangent. Persists for the life of the
    pair; no-op if the fixtures currently share no contact slot."""
    slot, found = _contact_slot(state, fixture_a, fixture_b)
    c = state.contacts
    val = jnp.where(found, jnp.float32(speed), c.tangent_speed[slot])
    return dataclasses.replace(
        state, contacts=dataclasses.replace(
            c, tangent_speed=c.tangent_speed.at[slot].set(val)))


def set_contact_friction(state: State, fixture_a, fixture_b,
                         value=None) -> State:
    """b2Contact::SetFriction / ResetFriction (b2Contact.h:126-141):
    value=None restores the default fixture mixing."""
    slot, found = _contact_slot(state, fixture_a, fixture_b)
    c = state.contacts
    v = jnp.float32(-1.0 if value is None else value)
    val = jnp.where(found, v, c.friction_override[slot])
    return dataclasses.replace(
        state, contacts=dataclasses.replace(
            c, friction_override=c.friction_override.at[slot].set(val)))


def set_contact_restitution(state: State, fixture_a, fixture_b,
                            value=None) -> State:
    """b2Contact::SetRestitution / ResetRestitution (b2Contact.h:143-150)."""
    slot, found = _contact_slot(state, fixture_a, fixture_b)
    c = state.contacts
    v = jnp.float32(-1.0 if value is None else value)
    val = jnp.where(found, v, c.restitution_override[slot])
    return dataclasses.replace(
        state, contacts=dataclasses.replace(
            c, restitution_override=c.restitution_override.at[slot].set(val)))


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


# --------------------------------------------------------------------------
# runtime joint creation — b2World::CreateJoint (b2World.cpp:679-832) into
# preallocated per-type capacity slots (WorldBuilder.freeze(joint_capacity=
# {...})). Anchors are resolved against the bodies' CURRENT transforms on
# device, exactly like the reference joint Initialize() helpers.
# --------------------------------------------------------------------------


def _body_origin_q(b, body):
    q = rot_from_angle(b.a[body])
    origin = b.c[body] - rot_vec(q, b.local_center[body])
    return origin, q


def _local_point(b, body, world_point):
    """b2Body::GetLocalPoint at the current transform."""
    origin, q = _body_origin_q(b, body)
    d = jnp.asarray(world_point, jnp.float32) - origin
    s, c = q[0], q[1]
    return jnp.stack([c * d[0] + s * d[1], -s * d[0] + c * d[1]])


def _local_vector(b, body, world_vec):
    """b2Body::GetLocalVector at the current transform."""
    q = rot_from_angle(b.a[body])
    v = jnp.asarray(world_vec, jnp.float32)
    s, c = q[0], q[1]
    return jnp.stack([c * v[0] + s * v[1], -s * v[0] + c * v[1]])


def _joint_add(state: State, kind: str, fields: dict):
    """Write a new joint into the first inactive slot of its typed block.
    Returns (state, index); index == -1 when the block is full. Sets
    pairs_dirty so collide_connected filtering applies at the next step
    (the reference updates contact filter flags on CreateJoint,
    b2World.cpp:796-812)."""
    blk = getattr(state.joints, kind)
    if blk.body_a.shape[0] == 0:
        raise ValueError(
            f"no '{kind}' joint slots: build the world with "
            f"freeze(joint_capacity={{'{kind}': n}}) to enable runtime "
            f"creation")
    free = ~blk.active
    idx = jnp.argmax(free).astype(jnp.int32)
    ok = free[idx]
    upd = {}
    for name, val in fields.items():
        arr = getattr(blk, name)
        val = jnp.asarray(val, arr.dtype)
        upd[name] = arr.at[idx].set(jnp.where(ok, val, arr[idx]))
    # fresh slots start with zero accumulated impulses + inactive limit
    for name in blk.__dataclass_fields__:
        if name.endswith("impulse") or name == "limit_state":
            arr = getattr(blk, name)
            upd[name] = arr.at[idx].set(
                jnp.where(ok, jnp.zeros_like(arr[idx]), arr[idx]))
    upd["active"] = blk.active.at[idx].set(ok | blk.active[idx])
    blk = dataclasses.replace(blk, **upd)
    state = dataclasses.replace(
        state, joints=dataclasses.replace(state.joints, **{kind: blk}),
        pairs_dirty=jnp.asarray(True))
    return state, jnp.where(ok, idx, -1)


def add_revolute_joint(state: State, body_a, body_b, anchor, *,
                       collide_connected=False, enable_limit=False,
                       lower_angle=0.0, upper_angle=0.0, enable_motor=False,
                       motor_speed=0.0, max_motor_torque=0.0,
                       reference_angle=None):
    """b2RevoluteJointDef::Initialize at the current body transforms."""
    b = state.bodies
    if reference_angle is None:
        reference_angle = b.a[body_b] - b.a[body_a]
    return _joint_add(state, "revolute", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor),
        local_anchor_b=_local_point(b, body_b, anchor),
        reference_angle=reference_angle,
        collide_connected=collide_connected, enable_limit=enable_limit,
        lower_angle=lower_angle, upper_angle=upper_angle,
        enable_motor=enable_motor, motor_speed=motor_speed,
        max_motor_torque=max_motor_torque))


def add_distance_joint(state: State, body_a, body_b, anchor_a, anchor_b, *,
                       collide_connected=False, frequency=0.0,
                       damping_ratio=0.0, length=None):
    """b2DistanceJointDef::Initialize at the current body transforms."""
    b = state.bodies
    if length is None:
        d = (jnp.asarray(anchor_b, jnp.float32)
             - jnp.asarray(anchor_a, jnp.float32))
        length = jnp.sqrt(jnp.sum(d * d))
    length = jnp.maximum(jnp.asarray(length, jnp.float32),
                         settings.LINEAR_SLOP)
    return _joint_add(state, "distance", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor_a),
        local_anchor_b=_local_point(b, body_b, anchor_b),
        length=length, frequency=frequency, damping_ratio=damping_ratio,
        collide_connected=collide_connected))


def add_prismatic_joint(state: State, body_a, body_b, anchor, axis, *,
                        collide_connected=False, enable_limit=False,
                        lower_translation=0.0, upper_translation=0.0,
                        enable_motor=False, motor_speed=0.0,
                        max_motor_force=0.0, reference_angle=None):
    b = state.bodies
    if reference_angle is None:
        reference_angle = b.a[body_b] - b.a[body_a]
    return _joint_add(state, "prismatic", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor),
        local_anchor_b=_local_point(b, body_b, anchor),
        local_axis_a=_local_vector(b, body_a, axis),
        reference_angle=reference_angle,
        collide_connected=collide_connected, enable_limit=enable_limit,
        lower_translation=lower_translation,
        upper_translation=upper_translation, enable_motor=enable_motor,
        motor_speed=motor_speed, max_motor_force=max_motor_force))


def add_weld_joint(state: State, body_a, body_b, anchor, *,
                   collide_connected=False, frequency=0.0,
                   damping_ratio=0.0, reference_angle=None):
    b = state.bodies
    if reference_angle is None:
        reference_angle = b.a[body_b] - b.a[body_a]
    return _joint_add(state, "weld", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor),
        local_anchor_b=_local_point(b, body_b, anchor),
        reference_angle=reference_angle, frequency=frequency,
        damping_ratio=damping_ratio, collide_connected=collide_connected))


def add_friction_joint(state: State, body_a, body_b, anchor, *,
                       collide_connected=False, max_force=0.0,
                       max_torque=0.0):
    b = state.bodies
    return _joint_add(state, "friction", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor),
        local_anchor_b=_local_point(b, body_b, anchor),
        max_force=max_force, max_torque=max_torque,
        collide_connected=collide_connected))


def add_rope_joint(state: State, body_a, body_b, local_anchor_a,
                   local_anchor_b, max_length, *, collide_connected=False):
    return _joint_add(state, "rope", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=jnp.asarray(local_anchor_a, jnp.float32),
        local_anchor_b=jnp.asarray(local_anchor_b, jnp.float32),
        max_length=max_length, collide_connected=collide_connected))


def add_motor_joint(state: State, body_a, body_b, *,
                    collide_connected=False, max_force=1.0, max_torque=1.0,
                    correction_factor=0.3, linear_offset=None,
                    angular_offset=None):
    """b2MotorJointDef::Initialize: defaults = current relative transform."""
    b = state.bodies
    if linear_offset is None:
        origin_b, _ = _body_origin_q(b, body_b)
        linear_offset = _local_point(b, body_a, origin_b)
    if angular_offset is None:
        angular_offset = b.a[body_b] - b.a[body_a]
    return _joint_add(state, "motor", dict(
        body_a=body_a, body_b=body_b,
        linear_offset=jnp.asarray(linear_offset, jnp.float32),
        angular_offset=angular_offset, max_force=max_force,
        max_torque=max_torque, correction_factor=correction_factor,
        collide_connected=collide_connected))


def add_mouse_joint(state: State, body_b, target, *, max_force=0.0,
                    frequency=5.0, damping_ratio=0.7):
    """b2MouseJoint creation mid-run (the interactive-drag idiom). Wakes
    the dragged body (the testbed does SetAwake on pick)."""
    b = state.bodies
    state = set_awake(state, body_b, True)
    return _joint_add(state, "mouse", dict(
        body_a=body_b, body_b=body_b,
        target=jnp.asarray(target, jnp.float32),
        local_anchor_b=_local_point(state.bodies, body_b, target),
        max_force=max_force, frequency=frequency,
        damping_ratio=damping_ratio, collide_connected=True))


def add_wheel_joint(state: State, body_a, body_b, anchor, axis, *,
                    collide_connected=False, enable_motor=False,
                    motor_speed=0.0, max_motor_torque=0.0, frequency=2.0,
                    damping_ratio=0.7):
    b = state.bodies
    return _joint_add(state, "wheel", dict(
        body_a=body_a, body_b=body_b,
        local_anchor_a=_local_point(b, body_a, anchor),
        local_anchor_b=_local_point(b, body_b, anchor),
        local_axis_a=_local_vector(b, body_a, axis),
        enable_motor=enable_motor, motor_speed=motor_speed,
        max_motor_torque=max_motor_torque, frequency=frequency,
        damping_ratio=damping_ratio, collide_connected=collide_connected))


def add_pulley_joint(state: State, body_a, body_b, ground_anchor_a,
                     ground_anchor_b, anchor_a, anchor_b, ratio=1.0, *,
                     collide_connected=True):
    b = state.bodies
    ga = jnp.asarray(ground_anchor_a, jnp.float32)
    gb = jnp.asarray(ground_anchor_b, jnp.float32)
    aa = jnp.asarray(anchor_a, jnp.float32)
    ab = jnp.asarray(anchor_b, jnp.float32)
    la = jnp.sqrt(jnp.sum((aa - ga) ** 2))
    lb = jnp.sqrt(jnp.sum((ab - gb) ** 2))
    return _joint_add(state, "pulley", dict(
        body_a=body_a, body_b=body_b, ground_anchor_a=ga, ground_anchor_b=gb,
        local_anchor_a=_local_point(b, body_a, aa),
        local_anchor_b=_local_point(b, body_b, ab),
        length_a=la, length_b=lb, ratio=ratio,
        collide_connected=collide_connected))


def _gear_coordinate_device(state, jtype, jindex):
    """Current gear coordinate + geometry of one coupled joint
    (b2GearJoint.cpp:70-123, evaluated at current transforms)."""
    b = state.bodies
    rev = state.joints.revolute
    pri = state.joints.prismatic
    is_rev = jtype == 0
    ir = jnp.clip(jindex, 0, max(rev.body_a.shape[0] - 1, 0))
    ip = jnp.clip(jindex, 0, max(pri.body_a.shape[0] - 1, 0))

    def pick(fr, fp):
        return jnp.where(is_rev, fr, fp)

    body_aj = pick(rev.body_a[ir] if rev.body_a.shape[0] else 0,
                   pri.body_a[ip] if pri.body_a.shape[0] else 0)
    body_bj = pick(rev.body_b[ir] if rev.body_a.shape[0] else 0,
                   pri.body_b[ip] if pri.body_a.shape[0] else 0)
    z2 = jnp.zeros(2, jnp.float32)
    anc_a = jnp.where(is_rev,
                      rev.local_anchor_a[ir] if rev.body_a.shape[0] else z2,
                      pri.local_anchor_a[ip] if pri.body_a.shape[0] else z2)
    anc_b = jnp.where(is_rev,
                      rev.local_anchor_b[ir] if rev.body_a.shape[0] else z2,
                      pri.local_anchor_b[ip] if pri.body_a.shape[0] else z2)
    ref = jnp.where(is_rev,
                    rev.reference_angle[ir] if rev.body_a.shape[0] else 0.0,
                    pri.reference_angle[ip] if pri.body_a.shape[0] else 0.0)
    axis = jnp.where(is_rev, z2,
                     pri.local_axis_a[ip] if pri.body_a.shape[0] else z2)

    # revolute coordinate: aB - aA - ref; prismatic: dot(pB_in_A - anchorA,
    # axisA), evaluated like the reference ctor against current transforms
    coord_rev = b.a[body_bj] - b.a[body_aj] - ref
    origin_a, qa = _body_origin_q(b, body_aj)
    origin_b, qb = _body_origin_q(b, body_bj)
    w = rot_vec(qb, anc_b) + origin_b - origin_a
    s, c = qa[0], qa[1]
    p_in_a = jnp.stack([c * w[0] + s * w[1], -s * w[0] + c * w[1]])
    coord_pri = jnp.sum((p_in_a - anc_a) * axis)
    coord = jnp.where(is_rev, coord_rev, coord_pri)
    return coord, dict(body_a=body_aj, body_b=body_bj, anchor_a=anc_a,
                       anchor_b=anc_b, ref=ref, axis=axis)


def add_gear_joint(state: State, joint1, joint2, ratio=1.0, *,
                   collide_connected=False):
    """b2GearJoint creation mid-run. joint1/joint2 are ("revolute" |
    "prismatic", index) references to existing joints (as with
    WorldBuilder.create_gear_joint)."""
    kind1, i1 = joint1
    kind2, i2 = joint2
    t1 = 0 if kind1 == "revolute" else 1
    t2 = 0 if kind2 == "revolute" else 1
    coord1, g1 = _gear_coordinate_device(state, jnp.int32(t1),
                                         jnp.asarray(i1, jnp.int32))
    coord2, g2 = _gear_coordinate_device(state, jnp.int32(t2),
                                         jnp.asarray(i2, jnp.int32))
    ratio = jnp.asarray(ratio, jnp.float32)
    return _joint_add(state, "gear", dict(
        body_a=g1["body_b"], body_b=g2["body_b"],
        body_c=g1["body_a"], body_d=g2["body_a"],
        joint1_type=t1, joint1_index=i1, joint2_type=t2, joint2_index=i2,
        local_anchor_a=g1["anchor_b"], local_anchor_c=g1["anchor_a"],
        local_anchor_b=g2["anchor_b"], local_anchor_d=g2["anchor_a"],
        local_axis_c=g1["axis"], local_axis_d=g2["axis"],
        reference_angle_a=g1["ref"], reference_angle_b=g2["ref"],
        ratio=ratio, constant=coord1 + ratio * coord2,
        collide_connected=collide_connected))


def set_mouse_target(state: State, index, target) -> State:
    """b2MouseJoint::SetTarget (b2MouseJoint.h:77): move the drag target
    between steps; wakes the dragged body."""
    mj = state.joints.mouse
    target = jnp.asarray(target, jnp.float32)
    joints = dataclasses.replace(
        state.joints,
        mouse=dataclasses.replace(mj, target=mj.target.at[index].set(target)))
    state = dataclasses.replace(state, joints=joints)
    return set_awake(state, mj.body_b[index], True)


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


def shift_origin(state: State, new_origin) -> State:
    """b2World::ShiftOrigin (b2World.cpp:2084-2105): subtract `new_origin`
    from every world-frame position — body transforms and sweep centers,
    mouse-joint targets (b2MouseJoint.cpp:220-223), pulley ground anchors
    (b2PulleyJoint.cpp:345-349), and the broad-phase fat AABBs (so no pair
    refresh is triggered; overlap is translation-invariant)."""
    o = jnp.asarray(new_origin, jnp.float32)
    b = state.bodies
    bodies = dataclasses.replace(b, c=b.c - o, c0=b.c0 - o)
    fx = state.fixtures
    fixtures = dataclasses.replace(
        fx, aabb_lo=fx.aabb_lo - o, aabb_hi=fx.aabb_hi - o)
    state = dataclasses.replace(state, bodies=bodies, fixtures=fixtures)
    joints = state.joints
    upd = {}
    if joints.mouse.body_a.shape[0]:
        mj = joints.mouse
        upd["mouse"] = dataclasses.replace(mj, target=mj.target - o)
    if joints.pulley.body_a.shape[0]:
        pj = joints.pulley
        upd["pulley"] = dataclasses.replace(
            pj, ground_anchor_a=pj.ground_anchor_a - o,
            ground_anchor_b=pj.ground_anchor_b - o)
    if upd:
        state = dataclasses.replace(
            state, joints=dataclasses.replace(joints, **upd))
    return state
