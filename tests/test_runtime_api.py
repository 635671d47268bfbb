"""Round-3 API parity: runtime joint creation (b2World::CreateJoint,
b2World.cpp:679-832), mouse-joint target mutation (b2MouseJoint.h:77),
fixture material setters (b2Fixture.h:187-194,326-340), per-contact
tangent speed / material overrides (b2Contact.h:126-157), and the custom
contact-filter hook (b2WorldCallbacks.h:52-62)."""

import numpy as np
import jax.numpy as jnp
import pytest

from box2d_mt_tpu import WorldBuilder, mutate, settings, shapes, world


def _pendulum_builder(with_joint: bool):
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    body = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(3.0, 10.0))
    wb.create_fixture(body, shapes.Polygon.box(0.5, 0.5), density=5.0)
    if with_joint:
        wb.create_revolute_joint(ground, body, (0.0, 10.0))
    return wb


def test_runtime_revolute_matches_build_time():
    """A joint added between steps behaves like one built in (the
    b2World::CreateJoint-anytime semantics)."""
    st_build = _pendulum_builder(True).freeze()
    st_rt = _pendulum_builder(False).freeze(joint_capacity={"revolute": 2})
    st_rt, idx = mutate.add_revolute_joint(st_rt, 0, 1, (0.0, 10.0))
    assert int(idx) == 0
    for _ in range(60):
        st_build, _ = world.step(st_build, 1 / 60)
        st_rt, _ = world.step(st_rt, 1 / 60)
    # device f32 anchor math vs host f64 builder math: tiny tolerance
    np.testing.assert_allclose(np.asarray(st_rt.bodies.c),
                               np.asarray(st_build.bodies.c), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_rt.bodies.a),
                               np.asarray(st_build.bodies.a), atol=1e-4)


def test_runtime_joint_capacity_overflow():
    st = _pendulum_builder(False).freeze(joint_capacity={"revolute": 1})
    st, i0 = mutate.add_revolute_joint(st, 0, 1, (0.0, 10.0))
    st, i1 = mutate.add_revolute_joint(st, 0, 1, (0.0, 10.0))
    assert int(i0) == 0 and int(i1) == -1
    with pytest.raises(ValueError):
        mutate.add_weld_joint(st, 0, 1, (0.0, 10.0))


def test_mouse_joint_drag_follows_target():
    """Runtime mouse joint + SetTarget path: drag a resting box along x
    (the interactive-drag idiom, Testbed Test::MouseDown/MouseMove)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    box = wb.create_body(body_type=settings.DYNAMIC_BODY,
                         position=(0.0, 0.5))
    wb.create_fixture(box, shapes.Polygon.box(0.5, 0.5), density=1.0,
                      friction=0.1)
    st = wb.freeze(joint_capacity={"mouse": 1})
    st, idx = mutate.add_mouse_joint(
        st, box, (0.0, 0.5), max_force=1000.0)
    assert int(idx) == 0
    # move the target rightward; the box must follow
    for i in range(90):
        target = (0.05 * (i + 1), 0.5)
        st = mutate.set_mouse_target(st, 0, target)
        st, _ = world.step(st, 1 / 60)
    x = float(st.bodies.c[box, 0])
    assert x > 2.0, x
    assert bool(st.bodies.awake[box])


def test_fixture_material_setters():
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    gf = wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    ball = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(0.0, 4.0))
    bf = wb.create_fixture(ball, shapes.Circle(0.5), density=1.0)
    st0 = wb.freeze()

    # restitution: without -> rests; with -> bounces
    st = st0
    for _ in range(120):
        st, _ = world.step(st, 1 / 60)
    assert abs(float(st.bodies.v[ball, 1])) < 0.01

    st = mutate.set_restitution(st0, bf, 0.8)
    hit_v = 0.0
    max_rebound = 0.0
    for _ in range(120):
        st, _ = world.step(st, 1 / 60)
        vy = float(st.bodies.v[ball, 1])
        hit_v = min(hit_v, vy)
        max_rebound = max(max_rebound, vy)
    assert max_rebound > 2.0, (hit_v, max_rebound)

    # density + ResetMassData: mass quadruples -> inv_mass quarters
    inv0 = float(st0.bodies.inv_mass[ball])
    st = mutate.set_density(st0, bf, 4.0)
    assert np.isclose(float(st.bodies.inv_mass[ball]), inv0 / 4.0, rtol=1e-5)

    # friction setter feeds the per-step mixing
    st = mutate.set_friction(st0, gf, 0.9)
    assert np.isclose(float(st.fixtures.friction[gf]), 0.9)


def _belt_world():
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    belt = wb.create_body(position=(0.0, 2.0))
    belt_fx = wb.create_fixture(belt, shapes.Polygon.box(4.0, 0.25),
                                density=0.0, friction=0.8)
    box = wb.create_body(body_type=settings.DYNAMIC_BODY,
                         position=(0.0, 2.8))
    wb.create_fixture(box, shapes.Polygon.box(0.25, 0.25), density=1.0,
                      friction=0.8)
    return wb.freeze(), belt_fx, box


def test_conveyor_belt_tangent_speed_hook():
    """ConveyorBelt scene (Testbed/Tests/ConveyorBelt.h): PreSolve sets
    tangentSpeed=5 on contacts with the belt fixture; the resting box is
    dragged along +x by friction."""
    st, belt_fx, box = _belt_world()

    def pre_solve(state, view):
        on_belt = (view.f_a == belt_fx) | (view.f_b == belt_fx)
        return {"tangent_speed": jnp.where(on_belt, 5.0,
                                           view.tangent_speed)}

    for _ in range(90):
        st, _ = world.step(st, 1 / 60, pre_solve_fn=pre_solve)
    assert float(st.bodies.v[box, 0]) > 1.0
    assert float(st.bodies.c[box, 0]) > 1.0


def test_conveyor_belt_mutator():
    """Same scene via the between-steps setter
    (b2Contact::SetTangentSpeed)."""
    st, belt_fx, box = _belt_world()
    # land the box first so the contact slot exists
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    box_fx = int(np.asarray(st.fixtures.body).tolist().index(box))
    st = mutate.set_contact_tangent_speed(st, belt_fx, box_fx, 5.0)
    for _ in range(60):
        st, _ = world.step(st, 1 / 60)
    assert float(st.bodies.v[box, 0]) > 1.0


def test_contact_friction_override():
    """b2Contact::SetFriction override: frictionless contact on a belt
    means tangent speed can no longer drag the box."""
    st, belt_fx, box = _belt_world()
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    box_fx = int(np.asarray(st.fixtures.body).tolist().index(box))
    st = mutate.set_contact_tangent_speed(st, belt_fx, box_fx, 5.0)
    st = mutate.set_contact_friction(st, belt_fx, box_fx, 0.0)
    for _ in range(60):
        st, _ = world.step(st, 1 / 60)
    assert abs(float(st.bodies.v[box, 0])) < 0.05


def test_contact_filter_hook():
    """Custom b2ContactFilter::ShouldCollide: veto collision between two
    specific fixtures — the box falls through the platform it would
    otherwise land on."""
    def build():
        wb = WorldBuilder(gravity=(0.0, -10.0))
        ground = wb.create_body()
        wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
        plat = wb.create_body(position=(0.0, 4.0))
        wb.create_fixture(plat, shapes.Polygon.box(2.0, 0.25), density=0.0)
        box = wb.create_body(body_type=settings.DYNAMIC_BODY,
                             position=(0.0, 8.0))
        wb.create_fixture(box, shapes.Polygon.box(0.4, 0.4), density=1.0)
        return wb, box

    def veto_platform(state, fi, fj):
        # fixture 1 = platform, fixture 2 = box
        pair = ((fi == 1) & (fj == 2)) | ((fi == 2) & (fj == 1))
        return ~pair

    wb, box = build()
    st = wb.freeze()
    for _ in range(90):
        st, _ = world.step(st, 1 / 60)
    assert float(st.bodies.c[box, 1]) > 3.0   # rests on the platform

    wb, box = build()
    st = wb.freeze(filter_fn=veto_platform)
    for _ in range(90):
        st, _ = world.step(st, 1 / 60, filter_fn=veto_platform)
    assert float(st.bodies.c[box, 1]) < 1.0   # fell through to the ground


def test_override_survives_pair_refresh():
    """tangent_speed / overrides must persist across a broad-phase pair
    refresh for surviving pairs (carry_over_contacts transfer)."""
    st, belt_fx, box = _belt_world()
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    box_fx = int(np.asarray(st.fixtures.body).tolist().index(box))
    st = mutate.set_contact_tangent_speed(st, belt_fx, box_fx, 5.0)
    st = mutate.set_contact_restitution(st, belt_fx, box_fx, 0.25)
    # force a pair refresh
    import dataclasses
    st = dataclasses.replace(st, pairs_dirty=jnp.asarray(True))
    st, _ = world.step(st, 1 / 60)
    c = st.contacts
    lo = min(belt_fx, box_fx)
    hi = max(belt_fx, box_fx)
    keys = np.minimum(np.asarray(c.f_a), np.asarray(c.f_b)) * 10000 + \
        np.maximum(np.asarray(c.f_a), np.asarray(c.f_b))
    slot = int(np.argmax(keys == lo * 10000 + hi))
    assert np.isclose(float(c.tangent_speed[slot]), 5.0)
    assert np.isclose(float(c.restitution_override[slot]), 0.25)
