"""Runtime world mutation: CreateBody/DestroyBody/CreateFixture analogs
(b2World.cpp:549-832) into free capacity slots."""

import numpy as np
import jax.numpy as jnp

from box2d_mt_tpu import mutate, settings, shapes, world


def _ground_world():
    wb = world.WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    return wb.freeze(body_capacity=8, fixture_capacity=8)


def _fresh_with_box(position):
    wb = world.WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=position)
    wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=1.0,
                      friction=0.2)
    return wb.freeze(body_capacity=8, fixture_capacity=8)


def test_spawn_matches_fresh_world():
    """A box spawned via add_body/add_fixture must step identically to the
    same box built by the WorldBuilder."""
    st = _ground_world()
    st, b = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                            position=(0.0, 4.0))
    assert int(b) == 1
    st, f = mutate.add_fixture(st, b, shapes.Polygon.box(0.5, 0.5),
                               density=1.0, friction=0.2)
    assert int(f) == 1
    ref = _fresh_with_box((0.0, 4.0))
    for i in range(90):
        st, _ = world.step(st, 1 / 60)
        ref, _ = world.step(ref, 1 / 60)
    np.testing.assert_allclose(np.asarray(st.bodies.c[1]),
                               np.asarray(ref.bodies.c[1]), atol=1e-6)
    # landed on the ground
    assert abs(float(st.bodies.c[1, 1]) - 0.5) < 0.02


def test_mass_data_recomputed():
    st = _ground_world()
    st, b = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                            position=(0.0, 4.0))
    # before any fixture: unit mass (b2Body ctor)
    assert float(st.bodies.inv_mass[int(b)]) == 1.0
    st, _ = mutate.add_fixture(st, b, shapes.Circle(0.5), density=2.0)
    m = 2.0 * np.pi * 0.25
    assert abs(float(st.bodies.inv_mass[int(b)]) - 1.0 / m) < 1e-5
    # off-center second fixture moves the center of mass
    st, f2 = mutate.add_fixture(st, b, shapes.Circle(0.5, center=(1.0, 0.0)),
                                density=2.0)
    assert abs(float(st.bodies.local_center[int(b), 0]) - 0.5) < 1e-5
    # removing it restores the original mass data
    st = mutate.remove_fixture(st, f2)
    assert abs(float(st.bodies.inv_mass[int(b)]) - 1.0 / m) < 1e-5
    assert abs(float(st.bodies.local_center[int(b), 0])) < 1e-6


def test_spawn_despawn_respawn():
    st = _ground_world()
    st, b1 = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                             position=(0.0, 4.0))
    st, _ = mutate.add_fixture(st, b1, shapes.Polygon.box(0.5, 0.5),
                               density=1.0, friction=0.2)
    for _ in range(60):
        st, _ = world.step(st, 1 / 60)
    st = mutate.remove_body(st, b1)
    for _ in range(10):
        st, ev = world.step(st, 1 / 60)
    assert not bool(np.asarray(ev.touching).any())
    # slot is reusable; respawned box behaves like a fresh world's box
    st, b2 = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                             position=(1.0, 5.0))
    assert int(b2) == 1
    st, _ = mutate.add_fixture(st, b2, shapes.Polygon.box(0.5, 0.5),
                               density=1.0, friction=0.2)
    ref = _fresh_with_box((1.0, 5.0))
    for _ in range(90):
        st, _ = world.step(st, 1 / 60)
        ref, _ = world.step(ref, 1 / 60)
    np.testing.assert_allclose(np.asarray(st.bodies.c[1]),
                               np.asarray(ref.bodies.c[1]), atol=1e-5)


def test_capacity_overflow_returns_minus_one():
    st = _ground_world()
    for i in range(7):
        st, b = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                                position=(float(i), 4.0))
        assert int(b) == i + 1
    st, b = mutate.add_body(st, body_type=settings.DYNAMIC_BODY)
    assert int(b) == -1


def test_remove_body_deactivates_joints():
    wb = world.WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(3.0, 10.0))
    wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_revolute_joint(ground, b, (0.0, 10.0))
    st = wb.freeze()
    st = mutate.remove_body(st, 1)
    assert not bool(st.joints.revolute.active[0])


def test_shift_origin_translation_invariant():
    """b2World::ShiftOrigin: shifting the origin mid-run translates every
    world position without perturbing the dynamics — continuing the
    shifted world reproduces the unshifted trajectory exactly, offset by
    the shift (pulley_pair covers the ground-anchor shift)."""
    from box2d_mt_tpu.models import scenes

    st = scenes.pulley_pair()
    kinds = world.possible_kinds(st)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    o = np.array([100.0, -25.0], np.float32)
    st_shift = mutate.shift_origin(st, o)
    for _ in range(60):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        st_shift, _ = world.step(st_shift, 1 / 60, kinds=kinds)
    live = np.asarray(st.bodies.exists)
    ca = np.asarray(st.bodies.c)[live]
    cb = np.asarray(st_shift.bodies.c)[live]
    assert np.allclose(ca - o, cb, atol=2e-4), np.abs(ca - o - cb).max()
    assert np.array_equal(np.asarray(st.bodies.a)[live],
                          np.asarray(st_shift.bodies.a)[live])
