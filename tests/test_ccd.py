"""Continuous collision (TOI) behavior tests — the TunnelingTest /
BulletTest analogs (Testbed/Tests/TunnelingTest.h:261, BulletTest.h)."""

import numpy as np

from box2d_mt_tpu import settings, shapes, world
from box2d_mt_tpu.world import WorldBuilder


def test_bullet_does_not_tunnel():
    wb = WorldBuilder(gravity=(0, 0))
    wall = wb.create_body(position=(10, 0))
    wb.create_fixture(wall, shapes.Polygon.box(0.05, 5.0))
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 0),
                       bullet=True, linear_velocity=(200.0, 0.0))
    wb.create_fixture(b, shapes.Circle(0.1), density=1.0)
    st = wb.freeze()
    for _ in range(30):
        st, _ = world.step(st, 1 / 60, max_colors=4)
    assert float(st.bodies.xf_p[1, 0]) < 10.0  # stopped at the wall


def test_tunnels_without_ccd():
    wb = WorldBuilder(gravity=(0, 0))
    wall = wb.create_body(position=(10, 0))
    wb.create_fixture(wall, shapes.Polygon.box(0.05, 5.0))
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 0),
                       bullet=True, linear_velocity=(200.0, 0.0))
    wb.create_fixture(b, shapes.Circle(0.1), density=1.0)
    st = wb.freeze()
    for _ in range(30):
        st, _ = world.step(st, 1 / 60, max_colors=4, continuous=False)
    assert float(st.bodies.xf_p[1, 0]) > 10.5  # proves the CCD test bites


def test_fast_faller_vs_thin_static():
    """Non-bullet dynamic vs static is a TOI candidate
    (b2Contact::IsToiCandidate, b2Contact.cpp:300-324)."""
    wb = WorldBuilder(gravity=(0, -10))
    floor = wb.create_body(position=(0, 0))
    wb.create_fixture(floor, shapes.Polygon.box(20.0, 0.05))
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 30),
                       linear_velocity=(0, -100.0))
    wb.create_fixture(b, shapes.Polygon.box(0.2, 0.2), density=1.0)
    st = wb.freeze()
    for _ in range(60):
        st, _ = world.step(st, 1 / 60, max_colors=4)
    assert float(st.bodies.xf_p[1, 1]) > -0.5  # rests on the floor


def test_thick_shape_opts_out_of_ccd():
    """The MT fork's thickShape flag disables CCD for non-bullets
    (b2Fixture.h:68, b2Fixture.cpp:241-258)."""
    wb = WorldBuilder(gravity=(0, 0))
    wall = wb.create_body(position=(10, 0))
    wb.create_fixture(wall, shapes.Polygon.box(0.05, 5.0), thick_shape=True)
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 0),
                       linear_velocity=(200.0, 0.0))
    wb.create_fixture(b, shapes.Circle(0.1), density=1.0, thick_shape=True)
    st = wb.freeze()
    for _ in range(30):
        st, _ = world.step(st, 1 / 60, max_colors=4)
    assert float(st.bodies.xf_p[1, 0]) > 10.5  # tunnels: CCD opted out
