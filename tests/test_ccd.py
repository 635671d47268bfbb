"""Continuous collision (TOI) behavior tests — the TunnelingTest /
BulletTest analogs (Testbed/Tests/TunnelingTest.h:261, BulletTest.h)."""

import numpy as np
import pytest

from box2d_mt_tpu import settings, shapes, world
from box2d_mt_tpu.world import WorldBuilder


# --------------------------------------------------------------------------
# TunnelingTest combination sweep (TunnelingTest.h cycles every
# bullet/thickShape/sensor combo and asserts the expected pass-through or
# stop). Expectations follow b2Contact::IsToiCandidate
# (b2Contact.cpp:300-324): candidate = ~sensor & (bullet | (one
# non-dynamic & neither thickShape)).
# --------------------------------------------------------------------------

_COMBOS = [
    # (bullet, wall_dynamic, thick, sensor, proj_circle) -> expect_stopped
    (False, False, False, False, True, True),    # plain vs static: CCD
    (False, False, False, False, False, True),   # box projectile
    (True, False, False, False, True, True),     # bullet vs static
    (True, True, False, False, True, True),      # bullet vs dynamic: CCD
    (False, True, False, False, True, False),    # non-bullet vs dynamic: no
    (False, False, True, False, True, False),    # thickShape opts out
    (True, False, True, False, True, True),      # bullet ignores thickShape
    (False, False, False, True, True, False),    # sensor never blocks
]


@pytest.mark.parametrize(
    "bullet,wall_dyn,thick,sensor,circle,expect_stop", _COMBOS,
    ids=[f"b{int(b)}wd{int(w)}t{int(t)}s{int(s)}c{int(c)}"
         for b, w, t, s, c, _ in _COMBOS])
def test_tunneling_combo(bullet, wall_dyn, thick, sensor, circle,
                         expect_stop):
    wb = WorldBuilder(gravity=(0, 0))
    wall = wb.create_body(
        body_type=settings.DYNAMIC_BODY if wall_dyn else settings.STATIC_BODY,
        position=(10, 0), fixed_rotation=True)
    wb.create_fixture(wall, shapes.Polygon.box(0.05, 5.0),
                      density=10.0 if wall_dyn else 0.0,
                      thick_shape=thick, is_sensor=sensor)
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 0),
                       bullet=bullet, linear_velocity=(200.0, 0.0))
    if circle:
        wb.create_fixture(b, shapes.Circle(0.1), density=1.0,
                          thick_shape=thick)
    else:
        wb.create_fixture(b, shapes.Polygon.box(0.1, 0.1), density=1.0,
                          thick_shape=thick)
    st = wb.freeze()
    for _ in range(20):
        st, _ = world.step(st, 1 / 60, max_colors=4)
    x = float(st.bodies.xf_p[1, 0])
    if expect_stop:
        assert x < 10.5, f"tunneled: x={x}"
    else:
        assert x > 10.5, f"unexpectedly stopped: x={x}"


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
