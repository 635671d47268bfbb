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


def test_toi_begin_events_decode_to_fixture_pairs():
    """Events slot-basis contract (round-3 fix): TOI-created BeginContact
    events are exported on the refreshed pair table's basis via
    (toi_begin, toi_f_a, toi_f_b) — never OR-ed into begin_touch, whose
    f_a/f_b describe the pre-refresh table. Every fired toi_begin must
    decode to the (bullet, wall) fixture pair and the refreshed table must
    report the pair touching."""
    wb = WorldBuilder(gravity=(0, 0))
    wall = wb.create_body(position=(10, 0))
    wall_fx = wb.create_fixture(wall, shapes.Polygon.box(0.05, 5.0))
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 0),
                       bullet=True, linear_velocity=(200.0, 0.0))
    b_fx = wb.create_fixture(b, shapes.Circle(0.1), density=1.0)
    st = wb.freeze()
    saw_toi_begin = False
    for _ in range(30):
        st, ev = world.step(st, 1 / 60, max_colors=4)
        tb = np.asarray(ev.toi_begin)
        if tb.any():
            saw_toi_begin = True
            fa = np.asarray(ev.toi_f_a)[tb]
            fb = np.asarray(ev.toi_f_b)[tb]
            assert set(map(tuple, np.sort(np.stack([fa, fb], 1), axis=1))) \
                == {(min(wall_fx, b_fx), max(wall_fx, b_fx))}
            # the refreshed table agrees the pair is touching
            touching = np.asarray(st.contacts.touching)
            assert touching[tb].all()
            # and the slot basis matches the refreshed contacts table
            np.testing.assert_array_equal(np.asarray(ev.toi_f_a),
                                          np.asarray(st.contacts.f_a))
        # begin_touch stays on its own (pre-refresh) basis: any set bit
        # must decode against ev.f_a/ev.f_b without -1 sentinels
        bt = np.asarray(ev.begin_touch)
        if bt.any():
            assert (np.asarray(ev.f_a)[bt] >= 0).all()
            assert (np.asarray(ev.f_b)[bt] >= 0).all()
    assert saw_toi_begin, "bullet impact never produced a TOI begin event"
