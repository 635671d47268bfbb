"""Deep-stack sleep parity (b2Island.cpp:355-395): the reference damps
pyramids/stacks to zero and sleeps the island by ~step 100-200; the colored
solver must do the same. These tests guard the round-3 fix (maximal-set
coloring — see ops/coloring.py) that removed per-step color overflow and
the Jacobi-fallback energy injection at stack apexes."""

import numpy as np

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes


def _steps_to_sleep(st, max_steps, **kw):
    kinds = world.possible_kinds(st)
    for i in range(max_steps):
        st, ev = world.step(st, 1 / 60, kinds=kinds, **kw)
        assert int(ev.color_overflow) == 0, f"color overflow at step {i}"
        dyn = np.asarray(st.bodies.body_type) == 2
        awake = np.asarray(st.bodies.awake) & dyn
        if not awake.any():
            return i, st
    return None, st


def test_pyramid10_sleeps():
    st = scenes.pyramid(10)
    slept_at, st = _steps_to_sleep(st, 200)
    assert slept_at is not None, "pyramid(10) never slept in 200 steps"
    # the reference island sleeps around step ~100; allow settling slack
    assert slept_at <= 200
    # all velocities zeroed on sleep (b2Body::SetAwake(false))
    assert float(np.abs(np.asarray(st.bodies.v)).max()) == 0.0
    assert float(np.abs(np.asarray(st.bodies.w)).max()) == 0.0
    # pyramid still standing: apex box near its build position
    c = np.asarray(st.bodies.c)
    apex = c[55]
    assert abs(apex[0] - (-1.9375)) < 0.35, apex
    assert abs(apex[1] - 9.6) < 0.35, apex


def test_vertical_stack10_sleeps():
    st = scenes.vertical_stack(10)
    slept_at, st = _steps_to_sleep(st, 200)
    assert slept_at is not None, "vertical_stack(10) never slept"
    c = np.asarray(st.bodies.c)
    # stack intact: boxes still near x=0, stacked in order
    assert np.all(np.abs(c[1:11, 0]) < 0.2)
    assert np.all(np.diff(c[1:11, 1]) > 0.8)


def test_sleeping_island_stays_put():
    """SleepCollideTest analog (Testbed/Tests/SleepCollideTest.h:124): a
    sleeping island must not move, wake, or emit touch events while another
    body in the world stays active (so the all-asleep fast path does NOT
    engage and the per-island path is what's exercised)."""
    from box2d_mt_tpu import WorldBuilder, settings, shapes
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    for i in range(3):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(0.0, 0.5 + 1.01 * i))
        wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=1.0,
                          friction=0.5)
    # far-away perpetually bouncing ball keeps the world active
    ball = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(20.0, 5.0))
    wb.create_fixture(ball, shapes.Circle(0.5), density=1.0,
                      restitution=1.0)
    st = wb.freeze()
    kinds = world.possible_kinds(st)

    # settle the stack until it sleeps
    for _ in range(240):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    awake = np.asarray(st.bodies.awake)
    assert not awake[1:4].any(), "stack should be asleep"
    assert awake[ball], "ball should still bounce"

    pos0 = np.asarray(st.bodies.c)[1:4].copy()
    for _ in range(60):
        st, ev = world.step(st, 1 / 60, kinds=kinds)
        # no begin/end events may involve the sleeping stack's fixtures
        beg = np.asarray(ev.begin_touch) | np.asarray(ev.end_touch)
        if beg.any():
            fa = np.asarray(ev.f_a)[beg]
            fb = np.asarray(ev.f_b)[beg]
            assert not np.isin(fa, [1, 2, 3]).any()
            assert not np.isin(fb, [1, 2, 3]).any()
    assert not np.asarray(st.bodies.awake)[1:4].any()
    np.testing.assert_array_equal(np.asarray(st.bodies.c)[1:4], pos0)
