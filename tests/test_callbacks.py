"""Sensor touch semantics + PreSolve/PostSolve analogs.

Sensor golden (tests/golden/sensor_180.jsonl, from tools/golden_gen/
sensor.cpp): a circle free-falls through a static sensor box, then lands on
the ground — begin/end events must fire at the reference's exact steps
(trajectory is pure free fall, bit-exact).
"""

import numpy as np
import jax.numpy as jnp

from box2d_mt_tpu import settings, shapes, world

from conftest import load_jsonl


def _sensor_scene():
    wb = world.WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    sensor_body = wb.create_body(position=(0.0, 6.0))
    wb.create_fixture(sensor_body, shapes.Polygon.box(2.0, 1.0),
                      is_sensor=True)
    ball = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(0.0, 12.0))
    wb.create_fixture(ball, shapes.Circle(0.5), density=1.0)
    return wb.freeze()


def test_sensor_begin_end_matches_reference():
    st = _sensor_scene()
    ref = load_jsonl("sensor_180.jsonl")
    ref_begin = [r["step"] for r in ref if r.get("ev") == "begin"]
    ref_end = [r["step"] for r in ref if r.get("ev") == "end"]

    begins, ends = [], []
    for i in range(180):
        st, ev = world.step(st, 1 / 60)
        # full begin set = begin_touch (pre-refresh basis) + toi_begin
        # (refreshed basis) — the landing BeginContact is TOI-created
        if bool(np.asarray(ev.begin_touch).any()
                or np.asarray(ev.toi_begin).any()):
            begins.append(i)
        if bool(np.asarray(ev.end_touch).any()):
            ends.append(i)
    assert begins == ref_begin, (begins, ref_begin)
    assert ends == ref_end, (ends, ref_end)
    # ball must have fallen straight through the sensor to the ground
    ref_final = [r for r in ref if "final" in r][0]["final"]
    p = np.asarray(st.bodies.xf_p)[2]
    assert abs(p[1] - ref_final[1]) < 5e-3


def _platform_scene():
    """OneSidedPlatform.h analog: a thin static platform; the ball is
    launched up from below, must pass through, then land on top."""
    wb = world.WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    platform = wb.create_body(position=(0.0, 10.0))
    wb.create_fixture(platform, shapes.Polygon.box(3.0, 0.5))
    ball = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(0.0, 5.0), linear_velocity=(0.0, 14.0))
    wb.create_fixture(ball, shapes.Circle(0.5), density=1.0)
    return wb.freeze()


def _one_sided(state, view):
    """Disable platform contacts while the ball's center is below the
    platform top (OneSidedPlatform.h:PreSolve)."""
    platform_top = 10.5
    ball_y = state.bodies.c[2, 1]
    is_platform_pair = (view.body_a == 1) | (view.body_b == 1)
    return ~(is_platform_pair & (ball_y < platform_top))


def test_one_sided_platform():
    st = _platform_scene()
    max_y = 0.0
    for _ in range(240):
        st, _ = world.step(st, 1 / 60, pre_solve_fn=_one_sided)
        max_y = max(max_y, float(st.bodies.c[2, 1]))
    # passed through the platform from below...
    assert max_y > 11.5, max_y
    # ...and came to rest on top of it (top 10.5 + radius 0.5)
    final_y = float(st.bodies.c[2, 1])
    assert abs(final_y - 11.0) < 0.05, final_y


def test_one_sided_platform_blocks_without_hook():
    st = _platform_scene()
    max_y = 0.0
    for _ in range(120):
        st, _ = world.step(st, 1 / 60)
        max_y = max(max_y, float(st.bodies.c[2, 1]))
    # without the PreSolve disable the platform blocks from below
    assert max_y < 10.2, max_y


def test_post_solve_impulses_reported():
    """Events.normal_impulse is the PostSolve analog: resting contact must
    report impulse ~= weight * dt once settled. Sleep disabled — sleeping
    islands don't solve and report no impulses (reference behavior)."""
    st = _sensor_scene()
    for _ in range(150):
        st, ev = world.step(st, 1 / 60, allow_sleep=False)
    ni = np.asarray(ev.normal_impulse)
    touching = np.asarray(ev.touching)
    total = ni[touching].sum()
    # ball mass = pi * 0.25 * 1.0; impulse per step = m * g * dt
    expect = np.pi * 0.25 * 10.0 / 60.0
    assert abs(total - expect) < 0.3 * expect, (total, expect)
