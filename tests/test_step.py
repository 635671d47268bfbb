"""End-to-end trajectory tests vs reference golden traces.

Golden traces (tests/golden/*.jsonl) were produced by the reference build;
bodies are listed in GetBodyList order = reverse creation order.

Tolerances: free flight is bit-exact; impact steps differ while SolveTOI
(CCD) is pending — the reference applies TOI sub-stepping even to ordinary
dynamic-vs-static landings (b2Contact::IsToiCandidate, b2Contact.cpp:300-324)
— so settled-state tolerances are a few millimeters.
"""

import json

import numpy as np
import pytest

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes

from conftest import GOLDEN


def _run_vs_golden(state, fname, steps, vi, pi, n_bodies):
    ref = [json.loads(line) for line in open(GOLDEN / fname)]
    errs = []
    for i in range(steps):
        state, ev = world.step(state, 1 / 60, velocity_iterations=vi,
                               position_iterations=pi)
        p = np.asarray(state.bodies.xf_p)
        a = np.asarray(state.bodies.a)
        err = 0.0
        for j, rb in enumerate(ref[i]["bodies"]):
            k = n_bodies - 1 - j
            err = max(err, abs(p[k][0] - rb[0]), abs(p[k][1] - rb[1]),
                      abs(a[k] - rb[2]))
        errs.append(err)
        assert int(ev.color_overflow) == 0
        assert int(ev.pair_overflow) == 0
    return errs, state


def test_helloworld_freefall_exact():
    st = scenes.hello_world()
    ref = [json.loads(line) for line in open(GOLDEN / "helloworld_60.jsonl")]
    for i in range(40):   # pure free fall, well before impact
        st, _ = world.step(st, 1 / 60, velocity_iterations=6,
                           position_iterations=2)
        rb = ref[i]["bodies"][0]
        p = np.asarray(st.bodies.xf_p)[1]
        assert abs(p[1] - rb[1]) < 1e-6, f"step {i}"


def test_helloworld_terminal():
    st = scenes.hello_world()
    errs, st = _run_vs_golden(st, "helloworld_60.jsonl", 60, 6, 2, 2)
    assert errs[-1] < 5e-4          # settled state
    assert max(errs) < 2e-3         # incl. the impact step (CCD active)
    # classic oracle: box rests at (0, ~1.015, 0)
    assert abs(float(st.bodies.xf_p[1, 1]) - 1.015) < 5e-3


def test_vertical_stack_stable():
    st = scenes.vertical_stack(5)
    errs, st = _run_vs_golden(st, "stack_5_240.jsonl", 240, 8, 3, 6)
    assert max(errs) < 0.02
    assert errs[-1] < 0.02
    # stack must not drift: all boxes still near x=0
    p = np.asarray(st.bodies.xf_p)
    assert np.all(np.abs(p[1:6, 0]) < 0.05)


def test_pyramid_stable():
    st = scenes.pyramid(5)
    errs, st = _run_vs_golden(st, "pyramid_5_240.jsonl", 240, 8, 3, 16)
    assert max(errs) < 0.05
    assert errs[-1] < 0.02


def test_falling_circle_bounces():
    st = scenes.falling_circle()
    errs, st = _run_vs_golden(st, "circle_120.jsonl", 120, 6, 2, 2)
    # restitution bounce timing shifts without TOI; bound loosely
    assert max(errs) < 0.5
    assert errs[-1] < 0.2


def test_revolute_pendulum():
    st = scenes.revolute_pendulum()
    errs, _ = _run_vs_golden(st, "revolute_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 5e-3


def test_distance_pendulum():
    st = scenes.distance_pendulum()
    errs, _ = _run_vs_golden(st, "distance_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 5e-3


def test_prismatic_slide():
    st = scenes.prismatic_slide()
    errs, _ = _run_vs_golden(st, "prismatic_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 5e-3


def test_sleep_engages():
    st = scenes.hello_world()
    for _ in range(120):
        st, _ = world.step(st, 1 / 60, velocity_iterations=6,
                           position_iterations=2)
    # after >0.5s at rest the box must be asleep with zero velocity
    assert not bool(st.bodies.awake[1])
    assert float(np.abs(np.asarray(st.bodies.v[1])).max()) == 0.0


def test_determinism_same_seed():
    st1 = scenes.pyramid(4)
    st2 = scenes.pyramid(4)
    for _ in range(60):
        st1, _ = world.step(st1, 1 / 60)
        st2, _ = world.step(st2, 1 / 60)
    assert np.array_equal(np.asarray(st1.bodies.c), np.asarray(st2.bodies.c))
    assert np.array_equal(np.asarray(st1.bodies.a), np.asarray(st2.bodies.a))
    assert np.array_equal(np.asarray(st1.bodies.awake), np.asarray(st2.bodies.awake))


def test_weld_pendulum():
    st = scenes.weld_pendulum()
    errs, _ = _run_vs_golden(st, "weld_240.jsonl", 240, 8, 3, 3)
    assert max(errs) < 2e-2


def test_weld_soft_pendulum():
    st = scenes.weld_pendulum(soft=True)
    errs, _ = _run_vs_golden(st, "weldsoft_240.jsonl", 240, 8, 3, 3)
    assert max(errs) < 2e-2


def test_friction_joint():
    st = scenes.friction_top_down()
    errs, _ = _run_vs_golden(st, "friction_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 5e-3


def test_rope_joint():
    st = scenes.rope_swing()
    errs, _ = _run_vs_golden(st, "rope_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 2e-2


def test_motor_joint():
    st = scenes.motor_drive()
    errs, _ = _run_vs_golden(st, "motor_240.jsonl", 240, 8, 3, 2)
    assert max(errs) < 5e-3


def test_wheel_joint():
    st = scenes.wheel_car()
    errs, _ = _run_vs_golden(st, "wheel_240.jsonl", 240, 8, 3, 3)
    assert max(errs) < 5e-2   # driven wheel on ground: contact+joint coupling


def test_gear_joint():
    """Gear train vs reference golden (b2GearJoint.cpp re-derivation):
    revolute-revolute 2:1 coupling + revolute-prismatic rack. Exact to
    ~4e-6 through 130 steps of free gearing; the rack's limit impact
    (~step 137) is a one-step transient that reconverges to 1e-6."""
    st = scenes.gear_train()
    errs, _ = _run_vs_golden(st, "gear_240.jsonl", 240, 8, 3, 4)
    assert max(errs[:130]) < 1e-4      # free gearing: exact
    assert max(errs) < 0.03            # limit-impact transient
    assert errs[-1] < 1e-4             # settled: exact


def test_pulley_joint():
    st = scenes.pulley_pair()
    errs, _ = _run_vs_golden(st, "pulley_240.jsonl", 240, 8, 3, 3)
    assert max(errs) < 1e-2
