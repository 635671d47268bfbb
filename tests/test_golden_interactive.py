"""Golden-trace parity for the hook/mutation-driven scenes (wave 7,
tools/golden_gen/golden11.cpp). These exercise the *interactive* API
surface against the reference engine: PreSolve hooks (SetTangentSpeed /
SetEnabled), runtime fixture add/remove + sensor toggling, the Breakable
cached-velocity split, and touching-pair-driven body destruction — the
scripted drives are mirrored exactly between the C++ driver and the code
here, so any divergence is an engine-parity failure, not a drive skew.

Bodies in reference dumps are in GetBodyList order = reverse creation
order; scenes that destroy bodies map dump row j to the j-th largest
still-active slot (slot order == creation order here).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from box2d_mt_tpu import mutate, settings, shapes, world
from box2d_mt_tpu.models import scenes

from conftest import GOLDEN


@pytest.fixture(autouse=True)
def _clear_caches_per_scene():
    yield
    jax.clear_caches()


def _load(fname):
    return [json.loads(line) for line in open(GOLDEN / fname)]


def _err_step(st, rbodies):
    """Max |Δ| over (x, y, angle) matching ref rows to active slots in
    reverse-slot order. Returns None on a body-count mismatch."""
    bt = np.asarray(st.bodies.body_type)
    slots = [i for i in range(len(bt) - 1, -1, -1) if bt[i] >= 0]
    if len(slots) != len(rbodies):
        return None
    p = np.asarray(st.bodies.xf_p)
    a = np.asarray(st.bodies.a)
    e = 0.0
    for j, rb in enumerate(rbodies):
        k = slots[j]
        e = max(e, abs(p[k][0] - rb[0]), abs(p[k][1] - rb[1]),
                abs(a[k] - rb[2]))
    return e


def _run(build, fname, steps, **kw):
    ref = _load(fname)
    st = build()
    kinds = world.possible_kinds(st)
    errs = []
    for i in range(steps):
        st, _ = world.step(st, 1 / 60, kinds=kinds, **kw)
        e = _err_step(st, ref[i]["bodies"])
        assert e is not None, f"body count mismatch at step {i}"
        errs.append(e)
    return np.asarray(errs), st


def test_add_pair_golden():
    # zero-g bullet plowing through 50 tiny circles (AddPair.h stress).
    # Deviation grows after the multi-impact pile-up; bound the approach
    # + first-impact frames tightly and the final state loosely.
    e, _ = _run(lambda: scenes.add_pair(50, 7), "add_pair_120.jsonl", 120)
    assert e[:20].max() < 1e-3, e[:20].max()
    assert e.max() < 2.5, e.max()


def _belt_hook(state, view):
    # ConveyorBelt.h:67-84 — platform is fixture 1, always the canonical
    # f_a of its pairs here; +5 matches the reference's A-side rule.
    is_plat = (view.f_a == 1) | (view.f_b == 1)
    return {"tangent_speed": jnp.where(is_plat, 5.0, 0.0)}


def test_conveyor_belt_golden():
    e, st = _run(scenes.conveyor_belt, "conveyor_belt_240.jsonl", 240,
                 pre_solve_fn=_belt_hook)
    assert e.max() < 0.35, e.max()
    assert e[-1] < 0.35, e[-1]
    # all five boxes carried right off the platform end (x > 5)
    x = np.asarray(st.bodies.xf_p)[2:7, 0]
    assert (x > 4.0).all(), x


def _oneside_hook(state, view):
    # disable platform (body 1) contacts while the actor (body 2) center
    # is below the platform top — mirrored in golden11.cpp
    below = state.bodies.c[2, 1] < 10.5
    is_plat = (view.body_a == 1) | (view.body_b == 1)
    return ~(is_plat & below)


def test_one_sided_platform_golden():
    e, st = _run(scenes.one_sided_platform, "one_sided_platform_240.jsonl",
                 240, pre_solve_fn=_oneside_hook)
    assert e.max() < 0.05, e.max()
    # approaching from above, the hook stays enabled (center >= 10.5) and
    # CCD stops the -50 m/s actor ON the platform top (reference: y=11.005)
    assert abs(float(st.bodies.c[2, 1]) - 11.005) < 0.05


def test_shape_editing_golden():
    # ShapeEditing.h 'C'/'S'/'D' script at steps 60/120/180
    ref = _load("shape_editing_240.jsonl")
    st = scenes.shape_editing()
    kinds = world.possible_kinds(st)
    errs = []
    fixture2 = None
    for i in range(240):
        if i == 60:
            st, fixture2 = mutate.add_fixture(
                st, 1, shapes.Circle(3.0, (0.5, -4.0)), density=10.0)
            st = mutate.set_awake(st, 1, True)
        elif i == 120:
            st = mutate.set_sensor(st, fixture2, True)
        elif i == 180:
            st = mutate.remove_fixture(st, fixture2)
            st = mutate.set_awake(st, 1, True)
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        e = _err_step(st, ref[i]["bodies"])
        assert e is not None, f"body count mismatch at step {i}"
        errs.append(e)
    errs = np.asarray(errs)
    assert errs.max() < 0.05, errs.max()


def test_breakable_golden():
    """Breakable.h verbatim: PostSolve impulse > 40 flags the break; the
    split at the next step's start reuses the pre-step cached velocities
    (Events.normal_impulse is the PostSolve analog)."""
    ref = _load("breakable_240.jsonl")
    st = scenes.breakable()
    kinds = world.possible_kinds(st)
    errs = []
    broke = do_break = False
    velocity = np.zeros(2)
    angular = 0.0
    break_step = -1
    for i in range(240):
        if do_break and not broke:
            center = np.asarray(st.bodies.c)[1].copy()
            st = mutate.remove_fixture(st, 2)
            pos = np.asarray(st.bodies.xf_p)[1]
            ang = float(np.asarray(st.bodies.a)[1])
            st, b2 = mutate.add_body(st, body_type=settings.DYNAMIC_BODY,
                                     position=tuple(pos), angle=ang)
            b2 = int(b2)
            assert b2 >= 0
            st, _ = mutate.add_fixture(
                st, b2, shapes.Polygon.box(0.5, 0.5, (0.5, 0.0), 0.0),
                density=1.0)
            c1 = np.asarray(st.bodies.c)[1]
            c2 = np.asarray(st.bodies.c)[b2]

            def crossw(w, r):
                return np.array([-w * r[1], w * r[0]])

            st = mutate.set_angular_velocity(st, 1, angular)
            st = mutate.set_linear_velocity(
                st, 1, tuple(velocity + crossw(angular, c1 - center)))
            st = mutate.set_angular_velocity(st, b2, angular)
            st = mutate.set_linear_velocity(
                st, b2, tuple(velocity + crossw(angular, c2 - center)))
            broke, do_break, break_step = True, False, i
        if not broke:
            velocity = np.asarray(st.bodies.v)[1].copy()
            angular = float(np.asarray(st.bodies.w)[1])
        st, ev = world.step(st, 1 / 60, kinds=kinds)
        if not broke and float(np.asarray(ev.normal_impulse).max()) > 40.0:
            do_break = True
        e = _err_step(st, ref[i]["bodies"])
        assert e is not None, f"body count mismatch at step {i}"
        errs.append(e)
    errs = np.asarray(errs)
    # the break must land on the reference's step (impulse parity)
    assert break_step == 167, break_step
    assert errs.max() < 0.1, errs.max()


def test_collision_processing_golden():
    """CollisionProcessing.h mass rule on the touching set: after each
    step destroy the lighter body of every touching dynamic-dynamic pair
    (Events.touching + mutate.remove_body)."""
    ref = _load("collision_processing_240.jsonl")
    st = scenes.collision_processing()
    kinds = world.possible_kinds(st)
    errs = []
    for i in range(240):
        st, ev = world.step(st, 1 / 60, kinds=kinds)
        e = _err_step(st, ref[i]["bodies"])
        assert e is not None, f"body count mismatch at step {i}"
        errs.append(e)
        touching = np.asarray(ev.touching)
        fa, fb = np.asarray(ev.f_a), np.asarray(ev.f_b)
        fxbody = np.asarray(st.fixtures.body)
        inv_mass = np.asarray(st.bodies.inv_mass)
        bt = np.asarray(st.bodies.body_type)
        nuke = set()
        for ci in np.nonzero(touching)[0]:
            ba, bb = int(fxbody[fa[ci]]), int(fxbody[fb[ci]])
            if ba < 0 or bb < 0 or bt[ba] < 0 or bt[bb] < 0:
                continue
            if inv_mass[ba] > 0 and inv_mass[bb] > 0:
                ma, mb = 1 / inv_mass[ba], 1 / inv_mass[bb]
                nuke.add(ba if mb > ma else bb)
        for b in sorted(nuke):
            st = mutate.remove_body(st, b)
    errs = np.asarray(errs)
    # same bodies destroyed at the same steps (asserted above) + bounded
    # trajectory drift on the survivors
    assert errs.max() < 0.2, errs.max()
    # the reference run ends with ground + the two heaviest survivors
    bt = np.asarray(st.bodies.body_type)
    assert (bt >= 0).sum() == len(ref[-1]["bodies"])


def test_sleep_collide_perf_golden():
    """SleepCollidePerf.h (reduced): pyramids must settle and sleep on the
    reference's schedule while the no-sleep tumbler keeps spinning. Only
    the pyramid bodies are compared — the tumbler's box pile is chaotic."""
    ref = _load("sleep_collide_perf_300.jsonl")
    st = scenes.sleep_collide_perf(2, 6, 1, 20)
    kinds = world.possible_kinds(st)
    n_bodies = int(np.asarray(st.bodies.body_type >= 0).sum())
    pyr = list(range(1, 43))  # ground=0, then 2 pyramids x 21 boxes
    errs = []
    for i in range(300):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        p = np.asarray(st.bodies.xf_p)
        a = np.asarray(st.bodies.a)
        e = 0.0
        for j, rb in enumerate(ref[i]["bodies"]):
            k = n_bodies - 1 - j
            if k in pyr:
                e = max(e, abs(p[k][0] - rb[0]), abs(p[k][1] - rb[1]),
                        abs(a[k] - rb[2]))
        errs.append(e)
    errs = np.asarray(errs)
    assert errs.max() < 0.05, errs.max()
    # sleep parity: all pyramid bodies asleep at the end, like the ref
    aw = np.asarray(st.bodies.awake)
    ref_awake = [bool(rb[6]) for rb in ref[-1]["bodies"]]
    assert not aw[pyr].any()
    assert not any(ref_awake[n_bodies - 1 - k] for k in pyr)
