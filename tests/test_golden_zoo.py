"""Golden-trace parity for the round-3 scene-zoo additions, generated from
the reference by tools/golden_gen/golden5.cpp (bodies in reverse creation
order, stepped at 8/3 iterations).

Tolerance notes (measured, see per-case comments):
- web / varying_restitution / slider_crank track near-exactly.
- Contact transients (sphere_stack at -50 m/s, bridge drops) deviate during
  the impact frames and reconverge.
- mobile is a symmetric equilibrium that the sequential solve breaks to ONE
  side: the reference's island joint order sways it -x, the colored solver
  +x (mirror image, equal magnitude). Both are valid resolutions of the
  same bifurcation; the tolerance bounds amplitude, not phase.
"""

import json

import jax
import numpy as np
import pytest

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes

from conftest import GOLDEN


@pytest.fixture(autouse=True)
def _clear_caches_per_scene():
    # same CPU-JIT live-executable pressure valve as test_scene_zoo
    yield
    jax.clear_caches()


def _errs(build, fname, steps, n_bodies, max_colors=None):
    ref = [json.loads(line) for line in open(GOLDEN / fname)]
    st = build()
    kinds = world.possible_kinds(st)
    kw = {} if max_colors is None else {"max_colors": max_colors}
    errs = []
    for i in range(steps):
        st, ev = world.step(st, 1 / 60, velocity_iterations=8,
                            position_iterations=3, kinds=kinds, **kw)
        assert int(ev.color_overflow) == 0
        p = np.asarray(st.bodies.xf_p)
        a = np.asarray(st.bodies.a)
        e = 0.0
        for j, rb in enumerate(ref[i]["bodies"]):
            k = n_bodies - 1 - j
            e = max(e, abs(p[k][0] - rb[0]), abs(p[k][1] - rb[1]),
                    abs(a[k] - rb[2]))
        errs.append(e)
    return np.asarray(errs)


def test_web_golden():
    # pure soft-joint web: near-exact (measured 5.7e-6 over 240 steps)
    e = _errs(scenes.web, "web_240.jsonl", 240, 5)
    assert e.max() < 1e-4, e.max()


def test_varying_restitution_golden():
    # bounce heights incl. restitution thresholds (measured 1.7e-3)
    e = _errs(scenes.varying_restitution, "varying_restitution_300.jsonl",
              300, 8)
    assert e.max() < 1e-2, e.max()


def test_slider_crank_golden():
    # 3-revolute + prismatic mechanism (measured 3.7e-3 peak)
    e = _errs(scenes.slider_crank, "slider_crank_240.jsonl", 240, 4)
    assert e.max() < 2e-2, e.max()
    assert e[-1] < 5e-3, e[-1]


def test_heavy_on_light_golden():
    # 100x mass ratio (measured 2.1e-2 impact transient, 2e-3 settled)
    e = _errs(scenes.heavy_on_light, "heavy_on_light_240.jsonl", 240, 3)
    assert e.max() < 0.08, e.max()
    assert e[-1] < 0.02, e[-1]


def test_cantilever_golden():
    # weld chains incl. soft 5 Hz segment (measured 3.5e-2 peak)
    e = _errs(lambda: scenes.cantilever(4), "cantilever_240.jsonl", 240, 12)
    assert e.max() < 0.12, e.max()
    assert e[-1] < 0.05, e[-1]


def test_bridge_golden():
    # 12 chained revolutes + dropped triangles/circles (measured 8.5e-2)
    e = _errs(lambda: scenes.bridge(12), "bridge_240.jsonl", 240, 18)
    assert e.max() < 0.25, e.max()
    assert e[-1] < 0.10, e[-1]


def test_sphere_stack_golden():
    # -50 m/s stacked impacts: transient diverges, settles (measured
    # 0.36 peak / 2.4e-2 settled)
    e = _errs(lambda: scenes.sphere_stack(5), "sphere_stack_240.jsonl",
              240, 6)
    assert e.max() < 0.8, e.max()
    assert e[-1] < 0.08, e[-1]


def test_mobile_golden_amplitude_bounded():
    # mirror-image sway (see module docstring): bound the amplitude —
    # bodies stay within ~slat-size of the reference envelope (measured
    # 0.41 peak) and the structure neither collapses nor gains energy
    e = _errs(lambda: scenes.mobile(3), "mobile_240.jsonl", 240, 16)
    assert e.max() < 0.8, e.max()
    assert e[-1] < 0.4, e[-1]


# ---- round-3 wave 2: CCD scenes + remaining zoo (golden6.cpp) ----------


def test_bullet_test_golden():
    """BulletTest.h: the canonical bullet-drop CCD regression. The first
    TOI impact (step ~7) and the mini-island response on the plank's
    obstacle hit (step 8, which needs the dynamic-bullet neighbor in the
    velocity pass) must match; afterwards both engines tumble chaotically
    (measured 1.4e-3 at step 8, divergence grows from step 9)."""
    e = _errs(scenes.bullet_test, "bullet_test_120.jsonl", 120, 3)
    assert e[:9].max() < 2e-2, e[:9].max()
    assert np.isfinite(e).all()


def test_continuous_test_golden():
    # non-bullet dynamic-vs-static CCD, spinning plank (measured 7.8e-3)
    e = _errs(scenes.continuous_test, "continuous_test_120.jsonl", 120, 2)
    assert e.max() < 3e-2, e.max()


def test_bullet_on_stack_golden():
    # bullet into a stack base; mini-island keeps the hit box from
    # tunneling into neighbors (measured 3.2e-2 at 60, 0.23 at 120)
    e = _errs(scenes.bullet_on_stack, "bullet_on_stack_120.jsonl", 120, 7)
    assert e[:60].max() < 0.1, e[:60].max()
    assert e.max() < 0.5, e.max()


def test_heavy_on_light_two_golden():
    # 100x mass-ratio circle stack (measured 4.95e-2 impact transient,
    # 2.3e-2 settled)
    e = _errs(scenes.heavy_on_light_two, "heavy_on_light_two_240.jsonl",
              240, 4)
    assert e.max() < 0.15, e.max()
    assert e[-1] < 0.08, e[-1]


def test_mobile_balanced_golden():
    # crossbar-balanced mobile: tracks near-exactly unlike the symmetric
    # plain mobile (measured 1.8e-3)
    e = _errs(lambda: scenes.mobile_balanced(3), "mobile_balanced_240.jsonl",
              240, 16)
    assert e.max() < 1e-2, e.max()


def test_apply_force_golden():
    # zero-g friction-joint pinning + damped ship (measured 8.2e-8: the
    # scene is in exact equilibrium under the friction joints)
    e = _errs(scenes.apply_force, "apply_force_240.jsonl", 240, 12)
    assert e.max() < 1e-4, e.max()


def test_character_collision_golden():
    # chain/edge traversal with five characters (measured 2.3e-2)
    e = _errs(scenes.character_collision, "character_collision_240.jsonl",
              240, 11)
    assert e.max() < 0.1, e.max()


def test_edge_shapes_golden():
    # cosine terrain drop: tracks to 2.8e-2 through step 120; afterwards
    # one slider settles into a different terrain valley (measured 4.0
    # late) — bound the tracked window, sanity-check the rest
    e = _errs(lambda: scenes.edge_shapes(8), "edge_shapes_240.jsonl",
              240, 9)
    assert e[:120].max() < 0.1, e[:120].max()
    assert np.isfinite(e).all()


def test_poly_shapes_golden():
    # five-shape tumble onto flat ground (measured 0.10 at 60; chaotic
    # tumbling later, 0.76 peak)
    e = _errs(lambda: scenes.poly_shapes(8), "poly_shapes_240.jsonl",
              240, 9)
    assert e[:60].max() < 0.3, e[:60].max()
    assert e.max() < 1.5, e.max()


# ---- round-3 wave 3: classic scenes (golden7.cpp) ----------------------


def test_tumbler_golden():
    # rotating drum with 40 boxes: tracks to 9.4e-3 through step 60,
    # then the box pile's chaos decorrelates (measured 9.9 peak late)
    # the jammed pile exceeds the default 24-color budget
    e = _errs(lambda: scenes.tumbler(40), "tumbler_240.jsonl", 240, 42,
              max_colors=48)
    assert e[:60].max() < 0.05, e[:60].max()
    assert np.isfinite(e).all()


def test_dominos_golden():
    # domino run + seesaw + cradle (measured 0.16 peak at the domino
    # topple, 0.15 settled — timing of each topple is contact-sensitive)
    e = _errs(scenes.dominos, "dominos_240.jsonl", 240, 23)
    assert e.max() < 0.4, e.max()


def test_car_golden():
    # motorized wheel joints over hilly edge terrain (measured 3.7e-2)
    e = _errs(scenes.car, "car_240.jsonl", 240, 30)
    assert e.max() < 0.15, e.max()


def test_tiles_golden():
    # pyramid on tiled ground fixtures (measured 4.9e-3)
    e = _errs(lambda: scenes.tiles(4, 20, 2), "tiles_240.jsonl", 240, 11)
    assert e.max() < 0.05, e.max()


def test_confined_golden():
    # zero-g sealed circles (measured 1.9e-3 peak, 4.8e-6 settled)
    e = _errs(lambda: scenes.confined(4, 3), "confined_240.jsonl", 240, 13)
    assert e.max() < 0.01, e.max()


def test_collision_filtering_golden():
    # category/mask/group admission semantics drive the trajectories
    # (measured 7.2e-2 transient, 6.3e-3 settled)
    e = _errs(scenes.collision_filtering,
              "collision_filtering_240.jsonl", 240, 8)
    assert e.max() < 0.2, e.max()
    assert e[-1] < 0.05, e[-1]


# ---- round-3 wave 4: headline + compound scenes (golden8.cpp) -----------


def test_multithread_demo_golden():
    # the reference's headline MT workload at 200 boxes: the packed grid
    # settles in lockstep (measured 1.2e-2 over 240 steps)
    e = _errs(lambda: scenes.multithread_demo(200),
              "multithread_demo_240.jsonl", 240, 201)
    assert e.max() < 0.05, e.max()


def test_pinball_golden():
    # bullet ball vs chain loop + motorized limited flippers
    # (measured 7.3e-3)
    e = _errs(scenes.pinball, "pinball_240.jsonl", 240, 4)
    assert e.max() < 0.05, e.max()


def test_chain_links_golden():
    # 10-plank revolute chain swing (measured 1.2e-2)
    e = _errs(lambda: scenes.chain_links(10), "chain_links_240.jsonl",
              240, 11)
    assert e.max() < 0.05, e.max()


def test_compound_shapes_golden():
    # multi-fixture bodies tumbling into columns: tracks to 6.6e-2 through
    # step 60, then the tumble decorrelates (measured 3.2 peak late)
    e = _errs(lambda: scenes.compound_shapes(4),
              "compound_shapes_240.jsonl", 240, 13)
    assert e[:60].max() < 0.2, e[:60].max()
    assert np.isfinite(e).all()


def test_body_types_golden():
    # motorized revolute+prismatic platform rig (measured 3.6e-3)
    e = _errs(scenes.body_types, "body_types_240.jsonl", 240, 4)
    assert e.max() < 0.02, e.max()


# ---- round-3 wave 5: linkage + friction scenes (golden9.cpp) ------------


def test_varying_friction_golden():
    # friction 0.75..0 boxes down the ramp zig-zag: stopping distances are
    # a direct friction-solve oracle (measured 1.4e-2 over 300 steps)
    e = _errs(scenes.varying_friction, "varying_friction_300.jsonl", 300, 11)
    assert e.max() < 0.05, e.max()


def test_theo_jansen_golden():
    """TheoJansen.h walker: 24 soft distance joints + 6 revolutes + motor
    over 40 loose circles. The gross gait must match — chassis (41) and
    wheel (42) track the reference within 0.1 for the full 240 steps
    (measured 9.4e-2; both walkers advance ~6 m). The leg linkage is
    solve-order-sensitive (measured 5.8e-2 at step 30) and the kicked
    floor circles decorrelate chaotically, so legs get an early-window
    bound and circles a finiteness check."""
    ref = [json.loads(line) for line in open(GOLDEN / "theo_jansen_240.jsonl")]
    st = scenes.theo_jansen()
    kinds = world.possible_kinds(st)
    n = 55
    core_err, leg30 = 0.0, 0.0
    for i in range(240):
        st, ev = world.step(st, 1 / 60, velocity_iterations=8,
                            position_iterations=3, kinds=kinds)
        assert int(ev.color_overflow) == 0
        p = np.asarray(st.bodies.xf_p)
        for k in (41, 42):  # chassis, wheel
            rb = ref[i]["bodies"][n - 1 - k]
            core_err = max(core_err, abs(p[k][0] - rb[0]),
                           abs(p[k][1] - rb[1]))
        if i < 30:
            for k in range(43, 55):  # leg bodies
                rb = ref[i]["bodies"][n - 1 - k]
                leg30 = max(leg30, abs(p[k][0] - rb[0]),
                            abs(p[k][1] - rb[1]))
    assert core_err < 0.15, core_err
    assert leg30 < 0.15, leg30
    assert np.isfinite(np.asarray(st.bodies.c)).all()


def test_skier_golden():
    """Skier.h (golden10.cpp, skier teleported to the slope edge x=-0.7
    as in test_scene_zoo): frictionless two-fixture skier crossing both
    ghost-edge slope joints tracks the reference descent. Measured max
    7.5e-3 during the slope-joint crossings, 1.0e-3 terminal."""
    from box2d_mt_tpu import mutate

    def build():
        st = scenes.skier()
        return mutate.set_transform(
            st, 1, (-0.7, float(np.asarray(st.bodies.xf_p)[1, 1])), 0.0)

    e = _errs(build, "skier_180.jsonl", 180, 2)
    assert e.max() < 0.02, e.max()
    assert e[-1] < 5e-3, e[-1]


def test_chain_problem_golden():
    """chainProblem.h regression dump (golden10.cpp): bullet box landing
    on the L-chain corner. Measured max 1.2e-3 at the bullet impact
    frame, 8e-7 terminal — the TOI sub-step and chain ghost handling
    reproduce the reference rest state bit-tight."""
    e = _errs(scenes.chain_problem, "chain_problem_180.jsonl", 180, 2)
    assert e.max() < 5e-3, e.max()
    assert e[-1] < 1e-4, e[-1]


def test_edge_test_golden():
    """EdgeTest.h (golden10.cpp): circle + box settling across internal
    terrain vertices. Measured max 1.9e-3 in the landing transient,
    3.6e-7 terminal."""
    e = _errs(scenes.edge_test, "edge_test_120.jsonl", 120, 3)
    assert e.max() < 5e-3, e.max()
    assert e[-1] < 1e-4, e[-1]


def test_basic_slider_crank_golden():
    """BasicSliderCrank.h (golden10.cpp): three revolutes + prismatic
    guide swinging under gravity. Measured max 3.7e-3 over 240 steps,
    3.4e-4 terminal."""
    e = _errs(scenes.basic_slider_crank, "basic_slider_crank_240.jsonl",
              240, 4)
    assert e.max() < 0.01, e.max()
    assert e[-1] < 2e-3, e[-1]
