"""Multi-scene determinism sweep — the reference's consistency harness
(Testbed/Framework/TestMT.cpp:50-132) checks every scene's positions,
angles, and awake flags for exact equality between two instances. The TPU
analogs of its thread-interleaving risk are (a) rerun nondeterminism and
(b) vmap changing reduction orders, so each scene is checked:

  * run-to-run: two rollouts of the same program are bit-identical;
  * batched-vs-batched: every lane of a replicated batch stays identical
    to lane 0 (one world's trajectory must not depend on batch position).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from box2d_mt_tpu.models import scenes
from box2d_mt_tpu.parallel.sharding import make_rollout, replicate_state

SCENES = [
    ("pyramid5", lambda: scenes.pyramid(5), 120),
    ("tumbler30", lambda: scenes.tumbler(30), 120),
    ("gear_train", scenes.gear_train, 120),
    ("wheel_car", scenes.wheel_car, 120),
]


@pytest.mark.parametrize("name,build,steps", SCENES,
                         ids=[s[0] for s in SCENES])
def test_scene_determinism(name, build, steps):
    state = build()
    batched = replicate_state(state, 4)
    roll = make_rollout(steps)

    out1 = roll(batched, jnp.float32(1 / 60))
    out2 = roll(batched, jnp.float32(1 / 60))

    c1 = np.asarray(out1.bodies.c)
    a1 = np.asarray(out1.bodies.a)
    w1 = np.asarray(out1.bodies.awake)
    # run-to-run bit equality
    np.testing.assert_array_equal(c1, np.asarray(out2.bodies.c))
    np.testing.assert_array_equal(a1, np.asarray(out2.bodies.a))
    np.testing.assert_array_equal(w1, np.asarray(out2.bodies.awake))
    # every batch lane identical (replicated worlds must stay in lockstep)
    for k in range(1, 4):
        np.testing.assert_array_equal(c1[k], c1[0], err_msg=f"lane {k}")
        np.testing.assert_array_equal(a1[k], a1[0], err_msg=f"lane {k}")
        np.testing.assert_array_equal(w1[k], w1[0], err_msg=f"lane {k}")
    assert not np.any(np.isnan(c1))


def _bullet_scene():
    """CCD-heavy determinism case: the TOI while-loop's `jnp.any` round
    gating is exactly where batch-dependent nondeterminism would hide."""
    from box2d_mt_tpu import settings, shapes
    from box2d_mt_tpu.world import WorldBuilder
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-30.0, 0.0), (30.0, 0.0)))
    wall = wb.create_body(position=(10.0, 3.0))
    wb.create_fixture(wall, shapes.Polygon.box(0.05, 3.0))
    for i in range(4):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(-8.0 - 1.5 * i, 1.0 + 0.8 * i),
                           bullet=True, linear_velocity=(120.0, 0.0))
        wb.create_fixture(b, shapes.Circle(0.1), density=5.0,
                          restitution=0.3)
    return wb.freeze()


def test_bullet_ccd_determinism():
    state = _bullet_scene()
    batched = replicate_state(state, 4)
    roll = make_rollout(60)
    out1 = roll(batched, jnp.float32(1 / 60))
    out2 = roll(batched, jnp.float32(1 / 60))
    c1 = np.asarray(out1.bodies.c)
    np.testing.assert_array_equal(c1, np.asarray(out2.bodies.c))
    for k in range(1, 4):
        np.testing.assert_array_equal(c1[k], c1[0], err_msg=f"lane {k}")
    assert not np.any(np.isnan(c1))


def test_mutation_sequence_determinism():
    """Between-step mutations (spawn, impulse) replayed twice must produce
    bit-identical trajectories."""
    from box2d_mt_tpu import mutate, settings, shapes, world

    def run():
        st = scenes.pyramid(4)
        out = []
        for i in range(40):
            if i == 10:
                st, b = mutate.add_body(
                    st, body_type=settings.DYNAMIC_BODY, position=(3.0, 6.0))
                st, _ = mutate.add_fixture(
                    st, b, shapes.Circle(0.4), density=2.0)
            if i == 20:
                st = mutate.apply_linear_impulse(st, 1, (2.0, 3.0),
                                                 (0.0, 0.0))
            st, _ = world.step(st, 1 / 60)
            out.append(np.asarray(st.bodies.c))
        return np.stack(out)

    t1 = run()
    t2 = run()
    np.testing.assert_array_equal(t1, t2)
