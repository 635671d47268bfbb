"""Grid-hash broad phase vs dense all-pairs (identical output contract) and
large-scene smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes
from box2d_mt_tpu.ops import broadphase


def _compare(state):
    nc = state.contacts.capacity
    fa1, fb1, ov1 = jax.jit(
        lambda s: broadphase.find_pairs_allpairs(s, nc))(state)
    fa2, fb2, ov2 = jax.jit(
        lambda s: broadphase.find_pairs_grid(s, nc))(state)
    np.testing.assert_array_equal(np.asarray(fa1), np.asarray(fa2))
    np.testing.assert_array_equal(np.asarray(fb1), np.asarray(fb2))
    assert int(ov2) == int(ov1)


def test_grid_matches_allpairs_static():
    for build in (scenes.pyramid, scenes.vertical_stack):
        _compare(build(5))
    _compare(scenes.gear_train())


def test_grid_matches_allpairs_after_motion():
    st = scenes.pyramid(6)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    _compare(st)
    st = scenes.tumbler(40)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    _compare(st)


def test_grid_scene_steps():
    """A >GRID_THRESHOLD-fixture scene routes through the grid finder and
    steps cleanly (no overflow, no NaN)."""
    st = scenes.many_bodies(1200, spacing=2.5)
    assert st.fixtures.capacity > broadphase.GRID_THRESHOLD
    for _ in range(5):
        st, ev = world.step(st, 1 / 60, continuous=False)
    assert int(ev.pair_overflow) == 0
    assert not np.any(np.isnan(np.asarray(st.bodies.c)))
    # bodies are falling under gravity
    assert float(jnp.mean(st.bodies.v[st.bodies.is_dynamic][:, 1])) < -0.5
