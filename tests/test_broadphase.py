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


def test_grid_no_duplicate_pairs_under_bucket_collisions():
    """DuplicateProxyTest analog (Testbed/Tests/DuplicateProxyTest.h:168) +
    the round-3 dedup fix: a fixture inserts one bucket entry per covered
    cell, and two of its cells can hash to the same bucket, which used to
    emit the same canonical pair twice (corrupting carry_over_contacts's
    unique-key matmul). Dense random churn maximizes covered-cell/bucket
    collisions; the grid table must stay duplicate-free and bit-identical
    to all-pairs throughout."""
    rng = np.random.RandomState(7)
    from box2d_mt_tpu import mutate, settings, shapes
    from box2d_mt_tpu.world import WorldBuilder

    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-60.0, 0.0), (60.0, 0.0)))
    n = 60
    for i in range(n):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(float(rng.uniform(-6, 6)),
                                     float(rng.uniform(0.5, 6))))
        wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=1.0)
    st = wb.freeze()

    def assert_unique_and_equal(st):
        nc = st.contacts.capacity
        fa_g, fb_g, _ = jax.jit(
            lambda s: broadphase.find_pairs_grid(s, nc))(st)
        fa_g = np.asarray(fa_g)
        fb_g = np.asarray(fb_g)
        valid = fa_g >= 0
        keys = (np.minimum(fa_g, fb_g) * 100000
                + np.maximum(fa_g, fb_g))[valid]
        assert len(keys) == len(set(keys.tolist())), "duplicate pair emitted"
        fa_a, fb_a, _ = jax.jit(
            lambda s: broadphase.find_pairs_allpairs(s, nc))(st)
        np.testing.assert_array_equal(fa_g, np.asarray(fa_a))
        np.testing.assert_array_equal(fb_g, np.asarray(fb_a))

    assert_unique_and_equal(st)
    for i in range(8):
        for _ in range(10):
            st, _ = world.step(st, 1 / 60)
        # churn: teleport a few bodies into dense clusters
        for b in rng.choice(np.arange(1, n + 1), size=4, replace=False):
            st = mutate.set_transform(
                st, int(b),
                (float(rng.uniform(-2, 2)), float(rng.uniform(0.5, 3))),
                0.0)
        assert_unique_and_equal(st)

    # graceful degradation: with cell_slots cranked far below the pile
    # density, the grid MUST report the dropped entries via overflow (the
    # growable-container analog — silent pair loss is the bug class this
    # guards), and still emit only real, unique pairs (a subset of
    # all-pairs).
    nc = st.contacts.capacity
    fa_g, fb_g, ovf = jax.jit(
        lambda s: broadphase.find_pairs_grid(s, nc, cell_slots=2))(st)
    fa_a, fb_a, _ = jax.jit(
        lambda s: broadphase.find_pairs_allpairs(s, nc))(st)
    fa_g, fb_g = np.asarray(fa_g), np.asarray(fb_g)
    gkeys = (np.minimum(fa_g, fb_g) * 100000
             + np.maximum(fa_g, fb_g))[fa_g >= 0]
    akeys = (np.minimum(np.asarray(fa_a), np.asarray(fb_a)) * 100000
             + np.maximum(np.asarray(fa_a), np.asarray(fb_a)))[
                 np.asarray(fa_a) >= 0]
    assert len(gkeys) == len(set(gkeys.tolist()))
    assert set(gkeys.tolist()) <= set(akeys.tolist())
    assert len(gkeys) < len(akeys) and int(ovf) > 0
