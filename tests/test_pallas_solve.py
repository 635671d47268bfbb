"""Fused Pallas solve-middle kernel vs the XLA color-chunk path.

Runs the Pallas kernel in interpret mode on CPU (the TPU driver exercises
the compiled kernel via bench.py / tools) and requires trajectory-level
agreement with the XLA middle over a settling stack.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from box2d_mt_tpu import world as W
from box2d_mt_tpu.models import scenes
from box2d_mt_tpu.parallel.sharding import replicate_state


def _roll(states, steps, kinds, dt):
    for _ in range(steps):
        states, _ = W.step_batched(states, dt, kinds=kinds)
    return states


@pytest.mark.parametrize("scene", ["pyramid", "vertical_stack", "bridge"])
def test_pallas_middle_matches_xla(scene, monkeypatch):
    """pyramid/vertical_stack exercise the fully-fused contact kernel;
    bridge (revolute joints + boxes) exercises the joint-world SANDWICH
    (pack/vel-iter/pos-iter/unpack kernels with XLA joint passes
    interleaved)."""
    if scene == "bridge":
        state = scenes.bridge(8)
    elif scene == "pyramid":
        state = scenes.pyramid(6)
    else:
        state = scenes.vertical_stack(6)
    states = replicate_state(state, 2)
    kinds = W.possible_kinds(state)
    dt = jnp.float32(1 / 60)

    ref = _roll(states, 12, kinds, dt)
    ref = jax.tree.map(np.asarray, ref)          # fetch before cache clear

    # the env switch is read at trace time — bust the jit cache so the
    # second rollout actually retraces through the Pallas path
    monkeypatch.setenv("BOX2D_TPU_FORCE_PALLAS_SOLVE", "1")
    monkeypatch.setenv("BOX2D_TPU_PALLAS_SOLVE_MIN_NB", "0")
    jax.clear_caches()
    got = _roll(states, 12, kinds, dt)
    jax.clear_caches()                           # don't poison later tests

    np.testing.assert_allclose(np.asarray(got.bodies.c),
                               np.asarray(ref.bodies.c),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bodies.a),
                               np.asarray(ref.bodies.a),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bodies.v),
                               np.asarray(ref.bodies.v),
                               rtol=0, atol=1e-4)
    assert bool(jnp.all(got.bodies.awake == ref.bodies.awake))
