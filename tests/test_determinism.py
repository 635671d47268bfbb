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
