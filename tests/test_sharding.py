"""Mesh-sharded execution must be bit-identical to unsharded execution.
conftest forces 8 virtual CPU devices precisely so this path is exercised
in the suite (the driver's dryrun_multichip covers compile-only)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes
from box2d_mt_tpu.parallel.sharding import (make_sharded_step,
                                            replicate_state)


def test_sharded_step_bit_equals_unsharded():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(devices[:8]), axis_names=("worlds",))

    state = scenes.pyramid(5)
    batched = replicate_state(state, 16)
    dt = jnp.float32(1 / 60)
    kinds = world.possible_kinds(state)

    step_fn, shard_state = make_sharded_step(mesh, kinds=kinds)
    sharded = shard_state(batched)

    plain = batched
    for _ in range(10):
        plain, _ = world.step_batched(plain, dt, kinds=kinds)
        sharded, _ = step_fn(sharded, dt)

    np.testing.assert_array_equal(np.asarray(sharded.bodies.c),
                                  np.asarray(plain.bodies.c))
    np.testing.assert_array_equal(np.asarray(sharded.bodies.a),
                                  np.asarray(plain.bodies.a))
    np.testing.assert_array_equal(np.asarray(sharded.bodies.awake),
                                  np.asarray(plain.bodies.awake))
    np.testing.assert_array_equal(np.asarray(sharded.contacts.touching),
                                  np.asarray(plain.contacts.touching))
