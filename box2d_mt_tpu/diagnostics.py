"""Observability + checkpoint/resume.

The reference exposes world counts (b2World.h:186-196), tree-quality
metrics, and a code-emitting b2World::Dump (b2World.h:246-248). The TPU
state is one pytree of arrays, so checkpointing is a direct serialization —
the real equivalent of Dump/replay — and counts are mask sums.
"""

import numpy as np

import jax

from .state import State


def counts(state: State) -> dict:
    """b2World::GetBodyCount/GetContactCount/GetJointCount analog; works on
    single or batched states (sums are over the trailing capacity axis)."""
    bodies = state.bodies
    contacts = state.contacts
    out = {
        "bodies": np.asarray((bodies.body_type >= 0).sum(-1)),
        "awake": np.asarray(
            ((bodies.body_type >= 0) & bodies.awake).sum(-1)),
        "fixtures": np.asarray((state.fixtures.body >= 0).sum(-1)),
        "contacts": np.asarray((contacts.f_a >= 0).sum(-1)),
        "touching": np.asarray(contacts.touching.sum(-1)),
    }
    joints = 0
    for name in ("revolute", "distance", "prismatic", "mouse", "weld",
                 "friction", "rope", "motor", "wheel", "pulley", "gear"):
        blk = getattr(state.joints, name)
        if blk.body_a.shape[-1]:
            joints = joints + np.asarray(blk.active.sum(-1))
    out["joints"] = joints
    return out


def save_state(state: State, path) -> None:
    """Checkpoint: serialize the full world state (the b2World::Dump
    equivalent — unlike the reference's code-emitting dump, this is exact:
    warm-start impulses, sweeps, and sleep timers all round-trip).

    Format: np.savez of the flattened pytree leaves (arrays only — no
    pickle, so an untrusted checkpoint cannot execute code on load)."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if hasattr(path, "write"):
        np.savez(path, **arrays)
    else:
        # open ourselves so the file lands exactly at `path` (np.savez
        # appends ".npz" to bare string paths)
        with open(path, "wb") as f:
            np.savez(f, **arrays)


def load_state(path, like: State) -> State:
    """Restore a checkpoint written by save_state. `like` is REQUIRED: it
    provides the pytree structure (any state with the same capacities —
    e.g. the freshly built scene). Uses np.load without pickle, so loading
    an untrusted file cannot execute code."""
    assert like is not None, "pass `like=` a State with matching capacities"
    with np.load(path, allow_pickle=False) as payload:
        leaves = [payload[f"leaf_{i}"] for i in range(len(payload.files))]
    _, treedef = jax.tree_util.tree_flatten(like)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves])


def dump(state: State) -> str:
    """b2World::Dump analog: a human-readable world summary (the exact
    state itself checkpoints via save_state)."""
    c = counts(state)
    lines = ["box2d_mt_tpu world:"]
    for k, v in c.items():
        lines.append(f"  {k}: {v}")
    lines.append(f"  gravity: {np.asarray(state.gravity).tolist()}")
    lines.append(f"  capacities: bodies={state.bodies.capacity} "
                 f"fixtures={state.fixtures.capacity} "
                 f"contacts={state.contacts.capacity}")
    return "\n".join(lines)
