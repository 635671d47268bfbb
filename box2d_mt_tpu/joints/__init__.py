"""Joint packing and the joint-solver registry.

Joints are typed SoA blocks (state.py). Each implemented joint type has a
module providing init/warm-start/velocity/position kernels, re-deriving the
reference joint math (Box2D/Dynamics/Joints/*.cpp) as batched array ops.
The per-type solvers run under the same coloring regime as contacts.
"""

import numpy as np
import jax.numpy as jnp

from .. import state as st


def _empty(cls, fields2=(), fields3=()):
    """Build a zero-capacity block of the given joint dataclass."""
    kw = {}
    for f in cls.__dataclass_fields__:
        if f in ("active", "collide_connected"):
            kw[f] = jnp.zeros(0, bool)
        elif f in ("body_a", "body_b", "body_c", "body_d", "joint1_type",
                   "joint1_index", "joint2_type", "joint2_index",
                   "limit_state"):
            kw[f] = jnp.zeros(0, jnp.int32)
        elif f in ("enable_limit", "enable_motor"):
            kw[f] = jnp.zeros(0, bool)
        elif f in fields3:
            kw[f] = jnp.zeros((0, 3), jnp.float32)
        elif f in fields2:
            kw[f] = jnp.zeros((0, 2), jnp.float32)
        else:
            kw[f] = jnp.zeros(0, jnp.float32)
    return cls(**kw)


_VEC2_FIELDS = {
    "local_anchor_a", "local_anchor_b", "local_anchor_c", "local_anchor_d",
    "local_axis_a", "local_axis_c", "local_axis_d", "target",
    "linear_offset", "ground_anchor_a", "ground_anchor_b", "linear_impulse",
}
_VEC3_FIELDS_BY_CLS = {
    st.RevoluteJoints: {"impulse"},
    st.PrismaticJoints: {"impulse"},
    st.WeldJoints: {"impulse"},
}
_VEC2_IMPULSE_BY_CLS = {
    st.MouseJoints: {"impulse"},
}


def _fields2(cls):
    f2 = set(_VEC2_FIELDS)
    f2 |= _VEC2_IMPULSE_BY_CLS.get(cls, set())
    return f2


def _fields3(cls):
    return _VEC3_FIELDS_BY_CLS.get(cls, set())


def make_empty_joints() -> st.Joints:
    return st.Joints(
        revolute=_empty(st.RevoluteJoints, _fields2(st.RevoluteJoints), _fields3(st.RevoluteJoints)),
        distance=_empty(st.DistanceJoints, _fields2(st.DistanceJoints), _fields3(st.DistanceJoints)),
        prismatic=_empty(st.PrismaticJoints, _fields2(st.PrismaticJoints), _fields3(st.PrismaticJoints)),
        mouse=_empty(st.MouseJoints, _fields2(st.MouseJoints), _fields3(st.MouseJoints)),
        weld=_empty(st.WeldJoints, _fields2(st.WeldJoints), _fields3(st.WeldJoints)),
        friction=_empty(st.FrictionJoints, _fields2(st.FrictionJoints), _fields3(st.FrictionJoints)),
        rope=_empty(st.RopeJoints, _fields2(st.RopeJoints), _fields3(st.RopeJoints)),
        motor=_empty(st.MotorJoints, _fields2(st.MotorJoints), _fields3(st.MotorJoints)),
        wheel=_empty(st.WheelJoints, _fields2(st.WheelJoints), _fields3(st.WheelJoints)),
        pulley=_empty(st.PulleyJoints, _fields2(st.PulleyJoints), _fields3(st.PulleyJoints)),
        gear=_empty(st.GearJoints, _fields2(st.GearJoints), _fields3(st.GearJoints)),
    )


def _pack(cls, defs, scalar_defaults, capacity=0):
    """Pack a list of joint-def dicts into a typed block, padded to
    `capacity` inactive slots for runtime joint creation
    (mutate.add_*_joint — the b2World::CreateJoint analog)."""
    n = len(defs)
    cap = max(n, capacity)
    if cap == 0:
        return _empty(cls, _fields2(cls), _fields3(cls))
    kw = {}
    f2 = _fields2(cls)
    f3 = _fields3(cls)

    def padded(vals, dtype, width=0):
        a = np.zeros((cap,) + ((width,) if width else ()), dtype)
        if n:
            a[:n] = vals
        return jnp.asarray(a)

    for f in cls.__dataclass_fields__:
        if f == "active":
            kw[f] = padded([True] * n, bool)
        elif f in ("collide_connected", "enable_limit", "enable_motor"):
            kw[f] = padded([bool(d.get(f, False)) for d in defs], bool)
        elif f in ("body_a", "body_b", "body_c", "body_d", "joint1_type",
                   "joint1_index", "joint2_type", "joint2_index",
                   "limit_state"):
            kw[f] = padded([int(d.get(f, 0)) for d in defs], np.int32)
        elif f in f3:
            kw[f] = jnp.zeros((cap, 3), jnp.float32)
        elif f in f2:
            if f.endswith("impulse"):
                kw[f] = jnp.zeros((cap, 2), jnp.float32)
            else:
                kw[f] = padded([d.get(f, (0.0, 0.0)) for d in defs],
                               np.float32, width=2)
        elif f.endswith("impulse"):
            kw[f] = jnp.zeros(cap, jnp.float32)
        else:
            kw[f] = padded(
                [float(d.get(f, scalar_defaults.get(f, 0.0))) for d in defs],
                np.float32)
    return cls(**kw)


def build_joints(joint_defs: dict, joint_capacity: dict = None) -> st.Joints:
    supported = {"revolute", "distance", "prismatic", "mouse", "weld",
                 "friction", "rope", "motor", "wheel", "pulley", "gear"}
    unknown = set(joint_defs) - supported
    if unknown:
        raise ValueError(f"unknown joint kinds: {unknown}")
    cap = joint_capacity or {}
    unknown_cap = set(cap) - supported
    if unknown_cap:
        raise ValueError(f"unknown joint kinds in capacity: {unknown_cap}")

    def c(k):
        return int(cap.get(k, 0))

    return st.Joints(
        revolute=_pack(st.RevoluteJoints, joint_defs.get("revolute", []), {},
                       c("revolute")),
        distance=_pack(st.DistanceJoints, joint_defs.get("distance", []), {},
                       c("distance")),
        prismatic=_pack(st.PrismaticJoints, joint_defs.get("prismatic", []),
                        {}, c("prismatic")),
        mouse=_pack(st.MouseJoints, joint_defs.get("mouse", []), {},
                    c("mouse")),
        weld=_pack(st.WeldJoints, joint_defs.get("weld", []), {}, c("weld")),
        friction=_pack(st.FrictionJoints, joint_defs.get("friction", []), {},
                       c("friction")),
        rope=_pack(st.RopeJoints, joint_defs.get("rope", []), {}, c("rope")),
        motor=_pack(st.MotorJoints, joint_defs.get("motor", []),
                    {"correction_factor": 0.3}, c("motor")),
        wheel=_pack(st.WheelJoints, joint_defs.get("wheel", []), {},
                    c("wheel")),
        pulley=_pack(st.PulleyJoints, joint_defs.get("pulley", []),
                     {"ratio": 1.0}, c("pulley")),
        gear=_pack(st.GearJoints, joint_defs.get("gear", []), {"ratio": 1.0},
                   c("gear")),
    )


_BLOCK_NAMES = ("revolute", "distance", "prismatic", "mouse", "weld",
                "friction", "rope", "motor", "wheel", "pulley", "gear")


def joints_present(joints: st.Joints) -> bool:
    return any(getattr(joints, n).body_a.shape[-1] > 0 for n in _BLOCK_NAMES)


def build_joint_arrays(joints: st.Joints):
    """Concatenated (body_a, body_b, active) across all blocks for island
    merging and collide-connected filtering; None if no joints exist."""
    bas, bbs, acts = [], [], []
    for n in _BLOCK_NAMES:
        blk = getattr(joints, n)
        if blk.body_a.shape[0] == 0:
            continue
        bas.append(blk.body_a)
        bbs.append(blk.body_b)
        acts.append(blk.active)
    if not bas:
        return None, None, None
    return (jnp.concatenate(bas), jnp.concatenate(bbs), jnp.concatenate(acts))


# Solver registry: populated by the per-type modules in this package.
from .solver import (init_joints, warm_start_joints, solve_joint_velocity,  # noqa: E402
                     solve_joint_position, store_joint_impulses)
