"""box2d_mt_tpu — a TPU-native 2D rigid-body physics framework.

A from-scratch re-design of the Box2D-MT feature set for TPUs: world state
is a fixed-capacity structure-of-arrays pytree, `step` is one fused XLA
program (broad phase, narrow phase, colored sequential-impulse solver,
integration, sleep), `vmap` batches thousands of independent worlds, and
`jax.sharding` scales the world axis across chips.

Quick start::

    from box2d_mt_tpu import WorldBuilder, shapes, step, settings

    wb = WorldBuilder(gravity=(0, -10))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40, 0), (40, 0)))
    box = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0, 4))
    wb.create_fixture(box, shapes.Polygon.box(0.5, 0.5), density=1.0)
    state = wb.freeze()
    for _ in range(60):
        state, events = step(state, 1 / 60)
"""

from . import math2d, settings, shapes, state
from .state import State, Bodies, Fixtures, Contacts, Joints
from .world import WorldBuilder, Events, PreSolveView, step
from . import diagnostics, draw, mutate, rope
from .ops.raycast import query_aabb, ray_cast_all, ray_cast_closest
from .ops.distance import shape_cast

__all__ = [
    "WorldBuilder", "Events", "step", "State", "Bodies", "Fixtures",
    "Contacts", "Joints", "math2d", "settings", "shapes", "state", "mutate",
    "rope", "ray_cast_closest", "ray_cast_all", "query_aabb", "shape_cast",
]

__version__ = "0.1.0"
