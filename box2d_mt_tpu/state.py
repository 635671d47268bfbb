"""World state schema: fixed-capacity structure-of-arrays pytrees.

This replaces the reference's pointer-graph object model (b2Body linked lists,
block-allocated b2Contact/b2Joint, b2Fixture proxy lists — reference:
Box2D/Dynamics/b2World.h:46, b2Body.h:126, Contacts/b2Contact.h:95) with a
single immutable pytree of dense arrays sized at build time. `step` is a pure
function State -> State; `vmap(step)` batches thousands of worlds; sharding
the batch axis over a device mesh scales across chips.

Slot conventions:
  * empty body slots have `body_type == -1`
  * empty fixture slots have `body == -1`
  * empty contact slots have `f_a == -1`
  * joints carry an explicit `active` mask
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import settings


def _pytree(cls):
    """Register a dataclass whose fields are all pytree children."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


def field(**kw):
    return dataclasses.field(**kw)


@_pytree
class Bodies:
    """SoA equivalent of b2Body (reference: b2Body.h:443-512).

    Positions are stored as the sweep center `c` (world center of mass) and
    angle `a` — the variables the solver integrates (b2Island.cpp:192-230).
    The body-origin transform is derived: p = c - R(a)·local_center.
    `c0/a0/alpha0` are the sweep start states for CCD (b2Math.h:362-383).
    """

    body_type: jax.Array      # (N,) i32: -1 empty / 0 static / 1 kinematic / 2 dynamic
    c: jax.Array              # (N,2) f32 world center of mass
    a: jax.Array              # (N,) f32 angle
    c0: jax.Array             # (N,2) f32 sweep start center
    a0: jax.Array             # (N,) f32 sweep start angle
    alpha0: jax.Array         # (N,) f32 sweep start fraction
    local_center: jax.Array   # (N,2) f32 center of mass in body frame
    v: jax.Array              # (N,2) f32 linear velocity (of center)
    w: jax.Array              # (N,) f32 angular velocity
    force: jax.Array          # (N,2) f32 accumulated force
    torque: jax.Array         # (N,) f32 accumulated torque
    inv_mass: jax.Array       # (N,) f32
    inv_inertia: jax.Array    # (N,) f32 (about center of mass)
    linear_damping: jax.Array   # (N,) f32
    angular_damping: jax.Array  # (N,) f32
    gravity_scale: jax.Array    # (N,) f32
    awake: jax.Array          # (N,) bool
    allow_sleep: jax.Array    # (N,) bool
    fixed_rotation: jax.Array  # (N,) bool
    bullet: jax.Array         # (N,) bool
    enabled: jax.Array        # (N,) bool (reference "active" flag)
    sleep_time: jax.Array     # (N,) f32

    @property
    def capacity(self):
        return self.body_type.shape[-1]

    @property
    def q(self):
        """Rotation (sin, cos) from angle."""
        from . import math2d
        return math2d.rot_from_angle(self.a)

    @property
    def xf_p(self):
        """Body-origin world position (b2Body::GetPosition)."""
        from . import math2d
        return self.c - math2d.rot_vec(self.q, self.local_center)

    @property
    def exists(self):
        return self.body_type >= 0

    @property
    def is_dynamic(self):
        return self.body_type == settings.DYNAMIC_BODY

    @property
    def is_static(self):
        return self.body_type == settings.STATIC_BODY


@_pytree
class Fixtures:
    """SoA equivalent of b2Fixture + its shape (reference: b2Fixture.h:100,
    Collision/Shapes/*). All shapes share one vertex-array layout:

      * circle:  verts[0] = local center, radius = m_radius
      * polygon: verts[0:n], normals[0:n], radius = b2_polygonRadius
      * edge:    verts[0] = v1, verts[1] = v2, verts[2] = ghost v0,
                 verts[3] = ghost v3, ghosts = (has_v0, has_v3)

    Chain shapes are decomposed into per-edge child fixtures at build time
    (reference: b2ChainShape::GetChildEdge), preserving ghost-vertex collision.

    `aabb_lo/aabb_hi` is the persistent *fat* broad-phase AABB
    (b2DynamicTree proxy semantics, b2DynamicTree.cpp:130-176): it is only
    recomputed when the tight swept AABB escapes it, which also gates pair
    (re)computation exactly like the reference's move buffer.
    """

    body: jax.Array          # (F,) i32 body slot, -1 = empty
    shape_type: jax.Array    # (F,) i32 settings.SHAPE_*
    radius: jax.Array        # (F,) f32
    verts: jax.Array         # (F, 8, 2) f32 local vertices
    normals: jax.Array       # (F, 8, 2) f32 local edge normals (polygon)
    nverts: jax.Array        # (F,) i32
    ghosts: jax.Array        # (F, 2) bool edge ghost-vertex presence
    friction: jax.Array      # (F,) f32
    restitution: jax.Array   # (F,) f32
    density: jax.Array       # (F,) f32
    is_sensor: jax.Array     # (F,) bool
    filter_category: jax.Array  # (F,) i32 (16-bit semantics)
    filter_mask: jax.Array      # (F,) i32
    filter_group: jax.Array     # (F,) i32
    thick_shape: jax.Array      # (F,) bool (MT fork's CCD opt-out, b2Fixture.h:68)
    aabb_lo: jax.Array       # (F,2) f32 fat AABB lower
    aabb_hi: jax.Array       # (F,2) f32 fat AABB upper

    @property
    def capacity(self):
        return self.body.shape[-1]

    @property
    def exists(self):
        return self.body >= 0


@_pytree
class Contacts:
    """Persistent contact table (slot i holds the i-th pair in canonical
    sorted key order). Equivalent of the reference's contact list +
    b2Manifold (b2Collision.h:93-107) + cached impulses for warm starting.

    Keys are canonical (min fixture, max fixture) packed as fa * F + fb —
    replicating b2ContactProxyIds' deterministic ordering (b2Contact.h:65-77).
    """

    f_a: jax.Array            # (C,) i32 fixture A (lower id), -1 = empty
    f_b: jax.Array            # (C,) i32 fixture B
    m_type: jax.Array         # (C,) i32 manifold type
    m_local_point: jax.Array  # (C,2) f32
    m_local_normal: jax.Array  # (C,2) f32
    m_points: jax.Array       # (C,2,2) f32 manifold local points
    m_ids: jax.Array          # (C,2) i32 packed contact feature ids
    m_count: jax.Array        # (C,) i32
    normal_impulse: jax.Array   # (C,2) f32
    tangent_impulse: jax.Array  # (C,2) f32
    touching: jax.Array       # (C,) bool
    toi_count: jax.Array      # (C,) i32 CCD sub-steps consumed this step
    # per-contact surface/material overrides (b2Contact::SetTangentSpeed /
    # SetFriction / SetRestitution, b2Contact.h:126-157). tangent_speed is
    # a plain value (0 = none, the conveyor-belt surface speed in m/s);
    # the material overrides use -1 = "mix from the fixtures as usual"
    # (negative friction/restitution being invalid). All three persist
    # across pair-table refreshes for surviving pairs and reset on new
    # pairs — the reference's per-contact storage semantics.
    tangent_speed: jax.Array        # (C,) f32
    friction_override: jax.Array    # (C,) f32, -1 = unset
    restitution_override: jax.Array  # (C,) f32, -1 = unset

    @property
    def capacity(self):
        return self.f_a.shape[-1]

    @property
    def exists(self):
        return self.f_a >= 0


@_pytree
class SolverCache:
    """Cross-step cache of the graph passes (island labels + constraint
    coloring). Both depend only on the contact/joint GRAPH, not on
    positions, so between contact begin/end events they are identical
    step to step — the analog of the reference keeping its island and
    contact structures alive between steps rather than rebuilding them.
    The step compares the stored signatures against this step's values
    (batch-globally) and skips the recompute on a match; any world
    mutation that changes the graph changes a signature and invalidates
    naturally. `valid` is False until the first recompute."""

    valid: jax.Array          # () bool
    labels: jax.Array         # (N,) i32 island labels
    color: jax.Array          # (C,) i32
    rank: jax.Array           # (C,) i32
    color_overflow: jax.Array  # () i32
    # island-labels signature
    sig_solv: jax.Array       # (C,) bool solvable_contact
    sig_ns: jax.Array         # (N,) bool non_static
    sig_jact: jax.Array       # (J,) bool joint actives ((1,) if no joints)
    sig_jba: jax.Array        # (J,) i32 joint body_a
    sig_jbb: jax.Array        # (J,) i32
    # coloring signature (on top of the above)
    sig_f_a: jax.Array        # (C,) i32 pair table identity
    sig_f_b: jax.Array        # (C,) i32
    sig_cc: jax.Array         # (C,) bool cc_active
    sig_dyn_a: jax.Array      # (C,) bool conflicting endpoints
    sig_dyn_b: jax.Array      # (C,) bool


def make_empty_cache(nb: int, nc: int, nj: int) -> SolverCache:
    nj = max(nj, 1)
    return SolverCache(
        valid=jnp.asarray(False),
        labels=jnp.full(nb, -1, jnp.int32),
        color=jnp.full(nc, -1, jnp.int32),
        rank=jnp.zeros(nc, jnp.int32),
        color_overflow=jnp.int32(0),
        sig_solv=jnp.zeros(nc, bool),
        sig_ns=jnp.zeros(nb, bool),
        sig_jact=jnp.zeros(nj, bool),
        sig_jba=jnp.zeros(nj, jnp.int32),
        sig_jbb=jnp.zeros(nj, jnp.int32),
        sig_f_a=jnp.full(nc, -1, jnp.int32),
        sig_f_b=jnp.full(nc, -1, jnp.int32),
        sig_cc=jnp.zeros(nc, bool),
        sig_dyn_a=jnp.zeros(nc, bool),
        sig_dyn_b=jnp.zeros(nc, bool),
    )


@_pytree
class State:
    """Complete world state; the pytree that `step` maps to a new instance."""

    bodies: Bodies
    fixtures: Fixtures
    contacts: Contacts
    joints: "Joints"
    gravity: jax.Array        # (2,) f32
    inv_dt0: jax.Array        # () f32 previous step's 1/dt (dtRatio warm start)
    pairs_dirty: jax.Array    # () bool — filter/fixture set changed since the
    # last pair refresh (the e_newFixture flag analog, b2World.h:252); forces
    # a broad-phase pair recompute even when no fat AABB moved.
    cache: SolverCache        # cross-step island/coloring cache


# --------------------------------------------------------------------------
# Joints: typed SoA blocks, one per reference joint class
# (reference: Dynamics/Joints/b2Joint.h:38-52 — 11 types).
# Every block shares the common fields; params/impulses are per type.
# --------------------------------------------------------------------------


def _joint_common_fields():
    return dict(
        active=None,            # (J,) bool
        body_a=None,            # (J,) i32
        body_b=None,            # (J,) i32
        collide_connected=None,  # (J,) bool
    )


@_pytree
class RevoluteJoints:
    """b2RevoluteJoint (reference: Joints/b2RevoluteJoint.h:85-204)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array   # (J,2)
    local_anchor_b: jax.Array   # (J,2)
    reference_angle: jax.Array  # (J,)
    enable_limit: jax.Array     # (J,) bool
    lower_angle: jax.Array
    upper_angle: jax.Array
    enable_motor: jax.Array     # (J,) bool
    motor_speed: jax.Array
    max_motor_torque: jax.Array
    impulse: jax.Array          # (J,3) persistent (x, y, angular)
    motor_impulse: jax.Array    # (J,)
    limit_state: jax.Array      # (J,) i32 persistent (b2Joint.h:77-84)


@_pytree
class DistanceJoints:
    """b2DistanceJoint (reference: Joints/b2DistanceJoint.h:68-169)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    length: jax.Array
    frequency: jax.Array        # Hz; 0 = rigid
    damping_ratio: jax.Array
    impulse: jax.Array          # (J,)


@_pytree
class PrismaticJoints:
    """b2PrismaticJoint (reference: Joints/b2PrismaticJoint.h:76-196)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    local_axis_a: jax.Array     # (J,2)
    reference_angle: jax.Array
    enable_limit: jax.Array
    lower_translation: jax.Array
    upper_translation: jax.Array
    enable_motor: jax.Array
    motor_speed: jax.Array
    max_motor_force: jax.Array
    impulse: jax.Array          # (J,3)
    motor_impulse: jax.Array
    limit_state: jax.Array      # (J,) i32 persistent


@_pytree
class MouseJoints:
    """b2MouseJoint (reference: Joints/b2MouseJoint.h:36-129)."""
    active: jax.Array
    body_a: jax.Array           # unused (ground proxy), kept for uniformity
    body_b: jax.Array
    collide_connected: jax.Array
    target: jax.Array           # (J,2) world target
    local_anchor_b: jax.Array   # (J,2)
    max_force: jax.Array
    frequency: jax.Array
    damping_ratio: jax.Array
    impulse: jax.Array          # (J,2)


@_pytree
class WeldJoints:
    """b2WeldJoint (reference: Joints/b2WeldJoint.h:70-126)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    reference_angle: jax.Array
    frequency: jax.Array
    damping_ratio: jax.Array
    impulse: jax.Array          # (J,3)


@_pytree
class FrictionJoints:
    """b2FrictionJoint (reference: Joints/b2FrictionJoint.h:39-120)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    max_force: jax.Array
    max_torque: jax.Array
    linear_impulse: jax.Array   # (J,2)
    angular_impulse: jax.Array  # (J,)


@_pytree
class RopeJoints:
    """b2RopeJoint (reference: Joints/b2RopeJoint.h:39-114)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    max_length: jax.Array
    impulse: jax.Array          # (J,)


@_pytree
class MotorJoints:
    """b2MotorJoint (reference: Joints/b2MotorJoint.h:41-133)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    linear_offset: jax.Array    # (J,2)
    angular_offset: jax.Array
    max_force: jax.Array
    max_torque: jax.Array
    correction_factor: jax.Array
    linear_impulse: jax.Array   # (J,2)
    angular_impulse: jax.Array


@_pytree
class WheelJoints:
    """b2WheelJoint (reference: Joints/b2WheelJoint.h:77-210)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    local_axis_a: jax.Array
    enable_motor: jax.Array
    motor_speed: jax.Array
    max_motor_torque: jax.Array
    frequency: jax.Array
    damping_ratio: jax.Array
    impulse: jax.Array          # (J,) spring-perp impulse
    spring_impulse: jax.Array   # (J,)
    motor_impulse: jax.Array    # (J,)


@_pytree
class PulleyJoints:
    """b2PulleyJoint (reference: Joints/b2PulleyJoint.h:64-151)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    ground_anchor_a: jax.Array  # (J,2) world
    ground_anchor_b: jax.Array
    local_anchor_a: jax.Array
    local_anchor_b: jax.Array
    length_a: jax.Array
    length_b: jax.Array
    ratio: jax.Array
    impulse: jax.Array          # (J,)


@_pytree
class GearJoints:
    """b2GearJoint (reference: Joints/b2GearJoint.h:38-126). Couples two
    existing revolute/prismatic joints; joint1/joint2 index into those typed
    blocks with a type flag (0 = revolute, 1 = prismatic).

    Four bodies: A = joint1.bodyB, C = joint1.bodyA, B = joint2.bodyB,
    D = joint2.bodyA (b2GearJoint.cpp:61-94). The coupled joints' immutable
    geometry (anchors, axes, reference angles) is copied in at build time —
    exactly what the reference constructor does (b2GearJoint.cpp:70-123)."""
    active: jax.Array
    body_a: jax.Array
    body_b: jax.Array
    collide_connected: jax.Array
    body_c: jax.Array           # (J,) i32 joint1.bodyA
    body_d: jax.Array           # (J,) i32 joint2.bodyA
    joint1_type: jax.Array      # (J,) i32: 0 = revolute, 1 = prismatic
    joint1_index: jax.Array     # (J,) i32
    joint2_type: jax.Array
    joint2_index: jax.Array
    local_anchor_a: jax.Array   # (J,2) from joint1 (bodyB side)
    local_anchor_b: jax.Array   # (J,2) from joint2 (bodyB side)
    local_anchor_c: jax.Array   # (J,2) from joint1 (bodyA side)
    local_anchor_d: jax.Array   # (J,2) from joint2 (bodyA side)
    local_axis_c: jax.Array     # (J,2) joint1 prismatic axis (zero if revolute)
    local_axis_d: jax.Array     # (J,2) joint2 prismatic axis
    reference_angle_a: jax.Array  # (J,)
    reference_angle_b: jax.Array  # (J,)
    ratio: jax.Array
    constant: jax.Array
    impulse: jax.Array          # (J,)


@_pytree
class Joints:
    """Container of all typed joint blocks (capacities may be zero)."""
    revolute: RevoluteJoints
    distance: DistanceJoints
    prismatic: PrismaticJoints
    mouse: MouseJoints
    weld: WeldJoints
    friction: FrictionJoints
    rope: RopeJoints
    motor: MotorJoints
    wheel: WheelJoints
    pulley: PulleyJoints
    gear: GearJoints
