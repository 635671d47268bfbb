"""Island discovery, awake propagation, and sleep management.

Replaces the reference's island DFS (b2World::Solve traversal,
b2World.cpp:1207-1330) with label propagation + pointer jumping over the
constraint edge list — O(E) work per round, fixed round count, fully
vectorized. Islands connect *non-static* bodies through touching non-sensor
contacts and joints; static bodies do not merge islands (the DFS "doesn't
cross static bodies").

Semantics preserved:
  * any body connected to an awake body wakes (the DFS calls SetAwake(true)
    on every body it pulls into an island);
  * an island falls asleep only when every member's sleep timer exceeds
    TIME_TO_SLEEP and its position constraints converged
    (b2Island.cpp:355-395).
"""

import jax
import jax.numpy as jnp

from .. import settings
from .gather import gather_scalar, scatter_min_scalar, scatter_max_scalar


def island_labels(n_bodies: int, edges_a, edges_b, edge_active, body_connectable,
                  rounds: int = settings.ISLAND_ROUNDS):
    """Connected-component labels over non-static bodies.

    edges_a/b: (E,) i32 endpoint body slots of constraints (contacts+joints).
    edge_active: (E,) bool.
    body_connectable: (N,) bool — non-static existing bodies.
    Returns (N,) i32 labels; unconnectable bodies keep their own index.

    For small N: a boolean transitive closure by repeated adjacency
    squaring — log2(diameter) MXU matmuls over the (N, N) reachability
    matrix — instead of scatter/gather label propagation. The label is the
    minimum reachable body index, identical to the DFS island numbering
    (b2World.cpp:1207-1330) up to island naming. Past a few hundred bodies
    the N³ squarings lose to plain label propagation, which takes over
    (the crossover is early because the closure runs batched under vmap:
    W x N x N x N flops vs the propagate path's W x O(E) scatters).
    """
    if n_bodies > 256:
        return _island_labels_propagate(n_bodies, edges_a, edges_b,
                                        edge_active, body_connectable,
                                        rounds)
    del rounds
    ea = jnp.clip(edges_a, 0, n_bodies - 1)
    eb = jnp.clip(edges_b, 0, n_bodies - 1)

    rng = jnp.arange(n_bodies)
    oh_a = jnp.where(edge_active[:, None], (ea[:, None] == rng[None, :]),
                     False)
    oh_b = jnp.where(edge_active[:, None], (eb[:, None] == rng[None, :]),
                     False)
    adj = jnp.matmul(oh_a.T.astype(jnp.float32), oh_b.astype(jnp.float32),
                     precision=jax.lax.Precision.DEFAULT) > 0.0
    # only non-static bodies merge islands (the DFS "doesn't cross static")
    # — masking the matrix avoids per-edge connectable gathers entirely
    adj &= body_connectable[:, None] & body_connectable[None, :]
    adj = adj | adj.T | jnp.eye(n_bodies, dtype=bool)

    # closure = adj^(2^k): doubles reach per squaring. Stop as soon as a
    # squaring adds nothing — the loop then costs log2(graph diameter)
    # matmuls, not log2(N) (a 990-body pyramid converges in ~6, not 10).
    n_sq = max(1, (n_bodies - 1).bit_length())

    def sq_cond(carry):
        k, _, changed = carry
        return (k < n_sq) & changed

    def sq_body(carry):
        k, a, _ = carry
        af = a.astype(jnp.float32)
        nxt = jnp.matmul(af, af,
                         precision=jax.lax.Precision.DEFAULT) > 0.0
        return k + 1, nxt, jnp.any(nxt != a)

    _, closure, _ = jax.lax.while_loop(
        sq_cond, sq_body, (jnp.int32(0), adj, jnp.bool_(True)))
    # argmax over bool finds the FIRST set bit = min reachable body index
    labels = jnp.argmax(closure, axis=1).astype(jnp.int32)
    return jnp.where(body_connectable, labels, rng)


def _island_labels_propagate(n_bodies, edges_a, edges_b, edge_active,
                             body_connectable, rounds):
    """Min-label propagation with pointer jumping — the large-N path."""
    labels = jnp.arange(n_bodies, dtype=jnp.int32)
    link = edge_active \
        & gather_scalar(body_connectable.astype(jnp.int32),
                        jnp.clip(edges_a, 0, n_bodies - 1)).astype(bool) \
        & gather_scalar(body_connectable.astype(jnp.int32),
                        jnp.clip(edges_b, 0, n_bodies - 1)).astype(bool)
    ea = jnp.where(link, edges_a, 0)
    eb = jnp.where(link, edges_b, 0)
    e2 = jnp.concatenate([ea, eb])

    def cond(carry):
        r, labels, changed = carry
        return (r < rounds) & changed

    def body(carry):
        r, labels, _ = carry
        g = gather_scalar(labels, e2)
        m = jnp.minimum(g[: ea.shape[0]], g[ea.shape[0]:])
        m2 = jnp.where(jnp.concatenate([link, link]),
                       jnp.concatenate([m, m]), BIGI)
        mins = scatter_min_scalar(n_bodies, e2, m2, BIGI)
        new = jnp.minimum(labels, mins)
        # pointer jumping doubles propagation reach per round
        new = gather_scalar(new, new)
        new = gather_scalar(new, new)
        return r + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
    return labels


BIGI = jnp.iinfo(jnp.int32).max


def propagate_awake(awake, labels, body_dynamic_or_kinematic):
    """Island-wide wake: if any member is awake, all are
    (b2World.cpp island traversal SetAwake)."""
    n = awake.shape[0]
    island_awake = scatter_max_scalar(
        n, labels, (awake & body_dynamic_or_kinematic).astype(jnp.int32), 0) > 0
    return jnp.where(body_dynamic_or_kinematic,
                     gather_scalar(island_awake, labels), awake)


def update_sleep(bodies, labels, island_converged_by_label, dt, allow_sleep_world: bool):
    """Per-body sleep timers + island-wide sleep decision
    (b2Island::Solve sleep block, b2Island.cpp:355-395).

    island_converged_by_label: (N,) bool — position solve converged for the
    island whose label is the index (computed by the solver via segment-min).
    Returns (awake, sleep_time).
    """
    lin_tol2 = settings.LINEAR_SLEEP_TOLERANCE ** 2
    ang_tol2 = settings.ANGULAR_SLEEP_TOLERANCE ** 2
    moving = (bodies.w * bodies.w > ang_tol2) | \
             (bodies.v[..., 0] ** 2 + bodies.v[..., 1] ** 2 > lin_tol2)
    non_static = bodies.exists & ~bodies.is_static
    cant_sleep = ~bodies.allow_sleep | moving
    sleep_time = jnp.where(
        non_static & bodies.awake,
        jnp.where(cant_sleep, 0.0, bodies.sleep_time + dt),
        bodies.sleep_time,
    )
    if not allow_sleep_world:
        return bodies.awake, sleep_time

    n = sleep_time.shape[0]
    # min sleep time over each island's members (awake non-static only)
    member = non_static & bodies.awake
    island_min = scatter_min_scalar(
        n, jnp.where(member, labels, n), jnp.where(member, sleep_time, jnp.inf),
        jnp.inf)
    island_sleeps = (island_min >= settings.TIME_TO_SLEEP) & island_converged_by_label
    goes_to_sleep = member & gather_scalar(island_sleeps, labels)
    awake = jnp.where(goes_to_sleep, False, bodies.awake)
    # sleeping bodies zero their velocities (b2Body::SetAwake(false))
    return awake, sleep_time
