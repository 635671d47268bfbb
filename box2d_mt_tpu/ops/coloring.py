"""Greedy graph coloring of the constraint graph.

TPU-native replacement for the reference's island-level task parallelism
(b2SolveTask batching, b2World.cpp:1332-1378): instead of carving the
contact/joint graph into islands solved on separate threads, we color
constraints so that no two constraints in a color share a *dynamic* body,
then run Gauss-Seidel color-by-color inside one fused program. Within a
color every constraint touches disjoint bodies, so impulses apply as
conflict-free scatters; across colors the sequential-impulse semantics of
the reference solver (b2ContactSolver.cpp:293-603) are preserved.

Static/kinematic bodies never receive impulses (inverse mass 0), so only
dynamic-body sharing causes conflicts — which keeps the chromatic number
around the max contacts-per-dynamic-body (~8 for box piles), independent of
how many bodies rest on one big static ground fixture.

The algorithm is deterministic: each round, every uncolored constraint
scatter-mins its slot index into its dynamic bodies; constraints that win
both endpoints take the current color. The global minimum always wins, so
every round makes progress. Constraints still uncolored after MAX_COLORS-1
rounds fall into the last color, where scatter-add accumulation degrades
gracefully to Jacobi averaging (overflow is reported for diagnostics).
"""

import jax
import jax.numpy as jnp

from .gather import gather_scalar, scatter_min_scalar

BIG = jnp.iinfo(jnp.int32).max


def color_constraints(body_a, body_b, conflict_a, conflict_b, active,
                      n_bodies: int, max_colors: int, with_rank: bool = False):
    """Color a constraint set.

    body_a/body_b: (K,) i32 endpoint body slots.
    conflict_a/b: (K,) bool — whether that endpoint causes conflicts
      (dynamic bodies only).
    active: (K,) bool — constraints to color.
    Returns (color (K,) i32 with -1 for inactive, overflow count); with
    with_rank=True additionally returns each constraint's rank within its
    color (slot order — the deterministic b2ContactProxyIds order), which
    the solver's color compaction consumes directly.

    The round loop exits as soon as every active constraint is colored, so
    a scene pays for its actual chromatic number, not max_colors.
    """
    k = body_a.shape[0]
    prio = jnp.arange(k, dtype=jnp.int32)
    color = jnp.full(k, -1, jnp.int32)
    remaining = active
    rank = jnp.zeros(k, jnp.int32)

    if k <= 2048:
        # conflict matrix on the MXU: two constraints conflict iff they
        # share a conflicting (dynamic) endpoint. winner-per-round =
        # uncolored with no lower-priority uncolored conflicting neighbor
        # — exactly the scatter-min rule below, as one matvec per round.
        rng = jnp.arange(n_bodies)
        xa = (conflict_a & active)[:, None] & (body_a[:, None] == rng)
        xb = (conflict_b & active)[:, None] & (body_b[:, None] == rng)
        x = (xa | xb).astype(jnp.float32)              # (K, N)
        conflict = jnp.matmul(
            x, x.T, precision=jax.lax.Precision.DEFAULT) > 0.0
        conf_lower = (conflict
                      & (prio[:, None] > prio[None, :])).astype(jnp.float32)

        def cond(carry):
            c, color, remaining, rank = carry
            return (c < max_colors - 1) & jnp.any(remaining)

        def round_body(carry):
            c, color, remaining, rank = carry
            blocked = jnp.matmul(
                conf_lower, remaining.astype(jnp.float32)[:, None],
                precision=jax.lax.Precision.DEFAULT)[:, 0] > 0.0
            winner = remaining & ~blocked
            color = jnp.where(winner, c, color)
            if with_rank:
                rank = jnp.where(
                    winner, jnp.cumsum(winner.astype(jnp.int32)) - 1, rank)
            return c + 1, color, remaining & ~winner, rank

        _, color, remaining, rank = jax.lax.while_loop(
            cond, round_body, (jnp.int32(0), color, remaining, rank))
    else:
        # large worlds: the K x K conflict matrix would not fit — use
        # per-round scatter-min over body slots instead
        idx2 = jnp.concatenate([jnp.where(conflict_a, body_a, n_bodies),
                                jnp.where(conflict_b, body_b, n_bodies)])
        conflict2 = jnp.concatenate([conflict_a, conflict_b])

        def cond(carry):
            c, color, remaining, rank = carry
            return (c < max_colors - 1) & jnp.any(remaining)

        def round_body(carry):
            c, color, remaining, rank = carry
            key = jnp.where(remaining, prio, BIG)
            key2 = jnp.where(conflict2, jnp.concatenate([key, key]), BIG)
            slot = scatter_min_scalar(n_bodies + 1, idx2, key2, BIG)
            g = gather_scalar(slot, jnp.clip(idx2, 0, n_bodies - 1))
            win_a = ~conflict_a | (g[:k] == prio)
            win_b = ~conflict_b | (g[k:] == prio)
            winner = remaining & win_a & win_b
            color = jnp.where(winner, c, color)
            if with_rank:
                rank = jnp.where(
                    winner, jnp.cumsum(winner.astype(jnp.int32)) - 1, rank)
            return c + 1, color, remaining & ~winner, rank

        _, color, remaining, rank = jax.lax.while_loop(
            cond, round_body, (jnp.int32(0), color, remaining, rank))
    # overflow: park leftovers in the last color (Jacobi fallback)
    overflow = jnp.sum(remaining)
    color = jnp.where(remaining, max_colors - 1, color)
    if with_rank:
        rank = jnp.where(remaining,
                         jnp.cumsum(remaining.astype(jnp.int32)) - 1, rank)
        return color, overflow, rank
    return color, overflow
