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

Each color is built as a MAXIMAL independent set (Luby-style): within a
round, priority-minima winners join the color, their conflict neighbors
drop out, and the selection repeats on the remainder until the set is
maximal. This bounds the color count near max-degree+1. (A single
winner-per-round pass — without the maximality inner loop — needs rounds
equal to the longest priority-monotone conflict path, which for slot-
ordered contact tables of deep stacks grows with stack depth and silently
overflowed the color budget, sending apex contacts to the Jacobi fallback
every step and injecting energy that defeated sleep.)

The algorithm is deterministic: priorities are the constraint slot indices,
so identical worlds color identically. Constraints still uncolored after
MAX_COLORS-1 colors fall into the last color, where conflicting scatter-add
accumulation degrades to Jacobi summing (can overshoot). With maximal-set
rounds the budget binds only past max-degree ~ MAX_COLORS, so overflow
(reported in Events.color_overflow) indicates the budget must be raised.
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

    The color loop exits as soon as every active constraint is colored, so
    a scene pays for its actual chromatic number, not max_colors.
    """
    k = body_a.shape[0]
    prio = jnp.arange(k, dtype=jnp.int32)
    color = jnp.full(k, -1, jnp.int32)
    remaining = active
    rank = jnp.zeros(k, jnp.int32)

    if k <= 2048:
        # conflict matrix on the MXU: two constraints conflict iff they
        # share a conflicting (dynamic) endpoint.
        rng = jnp.arange(n_bodies)
        xa = (conflict_a & active)[:, None] & (body_a[:, None] == rng)
        xb = (conflict_b & active)[:, None] & (body_b[:, None] == rng)
        x = (xa | xb).astype(jnp.float32)              # (K, N)
        conflict = jnp.matmul(
            x, x.T, precision=jax.lax.Precision.DEFAULT) > 0.0
        eye = jnp.eye(k, dtype=bool)
        conflict = conflict & ~eye
        conf_lower = (conflict
                      & (prio[:, None] > prio[None, :])).astype(jnp.float32)
        conflict_f = conflict.astype(jnp.float32)

        def maximal_set(remaining):
            """Maximal independent set among `remaining` by priority-minima
            sweeps (2 matvecs per inner iteration; a handful suffice)."""
            def m_cond(carry):
                _, cand = carry
                return jnp.any(cand)

            def m_body(carry):
                chosen, cand = carry
                blocked = jnp.matmul(
                    conf_lower, cand.astype(jnp.float32)[:, None],
                    precision=jax.lax.Precision.DEFAULT)[:, 0] > 0.0
                winner = cand & ~blocked
                nb = jnp.matmul(
                    conflict_f, winner.astype(jnp.float32)[:, None],
                    precision=jax.lax.Precision.DEFAULT)[:, 0] > 0.0
                return chosen | winner, cand & ~winner & ~nb

            chosen, _ = jax.lax.while_loop(
                m_cond, m_body,
                (jnp.zeros(k, bool), remaining))
            return chosen

        def cond(carry):
            c, color, remaining, rank = carry
            return (c < max_colors - 1) & jnp.any(remaining)

        def round_body(carry):
            c, color, remaining, rank = carry
            chosen = maximal_set(remaining)
            color = jnp.where(chosen, c, color)
            if with_rank:
                rank = jnp.where(
                    chosen, jnp.cumsum(chosen.astype(jnp.int32)) - 1, rank)
            return c + 1, color, remaining & ~chosen, rank

        _, color, remaining, rank = jax.lax.while_loop(
            cond, round_body, (jnp.int32(0), color, remaining, rank))
    else:
        # large worlds: the K x K conflict matrix would not fit — same
        # maximal-set rounds via per-body scatter-min/max instead
        nb1 = n_bodies + 1
        idx_a = jnp.where(conflict_a, body_a, n_bodies)
        idx_b = jnp.where(conflict_b, body_b, n_bodies)

        def maximal_set(remaining):
            def m_cond(carry):
                _, cand = carry
                return jnp.any(cand)

            def m_body(carry):
                chosen, cand = carry
                key = jnp.where(cand, prio, BIG)
                slot = jnp.minimum(
                    scatter_min_scalar(nb1, idx_a, key, BIG),
                    scatter_min_scalar(nb1, idx_b, key, BIG))
                ga = gather_scalar(slot, jnp.clip(idx_a, 0, nb1 - 1))
                gb = gather_scalar(slot, jnp.clip(idx_b, 0, nb1 - 1))
                winner = cand & (~conflict_a | (ga == prio)) \
                    & (~conflict_b | (gb == prio))
                # bodies claimed by winners block their other constraints
                wkey = jnp.where(winner, 0, BIG)
                claimed = jnp.minimum(
                    scatter_min_scalar(nb1, idx_a, wkey, BIG),
                    scatter_min_scalar(nb1, idx_b, wkey, BIG)) == 0
                ca = gather_scalar(claimed, jnp.clip(idx_a, 0, nb1 - 1))
                cb = gather_scalar(claimed, jnp.clip(idx_b, 0, nb1 - 1))
                nbr = (conflict_a & ca) | (conflict_b & cb)
                return chosen | winner, cand & ~winner & ~nbr

            chosen, _ = jax.lax.while_loop(
                m_cond, m_body, (jnp.zeros(k, bool), remaining))
            return chosen

        def cond(carry):
            c, color, remaining, rank = carry
            return (c < max_colors - 1) & jnp.any(remaining)

        def round_body(carry):
            c, color, remaining, rank = carry
            chosen = maximal_set(remaining)
            color = jnp.where(chosen, c, color)
            if with_rank:
                rank = jnp.where(
                    chosen, jnp.cumsum(chosen.astype(jnp.int32)) - 1, rank)
            return c + 1, color, remaining & ~chosen, rank

        _, color, remaining, rank = jax.lax.while_loop(
            cond, round_body, (jnp.int32(0), color, remaining, rank))
    # overflow: park leftovers in the last color (Jacobi-sum fallback)
    overflow = jnp.sum(remaining)
    color = jnp.where(remaining, max_colors - 1, color)
    if with_rank:
        rank = jnp.where(remaining,
                         jnp.cumsum(remaining.astype(jnp.int32)) - 1, rank)
        return color, overflow, rank
    return color, overflow
