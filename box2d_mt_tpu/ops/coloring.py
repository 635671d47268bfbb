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

from .gather import gather_scalar, scatter_max_scalar, scatter_min_scalar

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
        # large worlds: the (K, K) conflict matrix is out of budget (and
        # at batch x K x K it was the big-world OOM), so color the FULL
        # table with scatter-based Jones-Plassmann: each round, every
        # uncolored constraint whose hashed priority is the minimum among
        # uncolored constraints on BOTH its conflicting bodies picks the
        # smallest color not yet used on those bodies (tracked as per-body
        # color bitmasks). Two same-round winners never share a body (only
        # the body's minimum wins), so colors stay conflict-free. Hashed
        # priorities give O(log K) expected rounds; each round is a handful
        # of O(K)/O(N) scatters — no K^2 anything.
        assert max_colors <= 32, "bitmask JP supports <=32 colors"
        nb1 = n_bodies + 1
        idx_a = jnp.clip(jnp.where(conflict_a, body_a, n_bodies), 0, nb1 - 1)
        idx_b = jnp.clip(jnp.where(conflict_b, body_b, n_bodies), 0, nb1 - 1)
        # priorities = 31-bit bit-reversal of the slot index: a bijection,
        # so priorities are unique (collision-free for ANY table size — a
        # duplicate could give two same-round winners on one body, and the
        # per-body scatter-max would drop one winner's color bit), positive,
        # and low-discrepancy scattered so physically-adjacent slots land in
        # different rounds (O(log K) expected rounds, like hashed JP). Pure
        # function of the slot, so identical worlds color identically.
        x = jnp.arange(k, dtype=jnp.uint32)
        for sh, m in ((1, 0x55555555), (2, 0x33333333), (4, 0x0F0F0F0F),
                      (8, 0x00FF00FF)):
            mm = jnp.uint32(m)
            x = ((x & mm) << sh) | ((x >> sh) & mm)
        x = (x << 16) | (x >> 16)
        hprio = (x >> 1).astype(jnp.int32)
        # per-body color masks are uint32 so max_colors=32 (bit 31) is safe
        usable = jnp.uint32((1 << (max_colors - 1)) - 1)  # bits 0..mc-2

        def jp_cond(carry):
            r, color, remaining, _ = carry
            return (r < k) & jnp.any(remaining)

        idx_ab = jnp.concatenate([idx_a, idx_b])
        conf_ab = jnp.concatenate([conflict_a, conflict_b])

        def jp_round(carry):
            r, color, remaining, mask = carry
            key = jnp.where(remaining, hprio, BIG)
            key2 = jnp.concatenate([key, key])
            mins = scatter_min_scalar(
                nb1, idx_ab, jnp.where(conf_ab, key2, BIG), BIG)
            winner = remaining \
                & (~conflict_a | (gather_scalar(mins, idx_a) == hprio)) \
                & (~conflict_b | (gather_scalar(mins, idx_b) == hprio))
            # smallest usable color absent from both bodies' masks; all
            # taken -> park inline in the last color (the Jacobi fallback);
            # parked winners are counted as overflow below
            free = ~(gather_scalar(mask, idx_a)
                     | gather_scalar(mask, idx_b)) & usable
            lsb = free & (jnp.uint32(0) - free)
            c_new = jax.lax.population_count(
                lsb - jnp.uint32(1)).astype(jnp.int32)
            c_new = jnp.where(lsb > 0, c_new, max_colors - 1)
            color = jnp.where(winner, c_new, color)
            # a body sees at most one winner per round (the min is unique),
            # so per-round scatter-max yields that winner's single bit;
            # OR it into the accumulated mask (max would drop older bits)
            bit = jnp.where(winner,
                            jnp.uint32(1) << c_new.astype(jnp.uint32),
                            jnp.uint32(0))
            bit2 = jnp.concatenate([bit, bit])
            mask = mask | scatter_max_scalar(
                nb1, idx_ab, jnp.where(conf_ab, bit2, jnp.uint32(0)),
                jnp.uint32(0))
            return r + 1, color, remaining & ~winner, mask

        _, color, _, _ = jax.lax.while_loop(
            jp_cond, jp_round,
            (jnp.int32(0), color, active, jnp.zeros(nb1, jnp.uint32)))
        # a winner parked at max_colors-1 because its bodies' usable bits
        # were exhausted shares the Jacobi fallback color; count it
        overflow_parked = jnp.sum(active & (color == max_colors - 1))
        if with_rank:
            oh = (color[:, None] ==
                  jnp.arange(max_colors)[None, :]) & active[:, None]
            rank = jnp.where(
                active,
                jnp.take_along_axis(
                    jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1,
                    jnp.clip(color, 0)[:, None], axis=1)[:, 0],
                0)
            overflow = overflow_parked
            color = jnp.where(active, color, -1)
            return color, overflow, rank
        return jnp.where(active, color, -1), overflow_parked
    # overflow: park leftovers in the last color (Jacobi-sum fallback)
    overflow = jnp.sum(remaining)
    color = jnp.where(remaining, max_colors - 1, color)
    if with_rank:
        rank = jnp.where(remaining,
                         jnp.cumsum(remaining.astype(jnp.int32)) - 1, rank)
        return color, overflow, rank
    return color, overflow
