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
        # large worlds: capacity K exceeds the conflict-matrix budget, but
        # the ACTIVE constraint count rarely does — compact actives onto CW
        # lanes (stable, so lane order = slot order) and run the same
        # matrix algorithm there. The conflict matrix is built by direct
        # endpoint compares, (CW, CW) x 4, independent of body capacity.
        # Lane priorities are a deterministic bit-mix of the original slot
        # (pure function of the slot, so identical worlds still color
        # identically): slot-index priorities form monotone conflict
        # chains along deep stacks, making the maximal-set sweep take
        # O(chain length) iterations; hashing restores Luby's O(log K)
        # expected rounds. Actives beyond CW (and past the color budget)
        # fall to the shared last-color Jacobi fallback below and are
        # counted in `overflow`.
        CW = 2048
        order = jnp.argsort(jnp.where(active, 0, 1).astype(jnp.int32),
                            stable=True)
        sel = order[:CW]                                # (CW,) slot ids
        l_act = active[sel]
        l_ba = body_a[sel]
        l_bb = body_b[sel]
        l_ca = conflict_a[sel] & l_act
        l_cb = conflict_b[sel] & l_act
        # 15-bit hash of the slot, lane index as tie-break: distinct,
        # positive, pseudo-random ordering
        h = (sel.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) >> 17
        l_prio = (h.astype(jnp.int32) << 16) | jnp.arange(CW,
                                                          dtype=jnp.int32)

        conflict = ((l_ca[:, None] & l_ca[None, :]
                     & (l_ba[:, None] == l_ba[None, :]))
                    | (l_ca[:, None] & l_cb[None, :]
                       & (l_ba[:, None] == l_bb[None, :]))
                    | (l_cb[:, None] & l_ca[None, :]
                       & (l_bb[:, None] == l_ba[None, :]))
                    | (l_cb[:, None] & l_cb[None, :]
                       & (l_bb[:, None] == l_bb[None, :])))
        conflict = conflict & ~jnp.eye(CW, dtype=bool)
        # bf16 storage halves the HBM traffic of the inner matvecs; the
        # results are only ever tested > 0 (sums of positive 1.0s never
        # round to 0 in bf16), so the demotion is exact for this use
        conf_lower = (conflict
                      & (l_prio[:, None] > l_prio[None, :])
                      ).astype(jnp.bfloat16)
        conflict_f = conflict.astype(jnp.bfloat16)

        def maximal_set(remaining):
            def m_cond(carry):
                _, cand = carry
                return jnp.any(cand)

            def m_body(carry):
                chosen, cand = carry
                blocked = jnp.matmul(
                    conf_lower, cand.astype(jnp.bfloat16)[:, None],
                    precision=jax.lax.Precision.DEFAULT)[:, 0] > 0.0
                winner = cand & ~blocked
                nbr = jnp.matmul(
                    conflict_f, winner.astype(jnp.bfloat16)[:, None],
                    precision=jax.lax.Precision.DEFAULT)[:, 0] > 0.0
                return chosen | winner, cand & ~winner & ~nbr

            chosen, _ = jax.lax.while_loop(
                m_cond, m_body, (jnp.zeros(CW, bool), remaining))
            return chosen

        def cond(carry):
            c, color_l, remaining_l, rank_l = carry
            return (c < max_colors - 1) & jnp.any(remaining_l)

        def round_body(carry):
            c, color_l, remaining_l, rank_l = carry
            chosen = maximal_set(remaining_l)
            color_l = jnp.where(chosen, c, color_l)
            if with_rank:
                # lane order = slot order (stable compaction), so this
                # cumsum matches the full-size slot-order rank
                rank_l = jnp.where(
                    chosen, jnp.cumsum(chosen.astype(jnp.int32)) - 1,
                    rank_l)
            return c + 1, color_l, remaining_l & ~chosen, rank_l

        _, color_l, _, rank_l = jax.lax.while_loop(
            cond, round_body,
            (jnp.int32(0), jnp.full(CW, -1, jnp.int32), l_act,
             jnp.zeros(CW, jnp.int32)))

        # scatter lane results back to slots
        color = color.at[sel].set(jnp.where(l_act, color_l, -1))
        rank = rank.at[sel].set(jnp.where(l_act, rank_l, 0))
        remaining = active & (color < 0)

        # ---- leftover tier (actives beyond the CW compaction window,
        # e.g. >2048 touching contacts in ONE world): hashed-priority
        # Jones-Plassmann rounds over the full table. Each round c takes
        # the leftover local minima whose bodies are not already occupied
        # by a color-c constraint (so it composes soundly with the matrix
        # tier). Zero-trip when the compaction window covered everything.
        nb1 = n_bodies + 1
        idx_a = jnp.where(conflict_a, body_a, n_bodies)
        idx_b = jnp.where(conflict_b, body_b, n_bodies)
        hp = (jnp.arange(k, dtype=jnp.uint32) * jnp.uint32(0x9E3779B1)
              ) >> 17
        # 15-bit hash + low 16 slot bits: unique for k <= 65536 (the
        # broadphase pair-key encoding already caps fixture slots at 65535)
        hprio = (hp.astype(jnp.int32) << 16) | (
            jnp.arange(k, dtype=jnp.int32) & 0xFFFF)

        def jp_cond(carry):
            c, color, remaining, rank = carry
            return (c < max_colors - 1) & jnp.any(remaining)

        def jp_round(carry):
            c, color, remaining, rank = carry
            in_c = color == c
            # body occupancy of color c (scatter-min of 0 marks occupied)
            occ = jnp.minimum(
                jnp.full(nb1, 1, jnp.int32).at[
                    jnp.clip(jnp.where(in_c & conflict_a, idx_a, n_bodies),
                             0, nb1 - 1)].min(
                    jnp.where(in_c & conflict_a, 0, 1)),
                jnp.full(nb1, 1, jnp.int32).at[
                    jnp.clip(jnp.where(in_c & conflict_b, idx_b, n_bodies),
                             0, nb1 - 1)].min(
                    jnp.where(in_c & conflict_b, 0, 1))) == 0
            blocked = (conflict_a & occ[jnp.clip(idx_a, 0, nb1 - 1)]) | \
                      (conflict_b & occ[jnp.clip(idx_b, 0, nb1 - 1)])
            cand = remaining & ~blocked
            key = jnp.where(cand, hprio, BIG)
            slot = jnp.minimum(
                jnp.full(nb1, BIG, jnp.int32).at[
                    jnp.clip(idx_a, 0, nb1 - 1)].min(
                    jnp.where(idx_a < n_bodies, key, BIG)),
                jnp.full(nb1, BIG, jnp.int32).at[
                    jnp.clip(idx_b, 0, nb1 - 1)].min(
                    jnp.where(idx_b < n_bodies, key, BIG)))
            winner = cand \
                & (~conflict_a | (slot[jnp.clip(idx_a, 0, nb1 - 1)]
                                  == hprio)) \
                & (~conflict_b | (slot[jnp.clip(idx_b, 0, nb1 - 1)]
                                  == hprio))
            color = jnp.where(winner, c, color)
            if with_rank:
                # continue rank numbering after the color's existing count
                base = jnp.sum(in_c)
                rank = jnp.where(
                    winner,
                    base + jnp.cumsum(winner.astype(jnp.int32)) - 1, rank)
            return c + 1, color, remaining & ~winner, rank

        _, color, remaining, rank = jax.lax.while_loop(
            jp_cond, jp_round, (jnp.int32(0), color, remaining, rank))
    # overflow: park leftovers in the last color (Jacobi-sum fallback)
    overflow = jnp.sum(remaining)
    color = jnp.where(remaining, max_colors - 1, color)
    if with_rank:
        rank = jnp.where(remaining,
                         jnp.cumsum(remaining.astype(jnp.int32)) - 1, rank)
        return color, overflow, rank
    return color, overflow
