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
                      n_bodies: int, max_colors: int):
    """Color a constraint set.

    body_a/body_b: (K,) i32 endpoint body slots.
    conflict_a/b: (K,) bool — whether that endpoint causes conflicts
      (dynamic bodies only).
    active: (K,) bool — constraints to color.
    Returns (color (K,) i32 with -1 for inactive, overflow count).
    """
    k = body_a.shape[0]
    prio = jnp.arange(k, dtype=jnp.int32)
    color = jnp.full(k, -1, jnp.int32)
    remaining = active

    # packed endpoint indices: one scatter-min + one gather per round
    # (slot n_bodies is a dump target for non-conflicting endpoints)
    idx2 = jnp.concatenate([jnp.where(conflict_a, body_a, n_bodies),
                            jnp.where(conflict_b, body_b, n_bodies)])
    conflict2 = jnp.concatenate([conflict_a, conflict_b])

    def round_body(c, carry):
        color, remaining = carry
        key = jnp.where(remaining, prio, BIG)
        key2 = jnp.where(conflict2, jnp.concatenate([key, key]), BIG)
        slot = scatter_min_scalar(n_bodies + 1, idx2, key2, BIG)
        g = gather_scalar(slot, jnp.clip(idx2, 0, n_bodies - 1))
        win_a = ~conflict_a | (g[:k] == prio)
        win_b = ~conflict_b | (g[k:] == prio)
        winner = remaining & win_a & win_b
        color = jnp.where(winner, c, color)
        return color, remaining & ~winner

    color, remaining = jax.lax.fori_loop(
        0, max_colors - 1, round_body, (color, remaining))
    # overflow: park leftovers in the last color (Jacobi fallback)
    overflow = jnp.sum(remaining)
    color = jnp.where(remaining, max_colors - 1, color)
    return color, overflow
