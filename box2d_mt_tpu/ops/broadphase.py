"""Broad phase: batched AABB computation, fat-AABB hysteresis, pair finding.

TPU-native replacement for the reference's dynamic AABB tree + move buffer
(Box2D/Collision/b2DynamicTree.cpp, b2BroadPhase.h:211-267). Semantics are
preserved exactly where they affect behavior:

  * each fixture carries a persistent *fat* AABB that is only recomputed when
    the tight swept AABB escapes it (b2DynamicTree::MoveProxy,
    b2DynamicTree.cpp:130-176), with the same extension + predictive
    displacement fattening;
  * a contact pair exists iff the two fat AABBs overlap (pairs are created on
    overlap in UpdatePairs and destroyed in Collide when the fat AABBs stop
    overlapping, b2ContactManager.cpp:193-204) — so recomputing the full
    overlap set each step from fat AABBs yields the reference's persistent
    pair set without incremental tree surgery;
  * pair keys are canonical (low fixture, high fixture) ids and the pair
    table is emitted in sorted key order, replicating b2ContactProxyIds
    determinism (b2Contact.h:65-77).

The default pair finder is dense all-pairs over the upper triangle — optimal
on TPU up to a few thousand fixtures per world. A sort-and-sweep variant for
larger worlds plugs in behind the same interface.
"""

import jax
import jax.numpy as jnp

from .. import settings
from ..math2d import rot_vec
from ..state import Bodies, Fixtures, State


def tight_aabbs(fx: Fixtures, p, q):
    """Per-fixture tight AABB at the given body transforms (b2Shape::ComputeAABB).

    p, q: per-fixture world transforms (gathered for fixture's body).
    Works uniformly for circle (1 vert), edge (2 verts), polygon (n verts).
    Lane-major internally: fixtures ride the 128-wide vector axis, the tiny
    vertex/component dims ride sublanes.
    """
    vx = fx.verts[..., 0].T                                  # (8, F)
    vy = fx.verts[..., 1].T
    qs, qc = q[:, 0], q[:, 1]
    wx = qc * vx - qs * vy + p[:, 0]
    wy = qs * vx + qc * vy + p[:, 1]
    valid = (jnp.arange(settings.MAX_POLYGON_VERTICES)[:, None]
             < fx.nverts[None, :])
    lox = jnp.min(jnp.where(valid, wx, jnp.inf), axis=0) - fx.radius
    loy = jnp.min(jnp.where(valid, wy, jnp.inf), axis=0) - fx.radius
    hix = jnp.max(jnp.where(valid, wx, -jnp.inf), axis=0) + fx.radius
    hiy = jnp.max(jnp.where(valid, wy, -jnp.inf), axis=0) + fx.radius
    return jnp.stack([lox, loy], axis=-1), jnp.stack([hix, hiy], axis=-1)


def synchronize(fx: Fixtures, p0, q0, p1, q1):
    """b2Fixture::Synchronize (b2Fixture.cpp:165-180) + b2DynamicTree::MoveProxy:
    swept AABB over (xf0, xf1); if it escapes the stored fat AABB, re-fatten
    by AABB_EXTENSION plus AABB_MULTIPLIER * displacement. Returns updated
    (aabb_lo, aabb_hi, moved)."""
    lo0, hi0 = tight_aabbs(fx, p0, q0)
    lo1, hi1 = tight_aabbs(fx, p1, q1)
    lo = jnp.minimum(lo0, lo1)
    hi = jnp.maximum(hi0, hi1)
    disp = 0.5 * (hi1 + lo1) - 0.5 * (hi0 + lo0)

    contained = jnp.all((fx.aabb_lo <= lo) & (hi <= fx.aabb_hi), axis=1)
    ext = settings.AABB_EXTENSION
    d = settings.AABB_MULTIPLIER * disp
    new_lo = lo - ext + jnp.minimum(d, 0.0)
    new_hi = hi + ext + jnp.maximum(d, 0.0)
    moved = ~contained & fx.exists
    aabb_lo = jnp.where(moved[:, None], new_lo, fx.aabb_lo)
    aabb_hi = jnp.where(moved[:, None], new_hi, fx.aabb_hi)
    return aabb_lo, aabb_hi, moved


def initial_fat_aabbs(fx: Fixtures, p, q):
    """Fat AABBs at fixture creation (b2DynamicTree::CreateProxy fattens by
    AABB_EXTENSION only, b2DynamicTree.cpp:105-127)."""
    lo, hi = tight_aabbs(fx, p, q)
    return lo - settings.AABB_EXTENSION, hi + settings.AABB_EXTENSION


def _forbidden_joint_keys(state: State, nf: int):
    """Packed body-pair keys of joints with collide_connected == False
    (b2Body::ShouldCollide walks the joint list, b2Body.cpp)."""
    keys = []
    joints = state.joints
    for block in (joints.revolute, joints.distance, joints.prismatic,
                  joints.weld, joints.friction, joints.rope, joints.motor,
                  joints.wheel, joints.pulley, joints.gear):
        if block.body_a.shape[0] == 0:
            continue
        lo = jnp.minimum(block.body_a, block.body_b)
        hi = jnp.maximum(block.body_a, block.body_b)
        k = lo.astype(jnp.int32) * nf + hi
        k = jnp.where(block.active & ~block.collide_connected, k, jnp.int32(-2))
        keys.append(k)
    if not keys:
        return jnp.full((1,), -2, jnp.int32)
    return jnp.sort(jnp.concatenate(keys))


def should_collide_filters(group_i, group_j, cat_i, cat_j, mask_i, mask_j):
    """b2ContactFilter::ShouldCollide default implementation
    (b2WorldCallbacks.cpp): group overrides category/mask. Operates on
    broadcast-ready arrays (no gathers)."""
    same_group = (group_i == group_j) & (group_i != 0)
    group_ok = group_i > 0
    mask_ok = ((cat_i & mask_j) != 0) & ((cat_j & mask_i) != 0)
    return jnp.where(same_group, group_ok, mask_ok)


def find_pairs_allpairs(state: State, capacity: int, filter_fn=None):
    """Dense upper-triangular overlap test over fat AABBs + filtering.

    Returns (f_a, f_b) role-ordered fixture indices of up to `capacity`
    pairs in canonical sorted-key order, plus an overflow count.

    `filter_fn(state, fi, fj) -> bool` is the custom contact-filter hook
    (b2ContactFilter::ShouldCollide override, b2WorldCallbacks.h:52-62):
    traced into pair admission on broadcastable fixture-index arrays;
    False vetoes the pair on top of the built-in filters.
    """
    from .narrowphase import needs_swap

    fx = state.fixtures
    bd = state.bodies
    nf = fx.capacity

    lo, hi = fx.aabb_lo, fx.aabb_hi
    overlap = jnp.all(
        (lo[:, None, :] <= hi[None, :, :]) & (lo[None, :, :] <= hi[:, None, :]),
        axis=-1,
    )
    ii = jnp.arange(nf)
    upper = ii[:, None] < ii[None, :]
    exists = fx.exists
    pair_ok = overlap & upper & exists[:, None] & exists[None, :]

    body_i = fx.body
    same_body = body_i[:, None] == body_i[None, :]
    pair_ok &= ~same_body

    # b2Body::ShouldCollide: at least one dynamic body.
    dyn = bd.is_dynamic[jnp.clip(body_i, 0)] & (body_i >= 0)
    pair_ok &= dyn[:, None] | dyn[None, :]

    # enabled (active) bodies only
    enb = bd.enabled[jnp.clip(body_i, 0)]
    pair_ok &= enb[:, None] & enb[None, :]

    # jointed bodies with collideConnected=false don't collide
    jkeys = _forbidden_joint_keys(state, nf)
    blo = jnp.minimum(body_i[:, None], body_i[None, :]).astype(jnp.int32)
    bhi = jnp.maximum(body_i[:, None], body_i[None, :]).astype(jnp.int32)
    bkey = blo * nf + bhi
    idx = jnp.searchsorted(jkeys, bkey.ravel()).reshape(bkey.shape)
    forbidden = jkeys[jnp.clip(idx, 0, jkeys.shape[0] - 1)] == bkey
    pair_ok &= ~forbidden

    # category/mask/group filter (pure broadcasting, no gathers)
    pair_ok &= should_collide_filters(
        fx.filter_group[:, None], fx.filter_group[None, :],
        fx.filter_category[:, None], fx.filter_category[None, :],
        fx.filter_mask[:, None], fx.filter_mask[None, :])

    # edge-edge (and any unregistered kind): no contact is ever created
    from .narrowphase import contact_kind
    ti = fx.shape_type[:, None]
    tj = fx.shape_type[None, :]
    swap = needs_swap(ti, tj)
    ta = jnp.where(swap, tj, ti)
    tb = jnp.where(swap, ti, tj)
    pair_ok &= contact_kind(ta, tb) != 5  # KIND_INVALID

    # user contact-filter hook (b2ContactFilter::ShouldCollide override)
    if filter_fn is not None:
        gi = jnp.broadcast_to(ii[:, None], (nf, nf))
        gj = jnp.broadcast_to(ii[None, :], (nf, nf))
        pair_ok &= filter_fn(state, gi, gj)

    # extract up to `capacity` set bits in row-major (= canonical key)
    # order. A flat top_k over the F^2 mask costs ~23 ms at F=1024x16
    # worlds; instead run top_k per ROW (k = K_ROW, riding the lane axis)
    # and sort the F*K_ROW surviving keys — ~40x cheaper. Rows with more
    # than K_ROW overlaps ("hubs": big static fixtures whose low slot id
    # puts every pair in their own upper-triangular row) are extracted
    # densely, up to HUB_CAP of them; rows dropped past HUB_CAP are
    # reported in `overflow` (the growable-container analog — never
    # silent).
    # small fixtures overlap ~8-12 others at most; denser rows spill to
    # the hub path. Per-row extraction runs as K_ROW unrolled masked-min
    # passes, NOT jax.lax.top_k — top_k cost 22 ms vs ~6 ms for the min
    # passes over the (F, F) mask at 64x1k-fixture worlds.
    K_ROW = 16 if nf >= 512 else min(64, nf)
    HUB_CAP = 8 if nf >= 512 else min(16, nf)
    big = jnp.uint32(nf * nf)
    n_found = jnp.sum(pair_ok)
    row_cnt = jnp.sum(pair_ok, axis=1)
    hub = row_cnt > K_ROW
    m_r = pair_ok & ~hub[:, None]
    jj = jnp.broadcast_to(ii[None, :], (nf, nf))
    jvs = []
    for _ in range(K_ROW):
        jmin = jnp.min(jnp.where(m_r, jj, nf), axis=1)   # (F,)
        jvs.append(jmin)
        m_r = m_r & (jj != jmin[:, None])
    jv = jnp.stack(jvs, axis=1)                          # (F, K_ROW) asc
    keys_r = jnp.where(jv < nf,
                       (ii[:, None] * nf + jv).astype(jnp.uint32), big)
    horder = jnp.argsort(jnp.where(hub, 0, 1).astype(jnp.int32),
                         stable=True)
    hsel = horder[:HUB_CAP]                            # (HUB_CAP,)
    hval = hub[hsel]
    hmask = pair_ok[hsel] & hval[:, None]              # (HUB_CAP, F)
    keys_h = jnp.where(hmask,
                       (hsel[:, None] * nf + ii[None, :]).astype(jnp.uint32),
                       big)
    key = jnp.concatenate([keys_r.ravel(), keys_h.ravel()])
    if key.shape[0] < capacity:
        # tiny worlds (F*K_ROW + HUB_CAP*F < capacity): pad with sentinels
        # so the pair table always comes out at the requested capacity
        key = jnp.concatenate(
            [key, jnp.full(capacity - key.shape[0], big, jnp.uint32)])
    skey = jnp.sort(key)[:capacity]
    valid = skey < big
    pidx = jnp.where(valid, skey, 0).astype(jnp.int32)
    i_sel = pidx // nf
    j_sel = pidx % nf
    # hub rows beyond HUB_CAP: their pairs were not extracted
    dropped = jnp.sum(jnp.where(hub, row_cnt, 0)) \
        - jnp.sum(jnp.where(hval, row_cnt[hsel], 0))

    # role ordering by shape type (narrowphase registration order)
    swap_sel = needs_swap(fx.shape_type[jnp.clip(i_sel, 0, nf - 1)],
                          fx.shape_type[jnp.clip(j_sel, 0, nf - 1)])
    f_a = jnp.where(valid, jnp.where(swap_sel, j_sel, i_sel), -1)
    f_b = jnp.where(valid, jnp.where(swap_sel, i_sel, j_sel), -1)
    overflow = jnp.maximum(n_found - dropped - capacity, 0) + dropped
    return f_a, f_b, overflow


def _pair_allowed_idx(state: State, fi, fj, filter_fn=None):
    """Pair admissibility for (M,) candidate index arrays — the same rules
    the dense all-pairs masks apply (same body, joint collideConnected,
    category/mask/group filters, ≥1 dynamic, enabled, registered kind,
    optional user filter hook)."""
    from .narrowphase import contact_kind, needs_swap

    fx = state.fixtures
    bd = state.bodies
    nf = fx.capacity
    fic = jnp.clip(fi, 0, nf - 1)
    fjc = jnp.clip(fj, 0, nf - 1)
    bi = fx.body[fic]
    bj = fx.body[fjc]
    bic = jnp.clip(bi, 0)
    bjc = jnp.clip(bj, 0)
    ok = (fi >= 0) & (fj >= 0) & (bi >= 0) & (bj >= 0) & (bi != bj)
    ok &= bd.is_dynamic[bic] | bd.is_dynamic[bjc]
    ok &= bd.enabled[bic] & bd.enabled[bjc]

    jkeys = _forbidden_joint_keys(state, nf)
    bkey = (jnp.minimum(bi, bj).astype(jnp.int32) * nf
            + jnp.maximum(bi, bj))
    idx = jnp.searchsorted(jkeys, bkey)
    ok &= jkeys[jnp.clip(idx, 0, jkeys.shape[0] - 1)] != bkey

    ok &= should_collide_filters(
        fx.filter_group[fic], fx.filter_group[fjc],
        fx.filter_category[fic], fx.filter_category[fjc],
        fx.filter_mask[fic], fx.filter_mask[fjc])

    ti = fx.shape_type[fic]
    tj = fx.shape_type[fjc]
    swap = needs_swap(ti, tj)
    ok &= contact_kind(jnp.where(swap, tj, ti),
                       jnp.where(swap, ti, tj)) != 5  # KIND_INVALID
    if filter_fn is not None:
        ok &= filter_fn(state, fic, fjc)
    return ok


def find_pairs_grid(state: State, capacity: int, cell_slots: int = 32,
                    large_cap: int = 16, filter_fn=None):
    """Uniform-grid-hash pair finder for large fixture counts — the TPU
    analog of b2DynamicTreeOfTrees' sparse grid of sub-trees
    (Box2D/MT/b2DynamicTreeOfTrees.h:30-46). O(F · cell_slots) instead of
    the dense O(F²) mask; identical output contract to find_pairs_allpairs
    (canonical sorted-key order, role-ordered, overflow count).

    Mechanics: cell size = 1.5x the median fat-AABB extent (a dense pile
    of median-size boxes then puts ~9 fixtures in a cell, comfortably
    under the 32-slot default even when two dense cells hash-collide into
    one bucket); fixtures larger
    than a cell (grounds, walls — at most `large_cap`) pair densely against
    everyone; each small fixture covers ≤ 2x2 cells, cells hash into
    next_pow2(2F) buckets holding ≤ cell_slots fixtures. A candidate pair
    is emitted exactly once: by its lower-indexed fixture, from the cell
    containing the intersection's min corner. Dropped bucket/large
    overflows are counted.
    """
    fx = state.fixtures
    nf = fx.capacity
    large_cap = min(large_cap, nf)
    lo, hi = fx.aabb_lo, fx.aabb_hi
    exists = fx.exists

    ext = jnp.where(exists[:, None], hi - lo, 0.0)
    extent = jnp.maximum(ext[:, 0], ext[:, 1])
    n_ex = jnp.maximum(jnp.sum(exists), 1)
    sorted_ext = jnp.sort(jnp.where(exists, extent, jnp.inf))
    median = sorted_ext[jnp.clip(n_ex // 2, 0, nf - 1)]
    cell = jnp.maximum(1.5 * jnp.where(jnp.isfinite(median), median, 1.0),
                       10.0 * settings.LINEAR_SLOP)

    is_large = exists & (extent > cell)
    is_small = exists & ~is_large

    # ---- bucket table for small fixtures (each covers <= 2x2 cells)
    n_buckets = max(16, 1 << (2 * nf - 1).bit_length())
    c0 = jnp.floor(lo / cell).astype(jnp.int32)          # (F,2)
    c1 = jnp.floor(hi / cell).astype(jnp.int32)
    # 4 covered cells per fixture (duplicates when the AABB fits one cell)
    cxs = jnp.stack([c0[:, 0], c1[:, 0], c0[:, 0], c1[:, 0]], axis=1)
    cys = jnp.stack([c0[:, 1], c0[:, 1], c1[:, 1], c1[:, 1]], axis=1)
    dup = jnp.stack([
        jnp.zeros(nf, bool),
        c1[:, 0] == c0[:, 0],
        c1[:, 1] == c0[:, 1],
        (c1[:, 0] == c0[:, 0]) | (c1[:, 1] == c0[:, 1])], axis=1)

    def bucket_of(cx, cy):
        # 0x8da6b343 / 0xd8163841 spatial-hash primes, wrapped to int32
        h = (cx * jnp.int32(-1918851261)) ^ (cy * jnp.int32(-669632447))
        return h & (n_buckets - 1)

    bkt = bucket_of(cxs, cys)                            # (F,4)
    entry_on = is_small[:, None] & ~dup                  # (F,4)
    # entry dedup: two DISTINCT covered cells can hash to the same bucket;
    # inserting the fixture twice there both wastes slots and used to make
    # queries emit the same pair twice. Keep only the first entry per
    # (fixture, bucket) — queries are unaffected because an occupant entry
    # carries no cell identity (own_cell keys on the QUERYING fixture's
    # cell, which both fixtures of an overlap necessarily cover).
    eon = entry_on
    entry_on = eon & ~jnp.stack([
        jnp.zeros(nf, bool),
        eon[:, 0] & (bkt[:, 1] == bkt[:, 0]),
        (eon[:, 0] & (bkt[:, 2] == bkt[:, 0]))
        | (eon[:, 1] & (bkt[:, 2] == bkt[:, 1])),
        (eon[:, 0] & (bkt[:, 3] == bkt[:, 0]))
        | (eon[:, 1] & (bkt[:, 3] == bkt[:, 1]))
        | (eon[:, 2] & (bkt[:, 3] == bkt[:, 2]))], axis=1)
    ekey = jnp.where(entry_on, bkt, n_buckets).reshape(-1)   # (4F,)
    eorder = jnp.argsort(ekey, stable=True)
    sk = ekey[eorder]
    starts = jnp.searchsorted(sk, jnp.arange(n_buckets, dtype=sk.dtype))
    rank = (jnp.arange(4 * nf, dtype=jnp.int32)
            - starts[jnp.clip(sk, 0, n_buckets - 1)])
    fill_ok = (sk < n_buckets) & (rank < cell_slots)
    bucket_drop = jnp.sum((sk < n_buckets) & (rank >= cell_slots))
    slot = jnp.where(fill_ok, sk * cell_slots + rank,
                     n_buckets * cell_slots)
    table = jnp.full(n_buckets * cell_slots + 1, nf, jnp.int32)
    table = table.at[slot].set(
        jnp.where(fill_ok, eorder // 4, nf))[:-1]
    table = table.reshape(n_buckets, cell_slots)

    # ---- grid candidates: each small fixture queries its covered cells
    occ = table[bkt]                                     # (F,4,K)
    f_self = jnp.arange(nf, dtype=jnp.int32)
    g = occ
    cand_on = (g < nf) & is_small[:, None, None] & ~dup[:, :, None]
    gc = jnp.clip(g, 0, nf - 1)
    # overlap + canonical order + emit-once cell rule
    ov = jnp.all((lo[:, None, None] <= hi[gc]) & (lo[gc] <= hi[:, None, None]),
                 axis=-1)
    icell = jnp.floor(
        jnp.maximum(lo[:, None, None], lo[gc]) / cell).astype(jnp.int32)
    own_cell = (icell[..., 0] == cxs[:, :, None]) & \
               (icell[..., 1] == cys[:, :, None])
    cand_on &= ov & (f_self[:, None, None] < g) & own_cell
    grid_i = jnp.broadcast_to(f_self[:, None, None], g.shape).reshape(-1)
    grid_j = gc.reshape(-1)
    grid_ok = cand_on.reshape(-1)

    # ---- large fixtures pair densely against everyone
    neg = jnp.where(is_large, extent, -jnp.inf)
    _, lidx = jax.lax.top_k(neg, large_cap)
    lvalid = is_large[lidx]
    large_drop = jnp.maximum(jnp.sum(is_large) - large_cap, 0)
    li = jnp.broadcast_to(lidx[:, None], (large_cap, nf))
    lj = jnp.broadcast_to(f_self[None, :], (large_cap, nf))
    lov = jnp.all((lo[lidx][:, None, :] <= hi[None]) &
                  (lo[None] <= hi[lidx][:, None, :]), axis=-1)
    # each (large, X) pair appears exactly once in the dense rows, except
    # large-large pairs which appear in both rows — keep the li < lj one
    ll_once = jnp.where(is_large[None, :], li < lj, True)
    l_ok = (lvalid[:, None] & exists[None, :] & lov & (li != lj)
            & ll_once).reshape(-1)
    l_i = jnp.minimum(li, lj).reshape(-1)
    l_j = jnp.maximum(li, lj).reshape(-1)

    cand_i = jnp.concatenate([grid_i, l_i])
    cand_j = jnp.concatenate([grid_j, l_j])
    cand_ok = jnp.concatenate([grid_ok, l_ok])
    cand_ok &= _pair_allowed_idx(state, jnp.where(cand_ok, cand_i, -1),
                                 jnp.where(cand_ok, cand_j, -1), filter_fn)

    # ---- canonical sorted-key extraction (same contract as all-pairs);
    # uint32 keys support up to 65535 fixture slots
    big = jnp.uint32(0xFFFFFFFF)
    key = jnp.where(cand_ok,
                    cand_i.astype(jnp.uint32) * jnp.uint32(nf)
                    + cand_j.astype(jnp.uint32), big)
    skey = jnp.sort(key)
    # dedupe: a fixture inserts one bucket entry per covered cell, and two
    # of its cells can hash to the same bucket — own_cell then passes the
    # same pair twice. carry_over_contacts assumes unique keys (its one-hot
    # matmul would sum duplicate rows), so invalidate sorted duplicates and
    # re-sort the sentinels to the tail.
    dup = jnp.concatenate(
        [jnp.zeros(1, bool), (skey[1:] == skey[:-1]) & (skey[1:] < big)])
    skey = jnp.sort(jnp.where(dup, big, skey))
    n_found = jnp.sum(skey < big)
    pick = skey[:capacity]
    valid = pick < big
    i_sel = jnp.where(valid, pick // nf, 0).astype(jnp.int32)
    j_sel = jnp.where(valid, pick % nf, 0).astype(jnp.int32)

    from .narrowphase import needs_swap
    swap_sel = needs_swap(fx.shape_type[i_sel], fx.shape_type[j_sel])
    f_a = jnp.where(valid, jnp.where(swap_sel, j_sel, i_sel), -1)
    f_b = jnp.where(valid, jnp.where(swap_sel, i_sel, j_sel), -1)
    overflow = (jnp.maximum(n_found - capacity, 0) + bucket_drop
                + large_drop)
    return f_a, f_b, overflow


# all-pairs wins below this fixture count (dense mask is one fused op);
# the grid path takes over where O(F^2) would blow up
GRID_THRESHOLD = 1024


def find_pairs(state: State, capacity: int, filter_fn=None):
    """Strategy dispatch: dense all-pairs for small worlds, grid hash for
    large ones. Both produce identical canonical pair tables and both
    consult the optional `filter_fn` contact-filter hook."""
    if state.fixtures.capacity <= GRID_THRESHOLD:
        return find_pairs_allpairs(state, capacity, filter_fn)
    return find_pairs_grid(state, capacity, filter_fn=filter_fn)


def carry_over_contacts(old, f_a, f_b, nf: int):
    """Transfer manifold + impulses from the old contact table to the new
    pair list by canonical key matching (replaces slot-stable pointers;
    persistent contacts keep their warm-start state, new pairs start cold).

    `old` is the previous Contacts pytree (sorted canonical keys);
    (f_a, f_b) the new role-ordered pairs in sorted canonical key order.
    """
    big = jnp.iinfo(jnp.int32).max
    old_lo = jnp.minimum(old.f_a, old.f_b)
    old_hi = jnp.maximum(old.f_a, old.f_b)
    old_key = jnp.where(old.f_a >= 0, old_lo * nf + old_hi, big)
    new_lo = jnp.minimum(f_a, f_b)
    new_hi = jnp.maximum(f_a, f_b)
    new_key = jnp.where(f_a >= 0, new_lo * nf + new_hi, big)

    # m_ids are 32-bit packed feature keys — split into two f32-exact
    # 16-bit halves for the matmul transfer. The material overrides ride
    # shifted by +1 so unmatched (new) pairs land at their -1 "unset"
    # default after the transfer zeros them.
    ids_lo = (old.m_ids & 0xFFFF).astype(jnp.float32)
    ids_hi = ((old.m_ids >> 16) & 0xFFFF).astype(jnp.float32)
    blob = jnp.concatenate([
        old.m_type.astype(jnp.float32)[:, None],
        old.m_local_point, old.m_local_normal,
        old.m_points.reshape(-1, 4),
        old.m_count.astype(jnp.float32)[:, None],
        old.normal_impulse, old.tangent_impulse,
        old.touching.astype(jnp.float32)[:, None],
        ids_lo, ids_hi,
        old.tangent_speed[:, None],
        (old.friction_override + 1.0)[:, None],
        (old.restitution_override + 1.0)[:, None],
    ], axis=1)                                           # (C, 22)

    nc = old_key.shape[0]
    if nc <= 512:
        # key-match as a one-hot (C_new, C_old) compare + matmul — keys
        # are unique among valid slots, so each row has at most one hit.
        # At small C this single fused op beats the sorted merge's gather
        # DMA fixed costs.
        m = (new_key[:, None] == old_key[None, :]) & (old_key != big)[None, :]
        mf = m.astype(jnp.float32)
        g = jnp.matmul(mf, blob, precision=jax.lax.Precision.HIGHEST)
    elif nc * nc <= (1 << 24):
        # dense key match: rows[i] = the j with old_key[j] == new_key[i],
        # found by a fused compare+select+max reduce (no materialized
        # (C, C) f32 one-hot, no sort, no searchsorted binary-search
        # gathers — those cost ~25 ns/element-step on TPU and dominated
        # the big-world step at C=4096). One native row-gather remains.
        m = (new_key[:, None] == old_key[None, :]) & (old_key != big)[None, :]
        rows = jnp.max(jnp.where(m, jnp.arange(nc)[None, :], -1), axis=1)
        hit = rows >= 0
        g = jnp.where(hit[:, None], blob[jnp.clip(rows, 0)], 0.0)
    else:
        # sorted merge: O(C log C) — the huge-table tier.
        # Both tables carry invalid slots remapped to `big`, so a plain
        # argsort puts valid keys ascending with sentinels at the tail.
        perm = jnp.argsort(old_key)
        skey = old_key[perm]
        pos = jnp.searchsorted(skey, new_key)
        posc = jnp.clip(pos, 0, nc - 1)
        hit = (skey[posc] == new_key) & (new_key != big)
        rows = jnp.where(hit, perm[posc], 0)
        g = jnp.where(hit[:, None], blob[rows], 0.0)

    ids = (g[:, 15:17].astype(jnp.int32)
           | (g[:, 17:19].astype(jnp.int32) << 16))
    return old.__class__(
        f_a=f_a.astype(jnp.int32),
        f_b=f_b.astype(jnp.int32),
        m_type=g[:, 0].astype(jnp.int32),
        m_local_point=g[:, 1:3],
        m_local_normal=g[:, 3:5],
        m_points=g[:, 5:9].reshape(-1, 2, 2),
        m_ids=ids,
        m_count=g[:, 9].astype(jnp.int32),
        normal_impulse=g[:, 10:12],
        tangent_impulse=g[:, 12:14],
        touching=g[:, 14] > 0.5,
        toi_count=jnp.zeros_like(f_a, jnp.int32),
        tangent_speed=g[:, 19],
        friction_override=g[:, 20] - 1.0,
        restitution_override=g[:, 21] - 1.0,
    )
