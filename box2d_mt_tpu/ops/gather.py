"""Gather/scatter primitives tuned for TPU.

XLA's native gather/scatter lower to DMA-descriptor ops with ~0.1-0.3 ms
fixed cost per op on TPU — ruinous for a solver that runs hundreds of small
indexed reads/writes per step. For the fixed-capacity arrays of this engine
(bodies N, contacts C in the hundreds-to-thousands) a one-hot
compare-broadcast-reduce is far cheaper: it compiles to a single fused
VPU/MXU op with ~20-40 us overhead and perfect vectorization.

All solver-phase indexed access goes through these helpers; each falls back
to native gather/scatter when the (M, N) one-hot intermediate would be too
large.
"""

import jax
import jax.numpy as jnp

# One-hot matmuls MUST run at full f32 precision: the default TPU matmul
# precision demotes operands to bf16, which would round every gathered value
# (positions, velocities) to 8 mantissa bits. HIGHEST keeps 1.0*x exact.
_EXACT = jax.lax.Precision.HIGHEST

# beyond this intermediate size, fall back to native gather
# ~256k: one-hot work is O(M*N) per op; beyond this the (M, N) intermediate's
# bandwidth exceeds the native gather's fixed DMA cost (esp. under vmap).
ONEHOT_MAX_ELEMENTS = 1 << 18

# dense masked-reduce tier for SCALAR gathers/scatters between the one-hot
# and native tiers: XLA fuses the iota-compare + select + reduce into one
# VPU pass with no materialized intermediate, so an (M, N) op costs
# M*N/~4e12 s of compute — at (4096 lanes x 1024 bodies) that is ~70 us
# where the native DMA path costs ~25 ns/element (~6.5 ms at 64 worlds).
# Native only wins once N is huge (one DMA descriptor per element beats
# scanning a very wide row per element).
DENSE_MAX_ELEMENTS = 1 << 24


def _use_onehot(m, n):
    return m * n <= ONEHOT_MAX_ELEMENTS


def _use_dense(m, n):
    return m * n <= DENSE_MAX_ELEMENTS


def gather_rows(table, idx):
    """table (N, K) f32, idx (M,) i32 -> (M, K).

    No dense masked-reduce tier here, deliberately: row gathers with a
    trailing K axis measured FASTER native than as an (M, N, K) fused
    reduce inside real step programs (the wide intermediate breaks XLA's
    surrounding fusions — whole-step regression 645->486 w*s/s when it
    was tried); only the SCALAR helpers benefit from the dense tier."""
    n = table.shape[0]
    if not _use_onehot(idx.shape[0], n):
        return table[idx]
    oh = (idx[:, None] == jnp.arange(n)[None, :]).astype(table.dtype)
    return jnp.matmul(oh, table, precision=_EXACT)


def scatter_add(target, idx, delta):
    """target (N, K) += delta (M, K) at rows idx (M,). Duplicate indices sum."""
    n = target.shape[0]
    if not _use_onehot(idx.shape[0], n):
        return target.at[idx].add(delta)
    oh = (idx[:, None] == jnp.arange(n)[None, :]).astype(target.dtype)
    return target + jnp.matmul(oh.T, delta, precision=_EXACT)


def scatter_min_scalar(n, idx, vals, big):
    """(n,) array = min of vals (M,) scattered at idx, init `big`.
    Out-of-range idx rows are ignored."""
    m = idx.shape[0]
    if _use_onehot(m, n) or _use_dense(m, n):
        oh = idx[:, None] == jnp.arange(n)[None, :]
        return jnp.min(jnp.where(oh, vals[:, None], big), axis=0)
    return jnp.full(n, big, vals.dtype).at[jnp.clip(idx, 0, n - 1)].min(
        jnp.where((idx >= 0) & (idx < n), vals, big))


def scatter_max_scalar(n, idx, vals, small):
    m = idx.shape[0]
    if _use_onehot(m, n) or _use_dense(m, n):
        oh = idx[:, None] == jnp.arange(n)[None, :]
        return jnp.max(jnp.where(oh, vals[:, None], small), axis=0)
    return jnp.full(n, small, vals.dtype).at[jnp.clip(idx, 0, n - 1)].max(
        jnp.where((idx >= 0) & (idx < n), vals, small))


def gather_cols(table_t, idx):
    """table_t (K, N) plane-major, idx (M,) -> (K, M).

    Plane-major (component-rows) layout keeps N/M in the 128-wide lane
    axis; the (N, K)/(M, K) row-major forms would pad tiny K to 128 lanes
    (up to 64x HBM bloat when carried through loops)."""
    n = table_t.shape[1]
    if not _use_onehot(idx.shape[0], n):
        return table_t[:, idx]
    oh = (idx[None, :] == jnp.arange(n)[:, None]).astype(table_t.dtype)
    return jnp.matmul(table_t, oh, precision=_EXACT)


def scatter_add_cols(table_t, idx, delta_t):
    """table_t (K, N) += delta_t (K, M) at columns idx (M,). Duplicates sum."""
    n = table_t.shape[1]
    if not _use_onehot(idx.shape[0], n):
        return table_t.at[:, idx].add(delta_t)
    oh = (idx[:, None] == jnp.arange(n)[None, :]).astype(table_t.dtype)
    return table_t + jnp.matmul(delta_t, oh, precision=_EXACT)


def gather_scalar(arr, idx):
    """arr (N,), idx (M,) -> (M,). Out-of-range idx yields 0."""
    n = arr.shape[0]
    m = idx.shape[0]
    if _use_onehot(m, n):
        oh = idx[:, None] == jnp.arange(n)[None, :]
        acc = jnp.sum(jnp.where(oh, arr[None, :].astype(jnp.float32), 0.0),
                      axis=1)
        return acc.astype(arr.dtype)
    if _use_dense(m, n):
        # sentinel-max reduce: exact for any dtype (exactly one hit per
        # row), unlike the f32-sum form which would round wide int32
        oh = idx[:, None] == jnp.arange(n)[None, :]
        if arr.dtype == jnp.bool_:
            return jnp.any(oh & arr[None, :], axis=1)
        lo = (jnp.finfo(arr.dtype).min
              if jnp.issubdtype(arr.dtype, jnp.floating)
              else jnp.iinfo(arr.dtype).min)
        mx = jnp.max(jnp.where(oh, arr[None, :], lo), axis=1)
        return jnp.where((idx >= 0) & (idx < n), mx,
                         jnp.zeros((), arr.dtype))
    return arr[idx]
