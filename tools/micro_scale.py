#!/usr/bin/env python
"""Microbench: how individual hot constructs scale with world count W."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    import numpy as _np
    leaf = jax.tree.leaves(out)[0]
    _np.asarray(leaf.ravel()[0:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    nc, nb, K, P = 256, 64, 51, 1024
    key = jax.random.PRNGKey(0)
    for W in (512, 2048, 4096):
        blob = jax.random.normal(key, (W, nc + 1, K), jnp.float32)
        perm = jax.random.randint(key, (W, P), 0, nc + 1)
        t_take = timeit(jax.jit(
            lambda b, p: jnp.take_along_axis(b, p[..., None], axis=1)),
            blob, perm)

        blob_t = jax.random.normal(key, (W, K, nc + 1), jnp.float32)
        t_take_t = timeit(jax.jit(
            lambda b, p: jnp.take_along_axis(b, p[:, None, :], axis=2)),
            blob_t, perm)

        # one-hot gather einsum like the collide blob gather
        idx = jax.random.randint(key, (W, 2 * nc), 0, nb)
        tbl = jax.random.normal(key, (W, nb, 39), jnp.float32)
        def oh_gather(tbl, idx):
            oh = (idx[:, :, None] == jnp.arange(nb)[None, None, :]
                  ).astype(jnp.float32)
            return jnp.einsum("wmn,wnk->wmk", oh, tbl,
                              precision=jax.lax.Precision.HIGHEST)
        t_oh = timeit(jax.jit(oh_gather), tbl, idx)

        # solver chunk pass: gather_cols einsum (W,3,nb)x(W,128,nb)
        bst = jax.random.normal(key, (W, 3, nb), jnp.float32)
        idx2 = jax.random.randint(key, (W, 128), 0, nb)
        def gcols(bst, idx2):
            oh = (idx2[:, None, :] == jnp.arange(nb)[:, None]
                  ).astype(jnp.float32)  # (W, nb, 128)
            return jnp.einsum("wkn,wnm->wkm", bst, oh,
                              precision=jax.lax.Precision.HIGHEST)
        t_gc = timeit(jax.jit(gcols), bst, idx2)

        # argsort (W, nc)
        keys = jax.random.randint(key, (W, nc), 0, 100)
        t_sort = timeit(jax.jit(lambda k: jnp.argsort(k, axis=1)), keys)

        print(f"W={W}: take_along(W,{nc+1},{K})->P{P}: {t_take:.2f} ms | "
              f"transposed: {t_take_t:.2f} ms | onehot-gather: {t_oh:.2f} ms"
              f" | gather_cols: {t_gc:.3f} ms | argsort: {t_sort:.2f} ms")


if __name__ == "__main__":
    main()
