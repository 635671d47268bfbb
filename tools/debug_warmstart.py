#!/usr/bin/env python
"""Track warm-start id matching stability at equilibrium: what fraction of
touching contacts lose their accumulated impulses each step because the
fresh manifold's feature ids changed, and does the manifold type flip?"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from box2d_mt_tpu import world as W
    from box2d_mt_tpu.models import scenes

    st = scenes.pyramid(rows)
    kinds = W.possible_kinds(st)
    dt = 1.0 / 60.0
    step = jax.jit(lambda s: W.step(
        s, dt, kinds=kinds, continuous=False))

    prev = None
    for i in range(steps):
        st, ev = step(st)
        c = st.contacts
        f_a = np.asarray(c.f_a)
        touching = np.asarray(c.touching)
        ids = np.asarray(c.m_ids)
        mtype = np.asarray(c.m_type)
        count = np.asarray(c.m_count)
        ni = np.asarray(c.normal_impulse)
        key = np.where(f_a >= 0, f_a * 10000 + np.asarray(c.f_b), -1)
        cur = {int(k): (tuple(ids[j]), int(mtype[j]), int(count[j]),
                        float(ni[j, 0]), float(ni[j, 1]))
               for j, k in enumerate(key) if k >= 0 and touching[j]}
        if prev is not None and i % 10 == 0:
            both = set(cur) & set(prev)
            id_changed = sum(1 for k in both
                             if cur[k][0][:cur[k][2]] != prev[k][0][:prev[k][2]]
                             or cur[k][2] != prev[k][2])
            type_changed = sum(1 for k in both if cur[k][1] != prev[k][1])
            # touching contacts whose stored normal impulse is ~0
            # (warm start lost) at equilibrium
            lost = sum(1 for k in both
                       if cur[k][3] == 0.0 and cur[k][2] > 0)
            print(f"step {i:4d}: touching={len(cur):3d} persist={len(both):3d} "
                  f"ids_changed={id_changed:3d} type_changed={type_changed:2d} "
                  f"ni0_zero={lost:3d}")
        prev = cur


if __name__ == "__main__":
    main()
