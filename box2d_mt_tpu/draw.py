"""Headless draw-data export — the b2Draw interface analog
(Box2D/Common/b2Draw.h:52-57, b2World::DrawDebugData, b2World.cpp:1928).

There is no GUI by design; instead `draw_data(state)` returns plain arrays
a host renderer (matplotlib, a game engine, a notebook) can consume, and
`draw_svg(state)` renders a standalone SVG string for quick inspection.
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from . import settings
from .math2d import rot_from_angle, rot_vec
from .state import State


class DrawData(NamedTuple):
    """World-space geometry per fixture slot (mask with `exists`)."""
    exists: jax.Array      # (F,) bool
    shape_type: jax.Array  # (F,) i32
    verts: jax.Array       # (F, 8, 2) world-space (circle: center at [0])
    nverts: jax.Array      # (F,) i32
    radius: jax.Array      # (F,)
    body: jax.Array        # (F,) i32
    awake: jax.Array       # (F,) bool — of the owning body
    sensor: jax.Array      # (F,) bool
    aabb_lo: jax.Array     # (F, 2) fat AABBs (e_aabbBit analog)
    aabb_hi: jax.Array


def draw_data(state: State) -> DrawData:
    """Extract world-space draw data (jit-friendly; vmap for batches)."""
    fx = state.fixtures
    b = state.bodies
    q = rot_from_angle(b.a)
    p = b.c - rot_vec(q, b.local_center)
    fb = jnp.clip(fx.body, 0)
    w = rot_vec(q[fb][:, None, :], fx.verts) + p[fb][:, None, :]
    return DrawData(
        exists=fx.body >= 0, shape_type=fx.shape_type, verts=w,
        nverts=fx.nverts, radius=fx.radius, body=fx.body,
        awake=b.awake[fb], sensor=fx.is_sensor,
        aabb_lo=fx.aabb_lo, aabb_hi=fx.aabb_hi)


def draw_svg(state: State, width=640, height=480, scale=10.0,
             center=(0.0, 10.0)) -> str:
    """Render one world to a standalone SVG string (quick inspection)."""
    d = jax.device_get(draw_data(state))
    cx, cy = center
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" viewBox="0 0 {width} {height}">',
             '<rect width="100%" height="100%" fill="#10141a"/>']

    def to_px(x, y):
        return (width / 2 + (x - cx) * scale,
                height / 2 - (y - cy) * scale)

    for i in range(len(d.exists)):
        if not d.exists[i]:
            continue
        color = "#8bc34a" if d.awake[i] else "#607d8b"
        if d.sensor[i]:
            color = "#ffc107"
        st = int(d.shape_type[i])
        if st == settings.SHAPE_CIRCLE:
            x, y = to_px(d.verts[i, 0, 0], d.verts[i, 0, 1])
            parts.append(
                f'<circle cx="{x:.1f}" cy="{y:.1f}" '
                f'r="{d.radius[i] * scale:.1f}" fill="none" '
                f'stroke="{color}"/>')
        elif st == settings.SHAPE_EDGE:
            (x1, y1) = to_px(d.verts[i, 0, 0], d.verts[i, 0, 1])
            (x2, y2) = to_px(d.verts[i, 1, 0], d.verts[i, 1, 1])
            parts.append(f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
                         f'y2="{y2:.1f}" stroke="{color}"/>')
        else:
            n = int(d.nverts[i])
            pts = " ".join("{:.1f},{:.1f}".format(*to_px(d.verts[i, k, 0],
                                                         d.verts[i, k, 1]))
                           for k in range(n))
            parts.append(f'<polygon points="{pts}" fill="none" '
                         f'stroke="{color}"/>')
    parts.append("</svg>")
    return "\n".join(parts)
