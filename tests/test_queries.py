"""Ray-cast and AABB query tests (b2World::RayCast / QueryAABB analogs)."""

import numpy as np

from box2d_mt_tpu import settings, shapes
from box2d_mt_tpu.ops import raycast
from box2d_mt_tpu.world import WorldBuilder


def _scene():
    wb = WorldBuilder(gravity=(0, 0))
    b0 = wb.create_body(position=(5.0, 0.0))
    wb.create_fixture(b0, shapes.Circle(1.0))
    b1 = wb.create_body(position=(10.0, 0.0))
    wb.create_fixture(b1, shapes.Polygon.box(1.0, 1.0))
    b2 = wb.create_body()
    wb.create_fixture(b2, shapes.Edge((14.0, -2.0), (14.0, 2.0)))
    return wb.freeze()


def test_raycast_closest_circle():
    st = _scene()
    hit, idx, point, normal, frac = raycast.ray_cast_closest(
        st, (0.0, 0.0), (20.0, 0.0))
    assert bool(hit)
    assert int(idx) == 0
    assert abs(float(point[0]) - 4.0) < 1e-5       # circle near edge at x=4
    assert abs(float(normal[0]) + 1.0) < 1e-5      # normal faces the ray
    assert abs(float(frac) - 0.2) < 1e-5


def test_raycast_hits_each_shape():
    st = _scene()
    hits = raycast.ray_cast_all(st, (0.0, 0.0), (20.0, 0.0))
    assert bool(hits.hit[0]) and bool(hits.hit[1]) and bool(hits.hit[2])
    # box near face at x=9, edge at x=14
    assert abs(float(hits.fraction[1]) * 20.0 - 9.0) < 1e-4
    assert abs(float(hits.fraction[2]) * 20.0 - 14.0) < 1e-4


def test_raycast_miss():
    st = _scene()
    hit, idx, *_ = raycast.ray_cast_closest(st, (0.0, 5.0), (20.0, 5.0))
    assert not bool(hit)
    assert int(idx) == -1


def test_query_aabb():
    st = _scene()
    mask = np.asarray(raycast.query_aabb(st, (4.0, -1.0), (6.0, 1.0)))
    assert mask[0] and not mask[1] and not mask[2]
    mask = np.asarray(raycast.query_aabb(st, (-100, -100), (100, 100)))
    assert mask[:3].all()
