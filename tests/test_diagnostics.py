"""Counts, dump, and checkpoint round-trip."""

import io

import numpy as np

from box2d_mt_tpu import diagnostics, mutate, settings, world
from box2d_mt_tpu.models import scenes


def test_counts():
    st = scenes.gear_train()
    c = diagnostics.counts(st)
    assert int(c["bodies"]) == 4
    assert int(c["fixtures"]) == 4
    assert int(c["joints"]) == 5   # 2 revolute + 1 prismatic + 2 gear
    assert "world" in diagnostics.dump(st)


def test_checkpoint_roundtrip_continues_identically():
    st = scenes.pyramid(4)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
    buf = io.BytesIO()
    diagnostics.save_state(st, buf)
    buf.seek(0)
    st2 = diagnostics.load_state(buf, like=scenes.pyramid(4))
    # both continue bit-identically (warm-start state included)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60)
        st2, _ = world.step(st2, 1 / 60)
    np.testing.assert_array_equal(np.asarray(st.bodies.c),
                                  np.asarray(st2.bodies.c))
    np.testing.assert_array_equal(np.asarray(st.contacts.normal_impulse),
                                  np.asarray(st2.contacts.normal_impulse))


def test_setters():
    st = scenes.hello_world()
    st = mutate.set_bullet(st, 1, True)
    assert bool(st.bodies.bullet[1])
    st = mutate.set_gravity_scale(st, 1, 0.5)
    assert float(st.bodies.gravity_scale[1]) == 0.5
    st = mutate.set_type(st, 1, settings.STATIC_BODY)
    assert float(st.bodies.inv_mass[1]) == 0.0
    st = mutate.set_type(st, 1, settings.DYNAMIC_BODY)
    assert float(st.bodies.inv_mass[1]) > 0.0
    st = mutate.set_enabled(st, 1, False)
    for _ in range(10):
        st, ev = world.step(st, 1 / 60)
    # disabled body: no contacts, does not fall? (reference: not simulated)
    assert not bool(np.asarray(ev.touching).any())


def test_draw_data_and_svg():
    from box2d_mt_tpu import draw
    st = scenes.hello_world()
    d = draw.draw_data(st)
    assert int(np.asarray(d.exists).sum()) == 2
    # dynamic box world verts around (0, 4)
    v = np.asarray(d.verts[1][:4])
    assert np.allclose(v.mean(axis=0), [0.0, 4.0], atol=1e-5)
    svg = draw.draw_svg(st)
    assert svg.startswith("<svg") and "polygon" in svg


def _replay(src):
    ns = {}
    exec(src, ns)
    return ns["state"]


def _trees_equal(a, b):
    import jax
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_dump_source_fresh_world_bit_identical():
    """DumpShell.h analog: dump_source of a just-built world replays to a
    bit-identical world, and both trajectories stay bit-identical (the
    revolute+prismatic slider crank exercises raw joint defs)."""
    st_a = scenes.basic_slider_crank()
    st_b = _replay(diagnostics.dump_source(st_a))
    assert _trees_equal(st_a.bodies, st_b.bodies)
    assert _trees_equal(st_a.fixtures, st_b.fixtures)
    assert _trees_equal(st_a.joints, st_b.joints)
    kinds = world.possible_kinds(st_a)
    for _ in range(90):
        st_a, _ = world.step(st_a, 1 / 60, kinds=kinds)
        st_b, _ = world.step(st_b, 1 / 60, kinds=kinds)
    assert np.array_equal(np.asarray(st_a.bodies.c), np.asarray(st_b.bodies.c))
    assert np.array_equal(np.asarray(st_a.bodies.a), np.asarray(st_b.bodies.a))


def test_dump_source_gear_train_roundtrip():
    """Gear joints reference other joints by (type, block index); the dump
    remaps them through the compaction maps."""
    st_a = scenes.gear_train()
    st_b = _replay(diagnostics.dump_source(st_a))
    assert _trees_equal(st_a.joints, st_b.joints)
    kinds = world.possible_kinds(st_a)
    for _ in range(60):
        st_a, _ = world.step(st_a, 1 / 60, kinds=kinds)
        st_b, _ = world.step(st_b, 1 / 60, kinds=kinds)
    assert np.array_equal(np.asarray(st_a.bodies.a), np.asarray(st_b.bodies.a))


def test_dump_source_mid_simulation():
    """Dumping a mid-flight world captures current transforms/velocities;
    the replay continues cleanly (warm-start impulses start fresh, like a
    b2World::Dump replay)."""
    st = scenes.car()
    kinds = world.possible_kinds(st)
    for _ in range(30):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    st2 = _replay(diagnostics.dump_source(st))
    live = np.asarray(st.bodies.exists)
    assert np.array_equal(live, np.asarray(st2.bodies.exists))
    assert np.allclose(np.asarray(st.bodies.xf_p)[live],
                       np.asarray(st2.bodies.xf_p)[live], atol=1e-5)
    # COM-velocity roundtrip through the origin-velocity def costs a few ulps
    assert np.allclose(np.asarray(st.bodies.v)[live],
                       np.asarray(st2.bodies.v)[live], atol=1e-5)
    assert np.array_equal(np.asarray(st.bodies.awake)[live],
                          np.asarray(st2.bodies.awake)[live])
    for _ in range(60):
        st2, _ = world.step(st2, 1 / 60, kinds=kinds)
    c = np.asarray(st2.bodies.c)
    assert np.isfinite(c[np.asarray(st2.bodies.exists)]).all()


def test_dump_source_compacts_removed_bodies():
    """After remove_body, the dump renumbers slots and the replay has the
    same live-body count and geometry."""
    st = scenes.collision_processing(7)
    st = mutate.remove_body(st, 2)
    st = mutate.remove_body(st, 5)
    st2 = _replay(diagnostics.dump_source(st))
    n_live = int(np.asarray(st.bodies.exists).sum())
    assert int(np.asarray(st2.bodies.exists).sum()) == n_live
    # live bodies keep their transforms (in compacted order)
    pa = np.asarray(st.bodies.xf_p)[np.asarray(st.bodies.exists)]
    pb = np.asarray(st2.bodies.xf_p)[np.asarray(st2.bodies.exists)]
    assert np.allclose(pa, pb, atol=1e-5)


def test_broadphase_quality_metrics():
    """Tree-quality probe analog (b2World.h:198-206): the grid metrics
    must report sane loads on a dense pile and count oversized fixtures
    as dense-pairing fallbacks."""
    st = scenes.pyramid(8)
    q = diagnostics.broadphase_quality(st)
    n_fx = int(np.asarray(st.fixtures.exists).sum())
    assert q["fixtures"] == n_fx
    assert q["large_fixtures"] >= 1          # the ground edge
    assert 1 <= q["max_bucket_load"] <= n_fx
    assert 0.0 < q["pair_fill"] <= 1.0
    assert q["cell_size"] > 0.0
