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
