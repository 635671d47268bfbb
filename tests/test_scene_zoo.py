"""Scene-zoo smoke sweep: every round-3 scene builds, steps, and stays
finite (the TestEntries.cpp:81-146 coverage analog — the reference runs
every scene through the MT harness; here every scene must run the full
step pipeline without NaNs or color overflow)."""

import jax
import numpy as np
import pytest

from box2d_mt_tpu import world
from box2d_mt_tpu.models import scenes


@pytest.fixture(autouse=True)
def _clear_caches_per_scene():
    """This module alone compiles ~25 distinct step programs (one per
    capacity/kind signature); the host's CPU JIT segfaults when too many
    live executables accumulate (see conftest._clear_jax_caches_per_module,
    which only fires at module boundaries). Clear per test — the on-disk
    compilation cache makes reloads cheap."""
    yield
    jax.clear_caches()

ZOO = [
    ("dominos", scenes.dominos, 60),
    ("web", scenes.web, 60),
    ("bridge", lambda: scenes.bridge(12), 60),
    ("cantilever", lambda: scenes.cantilever(4), 60),
    ("chain_links", lambda: scenes.chain_links(10), 60),
    ("sphere_stack", lambda: scenes.sphere_stack(5), 60),
    ("heavy_on_light", scenes.heavy_on_light, 60),
    ("tiles", lambda: scenes.tiles(4, 20, 2), 60),
    ("conveyor_belt", scenes.conveyor_belt, 60),
    ("one_sided_platform", scenes.one_sided_platform, 60),
    ("slider_crank", scenes.slider_crank, 60),
    ("add_pair", lambda: scenes.add_pair(60), 40),
    ("confined", lambda: scenes.confined(4, 3), 60),
    ("mobile", lambda: scenes.mobile(3), 60),
    ("body_types", scenes.body_types, 60),
    ("varying_friction", scenes.varying_friction, 60),
    ("varying_restitution", scenes.varying_restitution, 60),
    ("compound_shapes", lambda: scenes.compound_shapes(4), 60),
    ("car", scenes.car, 60),
    ("sensor_zone", scenes.sensor_zone, 60),
    ("collision_filtering", scenes.collision_filtering, 60),
    ("pinball", scenes.pinball, 60),
    ("theo_jansen", scenes.theo_jansen, 40),
    ("breakable", scenes.breakable, 60),
    ("bullet_test", scenes.bullet_test, 40),
    ("continuous_test", scenes.continuous_test, 40),
    ("heavy_on_light_two", scenes.heavy_on_light_two, 60),
    ("mobile_balanced", lambda: scenes.mobile_balanced(3), 60),
    ("apply_force", scenes.apply_force, 60),
    ("edge_shapes", lambda: scenes.edge_shapes(8), 60),
    ("poly_shapes", lambda: scenes.poly_shapes(8), 60),
    ("character_collision", scenes.character_collision, 60),
]


def _run(build, steps):
    st = build()
    kinds = world.possible_kinds(st)
    overflow = 0
    for _ in range(steps):
        st, ev = world.step(st, 1 / 60, kinds=kinds)
        overflow += int(ev.color_overflow)
    return st, overflow


@pytest.mark.parametrize("name,build,steps", ZOO, ids=[z[0] for z in ZOO])
def test_scene_runs_clean(name, build, steps):
    st, overflow = _run(build, steps)
    c = np.asarray(st.bodies.c)
    exists = np.asarray(st.bodies.exists)
    assert np.isfinite(c[exists]).all(), f"{name}: non-finite positions"
    assert np.isfinite(np.asarray(st.bodies.v)[exists]).all()
    assert overflow == 0, f"{name}: color overflow"


def test_varying_restitution_orders_bounce_height():
    """Higher restitution must bounce higher (VaryingRestitution.h)."""
    st = scenes.varying_restitution()
    kinds = world.possible_kinds(st)
    peak = np.zeros(7)
    bounced = np.zeros(7, bool)
    # the drop from y=20 alone takes ~117 steps; 300 steps spans the full
    # first rebound arc for every ball
    for i in range(300):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        y = np.asarray(st.bodies.c)[1:8, 1]
        v = np.asarray(st.bodies.v)[1:8, 1]
        bounced |= v > 0.1
        peak = np.where(bounced, np.maximum(peak, y), peak)
    # restitution 0 ball stays down; restitution 1 ball returns high
    assert peak[0] < 3.0, peak
    assert peak[6] > 14.0, peak
    assert peak[3] < peak[5] < peak[6], peak


def test_heavy_on_light_supports_mass_ratio():
    """The 100x-mass circle must rest on the light one without pushing it
    through the ground (HeavyOnLight.h)."""
    st, _ = _run(scenes.heavy_on_light, 180)
    c = np.asarray(st.bodies.c)
    assert c[1, 1] > 0.3, c[1]       # light ball stays above ground
    assert c[2, 1] > c[1, 1], c      # heavy ball stays on top


def test_collision_filtering_groups():
    """Group -1 fixtures never collide with each other: the large box and
    large circle start overlapping-adjacent columns and must fall through
    one another's column without the solver separating them as a pair;
    the small shapes (group +1) stack (CollisionFiltering.h)."""
    st, overflow = _run(scenes.collision_filtering, 120)
    assert overflow == 0
    c = np.asarray(st.bodies.c)
    exists = np.asarray(st.bodies.exists)
    assert np.isfinite(c[exists]).all()
    # small box (body 4) rests ON the small triangle (body 1)'s column or
    # the ground — and the box-triangle mask bit means the small box never
    # rests on the LARGE triangle; just assert everything settled sanely.
    assert (c[exists][:, 1] > -1.0).all()


def test_sensor_zone_emits_begin_events():
    """Falling circles crossing the big sensor circle must produce sensor
    begin events with no solver response (SensorTest.h)."""
    st = scenes.sensor_zone()
    kinds = world.possible_kinds(st)
    saw_begin = False
    for _ in range(90):
        st, ev = world.step(st, 1 / 60, kinds=kinds)
        ba = np.asarray(ev.begin_touch)
        if ba.any():
            fa = np.asarray(ev.f_a)[ba]
            fb = np.asarray(ev.f_b)[ba]
            if ((fa == 1) | (fb == 1)).any():
                saw_begin = True
    assert saw_begin, "no sensor begin event observed"
    # sensor produced no collision response: balls fell through to ground
    c = np.asarray(st.bodies.c)
    assert (c[1:8, 1] < 9.0).all(), c[1:8]


@pytest.mark.parametrize("variant", [1, 2, 3, 4, 5, 6])
def test_many_bodies_variants(variant):
    """ManyBodies1-6 stress analogs (ManyBodies.h:335-427): each variant
    pressures a different phase (1-2 pair churn, 3 fixture sync, 4 island
    traversal, 5 SolveTOI, 6 reduced). Drive floaters with the
    UpdateFloaterTask analog between steps; the world must stay finite,
    in-bounds, and within its pair/color budgets."""
    st, aux = scenes.many_bodies_variant(variant)
    kinds = world.possible_kinds(st)
    dt = 1 / 60
    for _ in range(12):
        st = scenes.floater_drive(st, aux, dt)
        st, ev = world.step(st, dt, kinds=kinds)
        assert int(ev.color_overflow) == 0
        assert int(ev.pair_overflow) == 0
    c = np.asarray(st.bodies.c)
    live = np.asarray(st.bodies.body_type) >= 0
    assert np.isfinite(c[live]).all()
    # nothing escapes the thick-walled border (CCD holds for bullets)
    border = {1: 150.0, 2: 100.0, 3: 150.0, 4: 60.0, 5: 60.0, 6: 40.0}[variant]
    assert (np.abs(c[live]) < border + 10.0).all(), np.abs(c[live]).max()
