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
    ("chain_problem", scenes.chain_problem, 60),
    ("edge_test", scenes.edge_test, 60),
    ("skier", scenes.skier, 60),
    ("collision_processing", lambda: scenes.collision_processing(7), 60),
    ("sleep_collide_perf",
     lambda: scenes.sleep_collide_perf(2, 6, 1, 20), 60),
    ("basic_slider_crank", scenes.basic_slider_crank, 60),
    ("shape_editing", scenes.shape_editing, 60),
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


def test_skier_no_collision_jerk():
    """Skier.h regression: crossing the ghost-connected slope joints must
    not kick the frictionless skier airborne — its upward velocity stays
    negligible and it keeps descending the slope.

    The reference scene starts the skier mid-platform at 0.5 m/s (minutes
    of interactive runtime before the slope); teleport it next to the
    slope edge via the mutation API so 180 steps cover both slope joints."""
    from box2d_mt_tpu import mutate

    st = scenes.skier()
    st = mutate.set_transform(st, 1, (-0.7, float(np.asarray(st.bodies.xf_p)[1, 1])), 0.0)
    kinds = world.possible_kinds(st)
    max_vy_up = 0.0
    for _ in range(180):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        max_vy_up = max(max_vy_up, float(np.asarray(st.bodies.v)[1, 1]))
    assert max_vy_up < 0.05, max_vy_up            # no upward kick
    c = np.asarray(st.bodies.c)[1]
    assert c[0] > 0.5, c    # made it past the platform onto the slopes
    assert np.isfinite(c).all()


def test_chain_problem_rests_on_chain():
    """chainProblem.h regression dump: the tall bullet box must come to
    rest supported by the chain floor — no snag on the internal vertex,
    no tunneling through the one-sided chain."""
    st = scenes.chain_problem()
    kinds = world.possible_kinds(st)
    for _ in range(180):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    c = np.asarray(st.bodies.c)[1]
    v = np.asarray(st.bodies.v)[1]
    assert c[1] > 0.4, c            # not through the floor (min rest ~0.5)
    assert abs(v[0]) < 0.5 and abs(v[1]) < 0.5, v   # settled
    assert np.isfinite(c).all()


def test_edge_test_settles_on_terrain():
    """EdgeTest.h: circle and box settle onto the ghost-connected terrain
    near internal vertices without snagging or popping."""
    st = scenes.edge_test()
    kinds = world.possible_kinds(st)
    for _ in range(90):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    c = np.asarray(st.bodies.c)
    # circle radius 0.5 / box half-height 0.5 resting on y=0 segments
    assert abs(c[1, 1] - 0.5) < 0.1, c[1]
    assert abs(c[2, 1] - 0.5) < 0.1, c[2]


def test_collision_processing_destroys_lighter_of_touching():
    """CollisionProcessing.h Step loop: each step, for every touching
    dynamic-dynamic pair, destroy the lighter body (max 6 per step) via
    mutate.remove_body; the survivors keep simulating cleanly."""
    from box2d_mt_tpu import mutate

    st = scenes.collision_processing(7)
    kinds = world.possible_kinds(st)
    inv_mass0 = np.asarray(st.bodies.inv_mass)
    removed = set()
    for _ in range(120):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
        touching = np.asarray(st.contacts.touching)
        f_a = np.asarray(st.contacts.f_a)
        f_b = np.asarray(st.contacts.f_b)
        fx_body = np.asarray(st.fixtures.body)
        inv_mass = np.asarray(st.bodies.inv_mass)
        nuke = []
        for i in np.nonzero(touching)[0]:
            ba, bb = int(fx_body[f_a[i]]), int(fx_body[f_b[i]])
            if ba in removed or bb in removed:
                continue
            ma = 1.0 / inv_mass[ba] if inv_mass[ba] > 0 else 0.0
            mb = 1.0 / inv_mass[bb] if inv_mass[bb] > 0 else 0.0
            if ma > 0.0 and mb > 0.0:
                nuke.append(ba if mb > ma else bb)
        for b in sorted(set(nuke))[:6]:
            st = mutate.remove_body(st, b)
            removed.add(b)
    exists = np.asarray(st.bodies.exists)
    assert len(removed) >= 1, "no touching dynamic pair ever destroyed"
    assert not exists[sorted(removed)].any()
    c = np.asarray(st.bodies.c)
    assert np.isfinite(c[exists]).all()


def test_sleep_collide_perf_pyramids_sleep_tumbler_spins():
    """SleepCollidePerf.h: the settled pyramids must fall asleep while the
    no-sleep tumblers keep spinning — the scene's entire point is that
    throughput comes from skipping the sleeping islands."""
    st = scenes.sleep_collide_perf(2, 6, 1, 12)
    kinds = world.possible_kinds(st)
    n_pyr = 2 * (6 * 7) // 2   # 2 pyramids of size 6 = 42 bodies
    for _ in range(300):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    awake = np.asarray(st.bodies.awake)
    # bodies 1..42 are the pyramid boxes (0 = ground)
    asleep_pyr = (~awake[1:1 + n_pyr]).sum()
    assert asleep_pyr == n_pyr, f"{asleep_pyr}/{n_pyr} pyramid boxes asleep"
    # tumbler body right after the pyramids is flagged no-sleep
    assert awake[1 + n_pyr], "tumbler fell asleep"
    assert abs(float(np.asarray(st.bodies.w)[1 + n_pyr])) > 0.01


def test_basic_slider_crank_piston_guided():
    """BasicSliderCrank.h: the prismatic guide (axis (1,0), fixed-rotation
    piston) must keep the piston on its horizontal line while the crank
    and rod sag under gravity and drive it sideways."""
    st = scenes.basic_slider_crank()
    kinds = world.possible_kinds(st)
    for _ in range(120):
        st, _ = world.step(st, 1 / 60, kinds=kinds)
    c = np.asarray(st.bodies.c)
    a = np.asarray(st.bodies.a)
    assert abs(c[3, 1] - 20.0) < 0.05, c[3]     # piston rides the guide
    assert abs(a[3]) < 1e-3                      # fixed rotation holds
    assert c[1, 1] < 20.0 - 0.5, c[1]            # crank sagged
    assert np.isfinite(c).all()


def test_shape_editing_add_remove_fixture():
    """ShapeEditing.h: attach a circle fixture ('C') to the falling box at
    runtime — the compound must rest higher than the bare box; detach it
    ('D') and the box settles back to its own rest height; toggling the
    sensor flag ('S') makes the body fall through the ground."""
    from box2d_mt_tpu import mutate
    from box2d_mt_tpu import shapes as sh

    st = scenes.shape_editing()
    # kinds is the static compile-time collider set: include EDGE_CIRCLE
    # up front for the circle fixture this test attaches at runtime
    from box2d_mt_tpu.ops import narrowphase as nph
    kinds = tuple(sorted(set(world.possible_kinds(st))
                         | {nph.KIND_EDGE_CIRCLE, nph.KIND_POLYGON_CIRCLE}))

    def settle(st, n=150):
        for _ in range(n):
            st, _ = world.step(st, 1 / 60, kinds=kinds)
        return st

    st = settle(st)
    y_bare = float(np.asarray(st.bodies.c)[1, 1])
    assert abs(y_bare - 4.0) < 0.05, y_bare      # 4x4 box rest height

    st, fix2 = mutate.add_fixture(st, 1, sh.Circle(3.0, (0.5, -4.0)),
                                  density=10.0)
    assert int(fix2) >= 0
    st = mutate.set_awake(st, 1, True)   # ShapeEditing.h: SetAwake after edit
    st = settle(st)
    y_comp = float(np.asarray(st.bodies.c)[1, 1])
    # circle sticks out below the box bottom: the compound rests higher
    # (it tilts onto the offset circle, so the lift is ~0.85, not 3)
    assert y_comp > y_bare + 0.5, (y_bare, y_comp)

    st = mutate.remove_fixture(st, fix2)
    st = mutate.set_awake(st, 1, True)
    st = settle(st)
    y_back = float(np.asarray(st.bodies.c)[1, 1])
    assert abs(y_back - y_bare) < 0.1, (y_bare, y_back)

    st = mutate.set_sensor(st, 0, True)          # ground becomes sensor
    st = mutate.set_awake(st, 1, True)
    st = settle(st, 60)
    assert float(np.asarray(st.bodies.c)[1, 1]) < y_bare - 2.0
