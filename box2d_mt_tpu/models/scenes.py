"""Scene zoo: canonical reference workloads rebuilt on the TPU API.

Each function returns a frozen State (plus step kwargs where the reference
scene uses non-default iteration counts). Sources cited per scene.
"""

from .. import settings, shapes
from ..world import WorldBuilder


def hello_world():
    """HelloWorld.cpp:28-81 — ground box + one falling dynamic box."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body(position=(0.0, -10.0))
    wb.create_fixture(ground, shapes.Polygon.box(50.0, 10.0))
    body = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0.0, 4.0))
    wb.create_fixture(body, shapes.Polygon.box(1.0, 1.0), density=1.0,
                      friction=0.3)
    return wb.freeze()


def falling_circle():
    """Golden scene: restitution-heavy circle drop (tools golden.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body(position=(0.0, -10.0))
    wb.create_fixture(ground, shapes.Polygon.box(50.0, 10.0))
    body = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0.0, 4.0))
    wb.create_fixture(body, shapes.Circle(0.5), density=1.0, friction=0.3,
                      restitution=0.5)
    return wb.freeze()


def vertical_stack(n=5):
    """Testbed/Tests/VerticalStack.h — boxes stacked on an edge ground."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    for i in range(n):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(0.0, 0.502 + 1.01 * i))
        wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=1.0,
                          friction=0.3)
    return wb.freeze()


def pyramid(rows=10):
    """Testbed/Tests/Pyramid.h — the classic stacking benchmark."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    box = shapes.Polygon.box(0.5, 0.5)
    x = (-7.0, 0.75)
    dx = (0.5625, 1.25)
    dy = (1.125, 0.0)
    for i in range(rows):
        y = x
        for j in range(i, rows):
            b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=y)
            wb.create_fixture(b, box, density=5.0)
            y = (y[0] + dy[0], y[1] + dy[1])
        x = (x[0] + dx[0], x[1] + dx[1])
    return wb.freeze()


def revolute_pendulum():
    """Golden scene: box swinging on a revolute joint (golden.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    body = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(3.0, 10.0))
    wb.create_fixture(body, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_revolute_joint(ground, body, (0.0, 10.0))
    return wb.freeze()


def distance_pendulum():
    """Golden scene: circle on a rigid distance joint (golden.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    body = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 8.0))
    wb.create_fixture(body, shapes.Circle(0.5), density=1.0)
    wb.create_distance_joint(ground, body, (0.0, 10.0), (2.0, 8.0))
    return wb.freeze()


def prismatic_slide():
    """Golden scene: motorized prismatic slider with limits (golden.cpp)."""
    import math
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    body = wb.create_body(body_type=settings.DYNAMIC_BODY,
                          position=(0.0, 10.0), angle=0.5)
    wb.create_fixture(body, shapes.Polygon.box(2.0, 0.5), density=5.0)
    n = math.sqrt(5.0)
    wb.create_prismatic_joint(
        ground, body, (0.0, 10.0), (2.0 / n, 1.0 / n),
        enable_motor=True, motor_speed=1.0, max_motor_force=100.0,
        enable_limit=True, lower_translation=-5.0, upper_translation=5.0)
    return wb.freeze()


def tumbler(n_boxes=200):
    """Testbed/Tests/Tumbler.h — kinematic-ish rotating container full of
    boxes (driven here by a revolute motor on a dynamic container)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    container = wb.create_body(body_type=settings.DYNAMIC_BODY,
                               position=(0.0, 10.0), allow_sleep=False)
    box = shapes.Polygon.box
    wb.create_fixture(container, box(0.5, 10.0, (10.0, 0.0), 0.0), density=5.0)
    wb.create_fixture(container, box(0.5, 10.0, (-10.0, 0.0), 0.0), density=5.0)
    wb.create_fixture(container, box(10.0, 0.5, (0.0, 10.0), 0.0), density=5.0)
    wb.create_fixture(container, box(10.0, 0.5, (0.0, -10.0), 0.0), density=5.0)
    wb.create_revolute_joint(ground, container, (0.0, 10.0),
                             enable_motor=True, motor_speed=0.05 * 3.14159265,
                             max_motor_torque=1e8)
    import random
    rng = random.Random(42)
    for i in range(n_boxes):
        b = wb.create_body(body_type=settings.DYNAMIC_BODY,
                           position=(rng.uniform(-5, 5), 10.0 + rng.uniform(-5, 5)))
        wb.create_fixture(b, box(0.125, 0.125), density=1.0)
    return wb.freeze()


def weld_pendulum(soft=False):
    """Golden scene: two boxes welded, swinging on a revolute (golden2.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    b1 = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 8.0))
    wb.create_fixture(b1, shapes.Polygon.box(0.5, 0.5), density=5.0)
    b2 = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(3.0, 8.0))
    wb.create_fixture(b2, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_revolute_joint(ground, b1, (2.0, 9.0))
    if soft:
        wb.create_weld_joint(b1, b2, (2.5, 8.0), frequency=4.0,
                             damping_ratio=0.5)
    else:
        wb.create_weld_joint(b1, b2, (2.5, 8.0))
    return wb.freeze()


def friction_top_down():
    """Golden scene: sliding box damped by a friction joint (golden2.cpp)."""
    wb = WorldBuilder(gravity=(0.0, 0.0))
    ground = wb.create_body()
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 8.0),
                       linear_velocity=(8.0, 3.0), angular_velocity=5.0)
    wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_friction_joint(ground, b, (0.0, 0.0), max_force=10.0,
                             max_torque=10.0)
    # reference def uses local anchors (0,0) on both bodies
    wb._joints["friction"][-1]["local_anchor_a"] = (0.0, 0.0)
    wb._joints["friction"][-1]["local_anchor_b"] = (0.0, 0.0)
    return wb.freeze()


def rope_swing():
    """Golden scene: box dropping to a 5m rope limit (golden2.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 8.0))
    wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_rope_joint(ground, b, (0.0, 10.0), (0.0, 0.0), 5.0)
    return wb.freeze()


def motor_drive():
    """Golden scene: motor joint pulling a kicked box back (golden2.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 8.0),
                       linear_velocity=(5.0, 0.0))
    wb.create_fixture(b, shapes.Polygon.box(0.5, 0.5), density=5.0)
    wb.create_motor_joint(ground, b, max_force=1000.0, max_torque=1000.0)
    return wb.freeze()


def wheel_car():
    """Golden scene: motorized wheel + chassis on ground (golden3.cpp,
    Testbed Car.h analog)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    wheel = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0.0, 1.0))
    wb.create_fixture(wheel, shapes.Circle(0.4), density=1.0, friction=0.9)
    chassis = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0.0, 2.0))
    wb.create_fixture(chassis, shapes.Polygon.box(1.0, 0.25), density=1.0)
    wb.create_wheel_joint(chassis, wheel, (0.0, 1.0), (0.0, 1.0),
                          enable_motor=True, motor_speed=-10.0,
                          max_motor_torque=20.0, frequency=4.0,
                          damping_ratio=0.7)
    return wb.freeze()


def many_bodies(n=10000, spacing=2.2):
    """Testbed/Tests/ManyBodies.h analog: n small boxes in a sparse falling
    grid over a wide ground — the broad-phase/scaling stress load (the
    reference runs up to 50k bodies, ManyBodies.h:335-427)."""
    import math as _m
    wb = WorldBuilder(gravity=(0.0, -10.0))
    cols = int(_m.ceil(_m.sqrt(n)))
    half = 0.5 * cols * spacing + 10.0
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-half, 0.0), (half, 0.0)))
    box = shapes.Polygon.box(0.5, 0.5)
    for i in range(n):
        r, c = divmod(i, cols)
        x = (c - 0.5 * cols) * spacing
        y = 2.0 + r * spacing
        b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(x, y))
        wb.create_fixture(b, box, density=1.0, friction=0.3)
    return wb.freeze()


def multithread_demo(n_boxes=2800):
    """Testbed/Tests/MultithreadDemo.h analog: a container full of boxes
    (the reference's headline MT workload, MultithreadDemo.h:26)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    # container: floor + two walls
    wb.create_fixture(ground, shapes.Edge((-52.0, 0.0), (52.0, 0.0)))
    wb.create_fixture(ground, shapes.Edge((-52.0, 0.0), (-52.0, 120.0)))
    wb.create_fixture(ground, shapes.Edge((52.0, 0.0), (52.0, 120.0)))
    box = shapes.Polygon.box(0.5, 0.5)
    cols = 100
    for i in range(n_boxes):
        r, c = divmod(i, cols)
        x = (c - 0.5 * cols) * 1.02 + 0.255 * (r % 2)
        y = 1.02 + r * 1.02
        b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(x, y))
        wb.create_fixture(b, box, density=1.0, friction=0.3)
    return wb.freeze()


def gear_train():
    """Golden scene (golden4.cpp, Testbed Gears.h analog): two circle gears
    revolute-pinned to the ground, coupled by a gear joint with ratio
    r2/r1, plus a vertical rack on a prismatic joint coupled to the big
    gear with ratio -1/r2. Gravity drives the rack; the gear constraints
    drive the wheels."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    wb.create_fixture(ground, shapes.Edge((-40.0, 0.0), (40.0, 0.0)))
    g1 = wb.create_body(body_type=settings.DYNAMIC_BODY,
                        position=(-3.5, 12.0), angular_velocity=2.0)
    wb.create_fixture(g1, shapes.Circle(1.0), density=5.0)
    g2 = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(0.0, 12.0))
    wb.create_fixture(g2, shapes.Circle(2.0), density=5.0)
    rack = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(3.0, 12.0))
    wb.create_fixture(rack, shapes.Polygon.box(0.25, 1.5), density=5.0)
    rev1 = wb.create_revolute_joint(ground, g1, (-3.5, 12.0))
    rev2 = wb.create_revolute_joint(ground, g2, (0.0, 12.0))
    prism = wb.create_prismatic_joint(ground, rack, (3.0, 12.0), (0.0, 1.0),
                                      enable_limit=True,
                                      lower_translation=-5.0,
                                      upper_translation=5.0)
    wb.create_gear_joint(("revolute", rev1), ("revolute", rev2), ratio=2.0)
    wb.create_gear_joint(("revolute", rev2), ("prismatic", prism),
                         ratio=-0.5)
    return wb.freeze()


def pulley_pair():
    """Golden scene: 1.5-ratio pulley between two boxes (golden3.cpp)."""
    wb = WorldBuilder(gravity=(0.0, -10.0))
    ground = wb.create_body()
    a = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(-2.0, 5.0))
    wb.create_fixture(a, shapes.Polygon.box(0.5, 0.5), density=5.0)
    b = wb.create_body(body_type=settings.DYNAMIC_BODY, position=(2.0, 5.0))
    wb.create_fixture(b, shapes.Polygon.box(0.5, 1.0), density=5.0)
    wb.create_pulley_joint(a, b, (-2.0, 10.0), (2.0, 10.0),
                           (-2.0, 5.5), (2.0, 6.0), 1.5)
    return wb.freeze()
