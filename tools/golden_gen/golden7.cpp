// Golden traces for six more classic zoo scenes: tumbler(40), dominos,
// car, tiles(4,20,2), confined(4,3), collision_filtering. Original driver
// linked against the reference library (see README.md); scenes mirror
// models/scenes.py (which mirrors the cited Testbed headers), with the
// tumbler spawn table matching scenes.tumbler's seeded RNG.
#include <Box2D/Box2D.h>
#include <cmath>
#include <cstdio>
#include <cstring>

static b2ThreadPoolTaskExecutor g_exec;

static void dumpStep(b2World& world, int step) {
    printf("{\"step\":%d,\"bodies\":[", step);
    bool first = true;
    for (b2Body* b = world.GetBodyList(); b; b = b->GetNext()) {
        if (!first) printf(",");
        first = false;
        b2Vec2 p = b->GetPosition();
        printf("[%.9g,%.9g,%.9g,0,0,0,%d]", p.x, p.y, b->GetAngle(),
               b->IsAwake() ? 1 : 0);
    }
    printf("]}\n");
}

static void run(b2World& world, int steps) {
    for (int i = 0; i < steps; ++i) {
        world.Step(1.0f / 60.0f, 8, 3, g_exec);
        dumpStep(world, i);
    }
}

static b2Body* edgeGround(b2World& w, float x0, float x1) {
    b2BodyDef bd;
    b2Body* ground = w.CreateBody(&bd);
    b2EdgeShape e;
    e.Set(b2Vec2(x0, 0.0f), b2Vec2(x1, 0.0f));
    ground->CreateFixture(&e, 0.0f);
    return ground;
}

// scenes.tumbler(40): spawn table from random.Random(42)
static const float kTumblerSpawns[40][2] = {
    {1.39426798f, 5.25010755f},   {-2.24970682f, 7.23210738f},
    {2.36471214f, 11.7669949f},   {3.92179568f, 5.86938833f},
    {-0.780781803f, 5.29797219f}, {-2.81362025f, 10.0535529f},
    {-4.7346403f, 6.98837651f},   {1.49884438f, 10.4494148f},
    {-2.79559378f, 10.8926568f},  {3.09430457f, 5.0649876f},
    {3.05819252f, 11.9813939f},   {-1.59749483f, 6.554795f},
    {4.57213072f, 8.36594545f},   {-4.07254157f, 5.96716377f},
    {3.47494366f, 11.0372603f},   {3.07128273f, 12.2973179f},
    {0.362280915f, 14.7311576f},  {-1.21465623f, 10.5204063f},
    {3.29404664f, 11.1851975f},   {3.617069f, 10.7735215f},
    {2.04571836f, 5.45824384f},   {-2.72101724f, 7.89387964f},
    {-4.20208023f, 7.32790886f},  {-3.98998571f, 7.77973603f},
    {1.35684444f, 8.64832179f},   {-1.29819033f, 7.09507031f},
    {-2.33022178f, 14.3665459f},  {1.48035385f, 11.0913101f},
    {-3.28861352f, 12.291268f},   {-3.36597506f, 8.79455442f},
    {4.89523351f, 11.3999976f},   {0.569497438f, 11.8461425f},
    {3.4285192f, 12.7599991f},    {-2.70951928f, 5.32100244f},
    {-1.84546952f, 7.67740876f},  {-2.89017156f, 14.4290971f},
    {3.76367626f, 8.14677881f},   {1.55438665f, 8.95631901f},
    {4.1454759f, 9.58851853f},    {-2.35119834f, 7.46627508f}};

// Tumbler.h container + motor, pre-spawned boxes (ours spawns up front,
// the testbed spawns one per step).
static void tumbler() {
    b2World w(b2Vec2(0, -10));
    b2BodyDef gd;
    b2Body* ground = w.CreateBody(&gd);

    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.allowSleep = false;
    bd.position.Set(0.0f, 10.0f);
    b2Body* body = w.CreateBody(&bd);

    b2PolygonShape shape;
    shape.SetAsBox(0.5f, 10.0f, b2Vec2(10.0f, 0.0f), 0.0f);
    body->CreateFixture(&shape, 5.0f);
    shape.SetAsBox(0.5f, 10.0f, b2Vec2(-10.0f, 0.0f), 0.0f);
    body->CreateFixture(&shape, 5.0f);
    shape.SetAsBox(10.0f, 0.5f, b2Vec2(0.0f, 10.0f), 0.0f);
    body->CreateFixture(&shape, 5.0f);
    shape.SetAsBox(10.0f, 0.5f, b2Vec2(0.0f, -10.0f), 0.0f);
    body->CreateFixture(&shape, 5.0f);

    b2RevoluteJointDef jd;
    jd.bodyA = ground;
    jd.bodyB = body;
    jd.localAnchorA.Set(0.0f, 10.0f);
    jd.localAnchorB.Set(0.0f, 0.0f);
    jd.referenceAngle = 0.0f;
    jd.motorSpeed = 0.05f * 3.14159265f;
    jd.maxMotorTorque = 1e8f;
    jd.enableMotor = true;
    w.CreateJoint(&jd);

    b2PolygonShape small;
    small.SetAsBox(0.125f, 0.125f);
    for (int i = 0; i < 40; ++i) {
        b2BodyDef sd;
        sd.type = b2_dynamicBody;
        sd.position.Set(kTumblerSpawns[i][0], kTumblerSpawns[i][1]);
        w.CreateBody(&sd)->CreateFixture(&small, 1.0f);
    }
    run(w, 240);
}

// Dominos.h verbatim.
static void dominos() {
    b2World w(b2Vec2(0, -10));
    b2Body* b1 = edgeGround(w, -40, 40);
    {
        b2BodyDef bd;
        bd.position.Set(-1.5f, 10.0f);
        b2Body* ground = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(6.0f, 0.25f);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2PolygonShape shape;
        shape.SetAsBox(0.1f, 1.0f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        fd.friction = 0.1f;
        for (int i = 0; i < 10; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(-6.0f + 1.0f * i, 11.25f);
            w.CreateBody(&bd)->CreateFixture(&fd);
        }
    }
    b2Body* b2_;
    {
        b2BodyDef bd;
        bd.position.Set(1.0f, 6.0f);
        b2Body* ground = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(7.0f, 0.25f, b2Vec2_zero, 0.3f);
        ground->CreateFixture(&shape, 0.0f);

        b2BodyDef bd2;
        bd2.position.Set(-7.0f, 4.0f);
        b2_ = w.CreateBody(&bd2);
        b2PolygonShape shape2;
        shape2.SetAsBox(0.25f, 1.5f);
        b2_->CreateFixture(&shape2, 0.0f);
    }
    b2Body* b3;
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-0.9f, 1.0f);
        bd.angle = -0.15f;
        b3 = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(6.0f, 0.125f);
        b3->CreateFixture(&shape, 10.0f);

        b2RevoluteJointDef jd;
        jd.Initialize(b1, b3, b2Vec2(-2.0f, 1.0f));
        jd.collideConnected = true;
        w.CreateJoint(&jd);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-10.0f, 15.0f);
        b2Body* b4 = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.25f, 0.25f);
        b4->CreateFixture(&shape, 10.0f);
        b2RevoluteJointDef jd;
        jd.Initialize(b2_, b4, b2Vec2(-7.0f, 15.0f));
        w.CreateJoint(&jd);
    }
    b2Body* b5;
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(6.5f, 3.0f);
        b5 = w.CreateBody(&bd);
        b2PolygonShape shape;
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 10.0f;
        fd.friction = 0.1f;
        shape.SetAsBox(1.0f, 0.1f, b2Vec2(0.0f, -0.9f), 0.0f);
        b5->CreateFixture(&fd);
        shape.SetAsBox(0.1f, 1.0f, b2Vec2(-0.9f, 0.0f), 0.0f);
        b5->CreateFixture(&fd);
        shape.SetAsBox(0.1f, 1.0f, b2Vec2(0.9f, 0.0f), 0.0f);
        b5->CreateFixture(&fd);
        b2RevoluteJointDef jd;
        jd.Initialize(b1, b5, b2Vec2(6.0f, 2.0f));
        w.CreateJoint(&jd);
    }
    b2Body* b6;
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(6.5f, 4.1f);
        b6 = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(1.0f, 0.1f);
        b6->CreateFixture(&shape, 30.0f);
        b2RevoluteJointDef jd;
        jd.Initialize(b5, b6, b2Vec2(7.5f, 4.0f));
        w.CreateJoint(&jd);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(7.4f, 1.0f);
        b2Body* b7 = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.1f, 1.0f);
        b7->CreateFixture(&shape, 10.0f);
        b2DistanceJointDef djd;
        djd.bodyA = b3;
        djd.bodyB = b7;
        djd.localAnchorA.Set(6.0f, 0.0f);
        djd.localAnchorB.Set(0.0f, -1.0f);
        b2Vec2 d = djd.bodyB->GetWorldPoint(djd.localAnchorB)
                 - djd.bodyA->GetWorldPoint(djd.localAnchorA);
        djd.length = d.Length();
        w.CreateJoint(&djd);
    }
    {
        b2CircleShape shape;
        shape.m_radius = 0.2f;
        for (int i = 0; i < 4; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(5.9f + 2.0f * shape.m_radius * i, 2.4f);
            w.CreateBody(&bd)->CreateFixture(&shape, 10.0f);
        }
    }
    run(w, 240);
}

// Car.h with the rear motor enabled at -30 rad/s from step 0 (ours
// parameterizes the keyboard-driven testbed motor that way).
static void car() {
    b2World w(b2Vec2(0, -10));
    b2Body* ground = NULL;
    {
        b2BodyDef bd;
        ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 0.0f;
        fd.friction = 0.6f;
        shape.Set(b2Vec2(-20.0f, 0.0f), b2Vec2(20.0f, 0.0f));
        ground->CreateFixture(&fd);
        float hs[10] = {0.25f, 1.0f, 4.0f, 0.0f, 0.0f,
                        -1.0f, -2.0f, -2.0f, -1.25f, 0.0f};
        float x = 20.0f, y1 = 0.0f, dx = 5.0f;
        for (int r = 0; r < 2; ++r) {
            for (int i = 0; i < 10; ++i) {
                float y2 = hs[i];
                shape.Set(b2Vec2(x, y1), b2Vec2(x + dx, y2));
                ground->CreateFixture(&fd);
                y1 = y2;
                x += dx;
            }
        }
        shape.Set(b2Vec2(x, 0.0f), b2Vec2(x + 40.0f, 0.0f));
        ground->CreateFixture(&fd);
        x += 80.0f;
        shape.Set(b2Vec2(x, 0.0f), b2Vec2(x + 40.0f, 0.0f));
        ground->CreateFixture(&fd);
        x += 40.0f;
        shape.Set(b2Vec2(x, 0.0f), b2Vec2(x + 10.0f, 5.0f));
        ground->CreateFixture(&fd);
        x += 20.0f;
        shape.Set(b2Vec2(x, 0.0f), b2Vec2(x + 40.0f, 0.0f));
        ground->CreateFixture(&fd);
        x += 40.0f;
        shape.Set(b2Vec2(x, 0.0f), b2Vec2(x, 20.0f));
        ground->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(140.0f, 1.0f);
        bd.type = b2_dynamicBody;
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape box;
        box.SetAsBox(10.0f, 0.25f);
        body->CreateFixture(&box, 1.0f);
        b2RevoluteJointDef jd;
        jd.Initialize(ground, body, body->GetPosition());
        jd.lowerAngle = -8.0f * b2_pi / 180.0f;
        jd.upperAngle = 8.0f * b2_pi / 180.0f;
        jd.enableLimit = true;
        w.CreateJoint(&jd);
        body->ApplyAngularImpulse(100.0f, true);
    }
    {
        int N = 20;
        b2PolygonShape shape;
        shape.SetAsBox(1.0f, 0.125f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 1.0f;
        fd.friction = 0.6f;
        b2RevoluteJointDef jd;
        b2Body* prevBody = ground;
        for (int i = 0; i < N; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(161.0f + 2.0f * i, -0.125f);
            b2Body* body = w.CreateBody(&bd);
            body->CreateFixture(&fd);
            b2Vec2 anchor(160.0f + 2.0f * i, -0.125f);
            jd.Initialize(prevBody, body, anchor);
            w.CreateJoint(&jd);
            prevBody = body;
        }
        b2Vec2 anchor(160.0f + 2.0f * N, -0.125f);
        jd.Initialize(prevBody, ground, anchor);
        w.CreateJoint(&jd);
    }
    {
        b2PolygonShape box;
        box.SetAsBox(0.5f, 0.5f);
        for (int i = 0; i < 5; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(230.0f, 0.5f + i);
            w.CreateBody(&bd)->CreateFixture(&box, 0.5f);
        }
    }
    {
        b2PolygonShape chassis;
        b2Vec2 vertices[8];
        vertices[0].Set(-1.5f, -0.5f);
        vertices[1].Set(1.5f, -0.5f);
        vertices[2].Set(1.5f, 0.0f);
        vertices[3].Set(0.0f, 0.9f);
        vertices[4].Set(-1.15f, 0.9f);
        vertices[5].Set(-1.5f, 0.2f);
        chassis.Set(vertices, 6);

        b2CircleShape circle;
        circle.m_radius = 0.4f;

        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 1.0f);
        b2Body* car = w.CreateBody(&bd);
        car->CreateFixture(&chassis, 1.0f);

        b2FixtureDef fd;
        fd.shape = &circle;
        fd.density = 1.0f;
        fd.friction = 0.9f;

        bd.position.Set(-1.0f, 0.35f);
        b2Body* wheel1 = w.CreateBody(&bd);
        wheel1->CreateFixture(&fd);
        bd.position.Set(1.0f, 0.4f);
        b2Body* wheel2 = w.CreateBody(&bd);
        wheel2->CreateFixture(&fd);

        b2WheelJointDef jd;
        b2Vec2 axis(0.0f, 1.0f);
        jd.Initialize(car, wheel1, wheel1->GetPosition(), axis);
        jd.motorSpeed = -30.0f;
        jd.maxMotorTorque = 20.0f;
        jd.enableMotor = true;
        jd.frequencyHz = 4.0f;
        jd.dampingRatio = 0.7f;
        w.CreateJoint(&jd);

        jd.Initialize(car, wheel2, wheel2->GetPosition(), axis);
        jd.motorSpeed = 0.0f;
        jd.maxMotorTorque = 10.0f;
        jd.enableMotor = false;
        jd.frequencyHz = 4.0f;
        jd.dampingRatio = 0.7f;
        w.CreateJoint(&jd);
    }
    run(w, 240);
}

// Tiles.h at scenes.tiles(4, 20, 2): 20x2 ground tiles, 4-row pyramid.
static void tiles() {
    b2World w(b2Vec2(0, -10));
    {
        float a = 0.5f;
        b2BodyDef bd;
        bd.position.Set(0.0f, -a);
        b2Body* ground = w.CreateBody(&bd);
        int N = 20, M = 2;
        b2Vec2 position;
        position.y = 0.0f;
        for (int j = 0; j < M; ++j) {
            position.x = -N * a;
            for (int i = 0; i < N; ++i) {
                b2PolygonShape shape;
                shape.SetAsBox(a, a, position, 0.0f);
                ground->CreateFixture(&shape, 0.0f);
                position.x += 2.0f * a;
            }
            position.y -= 2.0f * a;
        }
    }
    {
        float a = 0.5f;
        b2PolygonShape shape;
        shape.SetAsBox(a, a);
        b2Vec2 x(-7.0f, 0.75f);
        b2Vec2 y;
        b2Vec2 deltaX(0.5625f, 1.25f);
        b2Vec2 deltaY(1.125f, 0.0f);
        int count = 4;
        for (int i = 0; i < count; ++i) {
            y = x;
            for (int j = i; j < count; ++j) {
                b2BodyDef bd;
                bd.type = b2_dynamicBody;
                bd.position = y;
                w.CreateBody(&bd)->CreateFixture(&shape, 5.0f);
                y += deltaY;
            }
            x += deltaX;
        }
    }
    run(w, 240);
}

// Confined.h at scenes.confined(4, 3): zero gravity, sealed edge box.
static void confined() {
    b2World w(b2Vec2(0.0f, 0.0f));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-10.0f, 0.0f), b2Vec2(10.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(-10.0f, 0.0f), b2Vec2(-10.0f, 20.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(10.0f, 0.0f), b2Vec2(10.0f, 20.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(-10.0f, 20.0f), b2Vec2(10.0f, 20.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    float radius = 0.5f;
    b2CircleShape shape;
    shape.m_p.SetZero();
    shape.m_radius = radius;
    b2FixtureDef fd;
    fd.shape = &shape;
    fd.density = 1.0f;
    fd.friction = 0.1f;
    int columnCount = 4, rowCount = 3;
    for (int j = 0; j < columnCount; ++j) {
        for (int i = 0; i < rowCount; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(-10.0f + (2.1f * j + 1.0f + 0.01f * i) * radius,
                            (2.0f * i + 1.0f) * radius);
            w.CreateBody(&bd)->CreateFixture(&fd);
        }
    }
    run(w, 240);
}

// CollisionFiltering.h verbatim.
static void collision_filtering() {
    const int16 k_smallGroup = 1;
    const int16 k_largeGroup = -1;
    const uint16 k_triangleCategory = 0x0002;
    const uint16 k_boxCategory = 0x0004;
    const uint16 k_circleCategory = 0x0008;
    const uint16 k_triangleMask = 0xFFFF;
    const uint16 k_boxMask = 0xFFFF ^ k_triangleCategory;
    const uint16 k_circleMask = 0xFFFF;

    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
        b2FixtureDef sd;
        sd.shape = &shape;
        sd.friction = 0.3f;
        ground->CreateFixture(&sd);
    }
    b2Vec2 vertices[3];
    vertices[0].Set(-1.0f, 0.0f);
    vertices[1].Set(1.0f, 0.0f);
    vertices[2].Set(0.0f, 2.0f);
    b2PolygonShape polygon;
    polygon.Set(vertices, 3);
    b2FixtureDef triangleShapeDef;
    triangleShapeDef.shape = &polygon;
    triangleShapeDef.density = 1.0f;
    triangleShapeDef.filter.groupIndex = k_smallGroup;
    triangleShapeDef.filter.categoryBits = k_triangleCategory;
    triangleShapeDef.filter.maskBits = k_triangleMask;

    b2BodyDef triangleBodyDef;
    triangleBodyDef.type = b2_dynamicBody;
    triangleBodyDef.position.Set(-5.0f, 2.0f);
    b2Body* body1 = w.CreateBody(&triangleBodyDef);
    body1->CreateFixture(&triangleShapeDef);

    vertices[0] *= 2.0f;
    vertices[1] *= 2.0f;
    vertices[2] *= 2.0f;
    polygon.Set(vertices, 3);
    triangleShapeDef.filter.groupIndex = k_largeGroup;
    triangleBodyDef.position.Set(-5.0f, 6.0f);
    triangleBodyDef.fixedRotation = true;
    b2Body* body2 = w.CreateBody(&triangleBodyDef);
    body2->CreateFixture(&triangleShapeDef);
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-5.0f, 10.0f);
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape p;
        p.SetAsBox(0.5f, 1.0f);
        body->CreateFixture(&p, 1.0f);
        b2PrismaticJointDef jd;
        jd.bodyA = body2;
        jd.bodyB = body;
        jd.enableLimit = true;
        jd.localAnchorA = body2->GetLocalPoint(body->GetPosition());
        jd.localAnchorB.SetZero();
        jd.localAxisA.Set(0.0f, 1.0f);
        jd.lowerTranslation = -1.0f;
        jd.upperTranslation = 1.0f;
        w.CreateJoint(&jd);
    }
    b2PolygonShape boxShape;
    boxShape.SetAsBox(1.0f, 0.5f);
    b2FixtureDef boxShapeDef;
    boxShapeDef.shape = &boxShape;
    boxShapeDef.density = 1.0f;
    boxShapeDef.restitution = 0.1f;
    boxShapeDef.filter.groupIndex = k_smallGroup;
    boxShapeDef.filter.categoryBits = k_boxCategory;
    boxShapeDef.filter.maskBits = k_boxMask;
    b2BodyDef boxBodyDef;
    boxBodyDef.type = b2_dynamicBody;
    boxBodyDef.position.Set(0.0f, 2.0f);
    b2Body* body3 = w.CreateBody(&boxBodyDef);
    body3->CreateFixture(&boxShapeDef);

    boxShape.SetAsBox(2.0f, 1.0f);
    boxShapeDef.filter.groupIndex = k_largeGroup;
    boxBodyDef.position.Set(0.0f, 6.0f);
    b2Body* body4 = w.CreateBody(&boxBodyDef);
    body4->CreateFixture(&boxShapeDef);

    b2CircleShape circle;
    circle.m_radius = 1.0f;
    b2FixtureDef circleShapeDef;
    circleShapeDef.shape = &circle;
    circleShapeDef.density = 1.0f;
    circleShapeDef.filter.groupIndex = k_smallGroup;
    circleShapeDef.filter.categoryBits = k_circleCategory;
    circleShapeDef.filter.maskBits = k_circleMask;
    b2BodyDef circleBodyDef;
    circleBodyDef.type = b2_dynamicBody;
    circleBodyDef.position.Set(5.0f, 2.0f);
    b2Body* body5 = w.CreateBody(&circleBodyDef);
    body5->CreateFixture(&circleShapeDef);

    circle.m_radius = 2.0f;
    circleShapeDef.filter.groupIndex = k_largeGroup;
    circleBodyDef.position.Set(5.0f, 6.0f);
    b2Body* body6 = w.CreateBody(&circleBodyDef);
    body6->CreateFixture(&circleShapeDef);
    run(w, 240);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "tumbler")) tumbler();
    else if (!strcmp(argv[1], "dominos")) dominos();
    else if (!strcmp(argv[1], "car")) car();
    else if (!strcmp(argv[1], "tiles")) tiles();
    else if (!strcmp(argv[1], "confined")) confined();
    else if (!strcmp(argv[1], "collision_filtering")) collision_filtering();
    else return 2;
    return 0;
}
