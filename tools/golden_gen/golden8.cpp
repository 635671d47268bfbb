// Golden traces: multithread_demo(200), pinball, chain_links(10),
// compound_shapes(4), body_types. Original driver linked against the
// reference library (see README.md); scenes mirror models/scenes.py
// (compound spawn table matches its seeded RNG; pinball flipper motors
// run at the scene's fixed +-10 rad/s parameterization).
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

// scenes.multithread_demo(200): edge container + 200-box grid.
static void multithread_demo() {
    b2World w(b2Vec2(0, -10));
    b2BodyDef gd;
    b2Body* ground = w.CreateBody(&gd);
    b2EdgeShape e;
    e.Set(b2Vec2(-52.0f, 0.0f), b2Vec2(52.0f, 0.0f));
    ground->CreateFixture(&e, 0.0f);
    e.Set(b2Vec2(-52.0f, 0.0f), b2Vec2(-52.0f, 120.0f));
    ground->CreateFixture(&e, 0.0f);
    e.Set(b2Vec2(52.0f, 0.0f), b2Vec2(52.0f, 120.0f));
    ground->CreateFixture(&e, 0.0f);

    b2PolygonShape box;
    box.SetAsBox(0.5f, 0.5f);
    b2FixtureDef fd;
    fd.shape = &box;
    fd.density = 1.0f;
    fd.friction = 0.3f;
    const int cols = 100;
    for (int i = 0; i < 200; ++i) {
        int r = i / cols, c = i % cols;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set((c - 0.5f * cols) * 1.02f + 0.255f * (r % 2),
                        1.02f + r * 1.02f);
        w.CreateBody(&bd)->CreateFixture(&fd);
    }
    run(w, 240);
}

// Pinball.h with flipper motors at -10/+10 rad/s from step 0.
static void pinball() {
    b2World w(b2Vec2(0, -10));
    b2Body* ground;
    {
        b2BodyDef bd;
        ground = w.CreateBody(&bd);
        b2Vec2 vs[5];
        vs[0].Set(0.0f, -2.0f);
        vs[1].Set(8.0f, 6.0f);
        vs[2].Set(8.0f, 20.0f);
        vs[3].Set(-8.0f, 20.0f);
        vs[4].Set(-8.0f, 6.0f);
        b2ChainShape loop;
        loop.CreateLoop(vs, 5);
        b2FixtureDef fd;
        fd.shape = &loop;
        fd.density = 0.0f;
        ground->CreateFixture(&fd);
    }
    {
        b2Vec2 p1(-2.0f, 0.0f), p2(2.0f, 0.0f);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position = p1;
        b2Body* leftFlipper = w.CreateBody(&bd);
        bd.position = p2;
        b2Body* rightFlipper = w.CreateBody(&bd);

        b2PolygonShape box;
        box.SetAsBox(1.75f, 0.1f);
        b2FixtureDef fd;
        fd.shape = &box;
        fd.density = 1.0f;
        leftFlipper->CreateFixture(&fd);
        rightFlipper->CreateFixture(&fd);

        b2RevoluteJointDef jd;
        jd.bodyA = ground;
        jd.localAnchorB.SetZero();
        jd.enableMotor = true;
        jd.maxMotorTorque = 1000.0f;
        jd.enableLimit = true;

        jd.motorSpeed = -10.0f;
        jd.localAnchorA = p1;
        jd.bodyB = leftFlipper;
        jd.lowerAngle = -30.0f * b2_pi / 180.0f;
        jd.upperAngle = 5.0f * b2_pi / 180.0f;
        w.CreateJoint(&jd);

        jd.motorSpeed = 10.0f;
        jd.localAnchorA = p2;
        jd.bodyB = rightFlipper;
        jd.lowerAngle = -5.0f * b2_pi / 180.0f;
        jd.upperAngle = 30.0f * b2_pi / 180.0f;
        w.CreateJoint(&jd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(1.0f, 15.0f);
        bd.type = b2_dynamicBody;
        bd.bullet = true;
        b2Body* ball = w.CreateBody(&bd);
        b2CircleShape shape;
        shape.m_radius = 0.2f;
        ball->CreateFixture(&shape, 1.0f);
    }
    run(w, 240);
}

// Chain.h at n=10.
static void chain_links() {
    b2World w(b2Vec2(0, -10));
    b2BodyDef gd;
    b2Body* ground = w.CreateBody(&gd);
    b2EdgeShape e;
    e.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
    ground->CreateFixture(&e, 0.0f);

    b2PolygonShape shape;
    shape.SetAsBox(0.6f, 0.125f);
    b2FixtureDef fd;
    fd.shape = &shape;
    fd.density = 20.0f;
    fd.friction = 0.2f;
    b2RevoluteJointDef jd;
    const float y = 25.0f;
    b2Body* prev = ground;
    for (int i = 0; i < 10; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.5f + i, y);
        b2Body* body = w.CreateBody(&bd);
        body->CreateFixture(&fd);
        b2Vec2 anchor((float)i, y);
        jd.Initialize(prev, body, anchor);
        w.CreateJoint(&jd);
        prev = body;
    }
    run(w, 240);
}

// scenes.compound_shapes(4, seed=3): spawn table from its Python RNG.
static const float kCompound[12][3] = {
    {4.94759293f, 1.05f, 0.277900419f},
    {4.97399103f, 3.55f, 0.65294886f},
    {5.02514406f, 6.05f, -2.72986269f},
    {4.9026336f, 8.55f, 2.12038078f},
    {-5.0481292f, 1.05f, -1.6692478f},
    {-4.90087103f, 3.55f, -0.186839893f},
    {-4.93270771f, 6.05f, -0.148577172f},
    {-4.97218637f, 8.55f, -2.19524175f},
    {0.0269721317f, 2.05f, 0.0f},
    {0.0736090614f, 4.55f, 0.0f},
    {0.00463624208f, 7.05f, 0.0f},
    {0.0482503712f, 9.55f, 0.0f}};

static void compound_shapes() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* body = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(50.0f, 0.0f), b2Vec2(-50.0f, 0.0f));
        body->CreateFixture(&shape, 0.0f);
    }
    {
        b2CircleShape circle1;
        circle1.m_radius = 0.5f;
        circle1.m_p.Set(-0.5f, 0.5f);
        b2CircleShape circle2;
        circle2.m_radius = 0.5f;
        circle2.m_p.Set(0.5f, 0.5f);
        for (int i = 0; i < 4; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(kCompound[i][0], kCompound[i][1]);
            bd.angle = kCompound[i][2];
            b2Body* body = w.CreateBody(&bd);
            body->CreateFixture(&circle1, 2.0f);
            body->CreateFixture(&circle2, 0.0f);
        }
    }
    {
        b2PolygonShape polygon1;
        polygon1.SetAsBox(0.25f, 0.5f);
        b2PolygonShape polygon2;
        polygon2.SetAsBox(0.25f, 0.5f, b2Vec2(0.0f, -0.5f), 0.5f * b2_pi);
        for (int i = 4; i < 8; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(kCompound[i][0], kCompound[i][1]);
            bd.angle = kCompound[i][2];
            b2Body* body = w.CreateBody(&bd);
            body->CreateFixture(&polygon1, 2.0f);
            body->CreateFixture(&polygon2, 2.0f);
        }
    }
    {
        b2Transform xf1;
        xf1.q.Set(0.3524f * b2_pi);
        xf1.p = xf1.q.GetXAxis();
        b2Vec2 vertices[3];
        vertices[0] = b2Mul(xf1, b2Vec2(-1.0f, 0.0f));
        vertices[1] = b2Mul(xf1, b2Vec2(1.0f, 0.0f));
        vertices[2] = b2Mul(xf1, b2Vec2(0.0f, 0.5f));
        b2PolygonShape triangle1;
        triangle1.Set(vertices, 3);

        b2Transform xf2;
        xf2.q.Set(-0.3524f * b2_pi);
        xf2.p = -xf2.q.GetXAxis();
        vertices[0] = b2Mul(xf2, b2Vec2(-1.0f, 0.0f));
        vertices[1] = b2Mul(xf2, b2Vec2(1.0f, 0.0f));
        vertices[2] = b2Mul(xf2, b2Vec2(0.0f, 0.5f));
        b2PolygonShape triangle2;
        triangle2.Set(vertices, 3);

        for (int i = 8; i < 12; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(kCompound[i][0], kCompound[i][1]);
            b2Body* body = w.CreateBody(&bd);
            body->CreateFixture(&triangle1, 2.0f);
            body->CreateFixture(&triangle2, 2.0f);
        }
    }
    run(w, 240);
}

// BodyTypes.h construction (platform left dynamic; no keyboard driving).
static void body_types() {
    b2World w(b2Vec2(0, -10));
    b2Body* ground;
    {
        b2BodyDef bd;
        ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-20.0f, 0.0f), b2Vec2(20.0f, 0.0f));
        b2FixtureDef fd;
        fd.shape = &shape;
        ground->CreateFixture(&fd);
    }
    b2Body* attachment;
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 3.0f);
        attachment = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 2.0f);
        attachment->CreateFixture(&shape, 2.0f);
    }
    b2Body* platform;
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-4.0f, 5.0f);
        platform = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 4.0f, b2Vec2(4.0f, 0.0f), 0.5f * b2_pi);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.friction = 0.6f;
        fd.density = 2.0f;
        platform->CreateFixture(&fd);

        b2RevoluteJointDef rjd;
        rjd.Initialize(attachment, platform, b2Vec2(0.0f, 5.0f));
        rjd.maxMotorTorque = 50.0f;
        rjd.enableMotor = true;
        w.CreateJoint(&rjd);

        b2PrismaticJointDef pjd;
        pjd.Initialize(ground, platform, b2Vec2(0.0f, 5.0f),
                       b2Vec2(1.0f, 0.0f));
        pjd.maxMotorForce = 1000.0f;
        pjd.enableMotor = true;
        pjd.lowerTranslation = -10.0f;
        pjd.upperTranslation = 10.0f;
        pjd.enableLimit = true;
        w.CreateJoint(&pjd);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 8.0f);
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.75f, 0.75f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.friction = 0.6f;
        fd.density = 2.0f;
        body->CreateFixture(&fd);
    }
    run(w, 240);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "multithread_demo")) multithread_demo();
    else if (!strcmp(argv[1], "pinball")) pinball();
    else if (!strcmp(argv[1], "chain_links")) chain_links();
    else if (!strcmp(argv[1], "compound_shapes")) compound_shapes();
    else if (!strcmp(argv[1], "body_types")) body_types();
    else return 2;
    return 0;
}
