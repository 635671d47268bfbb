// Golden traces for the round-3 scene-zoo additions: web, bridge(12),
// cantilever(4), slider_crank, heavy_on_light, sphere_stack(5),
// varying_restitution, mobile(depth 3). Original driver linked against the
// reference library (see README.md); scenes mirror models/scenes.py, which
// mirrors the Testbed sources cited there.
#include <Box2D/Box2D.h>
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

static void web() {
    b2World w(b2Vec2(0, -10));
    b2Body* ground = edgeGround(w, -40, 40);
    b2PolygonShape box;
    box.SetAsBox(0.5f, 0.5f);
    b2Vec2 pos[4] = {{-5, 5}, {5, 5}, {5, 15}, {-5, 15}};
    b2Body* bodies[4];
    for (int i = 0; i < 4; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position = pos[i];
        bodies[i] = w.CreateBody(&bd);
        bodies[i]->CreateFixture(&box, 5.0f);
    }
    b2DistanceJointDef jd;
    jd.frequencyHz = 2.0f;
    jd.dampingRatio = 0.0f;
    b2Vec2 ga[4] = {{-10, 0}, {10, 0}, {10, 20}, {-10, 20}};
    b2Vec2 la[4] = {{-0.5f, -0.5f}, {0.5f, -0.5f}, {0.5f, 0.5f}, {-0.5f, 0.5f}};
    for (int i = 0; i < 4; ++i) {
        jd.bodyA = ground;
        jd.bodyB = bodies[i];
        jd.localAnchorA = ga[i];
        jd.localAnchorB = la[i];
        b2Vec2 d = jd.bodyB->GetWorldPoint(la[i]) - jd.bodyA->GetWorldPoint(ga[i]);
        jd.length = d.Length();
        w.CreateJoint(&jd);
    }
    int ia[4] = {0, 1, 2, 3}, ib[4] = {1, 2, 3, 0};
    b2Vec2 laA[4] = {{0.5f, 0}, {0, 0.5f}, {-0.5f, 0}, {0, -0.5f}};
    b2Vec2 laB[4] = {{-0.5f, 0}, {0, -0.5f}, {0.5f, 0}, {0, 0.5f}};
    for (int i = 0; i < 4; ++i) {
        jd.bodyA = bodies[ia[i]];
        jd.bodyB = bodies[ib[i]];
        jd.localAnchorA = laA[i];
        jd.localAnchorB = laB[i];
        b2Vec2 d = jd.bodyB->GetWorldPoint(laB[i]) - jd.bodyA->GetWorldPoint(laA[i]);
        jd.length = d.Length();
        w.CreateJoint(&jd);
    }
    run(w, 240);
}

static void bridge() {
    const int N = 12;
    b2World w(b2Vec2(0, -10));
    b2Body* ground = edgeGround(w, -40, 40);
    b2PolygonShape plank;
    plank.SetAsBox(0.5f, 0.125f);
    b2FixtureDef fd;
    fd.shape = &plank;
    fd.density = 20.0f;
    fd.friction = 0.2f;
    b2RevoluteJointDef jd;
    b2Body* prev = ground;
    for (int i = 0; i < N; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-14.5f + 1.0f * i, 5.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&fd);
        jd.Initialize(prev, b, b2Vec2(-15.0f + 1.0f * i, 5.0f));
        w.CreateJoint(&jd);
        prev = b;
    }
    jd.Initialize(prev, ground, b2Vec2(-15.0f + 1.0f * N, 5.0f));
    w.CreateJoint(&jd);
    b2Vec2 verts[3] = {{-0.5f, 0}, {0.5f, 0}, {0, 1.5f}};
    b2PolygonShape tri;
    tri.Set(verts, 3);
    for (int i = 0; i < 2; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-8.0f + 8.0f * i, 12.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&tri, 1.0f);
    }
    b2CircleShape circ;
    circ.m_radius = 0.5f;
    for (int i = 0; i < 3; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-6.0f + 6.0f * i, 10.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&circ, 1.0f);
    }
    run(w, 240);
}

static void cantilever() {
    const int N = 4;
    b2World w(b2Vec2(0, -10));
    b2Body* ground = edgeGround(w, -40, 40);
    b2PolygonShape plank;
    plank.SetAsBox(0.5f, 0.125f);
    b2FixtureDef fd;
    fd.shape = &plank;
    fd.density = 20.0f;
    b2WeldJointDef jd;
    b2Body* prev = ground;
    for (int i = 0; i < N; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-14.5f + 1.0f * i, 5.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&fd);
        jd.Initialize(prev, b, b2Vec2(-15.0f + 1.0f * i, 5.0f));
        w.CreateJoint(&jd);
        prev = b;
    }
    b2PolygonShape wide;
    wide.SetAsBox(1.0f, 0.125f);
    b2FixtureDef fd2;
    fd2.shape = &wide;
    fd2.density = 20.0f;
    b2WeldJointDef jd2;
    jd2.frequencyHz = 5.0f;
    jd2.dampingRatio = 0.7f;
    prev = ground;
    for (int i = 0; i < 3; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-14.0f + 2.0f * i, 15.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&fd2);
        jd2.Initialize(prev, b, b2Vec2(-15.0f + 2.0f * i, 15.0f));
        w.CreateJoint(&jd2);
        prev = b;
    }
    prev = ground;
    for (int i = 0; i < N; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-4.5f + 1.0f * i, 5.0f);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&fd);
        jd.Initialize(prev, b, b2Vec2(-5.0f + 1.0f * i, 5.0f));
        w.CreateJoint(&jd);
        prev = b;
    }
    run(w, 240);
}

static void sliderCrank() {
    b2World w(b2Vec2(0, -10));
    b2BodyDef gd;
    gd.position.Set(0.0f, 17.0f);
    b2Body* ground = w.CreateBody(&gd);
    b2Body* prev = ground;
    {
        b2PolygonShape shape;
        shape.SetAsBox(4.0f, 1.0f);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-8.0f, 20.0f);
        b2Body* body = w.CreateBody(&bd);
        body->CreateFixture(&shape, 2.0f);
        b2RevoluteJointDef rjd;
        rjd.Initialize(prev, body, b2Vec2(-12.0f, 20.0f));
        w.CreateJoint(&rjd);
        prev = body;
    }
    {
        b2PolygonShape shape;
        shape.SetAsBox(8.0f, 1.0f);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(4.0f, 20.0f);
        b2Body* body = w.CreateBody(&bd);
        body->CreateFixture(&shape, 2.0f);
        b2RevoluteJointDef rjd;
        rjd.Initialize(prev, body, b2Vec2(-4.0f, 20.0f));
        w.CreateJoint(&rjd);
        prev = body;
    }
    {
        b2PolygonShape shape;
        shape.SetAsBox(3.0f, 3.0f);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.fixedRotation = true;
        bd.position.Set(12.0f, 20.0f);
        b2Body* body = w.CreateBody(&bd);
        body->CreateFixture(&shape, 2.0f);
        b2RevoluteJointDef rjd;
        rjd.Initialize(prev, body, b2Vec2(12.0f, 20.0f));
        w.CreateJoint(&rjd);
        b2PrismaticJointDef pjd;
        pjd.Initialize(ground, body, b2Vec2(12.0f, 17.0f), b2Vec2(1.0f, 0.0f));
        w.CreateJoint(&pjd);
    }
    run(w, 240);
}

static void heavyOnLight() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position.Set(0.0f, 0.5f);
    b2Body* body = w.CreateBody(&bd);
    b2CircleShape shape;
    shape.m_radius = 0.5f;
    body->CreateFixture(&shape, 10.0f);
    bd.position.Set(0.0f, 6.0f);
    body = w.CreateBody(&bd);
    shape.m_radius = 5.0f;
    body->CreateFixture(&shape, 10.0f);
    run(w, 240);
}

static void sphereStack() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2CircleShape shape;
    shape.m_radius = 1.0f;
    for (int i = 0; i < 5; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 4.0f + 3.0f * i);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&shape, 1.0f);
        b->SetLinearVelocity(b2Vec2(0.0f, -50.0f));
    }
    run(w, 240);
}

static void varyingRestitution() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2CircleShape shape;
    shape.m_radius = 1.0f;
    b2FixtureDef fd;
    fd.shape = &shape;
    fd.density = 1.0f;
    float rest[7] = {0.0f, 0.1f, 0.3f, 0.5f, 0.75f, 0.9f, 1.0f};
    for (int i = 0; i < 7; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-10.0f + 3.0f * i, 20.0f);
        b2Body* b = w.CreateBody(&bd);
        fd.restitution = rest[i];
        b->CreateFixture(&fd);
    }
    run(w, 300);
}

static b2World* g_mw;
static b2Body* mobileNode(b2Body* parent, const b2Vec2& localAnchor,
                          int depth, float offset, float a, int maxDepth) {
    b2Vec2 h(0.0f, a);
    b2Vec2 p = parent->GetPosition() + localAnchor - h;
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position = p;
    b2Body* body = g_mw->CreateBody(&bd);
    b2PolygonShape shape;
    shape.SetAsBox(0.25f * a, a);
    body->CreateFixture(&shape, 20.0f);
    if (depth == maxDepth) return body;
    b2Vec2 a1(offset, -a);
    b2Vec2 a2(-offset, -a);
    b2Body* b1 = mobileNode(body, a1, depth + 1, 0.5f * offset, a, maxDepth);
    b2Body* b2_ = mobileNode(body, a2, depth + 1, 0.5f * offset, a, maxDepth);
    b2RevoluteJointDef jd;
    jd.bodyA = body;
    jd.localAnchorB = h;
    jd.localAnchorA = a1;
    jd.bodyB = b1;
    g_mw->CreateJoint(&jd);
    jd.localAnchorA = a2;
    jd.bodyB = b2_;
    g_mw->CreateJoint(&jd);
    return body;
}

static void mobile() {
    b2World w(b2Vec2(0, -10));
    g_mw = &w;
    b2BodyDef gd;
    gd.position.Set(0.0f, 20.0f);
    b2Body* ground = w.CreateBody(&gd);
    float a = 0.5f;
    b2Body* root = mobileNode(ground, b2Vec2(0, 0), 0, 3.0f, a, 3);
    b2RevoluteJointDef jd;
    jd.bodyA = ground;
    jd.bodyB = root;
    jd.localAnchorA.SetZero();
    jd.localAnchorB.Set(0.0f, a);
    w.CreateJoint(&jd);
    run(w, 240);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "web")) web();
    else if (!strcmp(argv[1], "bridge")) bridge();
    else if (!strcmp(argv[1], "cantilever")) cantilever();
    else if (!strcmp(argv[1], "slider_crank")) sliderCrank();
    else if (!strcmp(argv[1], "heavy_on_light")) heavyOnLight();
    else if (!strcmp(argv[1], "sphere_stack")) sphereStack();
    else if (!strcmp(argv[1], "varying_restitution")) varyingRestitution();
    else if (!strcmp(argv[1], "mobile")) mobile();
    else return 2;
    return 0;
}
