// Golden traces: theo_jansen (walker linkage), varying_friction.
// Original driver linked against the reference library (see README.md);
// theo_jansen follows TheoJansen.h with the wheel angle reset to 0 after
// leg creation (scenes.theo_jansen builds the same joint locals via
// explicit anchors on an unrotated wheel).
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

static b2Body* g_chassis;
static b2Body* g_wheel;

static void createLeg(b2World& w, float s, const b2Vec2& wheelAnchor,
                      const b2Vec2& offset) {
    b2Vec2 p1(5.4f * s, -6.1f);
    b2Vec2 p2(7.2f * s, -1.2f);
    b2Vec2 p3(4.3f * s, -1.9f);
    b2Vec2 p4(3.1f * s, 0.8f);
    b2Vec2 p5(6.0f * s, 1.5f);
    b2Vec2 p6(2.5f * s, 3.7f);

    b2FixtureDef fd1, fd2;
    fd1.filter.groupIndex = -1;
    fd2.filter.groupIndex = -1;
    fd1.density = 1.0f;
    fd2.density = 1.0f;

    b2PolygonShape poly1, poly2;
    if (s > 0.0f) {
        b2Vec2 vertices[3];
        vertices[0] = p1;
        vertices[1] = p2;
        vertices[2] = p3;
        poly1.Set(vertices, 3);
        vertices[0] = b2Vec2_zero;
        vertices[1] = p5 - p4;
        vertices[2] = p6 - p4;
        poly2.Set(vertices, 3);
    } else {
        b2Vec2 vertices[3];
        vertices[0] = p1;
        vertices[1] = p3;
        vertices[2] = p2;
        poly1.Set(vertices, 3);
        vertices[0] = b2Vec2_zero;
        vertices[1] = p6 - p4;
        vertices[2] = p5 - p4;
        poly2.Set(vertices, 3);
    }
    fd1.shape = &poly1;
    fd2.shape = &poly2;

    b2BodyDef bd1, bd2;
    bd1.type = b2_dynamicBody;
    bd2.type = b2_dynamicBody;
    bd1.position = offset;
    bd2.position = p4 + offset;
    bd1.angularDamping = 10.0f;
    bd2.angularDamping = 10.0f;

    b2Body* body1 = w.CreateBody(&bd1);
    b2Body* body2 = w.CreateBody(&bd2);
    body1->CreateFixture(&fd1);
    body2->CreateFixture(&fd2);

    b2DistanceJointDef djd;
    djd.dampingRatio = 0.5f;
    djd.frequencyHz = 10.0f;

    djd.Initialize(body1, body2, p2 + offset, p5 + offset);
    w.CreateJoint(&djd);
    djd.Initialize(body1, body2, p3 + offset, p4 + offset);
    w.CreateJoint(&djd);
    djd.Initialize(body1, g_wheel, p3 + offset, wheelAnchor + offset);
    w.CreateJoint(&djd);
    djd.Initialize(body2, g_wheel, p6 + offset, wheelAnchor + offset);
    w.CreateJoint(&djd);

    b2RevoluteJointDef rjd;
    rjd.Initialize(body2, g_chassis, p4 + offset);
    w.CreateJoint(&rjd);
}

static void theo_jansen() {
    b2World w(b2Vec2(0, -10));
    b2Vec2 offset(0.0f, 8.0f);
    b2Vec2 pivot(0.0f, 0.8f);
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-50.0f, 0.0f), b2Vec2(50.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(-50.0f, 0.0f), b2Vec2(-50.0f, 10.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(50.0f, 0.0f), b2Vec2(50.0f, 10.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    for (int i = 0; i < 40; ++i) {
        b2CircleShape shape;
        shape.m_radius = 0.25f;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-40.0f + 2.0f * i, 0.5f);
        w.CreateBody(&bd)->CreateFixture(&shape, 1.0f);
    }
    {
        b2PolygonShape shape;
        shape.SetAsBox(2.5f, 1.0f);
        b2FixtureDef sd;
        sd.density = 1.0f;
        sd.shape = &shape;
        sd.filter.groupIndex = -1;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position = pivot + offset;
        g_chassis = w.CreateBody(&bd);
        g_chassis->CreateFixture(&sd);
    }
    {
        b2CircleShape shape;
        shape.m_radius = 1.6f;
        b2FixtureDef sd;
        sd.density = 1.0f;
        sd.shape = &shape;
        sd.filter.groupIndex = -1;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position = pivot + offset;
        g_wheel = w.CreateBody(&bd);
        g_wheel->CreateFixture(&sd);
    }
    {
        b2RevoluteJointDef jd;
        jd.Initialize(g_wheel, g_chassis, pivot + offset);
        jd.collideConnected = false;
        jd.motorSpeed = 2.0f;
        jd.maxMotorTorque = 400.0f;
        jd.enableMotor = true;
        w.CreateJoint(&jd);
    }
    b2Vec2 wheelAnchor = pivot + b2Vec2(0.0f, -0.8f);

    createLeg(w, -1.0f, wheelAnchor, offset);
    createLeg(w, 1.0f, wheelAnchor, offset);

    g_wheel->SetTransform(g_wheel->GetPosition(), 120.0f * b2_pi / 180.0f);
    createLeg(w, -1.0f, wheelAnchor, offset);
    createLeg(w, 1.0f, wheelAnchor, offset);

    g_wheel->SetTransform(g_wheel->GetPosition(), -120.0f * b2_pi / 180.0f);
    createLeg(w, -1.0f, wheelAnchor, offset);
    createLeg(w, 1.0f, wheelAnchor, offset);

    // scenes.theo_jansen builds the wheel unrotated with per-batch local
    // anchors; reset the angle so the initial states coincide.
    g_wheel->SetTransform(g_wheel->GetPosition(), 0.0f);
    run(w, 240);
}

// VaryingFriction.h verbatim.
static void varying_friction() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    struct Ramp { float x, y, a, hx, hy; };
    const Ramp ramps[5] = {{-4.0f, 22.0f, -0.25f, 13.0f, 0.25f},
                           {10.5f, 19.0f, 0.0f, 0.25f, 1.0f},
                           {4.0f, 14.0f, 0.25f, 13.0f, 0.25f},
                           {-10.5f, 11.0f, 0.0f, 0.25f, 1.0f},
                           {-4.0f, 6.0f, -0.25f, 13.0f, 0.25f}};
    for (int i = 0; i < 5; ++i) {
        b2BodyDef bd;
        bd.position.Set(ramps[i].x, ramps[i].y);
        bd.angle = ramps[i].a;
        b2Body* ground = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(ramps[i].hx, ramps[i].hy);
        ground->CreateFixture(&shape, 0.0f);
    }
    const float friction[5] = {0.75f, 0.5f, 0.35f, 0.1f, 0.0f};
    for (int i = 0; i < 5; ++i) {
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 0.5f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 25.0f;
        fd.friction = friction[i];
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-15.0f + 4.0f * i, 28.0f);
        w.CreateBody(&bd)->CreateFixture(&fd);
    }
    run(w, 300);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "theo_jansen")) theo_jansen();
    else if (!strcmp(argv[1], "varying_friction")) varying_friction();
    else return 2;
    return 0;
}
