// Golden traces for scene-zoo wave 6: skier, chain_problem, edge_test.
// Original driver linked against the reference library (see README.md).
// Scenes mirror Testbed/Tests/{Skier.h, chainProblem.h, EdgeTest.h} with
// the deviations scenes.py documents (skier starts at the slope edge —
// the test teleports it there via mutate.set_transform; edge_test bodies
// have allowSleep=false to keep awake flags comparable indefinitely).
#include <Box2D/Box2D.h>
#include <cstdio>
#include <cstring>
#include <cmath>

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

// Skier.h terrain (PlatformWidth 8, slopes 30deg then +10deg, length 2,
// friction 0.2) + two-fixture skier (box torso, trapezoid ski with
// friction 0 / restitution 0.15), EnableCircularSkiTips=false. The skier
// starts at x=-0.7 (slope edge) instead of mid-platform.
static void skier() {
    b2World w(b2Vec2(0, -10));
    const float a1 = 30.0f * b2_pi / 180.0f;
    const float a2 = a1 + 10.0f * b2_pi / 180.0f;
    const float slope = 2.0f;
    b2Vec2 verts[4];
    verts[0].Set(-8.0f, 0.0f);
    verts[1].Set(0.0f, 0.0f);
    verts[2].Set(verts[1].x + slope * cosf(a1), verts[1].y - slope * sinf(a1));
    verts[3].Set(verts[2].x + slope * cosf(a2), verts[2].y - slope * sinf(a2));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        for (int i = 0; i < 3; ++i) {
            b2EdgeShape shape;
            shape.Set(verts[i], verts[i + 1]);
            if (i > 0) { shape.m_hasVertex0 = true; shape.m_vertex0 = verts[i - 1]; }
            if (i < 2) { shape.m_hasVertex3 = true; shape.m_vertex3 = verts[i + 2]; }
            b2FixtureDef fd;
            fd.shape = &shape;
            fd.density = 0.0f;
            fd.friction = 0.2f;
            ground->CreateFixture(&fd);
        }
    }
    {
        const float bodyW = 1.0f, bodyH = 2.5f, skiLen = 3.0f, skiT = 0.3f;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-0.7f, bodyH / 2 + skiT);
        b2Body* skier = w.CreateBody(&bd);

        b2PolygonShape body;
        body.SetAsBox(bodyW / 2, bodyH / 2);
        b2FixtureDef fd;
        fd.shape = &body;
        fd.density = 1.0f;
        skier->CreateFixture(&fd);

        b2PolygonShape ski;
        b2Vec2 sv[4];
        sv[0].Set(-skiLen / 2 - skiT, -bodyH / 2);
        sv[1].Set(-skiLen / 2, -bodyH / 2 - skiT);
        sv[2].Set(skiLen / 2, -bodyH / 2 - skiT);
        sv[3].Set(skiLen / 2 + skiT, -bodyH / 2);
        ski.Set(sv, 4);
        fd.shape = &ski;
        fd.friction = 0.0f;
        fd.restitution = 0.15f;
        skier->CreateFixture(&fd);

        skier->SetLinearVelocity(b2Vec2(0.5f, 0.0f));
    }
    run(w, 180);
}

// chainProblem.h dump verbatim: L-chain [(0,1),(0,0),(4,0)] + 1x6 bullet
// box at (0.6034, 3.0284), density 10, friction 0.2.
static void chain_problem() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2ChainShape shape;
        b2Vec2 vs[3];
        vs[0].Set(0.0f, 1.0f);
        vs[1].Set(0.0f, 0.0f);
        vs[2].Set(4.0f, 0.0f);
        shape.CreateChain(vs, 3);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.friction = 0.2f;
        ground->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.bullet = true;
        bd.position.Set(6.033980250358582e-01f, 3.028350114822388e+00f);
        b2Body* b = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 3.0f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 10.0f;
        fd.friction = 0.2f;
        b->CreateFixture(&fd);
    }
    run(w, 180);
}

// EdgeTest.h: six ghost-connected edges, circle r=0.5 and box 0.5x0.5
// dropped near internal vertices (allowSleep=false on the dynamics).
static void edge_test() {
    b2World w(b2Vec2(0, -10));
    b2Vec2 v[7] = {b2Vec2(-10.0f, 0.0f), b2Vec2(-7.0f, -2.0f),
                   b2Vec2(-4.0f, 0.0f), b2Vec2(0.0f, 0.0f),
                   b2Vec2(4.0f, 0.0f),  b2Vec2(7.0f, 2.0f),
                   b2Vec2(10.0f, 0.0f)};
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        for (int i = 0; i < 6; ++i) {
            b2EdgeShape shape;
            shape.Set(v[i], v[i + 1]);
            if (i > 0) { shape.m_hasVertex0 = true; shape.m_vertex0 = v[i - 1]; }
            if (i < 5) { shape.m_hasVertex3 = true; shape.m_vertex3 = v[i + 2]; }
            ground->CreateFixture(&shape, 0.0f);
        }
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-0.5f, 0.6f);
        bd.allowSleep = false;
        b2Body* b = w.CreateBody(&bd);
        b2CircleShape shape;
        shape.m_radius = 0.5f;
        b->CreateFixture(&shape, 1.0f);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(1.0f, 0.6f);
        bd.allowSleep = false;
        b2Body* b = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 0.5f);
        b->CreateFixture(&shape, 1.0f);
    }
    run(w, 120);
}

// BasicSliderCrank.h verbatim: ground pivot at (0,17), crank 4x1 at
// (-8,20), rod 8x1 at (4,20), fixed-rotation piston 3x3 at (12,20);
// three revolutes + one horizontal prismatic guide.
static void basic_slider_crank() {
    b2World w(b2Vec2(0, -10));
    b2Body* ground;
    {
        b2BodyDef bd;
        bd.position.Set(0.0f, 17.0f);
        ground = w.CreateBody(&bd);
    }
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

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "skier")) skier();
    else if (!strcmp(argv[1], "chain_problem")) chain_problem();
    else if (!strcmp(argv[1], "edge_test")) edge_test();
    else if (!strcmp(argv[1], "basic_slider_crank")) basic_slider_crank();
    else return 2;
    return 0;
}
