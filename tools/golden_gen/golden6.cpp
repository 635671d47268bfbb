// Golden traces for the round-3 CCD + zoo additions: bullet_test,
// continuous_test, bullet_on_stack (mini-island oracle), heavy_on_light_two,
// mobile_balanced(3), apply_force, character_collision, edge_shapes(8),
// poly_shapes(8). Original driver linked against the reference library (see
// README.md); scenes mirror models/scenes.py, which mirrors the Testbed
// sources cited there.
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

// BulletTest.h:26-67, x pinned to the recorded seed.
static void bullet_test() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape e;
        e.Set(b2Vec2(-10.0f, 0.0f), b2Vec2(10.0f, 0.0f));
        ground->CreateFixture(&e, 0.0f);
        b2PolygonShape shape;
        shape.SetAsBox(0.2f, 1.0f, b2Vec2(0.5f, 1.0f), 0.0f);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 4.0f);
        b2PolygonShape box;
        box.SetAsBox(2.0f, 0.1f);
        b2Body* plank = w.CreateBody(&bd);
        plank->CreateFixture(&box, 1.0f);

        box.SetAsBox(0.25f, 0.25f);
        bd.position.Set(0.20352793f, 10.0f);
        bd.bullet = true;
        b2Body* bullet = w.CreateBody(&bd);
        bullet->CreateFixture(&box, 100.0f);
        bullet->SetLinearVelocity(b2Vec2(0.0f, -50.0f));
    }
    run(w, 120);
}

// ContinuousTest.h:27-61, omega pinned to the recorded seed.
static void continuous_test() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape e;
        e.Set(b2Vec2(-10.0f, 0.0f), b2Vec2(10.0f, 0.0f));
        ground->CreateFixture(&e, 0.0f);
        b2PolygonShape shape;
        shape.SetAsBox(0.2f, 1.0f, b2Vec2(0.5f, 1.0f), 0.0f);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 20.0f);
        b2PolygonShape shape;
        shape.SetAsBox(2.0f, 0.1f);
        b2Body* plank = w.CreateBody(&bd);
        plank->CreateFixture(&shape, 1.0f);
        plank->SetLinearVelocity(b2Vec2(0.0f, -100.0f));
        plank->SetAngularVelocity(46.661274f);
    }
    run(w, 120);
}

// Mini-island oracle (scenes.bullet_on_stack): bullet into a stack base.
static void bullet_on_stack() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2PolygonShape box;
    box.SetAsBox(0.5f, 0.5f);
    for (int i = 0; i < 5; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 0.502f + 1.01f * i);
        b2Body* b = w.CreateBody(&bd);
        b2FixtureDef fd;
        fd.shape = &box;
        fd.density = 1.0f;
        fd.friction = 0.3f;
        b->CreateFixture(&fd);
    }
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position.Set(-20.0f, 1.0f);
    bd.bullet = true;
    b2Body* bullet = w.CreateBody(&bd);
    b2PolygonShape small;
    small.SetAsBox(0.25f, 0.25f);
    bullet->CreateFixture(&small, 20.0f);
    bullet->SetLinearVelocity(b2Vec2(80.0f, 0.0f));
    run(w, 120);
}

// HeavyOnLightTwo.h:27-71 with the heavy circle present from step 0.
static void heavy_on_light_two() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2CircleShape light;
    light.m_radius = 0.5f;
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position.Set(0.0f, 2.5f);
    w.CreateBody(&bd)->CreateFixture(&light, 10.0f);
    bd.position.Set(0.0f, 3.5f);
    w.CreateBody(&bd)->CreateFixture(&light, 10.0f);
    bd.position.Set(0.0f, 9.0f);
    b2CircleShape heavy;
    heavy.m_radius = 5.0f;
    w.CreateBody(&bd)->CreateFixture(&heavy, 10.0f);
    run(w, 240);
}

// MobileBalanced.h (depth 3): crossbar fixture on non-leaf nodes.
static b2Body* mb_addNode(b2World& w, b2Body* parent,
                          const b2Vec2& localAnchor, int depth, float offset,
                          float a, int maxDepth) {
    const float density = 20.0f;
    b2Vec2 h(0.0f, a);
    b2Vec2 p = parent->GetPosition() + localAnchor - h;

    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position = p;
    b2Body* body = w.CreateBody(&bd);

    b2PolygonShape shape;
    shape.SetAsBox(0.25f * a, a);
    body->CreateFixture(&shape, density);

    if (depth == maxDepth) return body;

    shape.SetAsBox(offset, 0.25f * a, b2Vec2(0, -a), 0.0f);
    body->CreateFixture(&shape, density);

    b2Vec2 a1(offset, -a);
    b2Vec2 a2(-offset, -a);
    b2Body* body1 = mb_addNode(w, body, a1, depth + 1, 0.5f * offset, a,
                               maxDepth);
    b2Body* body2 = mb_addNode(w, body, a2, depth + 1, 0.5f * offset, a,
                               maxDepth);

    b2RevoluteJointDef jd;
    jd.bodyA = body;
    jd.localAnchorB = h;
    jd.localAnchorA = a1;
    jd.bodyB = body1;
    w.CreateJoint(&jd);
    jd.localAnchorA = a2;
    jd.bodyB = body2;
    w.CreateJoint(&jd);
    return body;
}

static void mobile_balanced() {
    b2World w(b2Vec2(0, -10));
    b2BodyDef gd;
    gd.position.Set(0.0f, 20.0f);
    b2Body* ground = w.CreateBody(&gd);

    const float a = 0.5f;
    b2Body* root = mb_addNode(w, ground, b2Vec2_zero, 0, 3.0f, a, 3);
    b2RevoluteJointDef jd;
    jd.bodyA = ground;
    jd.bodyB = root;
    jd.localAnchorA.SetZero();
    jd.localAnchorB = b2Vec2(0.0f, a);
    w.CreateJoint(&jd);
    run(w, 240);
}

// ApplyForce.h:27-144 (no user forces applied; the scene itself is the
// oracle: restitution walls + damped ship + friction-joint-pinned boxes).
static void apply_force() {
    b2World w(b2Vec2(0.0f, 0.0f));
    const float k_rest = 0.4f;
    b2Body* ground;
    {
        b2BodyDef bd;
        bd.position.Set(0.0f, 20.0f);
        ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        b2FixtureDef sd;
        sd.shape = &shape;
        sd.density = 0.0f;
        sd.restitution = k_rest;
        shape.Set(b2Vec2(-20.0f, -20.0f), b2Vec2(-20.0f, 20.0f));
        ground->CreateFixture(&sd);
        shape.Set(b2Vec2(20.0f, -20.0f), b2Vec2(20.0f, 20.0f));
        ground->CreateFixture(&sd);
        shape.Set(b2Vec2(-20.0f, 20.0f), b2Vec2(20.0f, 20.0f));
        ground->CreateFixture(&sd);
        shape.Set(b2Vec2(-20.0f, -20.0f), b2Vec2(20.0f, -20.0f));
        ground->CreateFixture(&sd);
    }
    {
        b2Transform xf1;
        xf1.q.Set(0.3524f * b2_pi);
        xf1.p = xf1.q.GetXAxis();
        b2Vec2 vertices[3];
        vertices[0] = b2Mul(xf1, b2Vec2(-1.0f, 0.0f));
        vertices[1] = b2Mul(xf1, b2Vec2(1.0f, 0.0f));
        vertices[2] = b2Mul(xf1, b2Vec2(0.0f, 0.5f));
        b2PolygonShape poly1;
        poly1.Set(vertices, 3);
        b2FixtureDef sd1;
        sd1.shape = &poly1;
        sd1.density = 4.0f;

        b2Transform xf2;
        xf2.q.Set(-0.3524f * b2_pi);
        xf2.p = -xf2.q.GetXAxis();
        vertices[0] = b2Mul(xf2, b2Vec2(-1.0f, 0.0f));
        vertices[1] = b2Mul(xf2, b2Vec2(1.0f, 0.0f));
        vertices[2] = b2Mul(xf2, b2Vec2(0.0f, 0.5f));
        b2PolygonShape poly2;
        poly2.Set(vertices, 3);
        b2FixtureDef sd2;
        sd2.shape = &poly2;
        sd2.density = 2.0f;

        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.angularDamping = 2.0f;
        bd.linearDamping = 0.5f;
        bd.position.Set(0.0f, 2.0f);
        bd.angle = b2_pi;
        bd.allowSleep = false;
        b2Body* ship = w.CreateBody(&bd);
        ship->CreateFixture(&sd1);
        ship->CreateFixture(&sd2);
    }
    {
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 0.5f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 1.0f;
        fd.friction = 0.3f;
        for (int i = 0; i < 10; ++i) {
            b2BodyDef bd;
            bd.type = b2_dynamicBody;
            bd.position.Set(0.0f, 5.0f + 1.54f * i);
            b2Body* body = w.CreateBody(&bd);
            body->CreateFixture(&fd);
            float gravity = 10.0f;
            float I = body->GetInertia();
            float mass = body->GetMass();
            float radius = b2Sqrt(2.0f * I / mass);
            b2FrictionJointDef jd;
            jd.localAnchorA.SetZero();
            jd.localAnchorB.SetZero();
            jd.bodyA = ground;
            jd.bodyB = body;
            jd.collideConnected = true;
            jd.maxForce = mass * gravity;
            jd.maxTorque = mass * radius * gravity;
            w.CreateJoint(&jd);
        }
    }
    run(w, 240);
}

// CharacterCollision.h:28-226.
static void character_collision() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-20.0f, 0.0f), b2Vec2(20.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-8.0f, 1.0f), b2Vec2(-6.0f, 1.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(-6.0f, 1.0f), b2Vec2(-4.0f, 1.0f));
        ground->CreateFixture(&shape, 0.0f);
        shape.Set(b2Vec2(-4.0f, 1.0f), b2Vec2(-2.0f, 1.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.angle = 0.25f * b2_pi;
        b2Body* ground = w.CreateBody(&bd);
        b2Vec2 vs[4];
        vs[0].Set(5.0f, 7.0f);
        vs[1].Set(6.0f, 8.0f);
        vs[2].Set(7.0f, 8.0f);
        vs[3].Set(8.0f, 7.0f);
        b2ChainShape shape;
        shape.CreateChain(vs, 4);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(1.0f, 1.0f, b2Vec2(4.0f, 3.0f), 0.0f);
        ground->CreateFixture(&shape, 0.0f);
        shape.SetAsBox(1.0f, 1.0f, b2Vec2(6.0f, 3.0f), 0.0f);
        ground->CreateFixture(&shape, 0.0f);
        shape.SetAsBox(1.0f, 1.0f, b2Vec2(8.0f, 3.0f), 0.0f);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2Vec2 vs[4];
        vs[0].Set(-1.0f, 3.0f);
        vs[1].Set(1.0f, 3.0f);
        vs[2].Set(1.0f, 5.0f);
        vs[3].Set(-1.0f, 5.0f);
        b2ChainShape shape;
        shape.CreateLoop(vs, 4);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-10.0f, 4.0f);
        b2Body* ground = w.CreateBody(&bd);
        b2Vec2 vs[10];
        vs[0].Set(0.0f, 0.0f);
        vs[1].Set(6.0f, 0.0f);
        vs[2].Set(6.0f, 2.0f);
        vs[3].Set(4.0f, 1.0f);
        vs[4].Set(2.0f, 2.0f);
        vs[5].Set(0.0f, 2.0f);
        vs[6].Set(-2.0f, 2.0f);
        vs[7].Set(-4.0f, 3.0f);
        vs[8].Set(-6.0f, 2.0f);
        vs[9].Set(-6.0f, 0.0f);
        b2ChainShape shape;
        shape.CreateLoop(vs, 10);
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-3.0f, 8.0f);
        bd.type = b2_dynamicBody;
        bd.fixedRotation = true;
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.5f, 0.5f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        body->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-5.0f, 5.0f);
        bd.type = b2_dynamicBody;
        bd.fixedRotation = true;
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(0.25f, 0.25f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        body->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-5.0f, 8.0f);
        bd.type = b2_dynamicBody;
        bd.fixedRotation = true;
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        float angle = 0.0f;
        const float delta = b2_pi / 3.0f;
        b2Vec2 vertices[6];
        for (int i = 0; i < 6; ++i) {
            vertices[i].Set(0.5f * cosf(angle), 0.5f * sinf(angle));
            angle += delta;
        }
        b2PolygonShape shape;
        shape.Set(vertices, 6);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        body->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(3.0f, 5.0f);
        bd.type = b2_dynamicBody;
        bd.fixedRotation = true;
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        b2CircleShape shape;
        shape.m_radius = 0.5f;
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        body->CreateFixture(&fd);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-7.0f, 6.0f);
        bd.type = b2_dynamicBody;
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        b2CircleShape shape;
        shape.m_radius = 0.25f;
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.density = 20.0f;
        fd.friction = 1.0f;
        body->CreateFixture(&fd);
    }
    run(w, 240);
}

// Shared deterministic spawn table (mirrors scenes._SPAWN_XS).
static const float kSpawnXs[20] = {
    -8.3f, 4.1f, -1.7f, 7.9f, -5.2f, 2.6f, -9.1f, 0.4f, 6.3f, -3.8f,
    8.7f, -6.9f, 1.2f, -0.6f, 5.5f, -7.4f, 3.3f, 9.6f, -2.1f, -4.4f};

static void fiveShapeZoo(b2PolygonShape polys[4], b2CircleShape* circle) {
    {
        b2Vec2 vertices[3];
        vertices[0].Set(-0.5f, 0.0f);
        vertices[1].Set(0.5f, 0.0f);
        vertices[2].Set(0.0f, 1.5f);
        polys[0].Set(vertices, 3);
    }
    {
        b2Vec2 vertices[3];
        vertices[0].Set(-0.1f, 0.0f);
        vertices[1].Set(0.1f, 0.0f);
        vertices[2].Set(0.0f, 1.5f);
        polys[1].Set(vertices, 3);
    }
    {
        float w = 1.0f;
        float b = w / (2.0f + b2Sqrt(2.0f));
        float s = b2Sqrt(2.0f) * b;
        b2Vec2 vertices[8];
        vertices[0].Set(0.5f * s, 0.0f);
        vertices[1].Set(0.5f * w, b);
        vertices[2].Set(0.5f * w, b + s);
        vertices[3].Set(0.5f * s, w);
        vertices[4].Set(-0.5f * s, w);
        vertices[5].Set(-0.5f * w, b + s);
        vertices[6].Set(-0.5f * w, b);
        vertices[7].Set(-0.5f * s, 0.0f);
        polys[2].Set(vertices, 8);
    }
    polys[3].SetAsBox(0.5f, 0.5f);
    circle->m_radius = 0.5f;
}

// EdgeShapes.h:55-120 terrain + deterministic spawns (8 bodies).
static void edge_shapes() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        float x1 = -20.0f;
        float y1 = 2.0f * cosf(x1 / 10.0f * b2_pi);
        for (int i = 0; i < 80; ++i) {
            float x2 = x1 + 0.5f;
            float y2 = 2.0f * cosf(x2 / 10.0f * b2_pi);
            b2EdgeShape shape;
            shape.Set(b2Vec2(x1, y1), b2Vec2(x2, y2));
            ground->CreateFixture(&shape, 0.0f);
            x1 = x2;
            y1 = y2;
        }
    }
    b2PolygonShape polys[4];
    b2CircleShape circle;
    fiveShapeZoo(polys, &circle);
    for (int i = 0; i < 8; ++i) {
        int k = i % 5;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kSpawnXs[i % 20], 10.0f);
        bd.angle = (float)(fmod(i * 0.7, 2.0 * M_PI) - M_PI);
        if (k == 4) bd.angularDamping = 0.02f;
        b2Body* body = w.CreateBody(&bd);
        b2FixtureDef fd;
        fd.density = 20.0f;
        fd.friction = 0.3f;
        if (k < 4)
            fd.shape = &polys[k];
        else
            fd.shape = &circle;
        body->CreateFixture(&fd);
    }
    run(w, 240);
}

// PolyShapes.h:112-210 flat ground + deterministic spawns (8 bodies).
static void poly_shapes() {
    b2World w(b2Vec2(0, -10));
    edgeGround(w, -40, 40);
    b2PolygonShape polys[4];
    b2CircleShape circle;
    fiveShapeZoo(polys, &circle);
    for (int i = 0; i < 8; ++i) {
        int k = i % 5;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kSpawnXs[(i * 3 + 1) % 20] * 0.2f, 1.0f + 1.2f * i);
        bd.angle = (float)(fmod(i * 1.1, 2.0 * M_PI) - M_PI);
        b2Body* body = w.CreateBody(&bd);
        b2FixtureDef fd;
        fd.density = 1.0f;
        fd.friction = 0.3f;
        if (k < 4)
            fd.shape = &polys[k];
        else
            fd.shape = &circle;
        body->CreateFixture(&fd);
    }
    run(w, 240);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "bullet_test")) bullet_test();
    else if (!strcmp(argv[1], "continuous_test")) continuous_test();
    else if (!strcmp(argv[1], "bullet_on_stack")) bullet_on_stack();
    else if (!strcmp(argv[1], "heavy_on_light_two")) heavy_on_light_two();
    else if (!strcmp(argv[1], "mobile_balanced")) mobile_balanced();
    else if (!strcmp(argv[1], "apply_force")) apply_force();
    else if (!strcmp(argv[1], "character_collision")) character_collision();
    else if (!strcmp(argv[1], "edge_shapes")) edge_shapes();
    else if (!strcmp(argv[1], "poly_shapes")) poly_shapes();
    else return 2;
    return 0;
}
