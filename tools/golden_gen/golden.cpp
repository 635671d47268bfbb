// Golden-trace driver: runs reference scenes and dumps per-step body states
// with full float precision for use as test fixtures in the TPU build.
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
        b2Vec2 v = b->GetLinearVelocity();
        printf("[%.9g,%.9g,%.9g,%.9g,%.9g,%.9g,%d]", p.x, p.y, b->GetAngle(),
               v.x, v.y, b->GetAngularVelocity(), b->IsAwake() ? 1 : 0);
    }
    printf("]}\n");
}

static void helloWorld(int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef groundBodyDef;
    groundBodyDef.position.Set(0.0f, -10.0f);
    b2Body* groundBody = world.CreateBody(&groundBodyDef);
    b2PolygonShape groundBox;
    groundBox.SetAsBox(50.0f, 10.0f);
    groundBody->CreateFixture(&groundBox, 0.0f);
    b2BodyDef bodyDef;
    bodyDef.type = b2_dynamicBody;
    bodyDef.position.Set(0.0f, 4.0f);
    b2Body* body = world.CreateBody(&bodyDef);
    b2PolygonShape dynamicBox;
    dynamicBox.SetAsBox(1.0f, 1.0f);
    b2FixtureDef fixtureDef;
    fixtureDef.shape = &dynamicBox;
    fixtureDef.density = 1.0f;
    fixtureDef.friction = 0.3f;
    body->CreateFixture(&fixtureDef);
    float32 timeStep = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) {
        world.Step(timeStep, 6, 2, g_exec);
        dumpStep(world, i);
    }
}

static void fallingCircle(int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd; gd.position.Set(0.0f, -10.0f);
    b2Body* ground = world.CreateBody(&gd);
    b2PolygonShape gb; gb.SetAsBox(50.0f, 10.0f);
    ground->CreateFixture(&gb, 0.0f);
    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(0.0f, 4.0f);
    b2Body* body = world.CreateBody(&bd);
    b2CircleShape c; c.m_radius = 0.5f;
    b2FixtureDef fd; fd.shape = &c; fd.density = 1.0f; fd.friction = 0.3f; fd.restitution = 0.5f;
    body->CreateFixture(&fd);
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 6, 2, g_exec); dumpStep(world, i); }
}

static void verticalStack(int n, int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd;
    b2Body* ground = world.CreateBody(&gd);
    b2EdgeShape ge; ge.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
    ground->CreateFixture(&ge, 0.0f);
    for (int i = 0; i < n; ++i) {
        b2BodyDef bd; bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 0.502f + 1.01f * i);
        b2Body* body = world.CreateBody(&bd);
        b2PolygonShape box; box.SetAsBox(0.5f, 0.5f);
        b2FixtureDef fd; fd.shape = &box; fd.density = 1.0f; fd.friction = 0.3f;
        body->CreateFixture(&fd);
    }
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 8, 3, g_exec); dumpStep(world, i); }
}

static void pyramid(int rows, int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd;
    b2Body* ground = world.CreateBody(&gd);
    b2EdgeShape ge; ge.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
    ground->CreateFixture(&ge, 0.0f);
    float32 a = 0.5f;
    b2PolygonShape shape; shape.SetAsBox(a, a);
    b2Vec2 x(-7.0f, 0.75f);
    b2Vec2 y, deltaX(0.5625f, 1.25f), deltaY(1.125f, 0.0f);
    for (int i = 0; i < rows; ++i) {
        y = x;
        for (int j = i; j < rows; ++j) {
            b2BodyDef bd; bd.type = b2_dynamicBody; bd.position = y;
            b2Body* body = world.CreateBody(&bd);
            body->CreateFixture(&shape, 5.0f);
            y += deltaY;
        }
        x += deltaX;
    }
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 8, 3, g_exec); dumpStep(world, i); }
}

static void revoluteSwing(int steps) {
    // pendulum: box on a revolute joint swinging under gravity
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(3.0f, 10.0f);
    b2Body* body = world.CreateBody(&bd);
    b2PolygonShape box; box.SetAsBox(0.5f, 0.5f);
    body->CreateFixture(&box, 5.0f);
    b2RevoluteJointDef jd;
    jd.Initialize(ground, body, b2Vec2(0.0f, 10.0f));
    world.CreateJoint(&jd);
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 8, 3, g_exec); dumpStep(world, i); }
}

static void distancePair(int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(2.0f, 8.0f);
    b2Body* body = world.CreateBody(&bd);
    b2CircleShape c; c.m_radius = 0.5f;
    body->CreateFixture(&c, 1.0f);
    b2DistanceJointDef jd;
    jd.Initialize(ground, body, b2Vec2(0.0f, 10.0f), body->GetPosition());
    world.CreateJoint(&jd);
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 8, 3, g_exec); dumpStep(world, i); }
}

static void prismaticSlide(int steps) {
    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(0.0f, 10.0f);
    bd.angle = 0.5f;
    b2Body* body = world.CreateBody(&bd);
    b2PolygonShape box; box.SetAsBox(2.0f, 0.5f);
    body->CreateFixture(&box, 5.0f);
    b2PrismaticJointDef jd;
    b2Vec2 axis(2.0f, 1.0f); axis.Normalize();
    jd.Initialize(ground, body, b2Vec2(0.0f, 10.0f), axis);
    jd.motorSpeed = 1.0f; jd.maxMotorForce = 100.0f; jd.enableMotor = true;
    jd.lowerTranslation = -5.0f; jd.upperTranslation = 5.0f; jd.enableLimit = true;
    world.CreateJoint(&jd);
    float32 dt = 1.0f / 60.0f;
    for (int i = 0; i < steps; ++i) { world.Step(dt, 8, 3, g_exec); dumpStep(world, i); }
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "helloworld")) helloWorld(argc > 2 ? atoi(argv[2]) : 60);
    else if (!strcmp(argv[1], "circle")) fallingCircle(argc > 2 ? atoi(argv[2]) : 120);
    else if (!strcmp(argv[1], "stack")) verticalStack(argc > 2 ? atoi(argv[2]) : 5, argc > 3 ? atoi(argv[3]) : 240);
    else if (!strcmp(argv[1], "pyramid")) pyramid(argc > 2 ? atoi(argv[2]) : 10, argc > 3 ? atoi(argv[3]) : 240);
    else if (!strcmp(argv[1], "revolute")) revoluteSwing(argc > 2 ? atoi(argv[2]) : 240);
    else if (!strcmp(argv[1], "distance")) distancePair(argc > 2 ? atoi(argv[2]) : 240);
    else if (!strcmp(argv[1], "prismatic")) prismaticSlide(argc > 2 ? atoi(argv[2]) : 240);
    else return 1;
    return 0;
}
