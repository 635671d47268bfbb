// Golden traces for wheel + pulley joints.
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
        printf("[%.9g,%.9g,%.9g,0,0,0,%d]", p.x, p.y, b->GetAngle(), b->IsAwake()?1:0);
    }
    printf("]}\n");
}
int main(int argc, char** argv) {
    b2Vec2 gravity(0, -10);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    if (!strcmp(argv[1], "wheel")) {
        b2EdgeShape ge; ge.Set(b2Vec2(-40, 0), b2Vec2(40, 0));
        ground->CreateFixture(&ge, 0.0f);
        b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(0.0f, 1.0f);
        b2Body* wheel = world.CreateBody(&bd);
        b2CircleShape c; c.m_radius = 0.4f;
        b2FixtureDef fd; fd.shape = &c; fd.density = 1.0f; fd.friction = 0.9f;
        wheel->CreateFixture(&fd);
        b2BodyDef cd; cd.type = b2_dynamicBody; cd.position.Set(0.0f, 2.0f);
        b2Body* chassis = world.CreateBody(&cd);
        b2PolygonShape box; box.SetAsBox(1.0f, 0.25f);
        chassis->CreateFixture(&box, 1.0f);
        b2WheelJointDef jd;
        jd.Initialize(chassis, wheel, wheel->GetPosition(), b2Vec2(0, 1));
        jd.motorSpeed = -10.0f; jd.maxMotorTorque = 20.0f; jd.enableMotor = true;
        jd.frequencyHz = 4.0f; jd.dampingRatio = 0.7f;
        world.CreateJoint(&jd);
    } else {
        b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(-2.0f, 5.0f);
        b2Body* a = world.CreateBody(&bd);
        b2PolygonShape box; box.SetAsBox(0.5f, 0.5f);
        a->CreateFixture(&box, 5.0f);
        b2BodyDef bd2; bd2.type = b2_dynamicBody; bd2.position.Set(2.0f, 5.0f);
        b2Body* b = world.CreateBody(&bd2);
        b2PolygonShape box2; box2.SetAsBox(0.5f, 1.0f);
        b->CreateFixture(&box2, 5.0f);
        b2PulleyJointDef jd;
        jd.Initialize(a, b, b2Vec2(-2, 10), b2Vec2(2, 10),
                      a->GetPosition() + b2Vec2(0, 0.5f),
                      b->GetPosition() + b2Vec2(0, 1.0f), 1.5f);
        world.CreateJoint(&jd);
    }
    for (int i = 0; i < 240; ++i) { world.Step(1.0f/60.0f, 8, 3, g_exec); dumpStep(world, i); }
    return 0;
}
