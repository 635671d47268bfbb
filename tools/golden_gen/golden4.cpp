// Golden traces for the gear joint (gear train: two revolute circle gears
// coupled 2:1 plus a prismatic rack coupled -1/r2 to the big gear).
#include <Box2D/Box2D.h>
#include <cstdio>
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
int main() {
    b2Vec2 gravity(0, -10);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    b2EdgeShape ge; ge.Set(b2Vec2(-40, 0), b2Vec2(40, 0));
    ground->CreateFixture(&ge, 0.0f);

    b2BodyDef bd1; bd1.type = b2_dynamicBody; bd1.position.Set(-3.5f, 12.0f);
    bd1.angularVelocity = 2.0f;
    b2Body* g1 = world.CreateBody(&bd1);
    b2CircleShape c1; c1.m_radius = 1.0f;
    b2FixtureDef fd1; fd1.shape = &c1; fd1.density = 5.0f;
    g1->CreateFixture(&fd1);

    b2BodyDef bd2; bd2.type = b2_dynamicBody; bd2.position.Set(0.0f, 12.0f);
    b2Body* g2 = world.CreateBody(&bd2);
    b2CircleShape c2; c2.m_radius = 2.0f;
    b2FixtureDef fd2; fd2.shape = &c2; fd2.density = 5.0f;
    g2->CreateFixture(&fd2);

    b2BodyDef bd3; bd3.type = b2_dynamicBody; bd3.position.Set(3.0f, 12.0f);
    b2Body* rack = world.CreateBody(&bd3);
    b2PolygonShape rb; rb.SetAsBox(0.25f, 1.5f);
    b2FixtureDef fd3; fd3.shape = &rb; fd3.density = 5.0f;
    rack->CreateFixture(&fd3);

    b2RevoluteJointDef rjd1; rjd1.Initialize(ground, g1, g1->GetPosition());
    b2Joint* rev1 = world.CreateJoint(&rjd1);
    b2RevoluteJointDef rjd2; rjd2.Initialize(ground, g2, g2->GetPosition());
    b2Joint* rev2 = world.CreateJoint(&rjd2);
    b2PrismaticJointDef pjd;
    pjd.Initialize(ground, rack, rack->GetPosition(), b2Vec2(0, 1));
    pjd.lowerTranslation = -5.0f; pjd.upperTranslation = 5.0f;
    pjd.enableLimit = true;
    b2Joint* prism = world.CreateJoint(&pjd);

    b2GearJointDef gjd1;
    gjd1.bodyA = g1; gjd1.bodyB = g2;
    gjd1.joint1 = rev1; gjd1.joint2 = rev2; gjd1.ratio = 2.0f;
    world.CreateJoint(&gjd1);
    b2GearJointDef gjd2;
    gjd2.bodyA = g2; gjd2.bodyB = rack;
    gjd2.joint1 = rev2; gjd2.joint2 = prism; gjd2.ratio = -0.5f;
    world.CreateJoint(&gjd2);

    for (int i = 0; i < 240; ++i) {
        world.Step(1.0f/60.0f, 8, 3, g_exec);
        dumpStep(world, i);
    }
    return 0;
}
