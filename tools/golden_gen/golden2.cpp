// Golden traces for weld/friction/rope/motor joints.
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
        printf("[%.9g,%.9g,%.9g,%.9g,%.9g,%.9g,%d]", p.x, p.y, b->GetAngle(),
               b->GetLinearVelocity().x, b->GetLinearVelocity().y,
               b->GetAngularVelocity(), b->IsAwake() ? 1 : 0);
    }
    printf("]}\n");
}
int main(int argc, char** argv) {
    b2Vec2 gravity(0, -10);
    b2World world(gravity);
    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    const char* kind = argv[1];
    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(2.0f, 8.0f);
    b2Body* body = world.CreateBody(&bd);
    b2PolygonShape box; box.SetAsBox(0.5f, 0.5f);
    body->CreateFixture(&box, 5.0f);
    if (!strcmp(kind, "weld")) {
        b2BodyDef bd2; bd2.type = b2_dynamicBody; bd2.position.Set(3.0f, 8.0f);
        b2Body* b2_ = world.CreateBody(&bd2);
        b2_->CreateFixture(&box, 5.0f);
        b2RevoluteJointDef rd; rd.Initialize(ground, body, b2Vec2(2.0f, 9.0f));
        world.CreateJoint(&rd);
        b2WeldJointDef jd; jd.Initialize(body, b2_, b2Vec2(2.5f, 8.0f));
        world.CreateJoint(&jd);
    } else if (!strcmp(kind, "weldsoft")) {
        b2BodyDef bd2; bd2.type = b2_dynamicBody; bd2.position.Set(3.0f, 8.0f);
        b2Body* b2_ = world.CreateBody(&bd2);
        b2_->CreateFixture(&box, 5.0f);
        b2RevoluteJointDef rd; rd.Initialize(ground, body, b2Vec2(2.0f, 9.0f));
        world.CreateJoint(&rd);
        b2WeldJointDef jd; jd.Initialize(body, b2_, b2Vec2(2.5f, 8.0f));
        jd.frequencyHz = 4.0f; jd.dampingRatio = 0.5f;
        world.CreateJoint(&jd);
    } else if (!strcmp(kind, "friction")) {
        world.SetGravity(b2Vec2(0, 0));
        body->SetLinearVelocity(b2Vec2(8.0f, 3.0f));
        body->SetAngularVelocity(5.0f);
        b2FrictionJointDef jd;
        jd.bodyA = ground; jd.bodyB = body;
        jd.localAnchorA.SetZero(); jd.localAnchorB.SetZero();
        jd.maxForce = 10.0f; jd.maxTorque = 10.0f;
        world.CreateJoint(&jd);
    } else if (!strcmp(kind, "rope")) {
        b2RopeJointDef jd;
        jd.bodyA = ground; jd.bodyB = body;
        jd.localAnchorA.Set(0.0f, 10.0f); jd.localAnchorB.Set(0.0f, 0.0f);
        jd.maxLength = 5.0f;
        world.CreateJoint(&jd);
    } else if (!strcmp(kind, "motor")) {
        b2MotorJointDef jd;
        jd.Initialize(ground, body);
        jd.maxForce = 1000.0f; jd.maxTorque = 1000.0f;
        world.CreateJoint(&jd);
        body->SetLinearVelocity(b2Vec2(5.0f, 0.0f));
    }
    for (int i = 0; i < 240; ++i) { world.Step(1.0f/60.0f, 8, 3, g_exec); dumpStep(world, i); }
    return 0;
}
