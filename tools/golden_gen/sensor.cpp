// Golden begin/end-touch steps for a sensor: circle free-falls through a
// static sensor box (SensorTest.h-style semantics, no motion coupling).
#include <Box2D/Box2D.h>
#include <cstdio>
static b2ThreadPoolTaskExecutor g_exec;

struct Listener : b2ContactListener {
    int step = -1;
    void BeginContact(b2Contact*) override { printf("{\"step\":%d,\"ev\":\"begin\"}\n", step); }
    void EndContact(b2Contact*) override { printf("{\"step\":%d,\"ev\":\"end\"}\n", step); }
    // MT fork immediate quartet: true defers to the user-thread callback
    bool BeginContactImmediate(b2Contact*, uint32) override { return true; }
    bool EndContactImmediate(b2Contact*, uint32) override { return true; }
    bool PreSolveImmediate(b2Contact*, const b2Manifold*, uint32) override { return false; }
    bool PostSolveImmediate(b2Contact*, const b2ContactImpulse*, uint32) override { return false; }
};

int main() {
    b2Vec2 gravity(0, -10);
    b2World world(gravity);
    Listener lst;
    world.SetContactListener(&lst);

    b2BodyDef gd; b2Body* ground = world.CreateBody(&gd);
    b2EdgeShape ge; ge.Set(b2Vec2(-40, 0), b2Vec2(40, 0));
    ground->CreateFixture(&ge, 0.0f);

    b2BodyDef sd; sd.position.Set(0.0f, 6.0f);
    b2Body* sensorBody = world.CreateBody(&sd);
    b2PolygonShape sb; sb.SetAsBox(2.0f, 1.0f);
    b2FixtureDef sfd; sfd.shape = &sb; sfd.isSensor = true;
    sensorBody->CreateFixture(&sfd);

    b2BodyDef bd; bd.type = b2_dynamicBody; bd.position.Set(0.0f, 12.0f);
    b2Body* ball = world.CreateBody(&bd);
    b2CircleShape c; c.m_radius = 0.5f;
    b2FixtureDef fd; fd.shape = &c; fd.density = 1.0f;
    ball->CreateFixture(&fd);

    for (int i = 0; i < 180; ++i) {
        lst.step = i;
        world.Step(1.0f/60.0f, 8, 3, g_exec);
    }
    b2Vec2 p = ball->GetPosition();
    printf("{\"final\":[%.9g,%.9g]}\n", p.x, p.y);
    return 0;
}
