// Golden traces for scene-zoo wave 7: the hook/mutation-driven scenes.
// Original driver linked against the reference library (see README.md).
// Scenes mirror models/scenes.py; the interactive drives (PreSolve hooks,
// runtime fixture/body mutation) are scripted identically on both sides:
//   add_pair(50, seed=7)        — broad-phase AddPair stress (pure physics)
//   conveyor_belt               — SetTangentSpeed(+-5) on platform contacts
//                                 (ConveyorBelt.h:67-84 rule)
//   one_sided_platform          — disable platform contact while the actor
//                                 center is below the platform top (the
//                                 zoo scene's center-y rule, mirrored here)
//   shape_editing               — create circle fixture before step 60,
//                                 SetSensor(true) before 120, destroy
//                                 before 180 (ShapeEditing.h 'C'/'S'/'D')
//   breakable                   — reference PostSolve maxImpulse>40 break
//                                 with cached-velocity split (Breakable.h)
//   collision_processing(seed=7)— after each step destroy the lighter body
//                                 of every touching dynamic-dynamic pair
//   sleep_collide_perf(2,6,1,20)— pyramids sleeping beside a no-sleep
//                                 tumbler (SleepCollidePerf.h reduced)
#include <Box2D/Box2D.h>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <set>
#include <vector>

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

// ---------------------------------------------------------------- add_pair
// scenes.add_pair(50, seed=7): spawn table from its Python RNG.
static const float kAddPair[50][2] = {
    {-4.057003411001026f, 4.301698347849004f},
    {-2.0943931617608778f, 4.1448725733350855f},
    {-2.784707974159865f, 4.731377833825171f},
    {-5.65200645135176f, 5.014871466378841f},
    {-5.7750260493480905f, 4.867291367324771f},
    {-5.580867458552286f, 4.18142602668773f},
    {-3.452884865144916f, 5.653704249344076f},
    {-5.257188233102126f, 4.446477929214029f},
    {-2.2354006655664644f, 5.8954178849140115f},
    {-2.537382308295008f, 4.79336094930156f},
    {-0.1424693664424801f, 4.093165361235513f},
    {-0.8491892457079224f, 4.579218572663352f},
    {-5.134469499855375f, 4.2355844761567365f},
    {-4.149109055388394f, 5.632252718240062f},
    {-4.915641720456375f, 5.163200327324932f},
    {-2.166519186442896f, 4.744795085451463f},
    {-2.713533205742653f, 4.1255779499466465f},
    {-5.6423929802026045f, 4.411917425638653f},
    {-1.9176001609092843f, 4.855184611338806f},
    {-4.115116977739251f, 5.171123727015278f},
    {-3.2808937417753476f, 4.5995339937273645f},
    {-1.2337231108650535f, 5.3979888674591425f},
    {-4.535420935667083f, 5.148847420517342f},
    {-2.8488209771312913f, 5.750274991146858f},
    {-1.6233282633646944f, 4.575875529780373f},
    {-0.11895091504450761f, 4.236131556509925f},
    {-3.491263069288637f, 5.514281859130499f},
    {-5.088092792036972f, 4.977926200951611f},
    {-5.764756457715374f, 5.336431713068791f},
    {-1.412574802723121f, 5.146051880554768f},
    {-0.7471331290146708f, 4.627495025696193f},
    {-1.828227802358044f, 5.188739754210037f},
    {-2.520628774305047f, 4.912410662602826f},
    {-0.9601933169247516f, 5.889362190215875f},
    {-3.155409975482133f, 5.3283044109493485f},
    {-5.635983434416682f, 5.402984042608848f},
    {-2.1172268728339874f, 5.986191878933268f},
    {-1.0684512803417103f, 4.569191064188298f},
    {-3.685251345319735f, 5.337305431768376f},
    {-5.864622431666469f, 4.923390572599532f},
    {-4.991709726560733f, 4.234191588963464f},
    {-5.646273484012138f, 5.536465976945042f},
    {-5.223958667887895f, 4.495229667393828f},
    {-3.6543017812006378f, 5.742843948252599f},
    {-5.516512192799168f, 4.898374801898662f},
    {-2.7033605451357756f, 5.766767652883025f},
    {-1.0843209729855516f, 5.72796893939703f},
    {-4.329473612916617f, 4.830593034423397f},
    {-3.8473730080102513f, 5.768385654396434f},
    {-0.2536127762160527f, 4.301841811582218f},
};

static void add_pair() {
    b2World w(b2Vec2(0, 0));
    b2CircleShape circle;
    circle.m_radius = 0.1f;
    for (int i = 0; i < 50; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kAddPair[i][0], kAddPair[i][1]);
        b2Body* b = w.CreateBody(&bd);
        b->CreateFixture(&circle, 0.01f);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-40.0f, 5.0f);
        bd.bullet = true;
        bd.linearVelocity.Set(150.0f, 0.0f);
        b2Body* b = w.CreateBody(&bd);
        b2PolygonShape box;
        box.SetAsBox(1.5f, 1.5f);
        b->CreateFixture(&box, 1.0f);
    }
    run(w, 120);
}

// ----------------------------------------------------------- conveyor_belt
// Listener reproducing ConveyorBelt.h:67-84: +5 when the platform is
// fixture A, -5 when it is fixture B (the same physical belt motion —
// the tangent direction flips with the normal).
struct BeltListener : b2ContactListener {
    b2Fixture* platform = nullptr;
    bool PreSolveImmediate(b2Contact* c, const b2Manifold*,
                           uint32) override {
        if (c->GetFixtureA() == platform) c->SetTangentSpeed(5.0f);
        if (c->GetFixtureB() == platform) c->SetTangentSpeed(-5.0f);
        return false;
    }
    bool BeginContactImmediate(b2Contact*, uint32) override { return false; }
    bool EndContactImmediate(b2Contact*, uint32) override { return false; }
    bool PostSolveImmediate(b2Contact*, const b2ContactImpulse*,
                            uint32) override { return false; }
};

static void conveyor_belt() {
    b2World w(b2Vec2(0, -10));
    BeltListener listener;
    w.SetContactListener(&listener);
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-20.0f, 0.0f), b2Vec2(20.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.position.Set(-5.0f, 5.0f);
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(10.0f, 0.5f);
        b2FixtureDef fd;
        fd.shape = &shape;
        fd.friction = 0.8f;
        listener.platform = body->CreateFixture(&fd);
    }
    for (int i = 0; i < 5; ++i) {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(-10.0f + 2.0f * i, 7.0f);
        b2Body* b = w.CreateBody(&bd);
        b2PolygonShape box;
        box.SetAsBox(0.5f, 0.5f);
        b->CreateFixture(&box, 20.0f);
    }
    run(w, 240);
}

// ------------------------------------------------------ one_sided_platform
// Mirror of the zoo scene's traced pre_solve_fn: disable any platform
// contact while the actor's center is below the platform top (10.5).
struct OneSidedListener : b2ContactListener {
    b2Fixture* platform = nullptr;
    b2Body* actor = nullptr;
    bool PreSolveImmediate(b2Contact* c, const b2Manifold*,
                           uint32) override {
        if (c->GetFixtureA() == platform || c->GetFixtureB() == platform) {
            if (actor->GetWorldCenter().y < 10.5f) c->SetEnabled(false);
        }
        return false;
    }
    bool BeginContactImmediate(b2Contact*, uint32) override { return false; }
    bool EndContactImmediate(b2Contact*, uint32) override { return false; }
    bool PostSolveImmediate(b2Contact*, const b2ContactImpulse*,
                            uint32) override { return false; }
};

static void one_sided_platform() {
    b2World w(b2Vec2(0, -10));
    OneSidedListener listener;
    w.SetContactListener(&listener);
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-20.0f, 0.0f), b2Vec2(20.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.position.Set(0.0f, 10.0f);
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape shape;
        shape.SetAsBox(3.0f, 0.5f);
        listener.platform = body->CreateFixture(&shape, 0.0f);
    }
    {
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(0.0f, 12.0f);
        bd.linearVelocity.Set(0.0f, -50.0f);
        b2Body* b = w.CreateBody(&bd);
        b2CircleShape c;
        c.m_radius = 0.5f;
        listener.actor = b;
        b->CreateFixture(&c, 20.0f);
    }
    run(w, 240);
}

// ------------------------------------------------------------ shape_editing
// ShapeEditing.h with the keyboard replaced by a fixed script: 'C' before
// step 60, 'S' before step 120, 'D' before step 180.
static void shape_editing() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position.Set(0.0f, 10.0f);
    b2Body* body = w.CreateBody(&bd);
    b2PolygonShape box;
    box.SetAsBox(4.0f, 4.0f, b2Vec2(0.0f, 0.0f), 0.0f);
    body->CreateFixture(&box, 10.0f);
    b2Fixture* fixture2 = nullptr;
    for (int i = 0; i < 240; ++i) {
        if (i == 60) {
            b2CircleShape shape;
            shape.m_radius = 3.0f;
            shape.m_p.Set(0.5f, -4.0f);
            fixture2 = body->CreateFixture(&shape, 10.0f);
            body->SetAwake(true);
        } else if (i == 120) {
            fixture2->SetSensor(true);
        } else if (i == 180) {
            body->DestroyFixture(fixture2);
            fixture2 = nullptr;
            body->SetAwake(true);
        }
        w.Step(1.0f / 60.0f, 8, 3, g_exec);
        dumpStep(w, i);
    }
}

// --------------------------------------------------------------- breakable
// Breakable.h verbatim semantics: PostSolve flags the break when any
// normal impulse exceeds 40; the split happens at the START of the next
// step using the pre-step cached velocities.
struct BreakListener : b2ContactListener {
    bool* broke = nullptr;
    bool* doBreak = nullptr;
    bool PostSolveImmediate(b2Contact*, const b2ContactImpulse*,
                            uint32) override { return true; }
    void PostSolve(b2Contact* contact,
                   const b2ContactImpulse* impulse) override {
        if (*broke) return;
        int32 count = contact->GetManifold()->pointCount;
        float32 maxImpulse = 0.0f;
        for (int32 i = 0; i < count; ++i)
            maxImpulse = b2Max(maxImpulse, impulse->normalImpulses[i]);
        if (maxImpulse > 40.0f) *doBreak = true;
    }
    bool PreSolveImmediate(b2Contact*, const b2Manifold*,
                           uint32) override { return false; }
    bool BeginContactImmediate(b2Contact*, uint32) override { return false; }
    bool EndContactImmediate(b2Contact*, uint32) override { return false; }
};

static void breakable() {
    b2World w(b2Vec2(0, -10));
    bool broke = false, doBreak = false;
    BreakListener listener;
    listener.broke = &broke;
    listener.doBreak = &doBreak;
    w.SetContactListener(&listener);
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    b2BodyDef bd;
    bd.type = b2_dynamicBody;
    bd.position.Set(0.0f, 40.0f);
    bd.angle = 0.25f * b2_pi;
    b2Body* body1 = w.CreateBody(&bd);
    b2PolygonShape shape1, shape2;
    shape1.SetAsBox(0.5f, 0.5f, b2Vec2(-0.5f, 0.0f), 0.0f);
    body1->CreateFixture(&shape1, 1.0f);
    shape2.SetAsBox(0.5f, 0.5f, b2Vec2(0.5f, 0.0f), 0.0f);
    b2Fixture* piece2 = body1->CreateFixture(&shape2, 1.0f);
    b2Vec2 velocity(0, 0);
    float32 angularVelocity = 0;
    int breakStep = -1;
    for (int i = 0; i < 240; ++i) {
        if (doBreak) {
            b2Vec2 center = body1->GetWorldCenter();
            body1->DestroyFixture(piece2);
            piece2 = nullptr;
            b2BodyDef nd;
            nd.type = b2_dynamicBody;
            nd.position = body1->GetPosition();
            nd.angle = body1->GetAngle();
            b2Body* body2 = w.CreateBody(&nd);
            body2->CreateFixture(&shape2, 1.0f);
            b2Vec2 center1 = body1->GetWorldCenter();
            b2Vec2 center2 = body2->GetWorldCenter();
            b2Vec2 velocity1 =
                velocity + b2Cross(angularVelocity, center1 - center);
            b2Vec2 velocity2 =
                velocity + b2Cross(angularVelocity, center2 - center);
            body1->SetAngularVelocity(angularVelocity);
            body1->SetLinearVelocity(velocity1);
            body2->SetAngularVelocity(angularVelocity);
            body2->SetLinearVelocity(velocity2);
            broke = true;
            doBreak = false;
            breakStep = i;
        }
        if (!broke) {
            velocity = body1->GetLinearVelocity();
            angularVelocity = body1->GetAngularVelocity();
        }
        w.Step(1.0f / 60.0f, 8, 3, g_exec);
        dumpStep(w, i);
    }
    fprintf(stderr, "breakable: break at step %d\n", breakStep);
}

// ---------------------------------------------------- collision_processing
// scenes.collision_processing(seed=7) + scripted nuke rule: after each
// step destroy the lighter body of every touching dynamic-dynamic pair
// (CollisionProcessing.h:~95-140's mass rule on the touching set).
static const float kCollProc[6][2] = {
    {-1.761672351668376f, 6.978022739508564f},
    {1.5093447303985377f, 4.390397460028911f},
    {0.35882004306689197f, 14.067734258115323f},
    {-4.4200107522529315f, 18.74537919525087f},
    {-4.625043415580151f, 16.310307560858732f},
    {-4.301445764253811f, 4.993529440347547f},
};

static void collision_processing() {
    b2World w(b2Vec2(0, -10));
    {
        b2BodyDef bd;
        b2Body* ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-50.0f, 0.0f), b2Vec2(50.0f, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    int k = 0;
    for (int s = 0; s < 2; ++s) {
        float scale = (s == 0) ? 1.0f : 2.0f;
        b2Vec2 verts[3] = {b2Vec2(-scale, 0.0f), b2Vec2(scale, 0.0f),
                           b2Vec2(0.0f, 2.0f * scale)};
        b2PolygonShape tri;
        tri.Set(verts, 3);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kCollProc[k][0], kCollProc[k][1]);
        ++k;
        w.CreateBody(&bd)->CreateFixture(&tri, 1.0f);
    }
    const float kBox[2][2] = {{1.0f, 0.5f}, {2.0f, 1.0f}};
    for (int s = 0; s < 2; ++s) {
        b2PolygonShape box;
        box.SetAsBox(kBox[s][0], kBox[s][1]);
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kCollProc[k][0], kCollProc[k][1]);
        ++k;
        w.CreateBody(&bd)->CreateFixture(&box, 1.0f);
    }
    for (int s = 0; s < 2; ++s) {
        b2CircleShape c;
        c.m_radius = (s == 0) ? 1.0f : 2.0f;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(kCollProc[k][0], kCollProc[k][1]);
        ++k;
        w.CreateBody(&bd)->CreateFixture(&c, 1.0f);
    }
    for (int i = 0; i < 240; ++i) {
        w.Step(1.0f / 60.0f, 8, 3, g_exec);
        dumpStep(w, i);
        std::set<b2Body*> nuke;
        for (b2Contact* c = w.GetContactList(); c; c = c->GetNext()) {
            if (!c->IsTouching()) continue;
            b2Body* ba = c->GetFixtureA()->GetBody();
            b2Body* bb = c->GetFixtureB()->GetBody();
            float ma = ba->GetMass(), mb = bb->GetMass();
            if (ma > 0.0f && mb > 0.0f)
                nuke.insert(mb > ma ? ba : bb);
        }
        for (b2Body* b : nuke) w.DestroyBody(b);
    }
}

// -------------------------------------------------------- sleep_collide_perf
// scenes.sleep_collide_perf(2, 6, 1, 20): tumbler-box offsets from its
// Python RNG (Random(11)).
static const float kSleepBoxes[20][2] = {
    {-0.476204464901814f, 0.59772386080496f},
    {4.2421058402372935f, -0.34349929900226694f},
    {0.07841273062271092f, 0.8738482884989693f},
    {-3.153396561451234f, 0.11908639041805458f},
    {1.2988272021680194f, 2.9297687251995264f},
    {-4.058765437707815f, -1.965987373754745f},
    {-4.093294625081606f, 3.0964453436717747f},
    {1.9343848254123905f, -4.58119663630154f},
    {4.821934207987782f, 4.647577811255667f},
    {1.5392253353384042f, 1.1556270457857076f},
    {-3.4250590485983756f, -4.849992630503951f},
    {0.283812661704788f, -4.40448894831145f},
    {-3.0979173720207087f, -2.5805698633478524f},
    {-4.699174107752114f, -0.3606553877671548f},
    {-0.5946888334334322f, 3.42427128518532f},
    {0.19124114764076694f, 1.4029170791917709f},
    {-0.0022684779320840676f, 1.6244953189036817f},
    {-0.4267011840044237f, -2.2183710033611415f},
    {4.976562004630843f, 4.956916416561992f},
    {3.4021554949286177f, 2.078096214979494f},
};

static void sleep_collide_perf() {
    const int pyramids = 2, pyramid_size = 6, boxes_per_tumbler = 20;
    b2World w(b2Vec2(0, -10));
    b2Body* ground;
    {
        b2BodyDef bd;
        ground = w.CreateBody(&bd);
        b2EdgeShape shape;
        shape.Set(b2Vec2(-20.0f * pyramids, 0.0f),
                  b2Vec2(20.0f * pyramids, 0.0f));
        ground->CreateFixture(&shape, 0.0f);
    }
    b2PolygonShape sq;
    sq.SetAsBox(0.5f, 0.5f);
    const float x_spacing = 1.125f * pyramid_size;
    const float x_init = -x_spacing * pyramids * 0.5f - 7.0f;
    for (int p = 0; p < pyramids; ++p) {
        float xx = x_init + p * x_spacing, xy = 0.75f;
        for (int i = 0; i < pyramid_size; ++i) {
            float yx = xx, yy = xy;
            for (int j = i; j < pyramid_size; ++j) {
                b2BodyDef bd;
                bd.type = b2_dynamicBody;
                bd.position.Set(yx, yy);
                w.CreateBody(&bd)->CreateFixture(&sq, 5.0f);
                yx += 1.125f;
            }
            xx += 0.5625f;
            xy += 1.25f;
        }
    }
    {
        float x = -30.0f * 1 * 0.5f + 10.0f;
        b2BodyDef bd;
        bd.type = b2_dynamicBody;
        bd.position.Set(x, 50.0f);
        bd.allowSleep = false;
        b2Body* body = w.CreateBody(&bd);
        b2PolygonShape side;
        side.SetAsBox(0.5f, 10.0f, b2Vec2(10.0f, 0.0f), 0.0f);
        body->CreateFixture(&side, 5.0f);
        side.SetAsBox(0.5f, 10.0f, b2Vec2(-10.0f, 0.0f), 0.0f);
        body->CreateFixture(&side, 5.0f);
        side.SetAsBox(10.0f, 0.5f, b2Vec2(0.0f, 10.0f), 0.0f);
        body->CreateFixture(&side, 5.0f);
        side.SetAsBox(10.0f, 0.5f, b2Vec2(0.0f, -10.0f), 0.0f);
        body->CreateFixture(&side, 5.0f);
        b2RevoluteJointDef jd;
        jd.Initialize(ground, body, b2Vec2(x, 50.0f));
        jd.enableMotor = true;
        jd.motorSpeed = 0.05f * b2_pi;
        jd.maxMotorTorque = 1e8f;
        w.CreateJoint(&jd);
        b2PolygonShape tiny;
        tiny.SetAsBox(0.125f, 0.125f);
        for (int i = 0; i < boxes_per_tumbler; ++i) {
            b2BodyDef bb;
            bb.type = b2_dynamicBody;
            bb.position.Set(x + kSleepBoxes[i][0], 50.0f + kSleepBoxes[i][1]);
            w.CreateBody(&bb)->CreateFixture(&tiny, 1.0f);
        }
    }
    run(w, 300);
}

int main(int argc, char** argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "add_pair")) add_pair();
    else if (!strcmp(argv[1], "conveyor_belt")) conveyor_belt();
    else if (!strcmp(argv[1], "one_sided_platform")) one_sided_platform();
    else if (!strcmp(argv[1], "shape_editing")) shape_editing();
    else if (!strcmp(argv[1], "breakable")) breakable();
    else if (!strcmp(argv[1], "collision_processing")) collision_processing();
    else if (!strcmp(argv[1], "sleep_collide_perf")) sleep_collide_perf();
    else return 1;
    return 0;
}
