// Reference benchmark: steps/sec on the pyramid workload at N threads.
#include <Box2D/Box2D.h>
#include <chrono>
#include <cstdio>
#include <cstdlib>

int main(int argc, char** argv) {
    int rows = argc > 1 ? atoi(argv[1]) : 24;
    int steps = argc > 2 ? atoi(argv[2]) : 1000;
    int threads = argc > 3 ? atoi(argv[3]) : 8;

    b2ThreadPoolOptions opts;
    opts.totalThreadCount = threads;
    b2ThreadPoolTaskExecutor exec(opts);

    b2Vec2 gravity(0.0f, -10.0f);
    b2World world(gravity);
    b2BodyDef gd;
    b2Body* ground = world.CreateBody(&gd);
    b2EdgeShape ge; ge.Set(b2Vec2(-40.0f, 0.0f), b2Vec2(40.0f, 0.0f));
    ground->CreateFixture(&ge, 0.0f);
    b2PolygonShape shape; shape.SetAsBox(0.5f, 0.5f);
    b2Vec2 x(-7.0f, 0.75f), y, dX(0.5625f, 1.25f), dY(1.125f, 0.0f);
    int n = 0;
    for (int i = 0; i < rows; ++i) {
        y = x;
        for (int j = i; j < rows; ++j) {
            b2BodyDef bd; bd.type = b2_dynamicBody; bd.position = y;
            world.CreateBody(&bd)->CreateFixture(&shape, 5.0f);
            y += dY; ++n;
        }
        x += dX;
    }
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < steps; ++i) world.Step(1.0f/60.0f, 8, 3, exec);
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    printf("{\"rows\": %d, \"bodies\": %d, \"threads\": %d, \"steps\": %d, \"elapsed_s\": %.3f, \"steps_per_sec\": %.1f}\n",
           rows, n, threads, steps, el, steps / el);
    return 0;
}
