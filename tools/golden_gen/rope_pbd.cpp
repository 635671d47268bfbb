// Golden trace for the standalone PBD rope (Rope/b2Rope.cpp), modeled on
// the Testbed Rope.h setup: 40 nodes, node 0 pinned, ramped masses.
#include <Box2D/Box2D.h>
#include <Box2D/Rope/b2Rope.h>
#include <cstdio>

int main() {
    const int N = 40;
    b2Vec2 vertices[N];
    float32 masses[N];
    for (int i = 0; i < N; ++i) {
        vertices[i].Set(0.0f, 20.0f - 0.25f * i);
        masses[i] = 1.0f;
    }
    masses[0] = 0.0f;
    masses[1] = 0.0f;

    b2RopeDef def;
    def.vertices = vertices;
    def.count = N;
    def.gravity.Set(0.0f, -10.0f);
    def.masses = masses;
    def.damping = 0.1f;
    def.k2 = 1.0f;
    def.k3 = 0.5f;

    b2Rope rope;
    rope.Initialize(&def);
    rope.SetAngle(0.25f * 3.14159265f);

    for (int s = 0; s < 240; ++s) {
        rope.Step(1.0f / 60.0f, 1);
        printf("{\"step\":%d,\"ps\":[", s);
        for (int i = 0; i < N; ++i) {
            if (i) printf(",");
            b2Vec2 p = rope.GetVertices()[i];
            printf("[%.9g,%.9g]", p.x, p.y);
        }
        printf("]}\n");
    }
    return 0;
}
