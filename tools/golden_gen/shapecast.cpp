// Dump reference b2ShapeCast results for random pairs.
#include <Box2D/Box2D.h>
#include <cstdio>
#include <cstdlib>

static float frnd(float lo, float hi) { return lo + (hi - lo) * (rand() / (float)RAND_MAX); }

static void emitProxy(const b2DistanceProxy& p) {
    printf("{\"radius\":%.9g,\"verts\":[", p.m_radius);
    for (int i = 0; i < p.m_count; ++i) {
        if (i) printf(",");
        printf("[%.9g,%.9g]", p.m_vertices[i].x, p.m_vertices[i].y);
    }
    printf("]}");
}

int main(int argc, char** argv) {
    int n = argc > 1 ? atoi(argv[1]) : 200;
    srand(11);
    for (int i = 0; i < n; ++i) {
        b2PolygonShape pa, pb;
        b2CircleShape ca, cb;
        b2ShapeCastInput in;
        if (rand() % 3 == 0) { ca.m_radius = frnd(0.2f, 1.0f); in.proxyA.Set(&ca, 0); }
        else { pa.SetAsBox(frnd(0.2f, 1.5f), frnd(0.2f, 1.5f)); in.proxyA.Set(&pa, 0); }
        if (rand() % 3 == 0) { cb.m_radius = frnd(0.2f, 1.0f); in.proxyB.Set(&cb, 0); }
        else { pb.SetAsBox(frnd(0.2f, 1.5f), frnd(0.2f, 1.5f)); in.proxyB.Set(&pb, 0); }

        in.transformA.Set(b2Vec2(frnd(-2, 2), frnd(-2, 2)), frnd(-2, 2));
        in.transformB.Set(b2Vec2(frnd(-6, 6), frnd(-6, 6)), frnd(-2, 2));
        in.translationB.Set(frnd(-10, 10), frnd(-10, 10));

        b2ShapeCastOutput out;
        bool hit = b2ShapeCast(&out, &in);

        printf("{\"a\":"); emitProxy(in.proxyA);
        printf(",\"b\":"); emitProxy(in.proxyB);
        printf(",\"xfa\":[%.9g,%.9g,%.9g],\"xfb\":[%.9g,%.9g,%.9g]",
               in.transformA.p.x, in.transformA.p.y, in.transformA.q.GetAngle(),
               in.transformB.p.x, in.transformB.p.y, in.transformB.q.GetAngle());
        printf(",\"tr\":[%.9g,%.9g]", in.translationB.x, in.translationB.y);
        printf(",\"hit\":%d,\"lambda\":%.9g,\"point\":[%.9g,%.9g],\"normal\":[%.9g,%.9g]}\n",
               hit ? 1 : 0, out.lambda, out.point.x, out.point.y,
               out.normal.x, out.normal.y);
    }
    return 0;
}
