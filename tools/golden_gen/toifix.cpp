// Dump reference b2Distance + b2TimeOfImpact results for random pairs.
#include <Box2D/Box2D.h>
#include <cstdio>
#include <cstdlib>
#include <cmath>

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
    srand(7);
    for (int i = 0; i < n; ++i) {
        b2PolygonShape pa, pb;
        b2CircleShape ca, cb;
        b2DistanceProxy proxyA, proxyB;
        if (rand() % 3 == 0) { ca.m_radius = frnd(0.2f, 1.0f); proxyA.Set(&ca, 0); }
        else { pa.SetAsBox(frnd(0.2f, 1.5f), frnd(0.2f, 1.5f)); proxyA.Set(&pa, 0); }
        if (rand() % 3 == 0) { cb.m_radius = frnd(0.2f, 1.0f); proxyB.Set(&cb, 0); }
        else { pb.SetAsBox(frnd(0.2f, 1.5f), frnd(0.2f, 1.5f)); proxyB.Set(&pb, 0); }

        b2Sweep sa, sb;
        sa.localCenter.SetZero(); sb.localCenter.SetZero();
        sa.c0.Set(frnd(-4, 4), frnd(-4, 4));
        sa.c = sa.c0 + b2Vec2(frnd(-6, 6), frnd(-6, 6));
        sa.a0 = frnd(-2, 2); sa.a = sa.a0 + frnd(-2, 2);
        sa.alpha0 = 0.0f;
        sb.c0.Set(frnd(-4, 4), frnd(-4, 4));
        sb.c = sb.c0 + b2Vec2(frnd(-6, 6), frnd(-6, 6));
        sb.a0 = frnd(-2, 2); sb.a = sb.a0 + frnd(-2, 2);
        sb.alpha0 = 0.0f;

        // distance at t=0
        b2Transform xfa, xfb;
        sa.GetTransform(&xfa, 0.0f);
        sb.GetTransform(&xfb, 0.0f);
        b2DistanceInput di;
        di.proxyA = proxyA; di.proxyB = proxyB;
        di.transformA = xfa; di.transformB = xfb;
        di.useRadii = false;
        b2SimplexCache cache; cache.count = 0;
        b2DistanceOutput dout;
        b2Distance(&dout, &cache, &di);

        b2TOIInput ti;
        ti.proxyA = proxyA; ti.proxyB = proxyB;
        ti.sweepA = sa; ti.sweepB = sb; ti.tMax = 1.0f;
        b2TOIOutput tout;
        b2TimeOfImpact(&tout, &ti);

        printf("{\"a\":"); emitProxy(proxyA);
        printf(",\"b\":"); emitProxy(proxyB);
        printf(",\"sweepA\":[%.9g,%.9g,%.9g,%.9g,%.9g,%.9g],", sa.c0.x, sa.c0.y, sa.c.x, sa.c.y, sa.a0, sa.a);
        printf("\"sweepB\":[%.9g,%.9g,%.9g,%.9g,%.9g,%.9g],", sb.c0.x, sb.c0.y, sb.c.x, sb.c.y, sb.a0, sb.a);
        printf("\"dist\":%.9g,\"toi_state\":%d,\"toi_t\":%.9g}\n",
               dout.distance, (int)tout.state, tout.t);
    }
    return 0;
}
