// Dump reference manifolds for random shape pairs as JSONL test fixtures.
#include <Box2D/Box2D.h>
#include <cstdio>
#include <cstdlib>
#include <cstring>

static float frnd(float lo, float hi) {
    return lo + (hi - lo) * (rand() / (float)RAND_MAX);
}

static void printVec(const b2Vec2& v) { printf("[%.9g,%.9g]", v.x, v.y); }

static void printPoly(const b2PolygonShape& p) {
    printf("{\"type\":\"polygon\",\"radius\":%.9g,\"verts\":[", p.m_radius);
    for (int i = 0; i < p.m_count; ++i) { if (i) printf(","); printVec(p.m_vertices[i]); }
    printf("],\"normals\":[");
    for (int i = 0; i < p.m_count; ++i) { if (i) printf(","); printVec(p.m_normals[i]); }
    printf("],\"centroid\":"); printVec(p.m_centroid); printf("}");
}

static void printCircle(const b2CircleShape& c) {
    printf("{\"type\":\"circle\",\"radius\":%.9g,\"center\":", c.m_radius);
    printVec(c.m_p); printf("}");
}

static void printEdge(const b2EdgeShape& e) {
    printf("{\"type\":\"edge\",\"radius\":%.9g,\"v1\":", e.m_radius);
    printVec(e.m_vertex1); printf(",\"v2\":"); printVec(e.m_vertex2);
    printf(",\"has0\":%d,\"has3\":%d,\"v0\":", e.m_hasVertex0 ? 1 : 0, e.m_hasVertex3 ? 1 : 0);
    printVec(e.m_vertex0); printf(",\"v3\":"); printVec(e.m_vertex3); printf("}");
}

static void printManifold(const b2Manifold& m) {
    printf("{\"mtype\":%d,\"count\":%d,\"lp\":", (int)m.type, m.pointCount);
    printVec(m.localPoint);
    printf(",\"ln\":"); printVec(m.localNormal);
    printf(",\"pts\":[");
    for (int i = 0; i < m.pointCount; ++i) { if (i) printf(","); printVec(m.points[i].localPoint); }
    printf("],\"ids\":[");
    for (int i = 0; i < m.pointCount; ++i) {
        if (i) printf(",");
        const b2ContactFeature& cf = m.points[i].id.cf;
        // pack to match the TPU build: indexA | indexB<<8 | typeA<<16 | typeB<<24
        unsigned key = (unsigned)cf.indexA | ((unsigned)cf.indexB << 8)
                     | ((unsigned)cf.typeA << 16) | ((unsigned)cf.typeB << 24);
        printf("%u", key);
    }
    printf("]}");
}

static b2Transform randXf(float span) {
    b2Transform xf;
    xf.p.Set(frnd(-span, span), frnd(-span, span));
    xf.q.Set(frnd(-3.2f, 3.2f));
    return xf;
}

static void randPoly(b2PolygonShape& p) {
    int which = rand() % 3;
    if (which == 0) {
        p.SetAsBox(frnd(0.2f, 2.0f), frnd(0.2f, 2.0f));
    } else if (which == 1) {
        p.SetAsBox(frnd(0.2f, 2.0f), frnd(0.2f, 2.0f), b2Vec2(frnd(-1, 1), frnd(-1, 1)), frnd(-3, 3));
    } else {
        int n = 3 + rand() % 6;
        b2Vec2 vs[8];
        for (int i = 0; i < n; ++i) {
            float ang = 2.0f * b2_pi * i / n + frnd(0.0f, 0.3f);
            float r = frnd(0.3f, 1.5f);
            vs[i].Set(r * cosf(ang), r * sinf(ang));
        }
        p.Set(vs, n);
    }
}

static void randEdge(b2EdgeShape& e) {
    b2Vec2 a(frnd(-2, 2), frnd(-2, 2));
    b2Vec2 b = a + b2Vec2(frnd(0.5f, 3.0f), frnd(-1.0f, 1.0f));
    e.Set(a, b);
    if (rand() % 2) { e.m_hasVertex0 = true; e.m_vertex0 = a - b2Vec2(frnd(0.2f, 2.f), frnd(-1.f, 1.f)); }
    if (rand() % 2) { e.m_hasVertex3 = true; e.m_vertex3 = b + b2Vec2(frnd(0.2f, 2.f), frnd(-1.f, 1.f)); }
}

int main(int argc, char** argv) {
    int count = argc > 1 ? atoi(argv[1]) : 300;
    srand(42);
    for (int kind = 0; kind < 5; ++kind) {
        for (int i = 0; i < count; ++i) {
            b2Manifold m;
            m.pointCount = 0;
            // span small so a good fraction overlap
            b2Transform xfA = randXf(1.5f), xfB = randXf(1.5f);
            printf("{\"kind\":%d,\"xfa\":[%.9g,%.9g,%.9g],\"xfb\":[%.9g,%.9g,%.9g],\"a\":",
                   kind, xfA.p.x, xfA.p.y, b2Atan2(xfA.q.s, xfA.q.c),
                   xfB.p.x, xfB.p.y, b2Atan2(xfB.q.s, xfB.q.c));
            if (kind == 0) {
                b2CircleShape a, b;
                a.m_radius = frnd(0.2f, 1.5f); a.m_p.Set(frnd(-1, 1), frnd(-1, 1));
                b.m_radius = frnd(0.2f, 1.5f); b.m_p.Set(frnd(-1, 1), frnd(-1, 1));
                printCircle(a); printf(",\"b\":"); printCircle(b);
                b2CollideCircles(&m, &a, xfA, &b, xfB);
            } else if (kind == 1) {
                b2PolygonShape a; randPoly(a);
                b2CircleShape b; b.m_radius = frnd(0.2f, 1.5f); b.m_p.Set(frnd(-1, 1), frnd(-1, 1));
                printPoly(a); printf(",\"b\":"); printCircle(b);
                b2CollidePolygonAndCircle(&m, &a, xfA, &b, xfB);
            } else if (kind == 2) {
                b2PolygonShape a, b; randPoly(a); randPoly(b);
                printPoly(a); printf(",\"b\":"); printPoly(b);
                b2CollidePolygons(&m, &a, xfA, &b, xfB);
            } else if (kind == 3) {
                b2EdgeShape a; randEdge(a);
                b2CircleShape b; b.m_radius = frnd(0.2f, 1.5f); b.m_p.Set(frnd(-1, 1), frnd(-1, 1));
                printEdge(a); printf(",\"b\":"); printCircle(b);
                b2CollideEdgeAndCircle(&m, &a, xfA, &b, xfB);
            } else {
                b2EdgeShape a; randEdge(a);
                b2PolygonShape b; randPoly(b);
                printEdge(a); printf(",\"b\":"); printPoly(b);
                b2CollideEdgeAndPolygon(&m, &a, xfA, &b, xfB);
            }
            printf(",\"m\":"); printManifold(m); printf("}\n");
        }
    }
    return 0;
}
