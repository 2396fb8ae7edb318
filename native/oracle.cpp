// C++ CPU oracle: scalar two-level brickmap DDA for parity testing.
//
// Native counterpart of ops/oracle.py (the reference is C++ throughout —
// SURVEY.md §2 calls for genuinely native host-side components).  Exposed
// via a plain C ABI for ctypes (ops/oracle_native.py); semantics identical
// to the Python oracle / JAX path: slab entry with the 1e-4 epsilon
// (obb.cpp:73), shared MAX_STEPS=256 budget (vv.cpp:7), Amanatides-Woo
// comparison order (vv.cpp:176-202), entry-voxel hits keep the slab axis.
//
// Build: native/build.sh -> native/liboracle.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

constexpr float BIG = 1e30f;
constexpr int MAX_STEPS = 256;
constexpr int BRICK = 8;

struct V3 {
    float x, y, z;
};

inline float get(const V3 &v, int a) { return a == 0 ? v.x : (a == 1 ? v.y : v.z); }
inline void set(V3 &v, int a, float val) { (a == 0 ? v.x : a == 1 ? v.y : v.z) = val; }

struct Grid {
    const uint8_t *vox;  // (gz, gy, gx) C-order
    const int32_t *occ;  // (bz, by, bx) brick occupancy counts
    int gx, gy, gz;
    int bx, by, bz;
    float vpu;
};

inline int voxel_at(const Grid &g, int x, int y, int z) {
    if (x < 0 || y < 0 || z < 0 || x >= g.gx || y >= g.gy || z >= g.gz)
        return 0;
    return g.vox[((size_t)z * g.gy + y) * g.gx + x];
}

inline int occ_at(const Grid &g, int x, int y, int z) {
    return g.occ[((size_t)z * g.by + y) * g.bx + x];
}

struct Hit {
    float t;
    int mat;
    int axis;
    int steps;
};

// slab entry vs [0, size]; returns false on miss
bool slab(const V3 &o, const V3 &d, const V3 &size, float &tmin, float &tmax,
          int &axis) {
    tmin = 0.0f;
    tmax = BIG;
    axis = 0;
    for (int a = 0; a < 3; a++) {
        float rcp = 1.0f / get(d, a);  // +-inf ok
        float t1 = (0.0f - get(o, a)) * rcp;
        float t2 = (get(size, a) - get(o, a)) * rcp;
        if (t1 > t2) std::swap(t1, t2);
        if (t1 > tmin) { tmin = t1; axis = a; }
        if (t2 < tmax) tmax = t2;
        if (tmax - 1e-4f < tmin) return false;
    }
    return true;
}

Hit trace_one(const Grid &g, const V3 &o, const V3 &d) {
    Hit hit{BIG, 0, 0, 0};
    V3 size{g.gx / g.vpu, g.gy / g.vpu, g.gz / g.vpu};
    float tmin, tmax;
    int entry_axis;
    if (!slab(o, d, size, tmin, tmax, entry_axis)) return hit;

    const float bpu = g.vpu / BRICK, rbpu = 1.0f / bpu;
    int step[3], cell[3];
    float rdir[3], delta[3], tmax3[3];
    for (int a = 0; a < 3; a++) {
        step[a] = std::signbit(get(d, a)) ? -1 : 1;
        rdir[a] = 1.0f / get(d, a);
        delta[a] = std::fabs(rdir[a]);
        float entry = (get(o, a) + get(d, a) * tmin) * bpu;
        int bs = a == 0 ? g.bx : (a == 1 ? g.by : g.bz);
        int c = (int)std::floor(entry);
        cell[a] = c < 0 ? 0 : (c >= bs ? bs - 1 : c);
        tmax3[a] = ((float)cell[a] - entry + (step[a] > 0 ? 1.0f : 0.0f)) * rdir[a];
        if (std::isnan(tmax3[a])) tmax3[a] = BIG;
    }

    int axis = entry_axis;
    int steps = 0;
    float t = 0.0f;
    const int bs3[3] = {g.bx, g.by, g.bz};

    while (steps < MAX_STEPS) {
        if (occ_at(g, cell[0], cell[1], cell[2]) > 0) {
            // fine march inside the brick
            float brick_entry_t = tmin + t * rbpu;
            float bmin[3] = {cell[0] * rbpu, cell[1] * rbpu, cell[2] * rbpu};
            int fc[3];
            float ftm[3];
            for (int a = 0; a < 3; a++) {
                float e = (get(o, a) + get(d, a) * brick_entry_t - bmin[a]) * g.vpu;
                int c = (int)std::floor(e);
                fc[a] = c < 0 ? 0 : (c > 7 ? 7 : c);
                ftm[a] = ((float)fc[a] - e + (step[a] > 0 ? 1.0f : 0.0f)) * rdir[a];
                if (std::isnan(ftm[a])) ftm[a] = BIG;
            }
            float ft = 0.0f;
            bool exited = false;
            while (steps < MAX_STEPS) {
                int vx = cell[0] * BRICK + fc[0];
                int vy = cell[1] * BRICK + fc[1];
                int vz = cell[2] * BRICK + fc[2];
                int mat = voxel_at(g, vx, vy, vz);
                if (mat != 0) {
                    hit.t = brick_entry_t + ft / g.vpu;
                    hit.mat = mat;
                    hit.axis = steps == 0 ? entry_axis : axis;
                    hit.steps = steps;
                    return hit;
                }
                // A&W fine step (reference comparison order)
                int a;
                if (ftm[0] < ftm[1])
                    a = ftm[0] < ftm[2] ? 0 : 2;
                else
                    a = ftm[1] < ftm[2] ? 1 : 2;
                fc[a] += step[a];
                if (fc[a] < 0 || fc[a] >= BRICK) { exited = true; break; }
                axis = a;
                ft = ftm[a];
                ftm[a] += delta[a];
                steps++;
            }
            if (!exited) break;  // budget exhausted inside brick
        }
        // A&W brick step
        int a;
        if (tmax3[0] < tmax3[1])
            a = tmax3[0] < tmax3[2] ? 0 : 2;
        else
            a = tmax3[1] < tmax3[2] ? 1 : 2;
        cell[a] += step[a];
        if (cell[a] < 0 || cell[a] >= bs3[a]) break;
        axis = a;
        t = tmax3[a];
        tmax3[a] += delta[a];
        steps++;
    }
    hit.steps = steps;
    return hit;
}

}  // namespace

extern "C" {

// rays: (n, 6) [ox oy oz dx dy dz]; out: (n, 4) [t mat axis steps]
void oracle_trace(const uint8_t *vox, const int32_t *occ, int gx, int gy,
                  int gz, int bx, int by, int bz, float vpu,
                  const float *rays, int n, float *out) {
    Grid g{vox, occ, gx, gy, gz, bx, by, bz, vpu};
    for (int i = 0; i < n; i++) {
        V3 o{rays[i * 6 + 0], rays[i * 6 + 1], rays[i * 6 + 2]};
        V3 d{rays[i * 6 + 3], rays[i * 6 + 4], rays[i * 6 + 5]};
        Hit h = trace_one(g, o, d);
        out[i * 4 + 0] = h.t;
        out[i * 4 + 1] = (float)h.mat;
        out[i * 4 + 2] = (float)h.axis;
        out[i * 4 + 3] = (float)h.steps;
    }
}
}
