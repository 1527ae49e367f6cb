// echoscene_native: host-side geometry kernels for the eval pipeline.
//
// Native equivalents of the reference's C++/CUDA components:
//   * chamfer nearest-neighbor distances  (extension/old_chamfer/chamfer.cu)
//   * approximate EMD via auction         (scripts/StructuralLosses prebuilt lib)
// plus the mesh machinery the reference outsources to python packages that are
// not assumed here:
//   * marching cubes (SDF grid -> triangle mesh; replaces mcubes)
//   * area-weighted surface point sampling (replaces trimesh.sample)
//
// Exposed as a C ABI for ctypes (no pybind11 dependency).  Build: see Makefile.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <random>
#include <limits>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// Chamfer: for each point in A find squared distance to nearest point in B.
// Blocked brute force; O(N*M) but cache-friendly.  Mirrors the semantics of
// NmDistanceKernel (chamfer.cu:12-133): squared L2, plus the matching index.
// ---------------------------------------------------------------------------
void nn_distance(const float* a, int n, const float* b, int m,
                 float* dist_out, int* idx_out) {
    constexpr int BLOCK = 256;
    for (int i = 0; i < n; ++i) {
        dist_out[i] = std::numeric_limits<float>::max();
        idx_out[i] = -1;
    }
    for (int jb = 0; jb < m; jb += BLOCK) {
        int je = std::min(m, jb + BLOCK);
        for (int i = 0; i < n; ++i) {
            const float ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
            float best = dist_out[i];
            int besti = idx_out[i];
            for (int j = jb; j < je; ++j) {
                const float dx = ax - b[3 * j];
                const float dy = ay - b[3 * j + 1];
                const float dz = az - b[3 * j + 2];
                const float d = dx * dx + dy * dy + dz * dz;
                if (d < best) { best = d; besti = j; }
            }
            dist_out[i] = best;
            idx_out[i] = besti;
        }
    }
}

// chamfer distance for a batch of pairs: returns per-pair
// mean_i d(a_i->B) + mean_j d(b_j->A)   (compute_mmd_cov_1nn.py:88)
void chamfer_batch(const float* a, const float* b, int bs, int n, int m,
                   float* out) {
    std::vector<float> da(n), db(m);
    std::vector<int> ia(n), ib(m);
    for (int k = 0; k < bs; ++k) {
        const float* ak = a + (size_t)k * n * 3;
        const float* bk = b + (size_t)k * m * 3;
        nn_distance(ak, n, bk, m, da.data(), ia.data());
        nn_distance(bk, m, ak, n, db.data(), ib.data());
        double s1 = 0, s2 = 0;
        for (int i = 0; i < n; ++i) s1 += da[i];
        for (int j = 0; j < m; ++j) s2 += db[j];
        out[k] = (float)(s1 / n + s2 / m);
    }
}

// ---------------------------------------------------------------------------
// Approximate EMD via auction algorithm (epsilon-scaled).  Upper-bounds the
// exact assignment cost; same role as the reference's ApproxMatch/MatchCost.
// Returns mean matched Euclidean distance.
// ---------------------------------------------------------------------------
float emd_auction_pair(const float* a, const float* b, int n, int iters) {
    std::vector<float> price(n, 0.f);
    std::vector<int> owner(n, -1);       // owner[j] = row owning column j
    std::vector<int> assign(n, -1);      // assign[i] = column owned by row i
    std::vector<float> dist((size_t)n * n);
    double dsum = 0;
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
            const float dx = a[3 * i] - b[3 * j];
            const float dy = a[3 * i + 1] - b[3 * j + 1];
            const float dz = a[3 * i + 2] - b[3 * j + 2];
            const float d = std::sqrt(dx * dx + dy * dy + dz * dz);
            dist[(size_t)i * n + j] = d;
            dsum += d;
        }
    const float eps = (float)(0.01 * dsum / ((double)n * n) + 1e-9);

    std::vector<int> unassigned;
    unassigned.reserve(n);
    for (int i = 0; i < n; ++i) unassigned.push_back(i);

    for (int it = 0; it < iters && !unassigned.empty(); ++it) {
        std::vector<int> next_unassigned;
        for (int i : unassigned) {
            // find best and second-best column for row i
            const float* di = dist.data() + (size_t)i * n;
            float best = std::numeric_limits<float>::max(), second = best;
            int bj = -1;
            for (int j = 0; j < n; ++j) {
                const float c = di[j] + price[j];
                if (c < best) { second = best; best = c; bj = j; }
                else if (c < second) { second = c; }
            }
            price[bj] += (second - best) + eps;
            int prev = owner[bj];
            owner[bj] = i;
            assign[i] = bj;
            if (prev >= 0) { assign[prev] = -1; next_unassigned.push_back(prev); }
        }
        unassigned.swap(next_unassigned);
    }
    // greedy cleanup for anything still unassigned after the iteration cap
    for (int i = 0; i < n; ++i) {
        if (assign[i] >= 0) continue;
        const float* di = dist.data() + (size_t)i * n;
        float best = std::numeric_limits<float>::max();
        int bj = -1;
        for (int j = 0; j < n; ++j)
            if (owner[j] < 0 && di[j] < best) { best = di[j]; bj = j; }
        if (bj < 0) {  // all owned: steal nearest
            for (int j = 0; j < n; ++j)
                if (di[j] < best) { best = di[j]; bj = j; }
        } else {
            owner[bj] = i;
        }
        assign[i] = bj;
    }
    double total = 0;
    for (int i = 0; i < n; ++i) total += dist[(size_t)i * n + assign[i]];
    return (float)(total / n);
}

void emd_batch(const float* a, const float* b, int bs, int n, int iters,
               float* out) {
    for (int k = 0; k < bs; ++k)
        out[k] = emd_auction_pair(a + (size_t)k * n * 3,
                                  b + (size_t)k * n * 3, n, iters);
}

// ---------------------------------------------------------------------------
// Isosurface extraction via marching TETRAHEDRA: each cell is split into six
// tetrahedra; a tet crossed by the isosurface emits one or two triangles with
// vertices linearly interpolated along crossing edges.  Table-free, crack-free
// (shared diagonals), adequate for the SDF->mesh uses here (point sampling,
// rendering) — the role mcubes plays in the reference
// (model/diff_utils/util_3d.py:194-236).
//
// Vertices are WELDED: every emitted vertex lies on a lattice edge (tet
// corners are always grid points), so a hash keyed by the edge's two lattice
// ids dedups shared vertices exactly — output is an indexed mesh with ~6x
// fewer vertices than the per-triangle soup, which shrinks every downstream
// host pass (box fitting, serialization) proportionally.
// ---------------------------------------------------------------------------
static inline void vert_interp(float level, const float* p1, const float* p2,
                               float v1, float v2, float* out) {
    float mu = (std::fabs(v2 - v1) > 1e-12f) ? (level - v1) / (v2 - v1) : 0.5f;
    if (mu < 0.f) mu = 0.f;
    if (mu > 1.f) mu = 1.f;
    out[0] = p1[0] + mu * (p2[0] - p1[0]);
    out[1] = p1[1] + mu * (p2[1] - p1[1]);
    out[2] = p1[2] + mu * (p2[2] - p1[2]);
}

struct WeldCtx {
    std::unordered_map<uint64_t, int32_t> map;
    float* verts;
    int max_verts;
    int nv = 0;
};

// vertex on the lattice edge (ia, ib); canonical orientation (smaller id
// first) makes the interpolated position bit-identical across the tets that
// share the edge, so the hash weld is exact.  Returns -1 on overflow.
static int32_t weld_vert(WeldCtx& W, float level, uint64_t ia, uint64_t ib,
                         const float* pa, const float* pb, float va, float vb) {
    if (ia > ib) {
        std::swap(ia, ib);
        std::swap(pa, pb);
        std::swap(va, vb);
    }
    const uint64_t key = (ia << 32) | ib;
    auto it = W.map.find(key);
    if (it != W.map.end()) return it->second;
    if (W.nv >= W.max_verts) return -1;
    vert_interp(level, pa, pb, va, vb, W.verts + 3 * W.nv);
    const int32_t id = W.nv++;
    W.map.emplace(key, id);
    return id;
}

// emit triangles for one tetrahedron; returns triangles written (0..2)
static int do_tet(WeldCtx& W, float level, const float p[4][3], const float v[4],
                  const uint64_t ids[4], int32_t* tris_out, int nt, int max_tris) {
    int inside = 0;
    for (int i = 0; i < 4; ++i)
        if (v[i] < level) inside |= (1 << i);
    if (inside == 0 || inside == 15) return 0;

    // collect crossing edges (pairs with differing sides)
    static const int E[6][2] = {{0,1},{0,2},{0,3},{1,2},{1,3},{2,3}};
    int32_t vid[4];
    int np = 0;
    for (int e = 0; e < 6; ++e) {
        const int a = E[e][0], b = E[e][1];
        const bool ia = (inside >> a) & 1, ib = (inside >> b) & 1;
        if (ia != ib && np < 4)
            vid[np++] = weld_vert(W, level, ids[a], ids[b], p[a], p[b],
                                  v[a], v[b]);
    }
    int emitted = 0;
    auto emit = [&](int i0, int i1, int i2) {
        if (nt + emitted >= max_tris) return;
        if (vid[i0] < 0 || vid[i1] < 0 || vid[i2] < 0) return;
        int32_t* to = tris_out + 3 * (nt + emitted);
        to[0] = vid[i0];
        to[1] = vid[i1];
        to[2] = vid[i2];
        ++emitted;
    };
    if (np == 3) {
        emit(0, 1, 2);
    } else if (np == 4) {
        // quad -> two triangles.  Crossing edges were enumerated in a fixed
        // order; (0,1,2) and (1,3,2) triangulate the quad without folding for
        // the one-in/one-out == 2/2 split cases.
        emit(0, 1, 2);
        emit(1, 3, 2);
    }
    return emitted;
}

// returns number of triangles written and the welded vertex count via
// nv_out; caller provides capacities.
int marching_cubes(const float* grid, int res, float level,
                   float* verts_out, int max_verts,
                   int32_t* tris_out, int max_tris, int32_t* nv_out) {
    // weld keys pack two lattice ids as (ia << 32) | ib; ids reach res^3 - 1,
    // so res^3 must fit 32 bits or unrelated edges silently collide.
    // res <= 1625; real grids are 64-256.  Signal the caller with -1.
    if ((uint64_t)res * res * res >= (1ull << 32)) {
        *nv_out = 0;
        return -1;
    }
    int nt = 0;
    const int r = res, r2 = res * res;
    auto G = [&](int x, int y, int z) -> float {
        return grid[(size_t)x * r2 + (size_t)y * r + z];
    };
    static const int cx[8] = {0, 1, 1, 0, 0, 1, 1, 0};
    static const int cy[8] = {0, 0, 1, 1, 0, 0, 1, 1};
    static const int cz[8] = {0, 0, 0, 0, 1, 1, 1, 1};
    // six tetrahedra sharing the 0-6 diagonal
    static const int TETS[6][4] = {
        {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
        {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

    WeldCtx W;
    W.verts = verts_out;
    W.max_verts = max_verts;
    W.map.reserve((size_t)std::min(max_tris, 1 << 20));

    float cube[8];
    float pos[8][3];
    uint64_t gid[8];
    for (int x = 0; x < res - 1; ++x)
        for (int y = 0; y < res - 1; ++y)
            for (int z = 0; z < res - 1; ++z) {
                bool any_in = false, any_out = false;
                for (int c = 0; c < 8; ++c) {
                    const int xx = x + cx[c], yy = y + cy[c], zz = z + cz[c];
                    cube[c] = G(xx, yy, zz);
                    pos[c][0] = (float)xx;
                    pos[c][1] = (float)yy;
                    pos[c][2] = (float)zz;
                    gid[c] = (uint64_t)xx * r2 + (uint64_t)yy * r + zz;
                    (cube[c] < level ? any_in : any_out) = true;
                }
                if (!any_in || !any_out) continue;
                for (int t = 0; t < 6; ++t) {
                    float tp[4][3], tv[4];
                    uint64_t tid[4];
                    for (int k = 0; k < 4; ++k) {
                        std::memcpy(tp[k], pos[TETS[t][k]], 3 * sizeof(float));
                        tv[k] = cube[TETS[t][k]];
                        tid[k] = gid[TETS[t][k]];
                    }
                    nt += do_tet(W, level, tp, tv, tid, tris_out, nt, max_tris);
                }
            }
    *nv_out = W.nv;
    return nt;
}

// ---------------------------------------------------------------------------
// Area-weighted uniform surface sampling of a triangle soup.
// ---------------------------------------------------------------------------
void sample_mesh(const float* verts, const int32_t* tris, int n_tris,
                 int n_samples, uint64_t seed, float* out) {
    std::vector<double> cum(n_tris);
    double total = 0;
    for (int t = 0; t < n_tris; ++t) {
        const float* A = verts + 3 * tris[3 * t];
        const float* B = verts + 3 * tris[3 * t + 1];
        const float* C = verts + 3 * tris[3 * t + 2];
        const double ux = B[0] - A[0], uy = B[1] - A[1], uz = B[2] - A[2];
        const double vx = C[0] - A[0], vy = C[1] - A[1], vz = C[2] - A[2];
        const double nx = uy * vz - uz * vy;
        const double ny = uz * vx - ux * vz;
        const double nz = ux * vy - uy * vx;
        total += 0.5 * std::sqrt(nx * nx + ny * ny + nz * nz);
        cum[t] = total;
    }
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    for (int s = 0; s < n_samples; ++s) {
        double r = uni(rng) * total;
        int t = (int)(std::lower_bound(cum.begin(), cum.end(), r) - cum.begin());
        if (t >= n_tris) t = n_tris - 1;
        const float* A = verts + 3 * tris[3 * t];
        const float* B = verts + 3 * tris[3 * t + 1];
        const float* C = verts + 3 * tris[3 * t + 2];
        double u = uni(rng), v = uni(rng);
        if (u + v > 1.0) { u = 1.0 - u; v = 1.0 - v; }
        for (int k = 0; k < 3; ++k)
            out[3 * s + k] = (float)(A[k] + u * (B[k] - A[k]) + v * (C[k] - A[k]));
    }
}

// ---------------------------------------------------------------------------
// Minimal perspective rasterizer with z-buffer and Lambertian shading —
// the software replacement for the reference's pyrender EGL offscreen
// top-down renders (helpers/visualize_scene.py:122-153): perspective camera
// (yfov pi/2) at (0, 8, 0) looking at the origin, up = -z, headlight.
// verts: (V,3) world; tris: (T,3); colors: (T,3) float 0..1 per triangle.
// image_out: (H,W,3) uint8, row-major, background white.
// ---------------------------------------------------------------------------
void rasterize_topdown(const float* verts, const int32_t* tris,
                       const float* colors, int n_tris,
                       float cam_height, float yfov,
                       uint8_t* image_out, int width, int height) {
    const float f = 1.0f / std::tan(yfov * 0.5f);   // focal (y)
    const float aspect = (float)width / (float)height;
    std::vector<float> zbuf((size_t)width * height,
                            std::numeric_limits<float>::max());
    std::memset(image_out, 255, (size_t)width * height * 3);

    // camera at (0, h, 0), forward = -y, right = +x, up(view) = -z
    auto to_cam = [&](const float* p, float* out) {
        out[0] = p[0];                 // right
        out[1] = -p[2];                // up in view = -z world
        out[2] = cam_height - p[1];    // depth along -y (positive in front)
    };
    const float Ld[3] = {0.f, 1.f, 0.f};  // headlight from above

    for (int t = 0; t < n_tris; ++t) {
        const float* A = verts + 3 * tris[3 * t];
        const float* B = verts + 3 * tris[3 * t + 1];
        const float* C = verts + 3 * tris[3 * t + 2];
        float a[3], b[3], c[3];
        to_cam(A, a); to_cam(B, b); to_cam(C, c);
        if (a[2] <= 1e-4f || b[2] <= 1e-4f || c[2] <= 1e-4f) continue;
        // project
        auto px = [&](const float* v, float* sx, float* sy) {
            *sx = (v[0] * f / aspect / v[2] * 0.5f + 0.5f) * width;
            *sy = (1.0f - (v[1] * f / v[2] * 0.5f + 0.5f)) * height;
        };
        float ax, ay, bx, by, cx, cy;
        px(a, &ax, &ay); px(b, &bx, &by); px(c, &cx, &cy);
        // normal / shading (world-space)
        const float ux = B[0]-A[0], uy = B[1]-A[1], uz = B[2]-A[2];
        const float vx = C[0]-A[0], vy = C[1]-A[1], vz = C[2]-A[2];
        float nx = uy*vz - uz*vy, ny = uz*vx - ux*vz, nz = ux*vy - uy*vx;
        const float nl = std::sqrt(nx*nx + ny*ny + nz*nz) + 1e-12f;
        nx /= nl; ny /= nl; nz /= nl;
        float lam = std::fabs(nx*Ld[0] + ny*Ld[1] + nz*Ld[2]);
        lam = 0.35f + 0.65f * lam;
        const float cr = colors[3*t] * lam, cg = colors[3*t+1] * lam,
                    cb = colors[3*t+2] * lam;

        const int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
        const int x1 = std::min(width - 1, (int)std::ceil(std::max({ax, bx, cx})));
        const int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
        const int y1 = std::min(height - 1, (int)std::ceil(std::max({ay, by, cy})));
        const float det = (bx-ax)*(cy-ay) - (by-ay)*(cx-ax);
        if (std::fabs(det) < 1e-12f) continue;
        for (int y = y0; y <= y1; ++y)
            for (int x = x0; x <= x1; ++x) {
                const float pxc = x + 0.5f, pyc = y + 0.5f;
                const float w0 = ((bx-pxc)*(cy-pyc) - (by-pyc)*(cx-pxc)) / det;
                const float w1 = ((cx-pxc)*(ay-pyc) - (cy-pyc)*(ax-pxc)) / det;
                const float w2 = 1.f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                const float z = w0*a[2] + w1*b[2] + w2*c[2];
                float* zb = &zbuf[(size_t)y * width + x];
                if (z < *zb) {
                    *zb = z;
                    uint8_t* px8 = image_out + ((size_t)y * width + x) * 3;
                    px8[0] = (uint8_t)std::min(255.f, cr * 255.f);
                    px8[1] = (uint8_t)std::min(255.f, cg * 255.f);
                    px8[2] = (uint8_t)std::min(255.f, cb * 255.f);
                }
            }
    }
}

}  // extern "C"
