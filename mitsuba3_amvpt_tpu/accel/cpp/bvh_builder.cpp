// Binned-SAH BVH builder (host-side native component).
//
// TPU-native replacement for the Embree/OptiX/kd-tree acceleration
// backends of the reference (src/render/scene_embree.inl,
// scene_optix.inl, include/mitsuba/render/kdtree.h).  On TPU there are
// no RT cores and no dlopen'able tracer, so the accel structure is
// built on the host in C++ and exported as flat SoA arrays that the
// JAX/Pallas traversal kernels consume:
//
//   nodes_bbox  : (n_nodes, 6) float32  [min.xyz, max.xyz]
//   nodes_meta  : (n_nodes, 2) int32    interior: [right_child, 0]
//                                        leaf:     [first_prim, count]
//                 (left child of an interior node is node_id + 1)
//   prim_order  : (n_prims,)   int32    leaf-contiguous primitive permutation
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).
//
// Build: full binned SAH (16 bins, largest axis), leaf size <= 4,
// comparable in quality to Embree's default BVH2.

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
    Vec3() : x(0), y(0), z(0) {}
    Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
    float operator[](int i) const { return (&x)[i]; }
    float &operator[](int i) { return (&x)[i]; }
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
    return Vec3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
    return Vec3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
    Vec3 lo, hi;
    AABB() : lo(FLT_MAX, FLT_MAX, FLT_MAX), hi(-FLT_MAX, -FLT_MAX, -FLT_MAX) {}
    void grow(const AABB &o) { lo = vmin(lo, o.lo); hi = vmax(hi, o.hi); }
    void grow(const Vec3 &p) { lo = vmin(lo, p); hi = vmax(hi, p); }
    float half_area() const {
        float dx = std::max(hi.x - lo.x, 0.f);
        float dy = std::max(hi.y - lo.y, 0.f);
        float dz = std::max(hi.z - lo.z, 0.f);
        return dx * dy + dy * dz + dz * dx;
    }
    Vec3 center() const {
        return Vec3(0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y), 0.5f * (lo.z + hi.z));
    }
};

struct BuildPrim {
    AABB box;
    Vec3 centroid;
    int32_t id;
};

struct Node {
    AABB box;
    int32_t a, b;  // interior: [right_child, 0]; leaf: [first, count]
};

constexpr int N_BINS = 16;
constexpr int MAX_LEAF = 4;

struct Builder {
    std::vector<BuildPrim> prims;
    std::vector<Node> nodes;

    int32_t build(int32_t begin, int32_t end) {
        AABB box, cbox;
        for (int32_t i = begin; i < end; ++i) {
            box.grow(prims[i].box);
            cbox.grow(prims[i].centroid);
        }
        int32_t node_id = (int32_t)nodes.size();
        nodes.push_back(Node());
        nodes[node_id].box = box;

        int32_t count = end - begin;
        if (count <= MAX_LEAF) {
            nodes[node_id].a = begin;
            nodes[node_id].b = count;
            return node_id;
        }

        // choose split axis = largest centroid extent
        Vec3 ext(cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y, cbox.hi.z - cbox.lo.z);
        int axis = 0;
        if (ext.y > ext.x) axis = 1;
        if (ext.z > ext[axis]) axis = 2;
        float extent = ext[axis];

        int32_t mid;
        if (extent < 1e-12f) {
            mid = begin + count / 2;  // degenerate: median split
        } else {
            // binned SAH
            AABB bin_box[N_BINS];
            int32_t bin_cnt[N_BINS] = {0};
            float k = N_BINS * (1.0f - 1e-6f) / extent;
            float lo = cbox.lo[axis];
            for (int32_t i = begin; i < end; ++i) {
                int bi = (int)(k * (prims[i].centroid[axis] - lo));
                bi = std::min(std::max(bi, 0), N_BINS - 1);
                bin_box[bi].grow(prims[i].box);
                bin_cnt[bi]++;
            }
            // sweep: suffix areas
            float rarea[N_BINS];
            AABB acc;
            int32_t rcnt[N_BINS];
            int32_t c = 0;
            for (int i = N_BINS - 1; i > 0; --i) {
                acc.grow(bin_box[i]);
                c += bin_cnt[i];
                rarea[i] = acc.half_area();
                rcnt[i] = c;
            }
            acc = AABB();
            c = 0;
            float best_cost = FLT_MAX;
            int best_split = -1;
            for (int i = 0; i < N_BINS - 1; ++i) {
                acc.grow(bin_box[i]);
                c += bin_cnt[i];
                if (c == 0 || c == count) continue;
                float cost = acc.half_area() * c + rarea[i + 1] * rcnt[i + 1];
                if (cost < best_cost) { best_cost = cost; best_split = i; }
            }
            float leaf_cost = box.half_area() * count;
            if (best_split < 0 || (count <= 2 * MAX_LEAF && leaf_cost <= best_cost)) {
                mid = begin + count / 2;
                std::nth_element(prims.begin() + begin, prims.begin() + mid,
                                 prims.begin() + end,
                                 [axis](const BuildPrim &p, const BuildPrim &q) {
                                     return p.centroid[axis] < q.centroid[axis];
                                 });
            } else {
                float split_plane = lo + (best_split + 1) * extent / N_BINS;
                auto it = std::partition(prims.begin() + begin, prims.begin() + end,
                                         [axis, split_plane](const BuildPrim &p) {
                                             return p.centroid[axis] < split_plane;
                                         });
                mid = (int32_t)(it - prims.begin());
                if (mid == begin || mid == end) mid = begin + count / 2;
            }
        }

        int32_t left = build(begin, mid);
        (void)left;  // left == node_id + 1 by construction
        int32_t right = build(mid, end);
        nodes[node_id].a = right;
        nodes[node_id].b = 0;
        return node_id;
    }
};

}  // namespace

extern "C" {

// Build a BVH over a soup of axis-aligned primitive bounds.
//   prim_lo / prim_hi : (n_prims, 3) float32 bounds
//   prim_ctr          : (n_prims, 3) float32 centroids
// Outputs (caller-allocated, capacity 2*n_prims nodes):
//   nodes_bbox (cap, 6) f32, nodes_meta (cap, 2) i32, prim_order (n) i32
// Returns the number of nodes written, or -1 on error.
int32_t bvh_build(const float *prim_lo, const float *prim_hi,
                  const float *prim_ctr, int32_t n_prims,
                  float *nodes_bbox, int32_t *nodes_meta,
                  int32_t *prim_order) {
    if (n_prims <= 0) return -1;
    Builder b;
    b.prims.resize(n_prims);
    for (int32_t i = 0; i < n_prims; ++i) {
        BuildPrim &p = b.prims[i];
        p.box.lo = Vec3(prim_lo[3 * i], prim_lo[3 * i + 1], prim_lo[3 * i + 2]);
        p.box.hi = Vec3(prim_hi[3 * i], prim_hi[3 * i + 1], prim_hi[3 * i + 2]);
        p.centroid = Vec3(prim_ctr[3 * i], prim_ctr[3 * i + 1], prim_ctr[3 * i + 2]);
        p.id = i;
    }
    b.nodes.reserve(2 * n_prims);
    b.build(0, n_prims);
    int32_t n_nodes = (int32_t)b.nodes.size();
    if (n_nodes > 2 * n_prims) return -1;
    for (int32_t i = 0; i < n_nodes; ++i) {
        const Node &n = b.nodes[i];
        nodes_bbox[6 * i + 0] = n.box.lo.x;
        nodes_bbox[6 * i + 1] = n.box.lo.y;
        nodes_bbox[6 * i + 2] = n.box.lo.z;
        nodes_bbox[6 * i + 3] = n.box.hi.x;
        nodes_bbox[6 * i + 4] = n.box.hi.y;
        nodes_bbox[6 * i + 5] = n.box.hi.z;
        nodes_meta[2 * i + 0] = n.a;
        nodes_meta[2 * i + 1] = n.b;
    }
    for (int32_t i = 0; i < n_prims; ++i) prim_order[i] = b.prims[i].id;
    return n_nodes;
}

}  // extern "C"
