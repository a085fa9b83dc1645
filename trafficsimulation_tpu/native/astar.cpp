// Host-side grid A* — the native fallback path of the framework.
//
// Counterpart of the reference's pybind11 module (`astar_cpp.cpp:1-129`),
// rebuilt with the FULL cost model of the reference's Numba planner
// (`astar_numba.py:87-239`), which the reference C++ backend silently
// dropped (no turn/road-type/contraflow/density penalties — SURVEY §2.2):
//   base 1 per edge
//   + turn penalty when the move direction changes
//   + road-type penalty of the entered cell (R1/R2/R3)
//   + soft obstacles: vehicle penalty x (1 + dyn_scale * density),
//     stop penalty; hard mode skips those edges entirely
//   + contraflow penalty when ignore_flow allows off-arrow moves
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC astar.cpp -o libastar.so

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <cmath>

namespace {

struct Node {
    float f;
    float g;
    int idx;
    int steps;
    int8_t dir;
};

struct NodeCmp {
    bool operator()(const Node& a, const Node& b) const { return a.f > b.f; }
};

// direction order N, E, S, W; N = +y, E = +x (codes.py convention)
const int DX[4] = {0, 1, 0, -1};
const int DY[4] = {1, 0, -1, 0};

}  // namespace

extern "C" int astar_grid(
    int width, int height, int sx, int sy, int gx, int gy,
    const uint8_t* occupancy, const uint8_t* stop_map,
    const uint8_t* is_road, const uint8_t* road_type,
    const uint8_t* allowed_dirs, const float* density,
    int soft_obstacles, int ignore_flow, int max_steps,
    float turn_penalty, float pen_r1, float pen_r2, float pen_r3,
    float veh_penalty, float stop_penalty, float contra_penalty,
    float dyn_scale, int dynamic_enabled,
    int32_t* out_xy, int out_cap) {
    const int n = width * height;
    const int start = sy * width + sx;
    const int goal = gy * width + gx;
    if (start < 0 || start >= n || goal < 0 || goal >= n) return -1;

    std::vector<float> dist(n, 1e30f);
    std::vector<int32_t> came(n, -1);
    std::priority_queue<Node, std::vector<Node>, NodeCmp> heap;

    dist[start] = 0.0f;
    const float h0 = float(std::abs(sx - gx) + std::abs(sy - gy));
    heap.push({h0, 0.0f, start, 0, -1});

    const float road_pen[4] = {0.0f, pen_r1, pen_r2, pen_r3};

    while (!heap.empty()) {
        Node cur = heap.top();
        heap.pop();
        if (cur.idx == goal) {
            // reconstruct (excluding the start cell, like the reference)
            std::vector<int32_t> rev;
            for (int i = cur.idx; i != start; i = came[i]) rev.push_back(i);
            const int len = int(rev.size());
            if (len > out_cap) return -2;
            for (int k = 0; k < len; ++k) {
                const int cell = rev[len - 1 - k];
                out_xy[2 * k] = cell % width;
                out_xy[2 * k + 1] = cell / width;
            }
            return len;
        }
        if (cur.g > dist[cur.idx]) continue;

        const int cx = cur.idx % width;
        const int cy = cur.idx / width;
        const uint8_t bits = allowed_dirs[cur.idx];

        for (int d = 0; d < 4; ++d) {
            const int nx = cx + DX[d];
            const int ny = cy + DY[d];
            if (nx < 0 || nx >= width || ny < 0 || ny >= height) continue;
            const int ns = cur.steps + 1;
            if (max_steps > 0 && ns > max_steps) continue;
            const int nidx = ny * width + nx;
            float ng = cur.g + 1.0f;

            if (turn_penalty > 0 && cur.dir != -1 && d != cur.dir)
                ng += turn_penalty;

            if (!(bits & (1 << d))) {
                if (ignore_flow && is_road[nidx]) ng += contra_penalty;
                else continue;
            }

            if (occupancy[nidx]) {
                if (soft_obstacles) {
                    float p = veh_penalty;
                    if (dynamic_enabled)
                        p *= (1.0f + dyn_scale * density[nidx]);
                    ng += p;
                } else {
                    continue;
                }
            }
            if (stop_map[nidx]) {
                if (soft_obstacles) ng += stop_penalty;
                else continue;
            }
            if (is_road[nidx]) {
                const int rt = road_type[nidx];
                if (rt >= 1 && rt <= 3) ng += road_pen[rt];
            }

            if (ng < dist[nidx]) {
                dist[nidx] = ng;
                came[nidx] = cur.idx;
                const float h = float(std::abs(nx - gx) + std::abs(ny - gy));
                heap.push({ng + h, ng, nidx, ns, int8_t(d)});
            }
        }
    }
    return 0;  // no path
}

// Batched planner: plans many (start, goal) pairs over the shared maps.
// Paths are written back-to-back; out_offsets[i] = begin of path i.
extern "C" int astar_grid_batch(
    int width, int height, int n_pairs,
    const int32_t* starts_xy, const int32_t* goals_xy,
    const uint8_t* occupancy, const uint8_t* stop_map,
    const uint8_t* is_road, const uint8_t* road_type,
    const uint8_t* allowed_dirs, const float* density,
    int soft_obstacles, int ignore_flow, int max_steps,
    float turn_penalty, float pen_r1, float pen_r2, float pen_r3,
    float veh_penalty, float stop_penalty, float contra_penalty,
    float dyn_scale, int dynamic_enabled,
    int32_t* out_xy, int32_t* out_offsets, int32_t* out_lens,
    int out_cap) {
    int cursor = 0;
    for (int i = 0; i < n_pairs; ++i) {
        out_offsets[i] = cursor;
        const int len = astar_grid(
            width, height, starts_xy[2 * i], starts_xy[2 * i + 1],
            goals_xy[2 * i], goals_xy[2 * i + 1],
            occupancy, stop_map, is_road, road_type, allowed_dirs, density,
            soft_obstacles, ignore_flow, max_steps, turn_penalty,
            pen_r1, pen_r2, pen_r3, veh_penalty, stop_penalty,
            contra_penalty, dyn_scale, dynamic_enabled,
            out_xy + 2 * cursor, out_cap - cursor);
        out_lens[i] = len < 0 ? 0 : len;
        if (len > 0) cursor += len;
    }
    return cursor;
}
