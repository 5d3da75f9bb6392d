// Marker-based watershed (skimage-compatible priority flood).
//
// Used by the HoVerNet-family instance postprocessing
// (models/architecture/hovernet.py) in place of the Python heapq
// flood; semantics match skimage.segmentation.watershed(image,
// markers, mask=mask): ascending image order, FIFO tie-break,
// 4-connectivity, labels only grow into masked unlabeled pixels.

#include <cstdint>
#include <queue>
#include <vector>

namespace {

struct Node {
    float value;
    uint64_t order;
    int32_t y;
    int32_t x;
};

struct NodeGreater {
    bool operator()(const Node& a, const Node& b) const {
        if (a.value != b.value) return a.value > b.value;
        return a.order > b.order;
    }
};

}  // namespace

extern "C" int tiatpu_watershed(const float* image, const int32_t* markers,
                                const uint8_t* mask, int h, int w,
                                int32_t* out) {
    const int64_t n = static_cast<int64_t>(h) * w;
    // out: marker label inside mask, -1 outside (finalised to 0 later)
    for (int64_t i = 0; i < n; ++i) {
        out[i] = mask[i] ? markers[i] : -1;
    }
    std::priority_queue<Node, std::vector<Node>, NodeGreater> heap;
    uint64_t counter = 0;
    for (int32_t y = 0; y < h; ++y) {
        const int64_t row = static_cast<int64_t>(y) * w;
        for (int32_t x = 0; x < w; ++x) {
            const int64_t i = row + x;
            if (markers[i] > 0 && mask[i]) {
                heap.push({image[i], counter++, y, x});
            }
        }
    }
    const int32_t dy[4] = {-1, 1, 0, 0};
    const int32_t dx[4] = {0, 0, -1, 1};
    while (!heap.empty()) {
        const Node node = heap.top();
        heap.pop();
        const int32_t label = out[static_cast<int64_t>(node.y) * w + node.x];
        for (int k = 0; k < 4; ++k) {
            const int32_t ny = node.y + dy[k];
            const int32_t nx = node.x + dx[k];
            if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
            const int64_t ni = static_cast<int64_t>(ny) * w + nx;
            if (out[ni] == 0) {
                out[ni] = label;
                heap.push({image[ni], counter++, ny, nx});
            }
        }
    }
    for (int64_t i = 0; i < n; ++i) {
        if (out[i] < 0) out[i] = 0;
    }
    return 0;
}
