// vitseg_native — host-side runtime kernels for the data/eval pipeline.
//
// The reference outsources these to scipy/skimage inside dataloader workers
// and eval scripts (scipy.ndimage.distance_transform_edt at reference
// model/PAED/segmentation.py:22-25, skimage skeletonize at :102-109,
// scipy.ndimage.label at model/CE/datasetTestViTmodel.py:27-35, per-pixel
// np.vectorize remap at model/CE/classes.py:81). Here they are first-party
// C++ with ctypes bindings (visiontransformer_tpu/native/__init__.py) and
// pure-Python fallbacks, so the framework carries no scipy/skimage
// dependency on its hot path.
//
// All functions use C linkage and operate on caller-allocated buffers.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Zhang-Suen thinning. img: h*w uint8 (0/1), modified in place.
// Returns number of iterations executed.
int vn_skeletonize(uint8_t* img, int h, int w, int max_iters) {
    std::vector<uint8_t> pad((h + 2) * (w + 2));
    const int pw = w + 2;
    auto at = [&](int r, int c) -> uint8_t& { return pad[r * pw + c]; };

    int iters = 0;
    bool changed = true;
    std::vector<int> kill;
    kill.reserve(h * w / 8);

    while (changed && iters < max_iters) {
        changed = false;
        for (int step = 0; step < 2; ++step) {
            std::fill(pad.begin(), pad.end(), 0);
            for (int r = 0; r < h; ++r)
                std::memcpy(&pad[(r + 1) * pw + 1], img + r * w, w);

            kill.clear();
            for (int r = 1; r <= h; ++r) {
                for (int c = 1; c <= w; ++c) {
                    if (!at(r, c)) continue;
                    const uint8_t p2 = at(r - 1, c), p3 = at(r - 1, c + 1),
                                  p4 = at(r, c + 1), p5 = at(r + 1, c + 1),
                                  p6 = at(r + 1, c), p7 = at(r + 1, c - 1),
                                  p8 = at(r, c - 1), p9 = at(r - 1, c - 1);
                    const int b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9;
                    if (b < 2 || b > 6) continue;
                    const uint8_t ring[9] = {p2, p3, p4, p5, p6, p7, p8, p9, p2};
                    int a = 0;
                    for (int i = 0; i < 8; ++i)
                        if (ring[i] == 0 && ring[i + 1] == 1) ++a;
                    if (a != 1) continue;
                    const bool cond = step == 0
                        ? (p2 * p4 * p6 == 0 && p4 * p6 * p8 == 0)
                        : (p2 * p4 * p8 == 0 && p2 * p6 * p8 == 0);
                    if (cond) kill.push_back((r - 1) * w + (c - 1));
                }
            }
            if (!kill.empty()) {
                changed = true;
                for (int idx : kill) img[idx] = 0;
            }
        }
        ++iters;
    }
    return iters;
}

// ---------------------------------------------------------------------------
// 4-connected components, two-pass union-find.
// mask: h*w uint8; labels out: h*w int32 (1..n consecutive). Returns n.
static int uf_find(std::vector<int>& parent, int x) {
    int root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) { int next = parent[x]; parent[x] = root; x = next; }
    return root;
}

int vn_label(const uint8_t* mask, int32_t* labels, int h, int w) {
    std::vector<int> parent(1, 0);
    int next_label = 1;

    for (int r = 0; r < h; ++r) {
        for (int c = 0; c < w; ++c) {
            const int i = r * w + c;
            if (!mask[i]) { labels[i] = 0; continue; }
            const int up = r > 0 ? labels[i - w] : 0;
            const int left = c > 0 ? labels[i - 1] : 0;
            if (!up && !left) {
                parent.push_back(next_label);
                labels[i] = next_label++;
            } else if (up && left) {
                int ru = uf_find(parent, up), rl = uf_find(parent, left);
                labels[i] = std::min(ru, rl);
                if (ru != rl) parent[std::max(ru, rl)] = std::min(ru, rl);
            } else {
                labels[i] = up ? up : left;
            }
        }
    }

    std::vector<int> remap(next_label, 0);
    int count = 0;
    for (int i = 0; i < h * w; ++i) {
        if (!labels[i]) continue;
        const int root = uf_find(parent, labels[i]);
        if (!remap[root]) remap[root] = ++count;
        labels[i] = remap[root];
    }
    return count;
}

// Per-label bounding boxes from a label image (labels 1..n).
// boxes out: n*4 int32 (y_min, x_min, y_max, x_max).
void vn_bounding_boxes(const int32_t* labels, int n, int32_t* boxes,
                       int h, int w) {
    for (int i = 0; i < n; ++i) {
        boxes[i * 4 + 0] = h; boxes[i * 4 + 1] = w;
        boxes[i * 4 + 2] = -1; boxes[i * 4 + 3] = -1;
    }
    for (int r = 0; r < h; ++r) {
        for (int c = 0; c < w; ++c) {
            const int lab = labels[r * w + c];
            if (lab <= 0 || lab > n) continue;
            int32_t* b = boxes + (lab - 1) * 4;
            b[0] = std::min(b[0], r); b[1] = std::min(b[1], c);
            b[2] = std::max(b[2], r); b[3] = std::max(b[3], c);
        }
    }
}

// ---------------------------------------------------------------------------
// Single-pass multiclass detections: 4-connected components within each
// class of an int32 class mask (0 = background), plus per-component
// bounding boxes, in one traversal. Replaces the per-class
// (mask==cls -> label -> boxes) loop, which re-scans the image once per
// class (17x for the CE sweep head) on the serving hot path.
//
// out: capacity*5 int32 rows (class, y_min, x_min, y_max, x_max).
// Returns the number of components (rows written = min(n, capacity)).
int vn_detections(const int32_t* classes, int32_t* scratch_labels,
                  int h, int w, int32_t* out, int capacity) {
    std::vector<int> parent(1, 0);
    int next_label = 1;
    int32_t* labels = scratch_labels;

    for (int r = 0; r < h; ++r) {
        for (int c = 0; c < w; ++c) {
            const int i = r * w + c;
            const int32_t cls = classes[i];
            if (!cls) { labels[i] = 0; continue; }
            const int up = (r > 0 && classes[i - w] == cls) ? labels[i - w] : 0;
            const int left = (c > 0 && classes[i - 1] == cls) ? labels[i - 1] : 0;
            if (!up && !left) {
                parent.push_back(next_label);
                labels[i] = next_label++;
            } else if (up && left) {
                int ru = uf_find(parent, up), rl = uf_find(parent, left);
                labels[i] = std::min(ru, rl);
                if (ru != rl) parent[std::max(ru, rl)] = std::min(ru, rl);
            } else {
                labels[i] = up ? up : left;
            }
        }
    }

    std::vector<int> remap(next_label, 0);
    int count = 0;
    for (int i = 0; i < h * w; ++i) {
        if (!labels[i]) continue;
        const int root = uf_find(parent, labels[i]);
        if (!remap[root]) {
            remap[root] = ++count;
            if (count <= capacity) {
                int32_t* b = out + (count - 1) * 5;
                b[0] = classes[i];
                b[1] = h; b[2] = w; b[3] = -1; b[4] = -1;
            }
        }
        labels[i] = remap[root];
        if (labels[i] <= capacity) {
            int32_t* b = out + (labels[i] - 1) * 5;
            const int r = i / w, c = i % w;
            b[1] = std::min(b[1], r); b[2] = std::min(b[2], c);
            b[3] = std::max(b[3], r); b[4] = std::max(b[4], c);
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// Exact Euclidean distance transform (Felzenszwalb-Huttenlocher).
// mask: h*w uint8. out: h*w float32 = distance of nonzero pixels to the
// nearest zero pixel (scipy.ndimage.distance_transform_edt semantics).
static void edt_1d(const float* f, float* d, int n, std::vector<int>& v,
                   std::vector<float>& z) {
    v.assign(n, 0);
    z.assign(n + 1, 0.f);
    int k = 0;
    v[0] = 0;
    z[0] = -1e20f;
    z[1] = 1e20f;
    for (int q = 1; q < n; ++q) {
        float s;
        while (true) {
            s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k])) /
                (2.f * q - 2.f * v[k]);
            if (s <= z[k]) { --k; } else break;
        }
        ++k;
        v[k] = q;
        z[k] = s;
        z[k + 1] = 1e20f;
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (z[k + 1] < q) ++k;
        const float dq = q - (float)v[k];
        d[q] = dq * dq + f[v[k]];
    }
}

void vn_edt(const uint8_t* mask, float* out, int h, int w) {
    const float INF = 1e20f;
    std::vector<float> f(std::max(h, w)), d(std::max(h, w));
    std::vector<int> v;
    std::vector<float> z;

    // column pass
    std::vector<float> tmp(h * (size_t)w);
    for (int c = 0; c < w; ++c) {
        for (int r = 0; r < h; ++r) f[r] = mask[r * w + c] ? INF : 0.f;
        edt_1d(f.data(), d.data(), h, v, z);
        for (int r = 0; r < h; ++r) tmp[r * (size_t)w + c] = d[r];
    }
    // row pass
    for (int r = 0; r < h; ++r) {
        edt_1d(&tmp[r * (size_t)w], d.data(), w, v, z);
        for (int c = 0; c < w; ++c) out[r * w + c] = std::sqrt(d[c]);
    }
}

// ---------------------------------------------------------------------------
// 256-entry LUT remap: grayscale mask value -> class index.
void vn_remap_u8(const uint8_t* in, const int32_t* lut256, int32_t* out,
                 long n) {
    for (long i = 0; i < n; ++i) out[i] = lut256[in[i]];
}

// ---------------------------------------------------------------------------
// PIL-exact NEAREST resize for uint8 images (the incremental-accumulation
// coordinate rule; see visiontransformer_tpu/ops/resize.py).
void vn_resize_nearest_pil_u8(const uint8_t* in, uint8_t* out, int ih, int iw,
                              int oh, int ow) {
    std::vector<int> cols(ow), rows(oh);
    {
        const double sc = (double)iw / ow;
        double xo = sc * 0.5;
        for (int c = 0; c < ow; ++c) {
            cols[c] = std::min((int)xo, iw - 1);
            xo += sc;
        }
        const double sr = (double)ih / oh;
        double yo = sr * 0.5;
        for (int r = 0; r < oh; ++r) {
            rows[r] = std::min((int)yo, ih - 1);
            yo += sr;
        }
    }
    for (int r = 0; r < oh; ++r) {
        const uint8_t* src = in + rows[r] * (size_t)iw;
        uint8_t* dst = out + r * (size_t)ow;
        for (int c = 0; c < ow; ++c) dst[c] = src[cols[c]];
    }
}

}  // extern "C"
