// Native host-side LiDAR preprocessing for dspslam_tpu.
//
// The per-frame measurement build (velodyne crop per 3D box, point
// transforms, in-mask projection counting) is the host hot path between
// sensor input and the TPU object optimizer — the counterpart of the
// reference's C++ FrameWithLiDAR numpy section (reconstruct/
// kitti_sequence.py:114-157 runs in numpy there; here it is native by
// design). Exposed with a plain C ABI for ctypes; built by
// dspslam_tpu/native/__init__.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Transform points by a row-major 4x4: out = R p + t. pts: (n, stride)
// float32 with xyz in the first 3 columns.
void transform_points_f32(const float* pts, int64_t n, int64_t stride,
                          const float* T, float* out) {
    const float r00 = T[0], r01 = T[1], r02 = T[2], tx = T[3];
    const float r10 = T[4], r11 = T[5], r12 = T[6], ty = T[7];
    const float r20 = T[8], r21 = T[9], r22 = T[10], tz = T[11];
    for (int64_t i = 0; i < n; ++i) {
        const float* p = pts + i * stride;
        float x = p[0], y = p[1], z = p[2];
        out[i * 3 + 0] = r00 * x + r01 * y + r02 * z + tx;
        out[i * 3 + 1] = r10 * x + r11 * y + r12 * z + ty;
        out[i * 3 + 2] = r20 * x + r21 * y + r22 * z + tz;
    }
}

// Crop LiDAR returns for one KITTI box [x, y, z, w, l, h, yaw] (velodyne
// frame): 3m-cube centroid prefilter, oriented-box test in the object
// frame with the reference's 1.1x w/l expansion and ShapeNet axis
// convention, then even subsampling to max_out. Returns the number of
// points written to out (xyz triples of the ORIGINAL velodyne coords).
int64_t crop_lidar_box_f32(const float* velo, int64_t n, int64_t stride,
                           const float* box, int64_t max_out, float* out,
                           int64_t* scratch_idx) {
    const float cx = box[0], cy = box[1], cz = box[2];
    const float half_w = 0.5f * box[3] * 1.1f;
    const float half_l = 0.5f * box[4] * 1.1f;
    const float half_h = 0.5f * box[5];
    const float yaw = box[6];
    const float c = std::cos(yaw), s = std::sin(yaw);
    // T_velo_obj columns (object axes in velodyne frame):
    //   x_obj = ( c, -s, 0), y_obj = (0, 0, 1), z_obj = (-s, -c, 0)
    // object center lifted by h/2 (boxes sit on the ground).
    const float ox = cx, oy = cy, oz = cz + box[5] * 0.5f;
    const float r = 3.0f;

    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        const float* p = velo + i * stride;
        const float dx0 = p[0] - cx, dy0 = p[1] - cy, dz0 = p[2] - cz;
        if (dx0 < -r || dx0 > r || dy0 < -r || dy0 > r || dz0 < -r || dz0 > r)
            continue;
        const float dx = p[0] - ox, dy = p[1] - oy, dz = p[2] - oz;
        const float xo = c * dx - s * dy;         // along object x (width)
        const float yo = dz;                      // along object y (height)
        const float zo = -s * dx - c * dy;        // along object z (length)
        if (std::fabs(xo) < half_w && std::fabs(yo) < half_h &&
            std::fabs(zo) < half_l) {
            scratch_idx[m++] = i;
        }
    }
    int64_t n_out = std::min(m, max_out);
    for (int64_t k = 0; k < n_out; ++k) {
        // even subsample (linspace over the kept set)
        int64_t src = (m <= max_out)
                          ? k
                          : (int64_t)((double)k * (m - 1) / (n_out - 1) + 0.5);
        const float* p = velo + scratch_idx[src] * stride;
        out[k * 3 + 0] = p[0];
        out[k * 3 + 1] = p[1];
        out[k * 3 + 2] = p[2];
    }
    return n_out;
}

// Count, per mask, how many projected pixels fall inside. masks: (M, H, W)
// uint8; uv: (n, 2) float pixel coords (already bounds-checked by caller
// flags in `valid`). Writes counts (M,).
void mask_hit_counts_u8(const uint8_t* masks, int64_t n_masks, int64_t h,
                        int64_t w, const float* uv, const uint8_t* valid,
                        int64_t n, int64_t* counts) {
    std::memset(counts, 0, sizeof(int64_t) * n_masks);
    for (int64_t i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        int64_t x = (int64_t)uv[i * 2 + 0];
        int64_t y = (int64_t)uv[i * 2 + 1];
        if (x < 0 || x >= w || y < 0 || y >= h) continue;
        const int64_t off = y * w + x;
        for (int64_t mIdx = 0; mIdx < n_masks; ++mIdx) {
            counts[mIdx] += masks[mIdx * h * w + off];
        }
    }
}

// Hamming distances between packed 256-bit descriptors: a (n, 8) x
// b (m, 8) uint32 -> (n, m) int32.
void hamming_matrix_u32(const uint32_t* a, int64_t n, const uint32_t* b,
                        int64_t m, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t* ai = a + i * 8;
        for (int64_t j = 0; j < m; ++j) {
            const uint32_t* bj = b + j * 8;
            int32_t d = 0;
            for (int k = 0; k < 8; ++k)
                d += __builtin_popcount(ai[k] ^ bj[k]);
            out[i * m + j] = d;
        }
    }
}

}  // extern "C"
