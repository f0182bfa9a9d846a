// Native batch rasterizer for the synthetic-shapes data pipeline.
//
// The reference's data layer is host-side Python+OpenCV per image
// (MaskRCNN/shapes.py:54-214). Training from the jitted step is fast enough
// that Python rasterization becomes the bottleneck; this C++ loader
// rasterizes a whole zero-padded batch (images, occlusion-aware instance
// masks, tight boxes, class ids) in one call, parallelized with OpenMP over
// the batch. Exposed through ctypes (no pybind11 in this image).
//
// Geometry matches objectdetection_tpu/data/shapes.py:
//   square:   axis-aligned filled rect [cy±s, cx±s]
//   circle:   filled disc radius s
//   triangle: filled triangle (cx, cy-s), (cx∓s/sin60, cy+s)
// Later instances occlude earlier ones; boxes are tight on the visible mask,
// normalized with the reference (h-1, w-1) + [0,0,1,1] convention.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

static inline bool in_triangle(float px, float py, float x0, float y0,
                               float x1, float y1, float x2, float y2) {
  // barycentric sign test
  auto sign = [](float ax, float ay, float bx, float by, float cx, float cy) {
    return (ax - cx) * (by - cy) - (bx - cx) * (ay - cy);
  };
  float d0 = sign(px, py, x0, y0, x1, y1);
  float d1 = sign(px, py, x1, y1, x2, y2);
  float d2 = sign(px, py, x2, y2, x0, y0);
  bool has_neg = (d0 < 0) || (d1 < 0) || (d2 < 0);
  bool has_pos = (d0 > 0) || (d1 > 0) || (d2 > 0);
  return !(has_neg && has_pos);
}

static void raster_instance(uint8_t* hit, int h, int w, int cls, int cy,
                            int cx, int s) {
  const float inv_sin60 = 1.1547005383792517f;  // 1/sin(60°)
  if (cls == 1) {  // square
    int y1 = std::max(cy - s, 0), y2 = std::min(cy + s, h - 1);
    int x1 = std::max(cx - s, 0), x2 = std::min(cx + s, w - 1);
    for (int y = y1; y <= y2; ++y)
      memset(hit + y * w + x1, 1, x2 - x1 + 1);
  } else if (cls == 2) {  // circle
    int y1 = std::max(cy - s, 0), y2 = std::min(cy + s, h - 1);
    for (int y = y1; y <= y2; ++y) {
      float dy = float(y - cy);
      float span = std::sqrt(std::max(float(s) * s - dy * dy, 0.0f));
      int x1 = std::max(int(std::ceil(cx - span)), 0);
      int x2 = std::min(int(std::floor(cx + span)), w - 1);
      if (x2 >= x1) memset(hit + y * w + x1, 1, x2 - x1 + 1);
    }
  } else if (cls == 3) {  // triangle
    float sx = s * inv_sin60;
    float x0 = cx, y0 = cy - s;
    float x1 = cx - sx, y1 = cy + s;
    float x2 = cx + sx, y2 = cy + s;
    int ylo = std::max(int(y0), 0), yhi = std::min(int(y1), h - 1);
    int xlo = std::max(int(std::floor(x1)), 0);
    int xhi = std::min(int(std::ceil(x2)), w - 1);
    for (int y = ylo; y <= yhi; ++y)
      for (int x = xlo; x <= xhi; ++x)
        if (in_triangle(float(x), float(y), x0, y0, x1, y1, x2, y2))
          hit[y * w + x] = 1;
  }
}

// Rasterize a full training batch.
//  specs layout per image i, instance j (max_inst rows):
//    class_id (0 = empty), cy, cx, size, r, g, b   -> int32[7]
//  bg_colors: int32 [B, 3]
//  outputs (caller-allocated):
//    images   float32 [B, H, W, 3]   (mean-subtracted)
//    masks    float32 [B, max_inst, H, W]
//    boxes    float32 [B, max_inst, 4]  (normalized y1x1y2x2)
//    classes  int32   [B, max_inst]
void rasterize_shapes_batch(const int32_t* specs, const int32_t* bg_colors,
                            int b, int h, int w, int max_inst,
                            const float* mean_pixel, float* images,
                            float* masks, float* boxes, int32_t* classes) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    const int32_t* spec = specs + (size_t)i * max_inst * 7;
    float* img = images + (size_t)i * h * w * 3;
    float* msk = masks + (size_t)i * max_inst * h * w;
    float* box = boxes + (size_t)i * max_inst * 4;
    int32_t* cls_out = classes + (size_t)i * max_inst;

    // background
    for (int p = 0; p < h * w; ++p)
      for (int c = 0; c < 3; ++c)
        img[p * 3 + c] = float(bg_colors[i * 3 + c]) - mean_pixel[c];

    // rasterize each instance into its own hit mask + paint image
    uint8_t* hits = new uint8_t[(size_t)max_inst * h * w]();
    int n = 0;
    for (; n < max_inst && spec[n * 7] > 0; ++n) {
      raster_instance(hits + (size_t)n * h * w, h, w, spec[n * 7],
                      spec[n * 7 + 1], spec[n * 7 + 2], spec[n * 7 + 3]);
      const uint8_t* hm = hits + (size_t)n * h * w;
      for (int p = 0; p < h * w; ++p)
        if (hm[p])
          for (int c = 0; c < 3; ++c)
            img[p * 3 + c] = float(spec[n * 7 + 4 + c]) - mean_pixel[c];
    }

    // occlusion: later instances erase earlier ones (shapes.py:182-189)
    for (int j = 0; j < n; ++j) {
      uint8_t* mj = hits + (size_t)j * h * w;
      for (int k = j + 1; k < n; ++k) {
        const uint8_t* mk = hits + (size_t)k * h * w;
        for (int p = 0; p < h * w; ++p)
          if (mk[p]) mj[p] = 0;
      }
    }

    // outputs: masks, tight boxes (normalized), classes; drop empty instances
    int out_j = 0;
    for (int j = 0; j < n; ++j) {
      const uint8_t* mj = hits + (size_t)j * h * w;
      int y1 = h, y2 = -1, x1 = w, x2 = -1;
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
          if (mj[y * w + x]) {
            y1 = std::min(y1, y); y2 = std::max(y2, y);
            x1 = std::min(x1, x); x2 = std::max(x2, x);
          }
      if (y2 < y1) continue;  // fully occluded
      float* mo = msk + (size_t)out_j * h * w;
      for (int p = 0; p < h * w; ++p) mo[p] = float(mj[p]);
      // pixel box (y1, x1, y2+1, x2+1) → reference normalization
      box[out_j * 4 + 0] = float(y1) / (h - 1);
      box[out_j * 4 + 1] = float(x1) / (w - 1);
      box[out_j * 4 + 2] = float(y2 + 1 - 1) / (h - 1);
      box[out_j * 4 + 3] = float(x2 + 1 - 1) / (w - 1);
      cls_out[out_j] = spec[j * 7];
      ++out_j;
    }
    delete[] hits;
  }
}

}  // extern "C"
