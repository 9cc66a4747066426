// Native batch PNG decoder for the host data pipeline.
//
// The reference relies on torch's C++ DataLoader workers + OpenCV for
// image decode (src/cgan.py:126-139); this is the equivalent native
// component here: a minimal, dependency-light (zlib only) PNG decoder
// with a std::thread pool that fills one contiguous uint8 batch buffer,
// ready for a single host->device transfer.
//
// Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA, alpha
// dropped), non-interlaced — which covers the ISTD dataset. Channel
// order is swapped to BGR on request to match the cv2 convention the
// training pipeline uses.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

struct PngInfo {
  uint32_t width = 0;
  uint32_t height = 0;
  int channels = 0;   // source channels (1, 3 or 4)
  int bit_depth = 0;
  int interlace = 0;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int channels_for_color_type(int color_type) {
  switch (color_type) {
    case 0: return 1;  // gray
    case 2: return 3;  // RGB
    case 6: return 4;  // RGBA
    default: return 0; // palette/gray+alpha unsupported
  }
}

// Read the whole file into memory. Returns empty vector on failure.
std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> data;
  FILE* f = fopen(path, "rb");
  if (!f) return data;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size > 0) {
    data.resize(size_t(size));
    if (fread(data.data(), 1, size_t(size), f) != size_t(size)) {
      data.clear();
    }
  }
  fclose(f);
  return data;
}

bool parse_header(const std::vector<uint8_t>& file, PngInfo* info,
                  std::vector<uint8_t>* idat) {
  if (file.size() < 8 || memcmp(file.data(), kPngSig, 8) != 0) return false;
  size_t pos = 8;
  bool saw_ihdr = false;
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    if (pos + 12 + len > file.size()) return false;
    const uint8_t* type = &file[pos + 4];
    const uint8_t* payload = &file[pos + 8];
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;
      info->width = be32(payload);
      info->height = be32(payload + 4);
      info->bit_depth = payload[8];
      info->channels = channels_for_color_type(payload[9]);
      info->interlace = payload[12];
      saw_ihdr = true;
    } else if (memcmp(type, "IDAT", 4) == 0 && idat != nullptr) {
      idat->insert(idat->end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  return saw_ihdr && info->channels > 0 && info->bit_depth == 8 &&
         info->interlace == 0;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode one PNG into out (h*w*out_channels, row-major). out_channels
// must be 1 or 3; RGB->BGR swap applied when swap_rb. Returns 0 on
// success.
int decode_png(const char* path, uint8_t* out, uint32_t exp_h,
               uint32_t exp_w, int out_channels, int swap_rb) {
  std::vector<uint8_t> file = read_file(path);
  if (file.empty()) return 1;
  PngInfo info;
  std::vector<uint8_t> idat;
  if (!parse_header(file, &info, &idat)) return 2;
  if (info.height != exp_h || info.width != exp_w) return 3;
  // Gray output is only a memcpy from gray sources. RGB->gray would
  // need cv2's exact conversion, which for PNGs goes through libpng's
  // rgb_to_gray (error-diffused, stateful) — not reproducible by a
  // per-pixel formula. Refuse so the caller falls back to cv2 and the
  // two loaders stay bit-identical.
  if (out_channels == 1 && info.channels != 1) return 6;

  const size_t stride = size_t(info.width) * info.channels;
  std::vector<uint8_t> raw((stride + 1) * info.height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return 4;
  }

  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  const int bpp = info.channels;  // bytes per pixel (8-bit)
  for (uint32_t y = 0; y < info.height; ++y) {
    const uint8_t* line = &raw[(stride + 1) * y];
    const int filter = line[0];
    const uint8_t* src = line + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? cur[x - bpp] : 0;        // left
      int b = prev[x];                                    // up
      int c = x >= size_t(bpp) ? prev[x - bpp] : 0;       // up-left
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return 5;
      }
      cur[x] = uint8_t(v);
    }
    // emit row: channel select/swap
    uint8_t* dst = out + size_t(y) * info.width * out_channels;
    if (out_channels == 1) {
      // gray from gray only (guarded above): bit-exact memcpy
      memcpy(dst, cur.data(), info.width);
    } else {  // out_channels == 3
      for (uint32_t x = 0; x < info.width; ++x) {
        const uint8_t* px = &cur[size_t(x) * info.channels];
        uint8_t r = px[0];
        uint8_t g = info.channels >= 3 ? px[1] : px[0];
        uint8_t b2 = info.channels >= 3 ? px[2] : px[0];
        uint8_t* o = dst + size_t(x) * 3;
        if (swap_rb) {
          o[0] = b2; o[1] = g; o[2] = r;  // BGR (cv2 convention)
        } else {
          o[0] = r; o[1] = g; o[2] = b2;
        }
      }
    }
    std::swap(prev, cur);
  }
  return 0;
}

}  // namespace

extern "C" {

// Probe image dimensions; returns 0 on success.
int srit_png_probe(const char* path, int* h, int* w, int* c) {
  std::vector<uint8_t> file = read_file(path);
  if (file.empty()) return 1;
  PngInfo info;
  if (!parse_header(file, &info, nullptr)) return 2;
  *h = int(info.height);
  *w = int(info.width);
  *c = info.channels;
  return 0;
}

// Decode n PNGs (all h x w) into out (n*h*w*out_channels uint8) with a
// thread pool. Returns the number of failed files (0 == full success);
// per-file status lands in status[n] when non-null.
int srit_png_decode_batch(const char** paths, int n, uint8_t* out,
                          int h, int w, int out_channels, int swap_rb,
                          int n_threads, int* status) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> local_status(size_t(n), 0);
  const size_t img_bytes = size_t(h) * w * out_channels;

  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      local_status[size_t(i)] = decode_png(
          paths[i], out + size_t(i) * img_bytes, uint32_t(h),
          uint32_t(w), out_channels, swap_rb);
    }
  };

  std::vector<std::thread> threads;
  int nt = n_threads > n ? n : n_threads;
  threads.reserve(size_t(nt));
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();

  int failures = 0;
  for (int i = 0; i < n; ++i) {
    if (status) status[i] = local_status[size_t(i)];
    if (local_status[size_t(i)] != 0) ++failures;
  }
  return failures;
}

}  // extern "C"
