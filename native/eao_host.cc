// eao_host — native host runtime for the TPU object-SLAM engine.
//
// The TPU-native counterpart of the reference's host-side C++ runtime
// (ROS message flow `ros_test/src/message_flow.cc`, cv_bridge image decode,
// the mutex-guarded latest-wins queues of `src/YOLOX.cc:412-461`): a
// pthread prefetcher that decodes TUM PNG frames (8-bit gray/RGB color and
// 16-bit grayscale depth via zlib inflate — no OpenCV/libpng dependency)
// into a ring of pinned host buffers the Python side hands straight to
// jax.device_put, plus a lock-free-ish SPSC frame queue supporting both the
// reference's FIFO (rosbag) and latest-wins (live camera) modes.
//
// Built as a plain C ABI shared object consumed via ctypes
// (eao_fusion_tpu/io/native_loader.py).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------- PNG decode

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;   // 1 or 3
  int bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, big-endian 16-bit as in PNG
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  static const uint8_t kMagic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, kMagic, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int interlace = 0;
  int color_type = -1;
  while (pos + 8 <= len) {
    uint32_t chunk_len = be32(buf + pos);
    const char* type = reinterpret_cast<const char*>(buf + pos + 4);
    const uint8_t* payload = buf + pos + 8;
    if (pos + 12 + chunk_len > len) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      out->width = be32(payload);
      out->height = be32(payload + 4);
      out->bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
      if (interlace != 0) return false;  // Adam7 unsupported (TUM is linear)
      switch (color_type) {
        case 0: out->channels = 1; break;  // gray (TUM depth: 16-bit)
        case 2: out->channels = 3; break;  // rgb (TUM color)
        default: return false;             // palette/alpha unsupported
      }
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + chunk_len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + chunk_len;
  }
  if (out->width <= 0 || out->height <= 0 || idat.empty()) return false;
  const int bytes_pp = out->channels * (out->bit_depth / 8);
  const size_t stride = size_t(out->width) * bytes_pp;
  std::vector<uint8_t> raw((stride + 1) * out->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return false;

  out->data.assign(stride * out->height, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < out->height; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* line = src + 1;
    uint8_t* dst = out->data.data() + size_t(y) * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bytes_pp) ? dst[x - bytes_pp] : 0;
      int b = prev[x];
      int c = x >= size_t(bytes_pp) ? prev[x - bytes_pp] : 0;
      int v = line[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
    memcpy(prev.data(), dst, stride);
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

// -------------------------------------------------------------- prefetcher

struct Frame {
  int64_t index = -1;
  double timestamp = 0;
  std::vector<float> gray;    // H*W in [0,1]
  std::vector<float> depth;   // H*W meters (empty if none)
  int width = 0, height = 0;
  bool ok = false;
};

struct Prefetcher {
  std::vector<std::string> rgb_paths;
  std::vector<std::string> depth_paths;  // may be empty
  std::vector<double> timestamps;
  float depth_factor = 5000.0f;
  int latest_wins = 0;   // 0 = FIFO (rosbag mode), 1 = drop backlog (live)
  size_t capacity = 4;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<Frame*> queue;
  std::atomic<bool> stop{false};
  int64_t next_index = 0;

  void run() {
    for (size_t i = 0; i < rgb_paths.size() && !stop; ++i) {
      Frame* fr = new Frame();
      fr->index = int64_t(i);
      fr->timestamp = timestamps.empty() ? 0.0 : timestamps[i];
      std::vector<uint8_t> buf;
      Image img;
      if (read_file(rgb_paths[i].c_str(), &buf) &&
          decode_png(buf.data(), buf.size(), &img)) {
        fr->width = img.width;
        fr->height = img.height;
        fr->gray.resize(size_t(img.width) * img.height);
        if (img.channels == 3 && img.bit_depth == 8) {
          for (size_t p = 0; p < fr->gray.size(); ++p) {
            const uint8_t* px = img.data.data() + 3 * p;
            fr->gray[p] =
                (0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2]) / 255.0f;
          }
        } else if (img.channels == 1 && img.bit_depth == 8) {
          for (size_t p = 0; p < fr->gray.size(); ++p)
            fr->gray[p] = img.data[p] / 255.0f;
        }
        fr->ok = true;
      }
      if (fr->ok && i < depth_paths.size() && !depth_paths[i].empty()) {
        std::vector<uint8_t> dbuf;
        Image dimg;
        if (read_file(depth_paths[i].c_str(), &dbuf) &&
            decode_png(dbuf.data(), dbuf.size(), &dimg) &&
            dimg.channels == 1 && dimg.bit_depth == 16) {
          fr->depth.resize(size_t(dimg.width) * dimg.height);
          for (size_t p = 0; p < fr->depth.size(); ++p) {
            uint16_t v = (uint16_t(dimg.data[2 * p]) << 8) |
                         dimg.data[2 * p + 1];  // PNG is big-endian
            fr->depth[p] = float(v) / depth_factor;
          }
        } else {
          fr->ok = false;
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      if (latest_wins) {
        // live-camera semantics: drop backlog (`ValidData`,
        // `ros_test/src/message_flow.cc:217-268`)
        while (!queue.empty()) {
          delete queue.front();
          queue.pop();
        }
      } else {
        cv_put.wait(lk, [&] { return queue.size() < capacity || stop; });
      }
      if (stop) {
        delete fr;
        break;
      }
      queue.push(fr);
      cv_get.notify_one();
    }
    std::unique_lock<std::mutex> lk(mu);
    Frame* eos = new Frame();  // ok=false, index=-1 -> end of stream
    queue.push(eos);
    cv_get.notify_one();
  }
};

}  // namespace

extern "C" {

void* eao_prefetcher_create(const char** rgb_paths, const char** depth_paths,
                            const double* timestamps, int n_frames,
                            float depth_factor, int latest_wins,
                            int capacity) {
  auto* p = new Prefetcher();
  p->rgb_paths.assign(rgb_paths, rgb_paths + n_frames);
  if (depth_paths) {
    p->depth_paths.assign(depth_paths, depth_paths + n_frames);
  }
  if (timestamps) {
    p->timestamps.assign(timestamps, timestamps + n_frames);
  }
  p->depth_factor = depth_factor;
  p->latest_wins = latest_wins;
  p->capacity = size_t(capacity > 0 ? capacity : 4);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until a frame is ready. Returns the frame index (>=0), -1 at end
// of stream, -2 on decode failure or when the decoded frame exceeds
// `capacity` floats (the caller's buffer size) — larger-than-configured
// images are rejected instead of overrunning the Python-owned buffers.
int64_t eao_prefetcher_next(void* handle, float* gray_out, float* depth_out,
                            double* timestamp_out, int* width_out,
                            int* height_out, int64_t capacity) {
  auto* p = static_cast<Prefetcher*>(handle);
  Frame* fr = nullptr;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_get.wait(lk, [&] { return !p->queue.empty(); });
    fr = p->queue.front();
    p->queue.pop();
    p->cv_put.notify_one();
  }
  int64_t idx = fr->index;
  bool fits = int64_t(fr->gray.size()) <= capacity &&
              int64_t(fr->depth.size()) <= capacity;
  if (idx >= 0 && fr->ok && fits) {
    *width_out = fr->width;
    *height_out = fr->height;
    *timestamp_out = fr->timestamp;
    memcpy(gray_out, fr->gray.data(), fr->gray.size() * sizeof(float));
    if (!fr->depth.empty() && depth_out) {
      memcpy(depth_out, fr->depth.data(), fr->depth.size() * sizeof(float));
    }
  } else if (idx >= 0) {
    idx = -2;
  }
  delete fr;
  return idx;
}

void eao_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop = true;
  p->cv_put.notify_all();
  if (p->worker.joinable()) p->worker.join();
  std::unique_lock<std::mutex> lk(p->mu);
  while (!p->queue.empty()) {
    delete p->queue.front();
    p->queue.pop();
  }
  lk.unlock();
  delete p;
}

// standalone PNG decode helper (for tests): returns 0 on success
int eao_decode_png(const uint8_t* buf, int64_t len, uint8_t* out,
                   int64_t out_capacity, int* width, int* height,
                   int* channels, int* bit_depth) {
  Image img;
  if (!decode_png(buf, size_t(len), &img)) return 1;
  if (int64_t(img.data.size()) > out_capacity) return 2;
  memcpy(out, img.data.data(), img.data.size());
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

}  // extern "C"
