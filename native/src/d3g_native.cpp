// Native runtime components for dynamic3dgaussians_tpu.
//
// TPU-native equivalent of the runtime-side native code of the reference
// stack (the reference's native layer is CUDA kernels only — SURVEY.md §2.1;
// its host-side IO is pure Python). Two components live here:
//
//  1. Binary "splat PLY" codec — the interchange format external 3DGS
//     viewers consume (reference helpers.py:40-67 save_ply_splat writes it
//     from Python one struct at a time; this writes/reads the whole buffer
//     in native code).
//  2. A threaded read-ahead file loader: worker threads stream files into an
//     in-memory cache so the single-host-core training loop never blocks on
//     disk (the reference loads every image synchronously per timestep,
//     train_beffor.py get_dataset).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: see native/Makefile (g++ -O2 -shared -fPIC -pthread).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. splat PLY codec
// ---------------------------------------------------------------------------
// Layout per vertex (little-endian f32), matching the de-facto 3DGS viewer
// format and reference helpers.py:40-67: x y z nx ny nz f_dc_0..2 opacity
// scale_0..2 rot_0..3  (normals zero; f_dc = (rgb - 0.5) / SH_C0; opacity =
// logit; scales = log; rot = unnormalized wxyz quaternion).

static const char* kPlyProps[] = {
    "x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2",
    "opacity", "scale_0", "scale_1", "scale_2",
    "rot_0", "rot_1", "rot_2", "rot_3"};
static const int kNumProps = 17;

int d3g_ply_write(const char* path, int64_t n,
                  const float* means,        // (n, 3)
                  const float* f_dc,         // (n, 3) SH-dc color
                  const float* logit_opac,   // (n,)
                  const float* log_scales,   // (n, 3)
                  const float* quats) {      // (n, 4) wxyz
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f, "ply\nformat binary_little_endian 1.0\n");
  fprintf(f, "element vertex %lld\n", (long long)n);
  for (int i = 0; i < kNumProps; ++i)
    fprintf(f, "property float %s\n", kPlyProps[i]);
  fprintf(f, "end_header\n");

  std::vector<float> row(kNumProps);
  std::vector<float> buf;
  buf.reserve((size_t)n * kNumProps);
  for (int64_t i = 0; i < n; ++i) {
    float* r = row.data();
    memcpy(r, means + i * 3, 3 * sizeof(float));
    memset(r + 3, 0, 3 * sizeof(float));  // normals
    memcpy(r + 6, f_dc + i * 3, 3 * sizeof(float));
    r[9] = logit_opac[i];
    memcpy(r + 10, log_scales + i * 3, 3 * sizeof(float));
    memcpy(r + 13, quats + i * 4, 4 * sizeof(float));
    buf.insert(buf.end(), row.begin(), row.end());
  }
  size_t wrote = fwrite(buf.data(), sizeof(float), buf.size(), f);
  fclose(f);
  return wrote == buf.size() ? 0 : -2;
}

// Returns vertex count, or -1 on error. Fills prop_count.
int64_t d3g_ply_read_header(const char* path, int* prop_count,
                            int64_t* header_bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1;
  int props = 0;
  int64_t offset = 0;
  while (fgets(line, sizeof(line), f)) {
    offset += (int64_t)strlen(line);
    if (!strncmp(line, "element vertex", 14))
      n = atoll(line + 14);
    else if (!strncmp(line, "property float", 14))
      ++props;
    else if (!strncmp(line, "end_header", 10))
      break;
  }
  fclose(f);
  *prop_count = props;
  *header_bytes = offset;
  return n;
}

// Reads the full (n, prop_count) float block into out.
int d3g_ply_read_data(const char* path, int64_t header_bytes, int64_t n,
                      int prop_count, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)header_bytes, SEEK_SET)) { fclose(f); return -2; }
  size_t want = (size_t)n * prop_count;
  size_t got = fread(out, sizeof(float), want, f);
  fclose(f);
  return got == want ? 0 : -3;
}

// ---------------------------------------------------------------------------
// 2. threaded read-ahead file loader
// ---------------------------------------------------------------------------

struct Loader {
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::deque<std::string> queue;
  std::map<std::string, std::vector<uint8_t>> cache;
  std::vector<std::thread> workers;
  size_t cache_limit;
  size_t cache_bytes = 0;
  std::deque<std::string> lru;  // insertion order for eviction
  std::atomic<bool> stop{false};

  explicit Loader(int n_threads, size_t limit) : cache_limit(limit) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { this->run(); });
  }

  void run() {
    for (;;) {
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop) return;
        path = queue.front();
        queue.pop_front();
        if (cache.count(path)) { cv_done.notify_all(); continue; }
      }
      std::vector<uint8_t> data;
      FILE* f = fopen(path.c_str(), "rb");
      if (f) {
        fseek(f, 0, SEEK_END);
        long sz = ftell(f);
        fseek(f, 0, SEEK_SET);
        data.resize((size_t)sz);
        if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) data.clear();
        fclose(f);
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cache_bytes += data.size();
        cache[path] = std::move(data);
        lru.push_back(path);
        while (cache_bytes > cache_limit && lru.size() > 1) {
          auto it = cache.find(lru.front());
          lru.pop_front();
          if (it != cache.end()) {
            cache_bytes -= it->second.size();
            cache.erase(it);
          }
        }
      }
      cv_done.notify_all();
    }
  }

  ~Loader() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }
};

void* d3g_loader_create(int n_threads, int64_t cache_limit_bytes) {
  return new Loader(n_threads > 0 ? n_threads : 2,
                    (size_t)cache_limit_bytes);
}

void d3g_loader_destroy(void* h) { delete (Loader*)h; }

void d3g_loader_prefetch(void* h, const char* path) {
  Loader* l = (Loader*)h;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    if (l->cache.count(path)) return;
    l->queue.push_back(path);
  }
  l->cv_work.notify_one();
}

// Blocks until the file is cached; returns its size (then call _copy), or -1.
int64_t d3g_loader_size(void* h, const char* path) {
  Loader* l = (Loader*)h;
  std::unique_lock<std::mutex> lk(l->mu);
  if (!l->cache.count(path)) {
    l->queue.push_front(path);  // priority: caller is blocked on it
    l->cv_work.notify_one();
    l->cv_done.wait(lk, [&] { return l->cache.count(path) > 0; });
  }
  auto& v = l->cache[path];
  return v.empty() ? -1 : (int64_t)v.size();
}

// Copies the cached bytes out and evicts the entry (consume-once semantics).
int d3g_loader_take(void* h, const char* path, uint8_t* out, int64_t size) {
  Loader* l = (Loader*)h;
  std::unique_lock<std::mutex> lk(l->mu);
  auto it = l->cache.find(path);
  if (it == l->cache.end() || (int64_t)it->second.size() != size) return -1;
  memcpy(out, it->second.data(), (size_t)size);
  l->cache_bytes -= it->second.size();
  l->cache.erase(it);
  return 0;
}

}  // extern "C"
