// SFB batch-file ingest: multithreaded native reader for the data pipeline.
//
// The reference's data hot loop is NetCDF decode + cloud fetch inside torch
// DataLoader worker *processes* (reference satflow/data/datamodules.py:87-96).
// On a TPU host the equivalent bottleneck is file read + decode feeding the
// host→HBM transfer; this library does that work in native threads (no GIL,
// no worker processes): N reader threads stream pre-batched .sfb files into
// a bounded ring of reusable buffers consumed from Python via ctypes
// (satflow_tpu/data/native_ingest.py).
//
// SFB ("SatFlow Batch") format v1, little-endian:
//   magic   "SFBATCH1"                       (8 bytes)
//   u32     n_entries
//   entry*: u16 name_len; char name[];
//           u8 dtype_code; u8 ndim; u32 dims[ndim];
//           u64 byte_len; pad to 8; raw data
//
// dtype codes: 0=f32 1=f16 2=i32 3=u8 4=f64 5=i64 6=bf16

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[8] = {'S', 'F', 'B', 'A', 'T', 'C', 'H', '1'};
constexpr int kMaxEntries = 256;

struct Entry {
  std::string name;
  uint8_t dtype = 0;
  uint8_t ndim = 0;
  uint32_t dims[16] = {0};
  uint64_t byte_len = 0;
  const uint8_t* data = nullptr;  // points into Batch::raw
};

struct Batch {
  std::vector<uint8_t> raw;
  std::vector<Entry> entries;
  int64_t index = -1;
  std::string error;
};

bool parse_batch(Batch* b) {
  const uint8_t* p = b->raw.data();
  const uint8_t* end = p + b->raw.size();
  if (b->raw.size() < 12 || std::memcmp(p, kMagic, 8) != 0) {
    b->error = "bad magic";
    return false;
  }
  p += 8;
  uint32_t n;
  std::memcpy(&n, p, 4);
  p += 4;
  if (n > kMaxEntries) {
    b->error = "too many entries";
    return false;
  }
  b->entries.resize(n);
  // All bounds checks compare LENGTHS against the remaining bytes, never
  // `p + len > end`: a corrupt/truncated file (e.g. a failed remote fetch)
  // could carry a byte_len near UINT64_MAX, and pointer-advance overflow is
  // UB that can skip the check entirely.
  for (uint32_t i = 0; i < n; ++i) {
    Entry& e = b->entries[i];
    size_t remain = static_cast<size_t>(end - p);
    if (remain < 2) return false;
    uint16_t name_len;
    std::memcpy(&name_len, p, 2);
    p += 2;
    remain -= 2;
    if (remain < static_cast<size_t>(name_len) + 2) return false;
    e.name.assign(reinterpret_cast<const char*>(p), name_len);
    p += name_len;
    e.dtype = *p++;
    e.ndim = *p++;
    remain -= static_cast<size_t>(name_len) + 2;
    if (e.ndim > 16 || remain < 4ull * e.ndim + 8) return false;
    std::memcpy(e.dims, p, 4ull * e.ndim);
    p += 4ull * e.ndim;
    std::memcpy(&e.byte_len, p, 8);
    p += 8;
    // align to 8 relative to file start
    size_t off = static_cast<size_t>(p - b->raw.data());
    size_t aligned = (off + 7) & ~size_t(7);
    if (aligned > b->raw.size()) return false;
    p = b->raw.data() + aligned;
    if (e.byte_len > static_cast<uint64_t>(end - p)) return false;
    e.data = p;
    p += e.byte_len;
  }
  return true;
}

struct Loader {
  std::vector<std::string> paths;
  int n_threads;
  size_t capacity;

  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  // results admitted strictly in file order so epochs are deterministic.
  std::deque<Batch*> ready;
  std::atomic<int64_t> next_file{0};
  int64_t next_emit = 0;
  std::vector<Batch*> pending;  // out-of-order completions
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};
  std::atomic<int> live_workers{0};

  void worker() {
    for (;;) {
      int64_t idx = next_file.fetch_add(1);
      if (stop.load() || idx >= static_cast<int64_t>(paths.size())) break;
      Batch* b = new Batch();
      b->index = idx;
      FILE* f = std::fopen(paths[idx].c_str(), "rb");
      if (f) {
        std::fseek(f, 0, SEEK_END);
        long size = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        b->raw.resize(size > 0 ? size : 0);
        if (size > 0 && std::fread(b->raw.data(), 1, size, f) !=
                            static_cast<size_t>(size)) {
          b->error = "short read";
        }
        std::fclose(f);
        if (b->error.empty() && !parse_batch(b) && b->error.empty()) {
          b->error = "parse failure";
        }
      } else {
        b->error = "open failed: " + paths[idx];
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_put.wait(lock, [&] {
        return stop.load() || ready.size() + pending.size() < capacity ||
               b->index == next_emit;
      });
      if (stop.load()) {
        delete b;
        break;
      }
      pending.push_back(b);
      // emit in order
      bool emitted = true;
      while (emitted) {
        emitted = false;
        for (size_t i = 0; i < pending.size(); ++i) {
          if (pending[i]->index == next_emit) {
            ready.push_back(pending[i]);
            pending.erase(pending.begin() + i);
            ++next_emit;
            emitted = true;
            cv_get.notify_all();
            break;
          }
        }
      }
    }
    if (live_workers.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lock(mu);
      cv_get.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* sfb_open(const char** paths, int n_files, int n_threads, int capacity) {
  Loader* l = new Loader();
  l->paths.assign(paths, paths + n_files);
  l->n_threads = n_threads > 0 ? n_threads : 1;
  l->capacity = capacity > 0 ? capacity : 4;
  l->live_workers = l->n_threads;
  for (int i = 0; i < l->n_threads; ++i) {
    l->threads.emplace_back([l] { l->worker(); });
  }
  return l;
}

// Blocks for the next in-order batch; returns nullptr when exhausted.
void* sfb_next(void* loader) {
  Loader* l = static_cast<Loader*>(loader);
  std::unique_lock<std::mutex> lock(l->mu);
  l->cv_get.wait(lock, [&] {
    return !l->ready.empty() || l->live_workers.load() == 0 || l->stop.load();
  });
  if (l->ready.empty()) return nullptr;
  Batch* b = l->ready.front();
  l->ready.pop_front();
  l->cv_put.notify_all();
  return b;
}

const char* sfb_batch_error(void* batch) {
  Batch* b = static_cast<Batch*>(batch);
  return b->error.empty() ? nullptr : b->error.c_str();
}

int64_t sfb_batch_index(void* batch) { return static_cast<Batch*>(batch)->index; }

int sfb_entry_count(void* batch) {
  return static_cast<int>(static_cast<Batch*>(batch)->entries.size());
}

const char* sfb_entry_name(void* batch, int i) {
  return static_cast<Batch*>(batch)->entries[i].name.c_str();
}

int sfb_entry_dtype(void* batch, int i) {
  return static_cast<Batch*>(batch)->entries[i].dtype;
}

int sfb_entry_ndim(void* batch, int i) {
  return static_cast<Batch*>(batch)->entries[i].ndim;
}

void sfb_entry_dims(void* batch, int i, uint32_t* out) {
  const Entry& e = static_cast<Batch*>(batch)->entries[i];
  std::memcpy(out, e.dims, 4ull * e.ndim);
}

const void* sfb_entry_data(void* batch, int i, uint64_t* byte_len) {
  const Entry& e = static_cast<Batch*>(batch)->entries[i];
  *byte_len = e.byte_len;
  return e.data;
}

void sfb_release(void* batch) { delete static_cast<Batch*>(batch); }

void sfb_close(void* loader) {
  Loader* l = static_cast<Loader*>(loader);
  {
    std::lock_guard<std::mutex> lock(l->mu);
    l->stop.store(true);
    l->cv_put.notify_all();
    l->cv_get.notify_all();
  }
  for (auto& t : l->threads) t.join();
  for (Batch* b : l->pending) delete b;
  for (Batch* b : l->ready) delete b;
  delete l;
}

}  // extern "C"
