// Native batch loader for observation files.
//
// TPU-native equivalent of the reference's DataLoader worker processes
// (/root/reference/torbi/data/loader.py): the host-side file pipeline must
// keep the chip fed, and per-file Python deserialization is the bottleneck
// for the ~40k-file evaluation workload. This library parses .npy
// observation files and collates a zero-padded (batch, max_frames, states)
// buffer with a thread pool, entirely outside the GIL.
//
// Exposed via ctypes (no pybind11 dependency):
//   probe_npy(path, &frames, &states)        -> 0 on success
//   load_batch(paths, n, out, frames, max_frames, states,
//              padded_states, pad_value, threads) -> 0
//
// The output buffer is (n, max_frames, padded_states): each frame's
// `states` floats land at a `padded_states` stride with the lane tail
// filled with pad_value (-inf for log-space data), so host-to-device
// transfers are tile-aligned and skip the device-side relayout an odd
// minor dimension triggers.
//
// Only little-endian float32 C-order .npy (format v1/v2) is supported;
// anything else returns an error and the Python caller falls back to the
// pure-Python loader.
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = 1;
constexpr int kErrMagic = 2;
constexpr int kErrHeader = 3;
constexpr int kErrDtype = 4;
constexpr int kErrShape = 5;
constexpr int kErrRead = 6;
constexpr int kErrStates = 7;

struct NpyInfo {
  int64_t frames = 0;
  int64_t states = 0;
  int64_t data_offset = 0;
};

// Parse the .npy header: magic, version, header length, then a Python dict
// literal {'descr': '<f4', 'fortran_order': False, 'shape': (T, S), }
int parse_npy_header(FILE* file, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, file) != 8) return kErrMagic;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return kErrMagic;
  int major = magic[6];
  uint32_t header_len = 0;
  int64_t prefix = 0;
  if (major == 1) {
    unsigned char len_bytes[2];
    if (fread(len_bytes, 1, 2, file) != 2) return kErrHeader;
    header_len = len_bytes[0] | (len_bytes[1] << 8);
    prefix = 10;
  } else {
    unsigned char len_bytes[4];
    if (fread(len_bytes, 1, 4, file) != 4) return kErrHeader;
    header_len = len_bytes[0] | (len_bytes[1] << 8) | (len_bytes[2] << 16) |
                 (static_cast<uint32_t>(len_bytes[3]) << 24);
    prefix = 12;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, file) != header_len)
    return kErrHeader;

  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos)
    return kErrDtype;
  if (header.find("'fortran_order': False") == std::string::npos)
    return kErrDtype;

  size_t shape_pos = header.find("'shape':");
  if (shape_pos == std::string::npos) return kErrShape;
  size_t open = header.find('(', shape_pos);
  size_t close = header.find(')', shape_pos);
  if (open == std::string::npos || close == std::string::npos)
    return kErrShape;
  std::string shape = header.substr(open + 1, close - open - 1);
  // Exactly two dimensions: reject N-D tuples instead of silently reading
  // the first two numbers (e.g. a (1, T, S) batch-leading save)
  long long frames = 0, states = 0;
  int consumed = 0;
  if (sscanf(shape.c_str(), " %lld , %lld %n", &frames, &states,
             &consumed) != 2)
    return kErrShape;
  for (size_t i = consumed; i < shape.size(); ++i) {
    char c = shape[i];
    if (c != ' ' && c != ',') return kErrShape;
  }
  info->frames = frames;
  info->states = states;
  info->data_offset = prefix + header_len;
  return kOk;
}

int load_one(const char* path, float* out_row, int32_t* frames_out,
             int64_t max_frames, int64_t states, int64_t padded_states,
             float pad_value) {
  FILE* file = fopen(path, "rb");
  if (!file) return kErrOpen;
  NpyInfo info;
  int status = parse_npy_header(file, &info);
  if (status != kOk) {
    fclose(file);
    return status;
  }
  if (info.states != states || info.frames > max_frames) {
    fclose(file);
    return kErrStates;
  }
  // Read the payload contiguously into the front of the row buffer, then
  // (for padded_states > states) expand frames back-to-front in place and
  // fill each frame's lane tail with pad_value
  size_t count = static_cast<size_t>(info.frames) * states;
  if (fread(out_row, sizeof(float), count, file) != count) {
    fclose(file);
    return kErrRead;
  }
  fclose(file);
  if (padded_states != states) {
    for (int64_t f = info.frames - 1; f >= 0; --f) {
      float* dst = out_row + f * padded_states;
      if (f > 0) {
        memmove(dst, out_row + f * states, states * sizeof(float));
      }
      for (int64_t lane = states; lane < padded_states; ++lane) {
        dst[lane] = pad_value;
      }
    }
  }
  // Zero-pad the frame tail (reference collate zero-pads,
  // collate.py:27-33); padded frames are masked by batch_frames
  size_t filled = static_cast<size_t>(info.frames) * padded_states;
  size_t total = static_cast<size_t>(max_frames) * padded_states;
  memset(out_row + filled, 0, (total - filled) * sizeof(float));
  *frames_out = static_cast<int32_t>(info.frames);
  return kOk;
}

// Load one file directly into the stitched band kernel's mod-M PACKED
// layout: out is an (M, n, max_frames, 128) buffer with state s = M*l + r
// at (r, file, frame, lane l), M = padded_states / 128. Bitwise identical
// to packing the natural padded row (lane tails pad_value for every frame,
// frame tails zero) -- the layout ops/dispatch.py::pack_observation
// produces -- but assembled in one streaming pass per file, so the file
// workload skips both the host transpose copy AND the in-graph relayout
// the natural layout pays on the stitched decode path.
int load_one_packed(const char* path, float* out, int32_t* frames_out,
                    int64_t file_index, int64_t n, int64_t max_frames,
                    int64_t states, int64_t padded_states, float pad_value,
                    std::vector<float>* scratch) {
  FILE* file = fopen(path, "rb");
  if (!file) return kErrOpen;
  NpyInfo info;
  int status = parse_npy_header(file, &info);
  if (status != kOk) {
    fclose(file);
    return status;
  }
  if (info.states != states || info.frames > max_frames) {
    fclose(file);
    return kErrStates;
  }
  const int64_t m = padded_states / 128;
  const int64_t block = n * max_frames * 128;  // one r-block's extent
  scratch->resize(states);
  float* row = scratch->data();
  for (int64_t t = 0; t < info.frames; ++t) {
    if (fread(row, sizeof(float), states, file) !=
        static_cast<size_t>(states)) {
      fclose(file);
      return kErrRead;
    }
    for (int64_t r = 0; r < m; ++r) {
      float* dst = out + r * block + (file_index * max_frames + t) * 128;
      // Lanes 0..k-1 hold states r, r+M, ...; the tail is lane padding
      const int64_t k = r < states ? (states - r + m - 1) / m : 0;
      for (int64_t lane = 0; lane < k; ++lane) dst[lane] = row[m * lane + r];
      for (int64_t lane = k; lane < 128; ++lane) dst[lane] = pad_value;
    }
  }
  fclose(file);
  // Frame tail: all-zero, matching this loader's natural layout (load_one
  // zeroes the whole tail, lane padding included); padded frames are
  // masked by batch_frames either way
  for (int64_t r = 0; r < m; ++r) {
    float* dst =
        out + r * block + (file_index * max_frames + info.frames) * 128;
    memset(dst, 0, (max_frames - info.frames) * 128 * sizeof(float));
  }
  *frames_out = static_cast<int32_t>(info.frames);
  return kOk;
}

}  // namespace

extern "C" {

// Read just the shape of one .npy file
int probe_npy(const char* path, int64_t* frames, int64_t* states) {
  FILE* file = fopen(path, "rb");
  if (!file) return kErrOpen;
  NpyInfo info;
  int status = parse_npy_header(file, &info);
  fclose(file);
  if (status != kOk) return status;
  *frames = info.frames;
  *states = info.states;
  return kOk;
}

// Load n files into a padded (n, max_frames, padded_states) float32
// buffer with a thread pool. frames[i] receives each file's frame count.
// Returns 0 on success, else the first error code encountered.
int load_batch(const char** paths, int64_t n, float* out, int32_t* frames,
               int64_t max_frames, int64_t states, int64_t padded_states,
               float pad_value, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (padded_states < states) return kErrStates;
  std::atomic<int64_t> next(0);
  std::atomic<int> error(kOk);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || error.load() != kOk) return;
      float* row = out + i * max_frames * padded_states;
      int status = load_one(paths[i], row, frames + i, max_frames, states,
                            padded_states, pad_value);
      if (status != kOk) {
        int expected = kOk;
        error.compare_exchange_strong(expected, status);
        return;
      }
    }
  };
  std::vector<std::thread> threads;
  int spawn = static_cast<int>(
      n < static_cast<int64_t>(num_threads) ? n : num_threads);
  threads.reserve(spawn);
  for (int i = 0; i < spawn; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return error.load();
}

// Load n files straight into the mod-M PACKED (M, n, max_frames, 128)
// layout (see load_one_packed). padded_states must be a 128 multiple.
int load_batch_packed(const char** paths, int64_t n, float* out,
                      int32_t* frames, int64_t max_frames, int64_t states,
                      int64_t padded_states, float pad_value,
                      int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (padded_states < states || padded_states % 128 != 0) return kErrStates;
  std::atomic<int64_t> next(0);
  std::atomic<int> error(kOk);
  auto worker = [&]() {
    std::vector<float> scratch;
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || error.load() != kOk) return;
      int status =
          load_one_packed(paths[i], out, frames + i, i, n, max_frames,
                          states, padded_states, pad_value, &scratch);
      if (status != kOk) {
        int expected = kOk;
        error.compare_exchange_strong(expected, status);
        return;
      }
    }
  };
  std::vector<std::thread> threads;
  int spawn = static_cast<int>(
      n < static_cast<int64_t>(num_threads) ? n : num_threads);
  threads.reserve(spawn);
  for (int i = 0; i < spawn; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return error.load();
}

}  // extern "C"
