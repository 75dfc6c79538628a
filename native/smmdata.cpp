// smmdata — native host-side media decode for the TPU input pipeline.
//
// The reference delegates audio decode/resample to torchaudio's C++ and video
// to OpenCV (/root/reference/data/dataset_loaders.py:105-173). This library is
// the framework's own native component: RIFF/WAV parsing, windowed-sinc
// polyphase resampling, mono downmix and pad/truncate to a fixed device
// buffer, with a thread-pool batch API so a multi-core host can decode a
// whole batch concurrently while the accelerator runs the previous step.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavData {
  std::vector<float> samples;  // interleaved
  int channels = 0;
  int rate = 0;
};

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool got_fmt = false, got_data = false;
  std::vector<uint8_t> data;
  char id[4];
  uint32_t size;
  while (std::fread(id, 1, 4, f) == 4 && std::fread(&size, 4, 1, f) == 1) {
    if (std::memcmp(id, "fmt ", 4) == 0) {
      std::vector<uint8_t> chunk(size);
      if (std::fread(chunk.data(), 1, size, f) != size) break;
      if (size >= 16) {
        std::memcpy(&fmt, chunk.data() + 0, 2);
        std::memcpy(&channels, chunk.data() + 2, 2);
        std::memcpy(&rate, chunk.data() + 4, 4);
        std::memcpy(&bits, chunk.data() + 14, 2);
        got_fmt = true;
      }
    } else if (std::memcmp(id, "data", 4) == 0) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) data.resize(0);
      got_data = true;
      break;
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    }
  }
  std::fclose(f);
  if (!got_fmt || !got_data || channels == 0) return false;

  out->channels = channels;
  out->rate = static_cast<int>(rate);
  size_t n;
  if (fmt == 1 && bits == 16) {
    n = data.size() / 2;
    out->samples.resize(n);
    const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
    for (size_t i = 0; i < n; ++i) out->samples[i] = p[i] / 32768.0f;
  } else if (fmt == 1 && bits == 32) {
    n = data.size() / 4;
    out->samples.resize(n);
    const int32_t* p = reinterpret_cast<const int32_t*>(data.data());
    for (size_t i = 0; i < n; ++i) out->samples[i] = p[i] / 2147483648.0f;
  } else if (fmt == 1 && bits == 8) {
    n = data.size();
    out->samples.resize(n);
    for (size_t i = 0; i < n; ++i)
      out->samples[i] = (static_cast<int>(data[i]) - 128) / 128.0f;
  } else if (fmt == 3 && bits == 32) {  // IEEE float
    n = data.size() / 4;
    out->samples.resize(n);
    std::memcpy(out->samples.data(), data.data(), n * 4);
  } else {
    return false;
  }
  return true;
}

uint64_t gcd64(uint64_t a, uint64_t b) { return b ? gcd64(b, a % b) : a; }

// Windowed-sinc polyphase resample of a mono signal.
std::vector<float> resample(const std::vector<float>& x, int src_rate,
                            int dst_rate, int zeros = 24) {
  if (src_rate == dst_rate) return x;
  uint64_t g = gcd64(src_rate, dst_rate);
  int up = static_cast<int>(dst_rate / g);
  int down = static_cast<int>(src_rate / g);
  double cutoff = 0.99 * 0.5 * std::min(1.0, double(up) / down);
  int taps_half =
      static_cast<int>(std::ceil(double(zeros) * down / std::min(up, down)));
  int taps = 2 * taps_half + 1;

  // kernel bank: one filter per output phase
  std::vector<float> kernels(static_cast<size_t>(up) * taps);
  for (int p = 0; p < up; ++p) {
    double frac = double(p) * down / up;
    frac -= std::floor(frac);
    for (int t = 0; t < taps; ++t) {
      double xt = ((t - taps_half) - frac) * 2.0 * cutoff;
      double sinc = xt == 0.0 ? 1.0 : std::sin(kPi * xt) / (kPi * xt);
      double window = 0.5 - 0.5 * std::cos(2.0 * kPi * t / (taps - 1));
      kernels[static_cast<size_t>(p) * taps + t] =
          static_cast<float>(2.0 * cutoff * sinc * window);
    }
  }

  int64_t n_in = static_cast<int64_t>(x.size());
  int64_t n_out = n_in * up / down;
  std::vector<float> out(n_out);
  for (int64_t i = 0; i < n_out; ++i) {
    int64_t src_pos = i * down / up;
    int phase = static_cast<int>((i * down) % up);
    const float* k = &kernels[static_cast<size_t>(phase) * taps];
    double acc = 0.0;
    int64_t start = src_pos - taps_half;
    for (int t = 0; t < taps; ++t) {
      int64_t j = start + t;
      if (j >= 0 && j < n_in) acc += double(x[j]) * k[t];
    }
    out[i] = static_cast<float>(acc);
  }
  return out;
}

// Decode one file into a fixed-length mono float buffer (zeros on failure).
void decode_one(const char* path, int target_rate, int64_t max_len,
                float* out) {
  std::memset(out, 0, sizeof(float) * max_len);
  WavData wav;
  if (!read_wav(path, &wav) || wav.samples.empty()) return;
  int64_t frames = static_cast<int64_t>(wav.samples.size()) / wav.channels;
  std::vector<float> mono(frames);
  if (wav.channels == 1) {
    mono.assign(wav.samples.begin(), wav.samples.end());
  } else {
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < wav.channels; ++c)
        acc += wav.samples[i * wav.channels + c];
      mono[i] = static_cast<float>(acc / wav.channels);
    }
  }
  std::vector<float> res = resample(mono, wav.rate, target_rate);
  int64_t n = std::min<int64_t>(res.size(), max_len);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

}  // namespace

extern "C" {

// Single-file decode. Returns 0 on success (zeros written on failure too).
int smm_decode_audio(const char* path, int target_rate, int64_t max_len,
                     float* out) {
  decode_one(path, target_rate, max_len, out);
  return 0;
}

// Batched decode across a thread pool: paths is a packed array of
// NUL-terminated strings, offsets[i] the start of path i; out is
// [n, max_len] row-major.
int smm_decode_audio_batch(const char* paths, const int64_t* offsets, int n,
                           int target_rate, int64_t max_len, float* out,
                           int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::atomic<int>* counter = new std::atomic<int>(0);
  auto work = [&, counter]() {
    for (;;) {
      int i = counter->fetch_add(1);
      if (i >= n) break;
      decode_one(paths + offsets[i], target_rate, max_len,
                 out + static_cast<int64_t>(i) * max_len);
    }
  };
  int t_count = std::min(num_threads, n);
  workers.reserve(t_count);
  for (int t = 0; t < t_count; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
  delete counter;
  return 0;
}

}  // extern "C"
