// sonicsim_native: CPU-native kernels for the SonicSim-TPU framework.
//
// Role (SURVEY.md §2.7): the reference's native layer is habitat-sim's C++
// simulator (scene/navmesh/audio ray tracing). The TPU rebuild keeps the
// device-side DSP in XLA and implements the combinatorial CPU work natively:
//   * multi-band Allen-Berkley image-source enumeration (per-wall,
//     per-frequency-band reflection coefficients) — the geometry half of
//     the RIR oracle; waveform assembly stays in JAX;
//   * A* shortest-path + line-of-sight simplification over occupancy grids
//     (the navmesh pathfinder replacement, SonicSim_rir.py:1064-1080).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// Enumerate image sources in a shoebox [0,Lx]x[0,Ly]x[0,Lz].
//
// dims[3], src[3], recv[3]; max_order: reflections per axis index range;
// n_bands: frequency bands; beta[n_bands*6]: per-band reflection
// coefficients for walls (x0, xL, y0, yL, z0, zL); max_delay_s: drop images
// arriving later; c: speed of sound.
//
// Outputs (caller-allocated, capacity max_out):
//   delays[N]        arrival delay in seconds (receiver at `recv`)
//   amps[N*n_bands]  per-band amplitude (reflection product / 4*pi*d)
//   dirs[N*3]        unit direction receiver -> image source
// Returns N (clipped to max_out).
int image_sources(const double* dims, const double* src, const double* recv,
                  int max_order, int n_bands, const double* beta,
                  double max_delay_s, double c, double* delays, double* amps,
                  double* dirs, int max_out) {
  int count = 0;
  const double maxd = max_delay_s * c;
  std::vector<double> band_amp(n_bands);
  for (int u = 0; u <= 1; ++u)
    for (int v = 0; v <= 1; ++v)
      for (int w = 0; w <= 1; ++w)
        for (int l = -max_order; l <= max_order; ++l)
          for (int m = -max_order; m <= max_order; ++m)
            for (int n = -max_order; n <= max_order; ++n) {
              const double px = (1 - 2 * u) * src[0] + 2.0 * l * dims[0];
              const double py = (1 - 2 * v) * src[1] + 2.0 * m * dims[1];
              const double pz = (1 - 2 * w) * src[2] + 2.0 * n * dims[2];
              const double dx = px - recv[0];
              const double dy = py - recv[1];
              const double dz = pz - recv[2];
              const double d = std::sqrt(dx * dx + dy * dy + dz * dz);
              if (d > maxd || d < 1e-6) continue;
              // Wall hit counts (Allen & Berkley 1979).
              const int hx0 = std::abs(l - u), hx1 = std::abs(l);
              const int hy0 = std::abs(m - v), hy1 = std::abs(m);
              const int hz0 = std::abs(n - w), hz1 = std::abs(n);
              const double inv = 1.0 / (4.0 * M_PI * d);
              for (int b = 0; b < n_bands; ++b) {
                const double* bb = beta + b * 6;
                double a = inv;
                a *= std::pow(bb[0], hx0) * std::pow(bb[1], hx1);
                a *= std::pow(bb[2], hy0) * std::pow(bb[3], hy1);
                a *= std::pow(bb[4], hz0) * std::pow(bb[5], hz1);
                band_amp[b] = a;
              }
              if (count >= max_out) return count;
              delays[count] = d / c;
              for (int b = 0; b < n_bands; ++b)
                amps[count * n_bands + b] = band_amp[b];
              dirs[count * 3 + 0] = dx / d;
              dirs[count * 3 + 1] = dy / d;
              dirs[count * 3 + 2] = dz / d;
              ++count;
            }
  return count;
}

namespace {

struct Node {
  double f;
  int idx;
  bool operator<(const Node& o) const { return f > o.f; }  // min-heap
};

inline bool los(const uint8_t* occ, int nx, int nz, int ai, int aj, int bi,
                int bj) {
  const int steps = std::max(std::abs(bi - ai), std::abs(bj - aj)) + 1;
  for (int s = 0; s <= steps; ++s) {
    const double t = steps ? static_cast<double>(s) / steps : 0.0;
    const int i = static_cast<int>(std::lround(ai + (bi - ai) * t));
    const int j = static_cast<int>(std::lround(aj + (bj - aj) * t));
    if (i < 0 || i >= nx || j < 0 || j >= nz || !occ[i * nz + j]) return false;
  }
  return true;
}

}  // namespace

// A* (8-connected) on an occupancy grid. occ[nx*nz] nonzero = navigable.
// Writes up to max_len (i, j) pairs into `path`; returns the number of
// waypoints, or -1 if unreachable.
int astar(const uint8_t* occ, int nx, int nz, int si, int sj, int gi, int gj,
          int* path, int max_len) {
  if (si < 0 || si >= nx || sj < 0 || sj >= nz || !occ[si * nz + sj]) return -1;
  if (gi < 0 || gi >= nx || gj < 0 || gj >= nz || !occ[gi * nz + gj]) return -1;
  const int total = nx * nz;
  std::vector<double> cost(total, 1e30);
  std::vector<int> came(total, -1);
  const int start = si * nz + sj, goal = gi * nz + gj;
  std::priority_queue<Node> pq;
  cost[start] = 0.0;
  pq.push({0.0, start});
  const int di[8] = {1, -1, 0, 0, 1, 1, -1, -1};
  const int dj[8] = {0, 0, 1, -1, 1, -1, 1, -1};
  const double dw[8] = {1, 1, 1, 1, 1.41421356, 1.41421356, 1.41421356,
                        1.41421356};
  bool found = false;
  while (!pq.empty()) {
    const Node top = pq.top();
    pq.pop();
    if (top.idx == goal) {
      found = true;
      break;
    }
    const int ci = top.idx / nz, cj = top.idx % nz;
    if (top.f > cost[top.idx] + std::hypot(gi - ci, gj - cj) + 1e-9) continue;
    for (int k = 0; k < 8; ++k) {
      const int ni = ci + di[k], nj = cj + dj[k];
      if (ni < 0 || ni >= nx || nj < 0 || nj >= nz) continue;
      const int nidx = ni * nz + nj;
      if (!occ[nidx]) continue;
      const double nc = cost[top.idx] + dw[k];
      if (nc < cost[nidx]) {
        cost[nidx] = nc;
        came[nidx] = top.idx;
        pq.push({nc + std::hypot(gi - ni, gj - nj), nidx});
      }
    }
  }
  if (!found) return -1;
  std::vector<int> cells;
  for (int cur = goal; cur != -1; cur = came[cur]) cells.push_back(cur);
  int n = static_cast<int>(cells.size());
  if (n > max_len) n = max_len;
  for (int i = 0; i < n; ++i) {
    const int cell = cells[cells.size() - 1 - i];
    path[2 * i] = cell / nz;
    path[2 * i + 1] = cell % nz;
  }
  return n;
}

// String-pulling simplification; rewrites `path` in place, returns new count.
int simplify_path(const uint8_t* occ, int nx, int nz, int* path, int n) {
  if (n <= 2) return n;
  std::vector<int> out;
  out.push_back(0);
  int anchor = 0;
  for (int k = 2; k < n; ++k) {
    if (!los(occ, nx, nz, path[2 * anchor], path[2 * anchor + 1], path[2 * k],
             path[2 * k + 1])) {
      out.push_back(k - 1);
      anchor = k - 1;
    }
  }
  out.push_back(n - 1);
  std::vector<int> buf(out.size() * 2);
  for (size_t i = 0; i < out.size(); ++i) {
    buf[2 * i] = path[2 * out[i]];
    buf[2 * i + 1] = path[2 * out[i] + 1];
  }
  std::memcpy(path, buf.data(), buf.size() * sizeof(int));
  return static_cast<int>(out.size());
}

// ---------------------------------------------------------------------------
// Native WAV decode (the data-loader hot path; the reference leans on torch
// DataLoader's C++ workers — separation/look2hear/datas/movingdatamodule.py
// via torchaudio.load). Plain-C ABI; ctypes releases the GIL around these
// calls, so a Python thread pool gets true parallel decode.
// ---------------------------------------------------------------------------

namespace {

struct WavHeader {
  int format = 0;      // 1 = PCM, 3 = IEEE float
  int n_ch = 0;
  int sample_rate = 0;
  int bits = 0;
  long long data_off = 0;  // byte offset of sample data in file
  long long data_len = 0;  // bytes of sample data
};

// Parses the RIFF chunk list (same walk as utils/wavio.py read_wav).
static int parse_wav_header(FILE* f, WavHeader* h) {
  unsigned char head[12];
  if (std::fread(head, 1, 12, f) != 12) return -1;
  if (std::memcmp(head, "RIFF", 4) != 0 || std::memcmp(head + 8, "WAVE", 4) != 0)
    return -2;
  long long pos = 12;
  bool have_fmt = false, have_data = false;
  while (!(have_fmt && have_data)) {
    unsigned char ch[8];
    if (std::fseek(f, static_cast<long>(pos), SEEK_SET) != 0) break;
    if (std::fread(ch, 1, 8, f) != 8) break;
    unsigned int size = ch[4] | (ch[5] << 8) | (ch[6] << 16)
        | (static_cast<unsigned int>(ch[7]) << 24);
    if (std::memcmp(ch, "fmt ", 4) == 0) {
      unsigned char fmt[40];
      size_t want = size < sizeof(fmt) ? size : sizeof(fmt);
      if (std::fread(fmt, 1, want, f) != want) return -3;
      h->format = fmt[0] | (fmt[1] << 8);
      h->n_ch = fmt[2] | (fmt[3] << 8);
      h->sample_rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) | (fmt[7] << 24);
      h->bits = fmt[14] | (fmt[15] << 8);
      if (h->format == 0xFFFE && want >= 26)  // WAVE_FORMAT_EXTENSIBLE
        h->format = fmt[24] | (fmt[25] << 8);
      have_fmt = true;
    } else if (std::memcmp(ch, "data", 4) == 0) {
      h->data_off = pos + 8;
      h->data_len = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  if (!have_fmt || !have_data) return -4;
  return 0;
}

}  // namespace

// File metadata: frames/channels/sample-rate without decoding.
// Returns 0, or a negative parse error.
int wav_info(const char* path, long long* n_frames, int* n_ch, int* sr) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  WavHeader h;
  int rc = parse_wav_header(f, &h);
  std::fclose(f);
  if (rc != 0) return rc;
  if (h.n_ch <= 0 || h.bits <= 0) return -5;
  *n_frames = h.data_len / (static_cast<long long>(h.n_ch) * (h.bits / 8));
  *n_ch = h.n_ch;
  *sr = h.sample_rate;
  return 0;
}

// Decode to float32. mono=1 averages channels into (frames,); otherwise the
// output is channel-major (n_ch, frames) — the (C, T) layout of
// utils/wavio.py. Returns frames decoded, or a negative error.
long long wav_read_f32(const char* path, int mono, float* out,
                       long long cap_frames) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  WavHeader h;
  int rc = parse_wav_header(f, &h);
  if (rc != 0) { std::fclose(f); return rc; }
  int bytes = h.bits / 8;
  if (h.n_ch <= 0 || bytes <= 0) { std::fclose(f); return -5; }
  long long frames = h.data_len / (static_cast<long long>(h.n_ch) * bytes);
  if (frames > cap_frames) frames = cap_frames;
  std::vector<unsigned char> raw(static_cast<size_t>(frames) * h.n_ch * bytes);
  if (std::fseek(f, static_cast<long>(h.data_off), SEEK_SET) != 0 ||
      std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    std::fclose(f);
    return -6;
  }
  std::fclose(f);

  const int C = h.n_ch;
  auto sample = [&](long long t, int c) -> float {
    const unsigned char* p = raw.data() + (t * C + c) * bytes;
    if (h.format == 1) {  // PCM
      switch (h.bits) {
        case 16: {
          int16_t v; std::memcpy(&v, p, 2);
          return static_cast<float>(v) / 32768.0f;
        }
        case 32: {
          int32_t v; std::memcpy(&v, p, 4);
          return static_cast<float>(v) / 2147483648.0f;
        }
        case 24: {
          int32_t v = p[0] | (p[1] << 8) | (static_cast<int8_t>(p[2]) << 16);
          return static_cast<float>(v) / 8388608.0f;
        }
        case 8:
          return (static_cast<float>(p[0]) - 128.0f) / 128.0f;
        default:
          return 0.0f;
      }
    }
    if (h.format == 3) {  // IEEE float
      if (h.bits == 32) { float v; std::memcpy(&v, p, 4); return v; }
      if (h.bits == 64) { double v; std::memcpy(&v, p, 8);
                          return static_cast<float>(v); }
    }
    return 0.0f;
  };
  if ((h.format != 1 && h.format != 3) ||
      (h.format == 1 && h.bits != 8 && h.bits != 16 && h.bits != 24 &&
       h.bits != 32) ||
      (h.format == 3 && h.bits != 32 && h.bits != 64))
    return -7;

  if (mono) {
    const float inv = 1.0f / static_cast<float>(C);
    for (long long t = 0; t < frames; ++t) {
      float acc = 0.0f;
      for (int c = 0; c < C; ++c) acc += sample(t, c);
      out[t] = acc * inv;
    }
  } else {
    for (int c = 0; c < C; ++c)
      for (long long t = 0; t < frames; ++t)
        out[c * frames + t] = sample(t, c);
  }
  return frames;
}

}  // extern "C"
