// Native host-side data kernels for vitlens-tpu.
//
// The reference leans on C++ libraries for its data path (torchaudio's
// C++ decoders, dgl's CUDA FPS — SURVEY.md §2.6). This library supplies the
// TPU-host equivalents for the two hot preprocessing ops:
//   * FLAC decode (subset: constant/verbatim/fixed/LPC subframes, 8/16/24
//     bit, mono/stereo incl. left/right/mid-side decorrelation)
//   * farthest-point sampling (the 8192-point eval resample,
//     pc_processor.py:8-29 semantics with deterministic start)
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this
// image). Build: see native/build.sh. The python pipeline falls back to the
// pure-python implementations when the shared library is absent.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// Bit reader over a byte buffer
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;       // byte position
  uint64_t bitbuf = 0;
  int bitcnt = 0;
  bool error = false;

  explicit BitReader(const uint8_t* d, size_t n, size_t start)
      : data(d), size(n), pos(start) {}

  inline uint64_t read_uint(int n) {
    while (bitcnt < n) {
      if (pos >= size) { error = true; return 0; }
      bitbuf = (bitbuf << 8) | data[pos++];
      bitcnt += 8;
    }
    bitcnt -= n;
    uint64_t val = (bitbuf >> bitcnt) & ((n == 64) ? ~0ull : ((1ull << n) - 1));
    bitbuf &= (bitcnt == 64) ? ~0ull : ((1ull << bitcnt) - 1);
    return val;
  }

  inline int64_t read_sint(int n) {
    int64_t v = (int64_t)read_uint(n);
    if (v >= (1ll << (n - 1))) v -= (1ll << n);
    return v;
  }

  inline int read_unary() {
    int c = 0;
    while (!error && read_uint(1) == 0) c++;
    return c;
  }

  inline int64_t read_rice(int param) {
    int q = read_unary();
    uint64_t r = param ? read_uint(param) : 0;
    uint64_t v = (((uint64_t)q) << param) | r;
    return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
  }

  inline void align() { bitcnt = 0; bitbuf = 0; }

  inline uint64_t read_utf8() {
    uint64_t b0 = read_uint(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    while ((b0 << n) & 0x80) n++;
    uint64_t val = b0 & (0x7F >> n);
    for (int i = 0; i < n - 1; i++) val = (val << 6) | (read_uint(8) & 0x3F);
    return val;
  }
};

const int kFixedOrders[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int block_size, int order,
                     std::vector<int64_t>& out) {
  int method = (int)br.read_uint(2);
  if (method > 1) return false;
  int param_bits = 4 + method;
  int escape = (1 << param_bits) - 1;
  int part_order = (int)br.read_uint(4);
  int n_parts = 1 << part_order;
  out.resize(block_size - order);
  size_t idx = 0;
  for (int p = 0; p < n_parts; p++) {
    int count = (block_size >> part_order) - (p == 0 ? order : 0);
    int param = (int)br.read_uint(param_bits);
    if (param == escape) {
      int nbits = (int)br.read_uint(5);
      for (int i = 0; i < count; i++)
        out[idx++] = nbits ? br.read_sint(nbits) : 0;
    } else {
      for (int i = 0; i < count; i++) out[idx++] = br.read_rice(param);
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_uint(1) != 0) return false;
  int stype = (int)br.read_uint(6);
  int wasted = 0;
  if (br.read_uint(1)) { wasted = 1 + br.read_unary(); bps -= wasted; }
  out.resize(block_size);
  std::vector<int64_t> resid;
  if (stype == 0) {
    int64_t v = br.read_sint(bps);
    std::fill(out.begin(), out.end(), v);
  } else if (stype == 1) {
    for (int i = 0; i < block_size; i++) out[i] = br.read_sint(bps);
  } else if (stype >= 8 && stype <= 12) {
    int order = stype - 8;
    for (int i = 0; i < order; i++) out[i] = br.read_sint(bps);
    if (!decode_residual(br, block_size, order, resid)) return false;
    const int* c = kFixedOrders[order];
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += c[j] * out[i - 1 - j];
      out[i] = pred + resid[i - order];
    }
  } else if (stype >= 32) {
    int order = stype - 31;
    for (int i = 0; i < order; i++) out[i] = br.read_sint(bps);
    int precision = (int)br.read_uint(4) + 1;
    int shift = (int)br.read_sint(5);
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) coefs[i] = br.read_sint(precision);
    if (!decode_residual(br, block_size, order, resid)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coefs[j] * out[i - 1 - j];
      out[i] = (pred >> shift) + resid[i - order];
    }
  } else {
    return false;
  }
  if (wasted)
    for (auto& v : out) v <<= wasted;
  return !br.error;
}

}  // namespace

extern "C" {

// Probe STREAMINFO: returns 0 on success, fills rate/channels/bps/total.
int flac_probe(const uint8_t* data, int64_t n, int32_t* sample_rate,
               int32_t* channels, int32_t* bps, int64_t* total_samples) {
  if (n < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  while (pos + 4 <= (size_t)n) {
    uint8_t header = data[pos];
    int last = header & 0x80;
    int btype = header & 0x7F;
    size_t length = ((size_t)data[pos + 1] << 16) | ((size_t)data[pos + 2] << 8) |
                    data[pos + 3];
    const uint8_t* body = data + pos + 4;
    if (btype == 0 && length >= 18) {
      uint64_t sr_cc_bps = 0;
      for (int i = 10; i < 18; i++) sr_cc_bps = (sr_cc_bps << 8) | body[i];
      *sample_rate = (int32_t)(sr_cc_bps >> 44);
      *channels = (int32_t)(((sr_cc_bps >> 41) & 0x7) + 1);
      *bps = (int32_t)(((sr_cc_bps >> 36) & 0x1F) + 1);
      *total_samples = (int64_t)(sr_cc_bps & ((1ull << 36) - 1));
      return 0;
    }
    pos += 4 + length;
    if (last) break;
  }
  return -2;
}

// Decode interleaved float32 [-1,1] into out[channels * total]. Layout:
// channel-major (out[c * total + t]). Returns decoded samples per channel,
// or < 0 on error.
int64_t flac_decode(const uint8_t* data, int64_t n, float* out,
                    int64_t out_capacity_per_chan) {
  int32_t rate, channels, bps;
  int64_t total;
  if (flac_probe(data, n, &rate, &channels, &bps, &total) != 0) return -1;

  // skip metadata blocks
  size_t pos = 4;
  while (pos + 4 <= (size_t)n) {
    uint8_t header = data[pos];
    size_t length = ((size_t)data[pos + 1] << 16) | ((size_t)data[pos + 2] << 8) |
                    data[pos + 3];
    pos += 4 + length;
    if (header & 0x80) break;
  }

  BitReader br(data, (size_t)n, pos);
  int64_t written = 0;
  float scale = 1.0f / (float)(1ll << (bps - 1));
  std::vector<std::vector<int64_t>> subs((size_t)channels);

  while (br.pos < (size_t)n - 2 && (total == 0 || written < total)) {
    if (br.read_uint(14) != 0x3FFE) break;
    br.read_uint(2);  // reserved + blocking strategy
    int bs_code = (int)br.read_uint(4);
    int sr_code = (int)br.read_uint(4);
    int ch_code = (int)br.read_uint(4);
    int bps_code = (int)br.read_uint(3);
    br.read_uint(1);
    br.read_utf8();
    int block_size;
    if (bs_code == 6) block_size = (int)br.read_uint(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read_uint(16) + 1;
    else if (bs_code == 1) block_size = 192;
    else if (bs_code >= 2 && bs_code <= 5) block_size = 576 << (bs_code - 2);
    else block_size = 256 << (bs_code - 8);
    if (sr_code == 12) br.read_uint(8);
    else if (sr_code == 13 || sr_code == 14) br.read_uint(16);
    int fbps = bps;
    switch (bps_code) {
      case 1: fbps = 8; break; case 2: fbps = 12; break;
      case 4: fbps = 16; break; case 5: fbps = 20; break;
      case 6: fbps = 24; break; case 7: fbps = 32; break;
      default: break;
    }
    br.read_uint(8);  // header CRC

    bool ok = true;
    if (ch_code < 8) {
      for (int c = 0; c < ch_code + 1 && ok; c++)
        ok = decode_subframe(br, block_size, fbps, subs[c]);
    } else if (ch_code == 8) {  // left/side
      ok = decode_subframe(br, block_size, fbps, subs[0]) &&
           decode_subframe(br, block_size, fbps + 1, subs[1]);
      if (ok)
        for (int i = 0; i < block_size; i++) subs[1][i] = subs[0][i] - subs[1][i];
    } else if (ch_code == 9) {  // right/side
      ok = decode_subframe(br, block_size, fbps + 1, subs[0]) &&
           decode_subframe(br, block_size, fbps, subs[1]);
      if (ok)
        for (int i = 0; i < block_size; i++) subs[0][i] = subs[1][i] + subs[0][i];
    } else if (ch_code == 10) {  // mid/side
      ok = decode_subframe(br, block_size, fbps, subs[0]) &&
           decode_subframe(br, block_size, fbps + 1, subs[1]);
      if (ok) {
        for (int i = 0; i < block_size; i++) {
          int64_t mid = subs[0][i], side = subs[1][i];
          int64_t left = ((mid << 1) | (side & 1)) + side;
          subs[0][i] = left >> 1;
          subs[1][i] = (left >> 1) - side;
        }
      }
    } else {
      ok = false;
    }
    if (!ok || br.error) return -3;

    br.align();
    br.read_uint(16);  // frame CRC
    int64_t take = block_size;
    if (out_capacity_per_chan - written < take)
      take = out_capacity_per_chan - written;
    for (int c = 0; c < channels; c++)
      for (int64_t i = 0; i < take; i++)
        out[(int64_t)c * out_capacity_per_chan + written + i] =
            (float)subs[c][i] * scale;
    written += take;
    if (written >= out_capacity_per_chan) break;
  }
  return written;
}

// Farthest point sampling: xyz [n, 3] float32, writes npoint indices.
// start < 0 -> start at 0 (deterministic), matching the python path.
void fps_indices(const float* xyz, int64_t n, int64_t npoint, int64_t start,
                 int64_t* out_idx) {
  std::vector<float> dist((size_t)n, 1e10f);
  int64_t farthest = start >= 0 ? start : 0;
  for (int64_t i = 0; i < npoint; i++) {
    out_idx[i] = farthest;
    const float cx = xyz[farthest * 3], cy = xyz[farthest * 3 + 1],
                cz = xyz[farthest * 3 + 2];
    float best = -1.0f;
    int64_t best_j = 0;
    for (int64_t j = 0; j < n; j++) {
      const float dx = xyz[j * 3] - cx, dy = xyz[j * 3 + 1] - cy,
                  dz = xyz[j * 3 + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best) { best = dist[j]; best_j = j; }
    }
    farthest = best_j;
  }
}

}  // extern "C"
