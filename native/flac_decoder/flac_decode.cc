// Native FLAC decoder: host-side fast path for the data pipeline.
//
// The pure-Python decoder in openasr_tpu/data/audio.py is the correctness
// oracle (tests assert exact sample agreement); this C++ implementation is
// the production path — the Python bit-reader tops out around ~25x realtime
// per core, which starves a TPU consuming ~100 s of audio per train step.
//
// Scope: the full mandatory FLAC subset — CONSTANT / VERBATIM / FIXED /
// LPC subframes, Rice/Rice2 residuals with escape codes, wasted bits,
// left-side / right-side / mid-side stereo decorrelation, 8/12/16/20/24-bit
// streams, UTF8-coded frame numbers. CRCs are skipped (transport integrity
// is the filesystem's job here).
//
// C ABI only; loaded via ctypes (see openasr_tpu/data/audio.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t size;
  int64_t pos = 0;     // byte position
  uint64_t acc = 0;
  int nbits = 0;
  bool error = false;

  BitReader(const uint8_t* d, int64_t n, int64_t p) : data(d), size(n), pos(p) {}

  inline uint32_t read(int n) {
    while (nbits < n) {
      if (pos >= size) { error = true; return 0; }
      acc = (acc << 8) | data[pos++];
      nbits += 8;
    }
    nbits -= n;
    uint32_t val = (uint32_t)((acc >> nbits) & ((n == 32) ? 0xFFFFFFFFull
                                                          : ((1ull << n) - 1)));
    acc &= (nbits == 64) ? ~0ull : ((1ull << nbits) - 1);
    return val;
  }

  inline int64_t read_signed(int n) {
    int64_t v = read(n);
    if (n > 0 && (v >> (n - 1))) v -= (int64_t)1 << n;
    return v;
  }

  inline uint32_t read_unary() {
    uint32_t count = 0;
    while (!error && read(1) == 0) count++;
    return count;
  }

  inline void align() { acc = 0; nbits = 0; }

  inline uint64_t read_utf8_coded() {
    uint32_t b0 = read(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    uint32_t mask = 0x80;
    while (b0 & mask) { n++; mask >>= 1; }
    uint64_t val = b0 & (mask - 1);
    for (int i = 0; i < n - 1; i++) val = (val << 6) | (read(8) & 0x3F);
    return val;
  }
};

const int kFixedOrderMax = 4;
const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int block_size, int order,
                     int64_t* out /* residual appended after warmup */) {
  uint32_t method = br.read(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = (1u << plen) - 1;
  int part_order = br.read(4);
  int n_parts = 1 << part_order;
  int samples_per_part = block_size >> part_order;
  int idx = order;
  for (int p = 0; p < n_parts; p++) {
    int n = samples_per_part - (p == 0 ? order : 0);
    uint32_t param = br.read(plen);
    if (param == escape) {
      int bits = br.read(5);
      for (int i = 0; i < n; i++)
        out[idx++] = bits ? br.read_signed(bits) : 0;
    } else {
      for (int i = 0; i < n; i++) {
        uint32_t q = br.read_unary();
        uint32_t r = param ? br.read(param) : 0;
        uint64_t v = ((uint64_t)q << param) | r;
        out[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);  // unzigzag
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps, int64_t* out) {
  if (br.read(1) != 0) return false;
  uint32_t sf_type = br.read(6);
  int wasted = 0;
  if (br.read(1)) {
    wasted = 1 + (int)br.read_unary();
    bps -= wasted;
  }

  if (sf_type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) out[i] = v;
  } else if (sf_type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) out[i] = br.read_signed(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    if (order > kFixedOrderMax) return false;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    if (!decode_residual(br, block_size, order, out)) return false;
    const int* coefs = kFixedCoefs[order];
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += (int64_t)coefs[j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (sf_type >= 32) {  // LPC
    int order = sf_type - 31;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    int precision = br.read(4) + 1;
    int shift = (int)br.read_signed(5);
    int64_t coefs[32];
    for (int i = 0; i < order; i++) coefs[i] = br.read_signed(precision);
    if (!decode_residual(br, block_size, order, out)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coefs[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;
  }

  if (wasted)
    for (int i = 0; i < block_size; i++) out[i] <<= wasted;
  return !br.error;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

struct StreamInfo {
  int sample_rate = 0, channels = 0, bps = 0;
  int64_t total = 0;
  int64_t frames_pos = 0;  // byte offset of the first audio frame
  bool ok = false;
};

StreamInfo parse_header(const uint8_t* data, int64_t size) {
  StreamInfo si;
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return si;
  int64_t pos = 4;
  bool have_info = false;
  while (pos + 4 <= size) {
    uint8_t hdr = data[pos];
    bool last = hdr & 0x80;
    int btype = hdr & 0x7F;
    int64_t bsize = ((int64_t)data[pos + 1] << 16) |
                    ((int64_t)data[pos + 2] << 8) | data[pos + 3];
    if (btype == 0 && pos + 4 + 18 <= size) {
      const uint8_t* b = data + pos + 4;
      uint64_t bits = 0;
      for (int i = 10; i < 18; i++) bits = (bits << 8) | b[i];
      si.sample_rate = (int)((bits >> 44) & 0xFFFFF);
      si.channels = (int)((bits >> 41) & 0x7) + 1;
      si.bps = (int)((bits >> 36) & 0x1F) + 1;
      si.total = (int64_t)(bits & 0xFFFFFFFFFull);
      have_info = true;
    }
    pos += 4 + bsize;
    if (last) break;
  }
  si.frames_pos = pos;
  si.ok = have_info && pos < size;
  return si;
}

}  // namespace

extern "C" {

// Fills stream parameters from STREAMINFO. Returns 0 on success.
int flac_stream_info(const uint8_t* data, int64_t size, int* sample_rate,
                     int* channels, int* bps, int64_t* total_samples) {
  StreamInfo si = parse_header(data, size);
  if (!si.ok) return -1;
  *sample_rate = si.sample_rate;
  *channels = si.channels;
  *bps = si.bps;
  *total_samples = si.total;
  return 0;
}

// Decodes the whole stream into planar int32 `out` [channels, capacity].
// Returns samples-per-channel decoded, or -1 on error.
int64_t flac_decode(const uint8_t* data, int64_t size, int32_t* out,
                    int64_t capacity) {
  StreamInfo si = parse_header(data, size);
  if (!si.ok) return -1;
  int channels = si.channels;

  BitReader br(data, size, si.frames_pos);
  std::vector<std::vector<int64_t>> subs(channels);
  for (auto& s : subs) s.resize(65536);

  int64_t n_decoded = 0;
  while (br.pos < size - 2 && (si.total == 0 || n_decoded < si.total)) {
    if (br.read(14) != 0x3FFE) return -1;  // lost sync
    br.read(1);  // reserved
    br.read(1);  // blocking strategy
    int bs_code = br.read(4);
    int sr_code = br.read(4);
    int ch_code = br.read(4);
    int ss_code = br.read(3);
    br.read(1);  // reserved
    br.read_utf8_coded();

    int block_size;
    if (bs_code == 6) block_size = (int)br.read(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read(16) + 1;
    else if (bs_code == 0) return -1;
    else block_size = kBlockSizes[bs_code];
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    int frame_bps = kSampleSizes[ss_code] ? kSampleSizes[ss_code] : si.bps;
    br.read(8);  // CRC-8

    if (block_size > 65536) return -1;
    int64_t* c0 = subs[0].data();
    int64_t* c1 = channels > 1 ? subs[1].data() : nullptr;

    // stereo-decorrelated frames in a stream whose STREAMINFO declares
    // mono are malformed; without this check the ch_code 8/9/10 branches
    // would write through a null c1
    if (ch_code >= 8 && channels < 2) return -1;

    if (ch_code < 8) {
      if (ch_code + 1 != channels) return -1;
      for (int c = 0; c < channels; c++)
        if (!decode_subframe(br, block_size, frame_bps, subs[c].data()))
          return -1;
    } else if (ch_code == 8) {  // left/side
      if (!decode_subframe(br, block_size, frame_bps, c0)) return -1;
      if (!decode_subframe(br, block_size, frame_bps + 1, c1)) return -1;
      for (int i = 0; i < block_size; i++) c1[i] = c0[i] - c1[i];
    } else if (ch_code == 9) {  // right/side: side first, then right
      if (!decode_subframe(br, block_size, frame_bps + 1, c0)) return -1;
      if (!decode_subframe(br, block_size, frame_bps, c1)) return -1;
      for (int i = 0; i < block_size; i++) {
        int64_t side = c0[i], right = c1[i];
        c0[i] = right + side;
        c1[i] = right;
      }
    } else if (ch_code == 10) {  // mid/side
      if (!decode_subframe(br, block_size, frame_bps, c0)) return -1;
      if (!decode_subframe(br, block_size, frame_bps + 1, c1)) return -1;
      for (int i = 0; i < block_size; i++) {
        int64_t mid = (c0[i] << 1) | (c1[i] & 1);
        int64_t side = c1[i];
        c0[i] = (mid + side) >> 1;
        c1[i] = (mid - side) >> 1;
      }
    } else {
      return -1;
    }

    int64_t n = block_size;
    if (n_decoded + n > capacity) n = capacity - n_decoded;
    for (int c = 0; c < channels; c++) {
      int32_t* dst = out + (int64_t)c * capacity + n_decoded;
      const int64_t* src = subs[c].data();
      for (int64_t i = 0; i < n; i++) dst[i] = (int32_t)src[i];
    }
    n_decoded += n;
    if (n_decoded >= capacity) break;
    br.align();
    br.read(16);  // CRC-16
    if (br.error) return -1;
  }
  return n_decoded;
}

}  // extern "C"
