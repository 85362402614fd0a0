// exr.cpp — native OpenEXR scanline codec for materialist_tpu.
//
// The reference delegates all EXR I/O to Mitsuba's mi.Bitmap (C++); this is
// the TPU-framework's native equivalent: a small, dependency-light (zlib
// only) implementation of the OpenEXR 2.0 scanline format sufficient for the
// pipeline's data contract (SURVEY.md §2.10):
//   read : NONE / RLE / ZIPS / ZIP / PIZ compression, HALF & FLOAT channels
//   write: ZIP compression, FLOAT or HALF channels
// Exposed as a C ABI for ctypes binding (materialist_tpu/io/exr.py).
//
// Format implemented from the public OpenEXR file-format specification
// (openexr.com/en/latest/OpenEXRFileLayout.html) — PIZ is the
// bitmap+Huffman+2D-wavelet scheme described there.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

static thread_local std::string g_err;

namespace {

// ---------------------------------------------------------------- half float
static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t f;
  if (exp == 0) {
    if (mant == 0) {
      f = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ff;
      f = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7f800000u | (mant << 13);
  } else {
    f = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}

static inline uint16_t float_to_half(float x) {
  uint32_t f;
  std::memcpy(&f, &x, 4);
  uint16_t sign = (uint16_t)((f >> 16) & 0x8000);
  int32_t exp = (int32_t)((f >> 23) & 0xff) - 127 + 15;
  uint32_t mant = f & 0x7fffff;
  if (exp <= 0) {
    if (exp < -10) return sign;  // underflow to signed zero
    mant |= 0x800000;
    uint32_t shift = (uint32_t)(14 - exp);
    // round-to-nearest-even
    uint32_t a = (1u << (shift - 1)) - 1;
    uint32_t b = (mant >> shift) & 1;
    return (uint16_t)(sign | ((mant + a + b) >> shift));
  }
  if (exp >= 31) return (uint16_t)(sign | 0x7c00 | (mant ? 0x200 : 0));
  // round mantissa
  uint32_t rounded = mant + 0xfff + ((mant >> 13) & 1);
  if (rounded & 0x800000) {
    rounded = 0;
    exp++;
    if (exp >= 31) return (uint16_t)(sign | 0x7c00);
  }
  return (uint16_t)(sign | (exp << 10) | (rounded >> 13));
}

// ---------------------------------------------------------------- byte io
struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  uint8_t u8() {
    if (p >= end) {
      ok = false;
      return 0;
    }
    return *p++;
  }
  uint32_t u32() {
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) v |= (uint32_t)u8() << (8 * i);
    return v;
  }
  int32_t i32() { return (int32_t)u32(); }
  uint64_t u64() {
    uint64_t v = 0;
    for (int i = 0; i < 8; i++) v |= (uint64_t)u8() << (8 * i);
    return v;
  }
  std::string cstr(size_t maxlen = 256) {
    std::string s;
    while (ok && s.size() < maxlen) {
      char c = (char)u8();
      if (c == 0) break;
      s.push_back(c);
    }
    return s;
  }
  void skip(size_t n) {
    if ((size_t)(end - p) < n) {
      ok = false;
      p = end;
    } else {
      p += n;
    }
  }
};

// ---------------------------------------------------------------- zip filter
// EXR's zip/rle pre-filter: byte delta + even/odd interleave.
static void postfilter(std::vector<uint8_t>& buf) {
  // undo delta
  for (size_t i = 1; i < buf.size(); i++)
    buf[i] = (uint8_t)((int)buf[i - 1] + (int)buf[i] - 128);
  // deinterleave halves
  std::vector<uint8_t> out(buf.size());
  const uint8_t* t1 = buf.data();
  const uint8_t* t2 = buf.data() + (buf.size() + 1) / 2;
  uint8_t* s = out.data();
  uint8_t* stop = s + out.size();
  while (s < stop) {
    *s++ = *t1++;
    if (s < stop) *s++ = *t2++;
  }
  buf.swap(out);
}

static void prefilter(std::vector<uint8_t>& buf) {
  std::vector<uint8_t> tmp(buf.size());
  uint8_t* t1 = tmp.data();
  uint8_t* t2 = tmp.data() + (buf.size() + 1) / 2;
  const uint8_t* s = buf.data();
  const uint8_t* stop = s + buf.size();
  while (s < stop) {
    *t1++ = *s++;
    if (s < stop) *t2++ = *s++;
  }
  int prev = tmp.empty() ? 0 : tmp[0];
  for (size_t i = 1; i < tmp.size(); i++) {
    int d = (int)tmp[i] - prev + 128 + 256;
    prev = tmp[i];
    tmp[i] = (uint8_t)d;
  }
  buf.swap(tmp);
}

static bool zlib_inflate(const uint8_t* src, size_t n, std::vector<uint8_t>& dst) {
  uLongf dlen = (uLongf)dst.size();
  int r = uncompress(dst.data(), &dlen, src, (uLong)n);
  return r == Z_OK && dlen == dst.size();
}

// ---------------------------------------------------------------- rle
static bool rle_decode(const uint8_t* src, size_t n, std::vector<uint8_t>& dst) {
  size_t o = 0, i = 0;
  while (i < n) {
    int8_t count = (int8_t)src[i++];
    if (count < 0) {
      size_t c = (size_t)(-count);
      if (i + c > n || o + c > dst.size()) return false;
      std::memcpy(dst.data() + o, src + i, c);
      i += c;
      o += c;
    } else {
      size_t c = (size_t)count + 1;
      if (i >= n || o + c > dst.size()) return false;
      std::memset(dst.data() + o, src[i++], c);
      o += c;
    }
  }
  return o == dst.size();
}

// ---------------------------------------------------------------- PIZ: huf
// 16-bit-symbol canonical Huffman coder used by PIZ.
static const int HUF_ENCBITS = 16;
static const int HUF_ENCSIZE = (1 << HUF_ENCBITS) + 1;
static const int HUF_DECBITS = 14;
static const int HUF_DECSIZE = 1 << HUF_DECBITS;
static const int HUF_DECMASK = HUF_DECSIZE - 1;

static const int SHORT_ZEROCODE_RUN = 59;
static const int LONG_ZEROCODE_RUN = 63;
static const int SHORTEST_LONG_RUN = 2 + LONG_ZEROCODE_RUN - SHORT_ZEROCODE_RUN;

struct HufDec {
  int len = 0;          // code length if <= HUF_DECBITS
  uint32_t lit = 0;     // symbol (fast path) or #long codes (slow path)
  std::vector<uint32_t> p;  // long-code symbol candidates
};

struct BitReader {
  const uint8_t* in;
  const uint8_t* ie;
  uint64_t c = 0;
  int lc = 0;
  bool refill_to(int nbits) {
    while (lc < nbits && in < ie) {
      c = (c << 8) | *in++;
      lc += 8;
    }
    return lc >= nbits;
  }
};

static inline uint64_t huf_code(uint64_t packed) { return packed >> 6; }
static inline int huf_len(uint64_t packed) { return (int)(packed & 63); }

static bool huf_unpack_enc_table(Reader& r, int im, int iM,
                                 std::vector<uint64_t>& hcode) {
  hcode.assign(HUF_ENCSIZE, 0);
  BitReader br{r.p, r.end};
  for (int i = im; i <= iM;) {
    if (!br.refill_to(6)) return false;
    int l = (int)((br.c >> (br.lc - 6)) & 63);
    br.lc -= 6;
    if (l == LONG_ZEROCODE_RUN) {
      if (!br.refill_to(8)) return false;
      int zerun = (int)((br.c >> (br.lc - 8)) & 0xff) + SHORTEST_LONG_RUN;
      br.lc -= 8;
      if (i + zerun > iM + 1) return false;
      while (zerun--) hcode[i++] = 0;
    } else if (l >= SHORT_ZEROCODE_RUN) {
      int zerun = l - SHORT_ZEROCODE_RUN + 2;
      if (i + zerun > iM + 1) return false;
      while (zerun--) hcode[i++] = 0;
    } else {
      hcode[i++] = (uint64_t)l;
    }
  }
  r.p = br.in;
  // canonical code assignment
  uint64_t n[59] = {0};
  for (int i = 0; i < HUF_ENCSIZE; i++) n[huf_len(hcode[i])]++;
  uint64_t c = 0;
  for (int i = 58; i > 0; --i) {
    uint64_t nc = (c + n[i]) >> 1;
    n[i] = c;
    c = nc;
  }
  for (int i = 0; i < HUF_ENCSIZE; i++) {
    int l = (int)hcode[i];
    if (l > 0) hcode[i] = (uint64_t)l | (n[l]++ << 6);
  }
  return true;
}

static bool huf_build_dec_table(const std::vector<uint64_t>& hcode, int im,
                                int iM, std::vector<HufDec>& hdecod) {
  hdecod.assign(HUF_DECSIZE, HufDec());
  for (int sym = im; sym <= iM; sym++) {
    uint64_t code = huf_code(hcode[sym]);
    int l = huf_len(hcode[sym]);
    if (l == 0) continue;
    if (code >> l) return false;
    if (l <= HUF_DECBITS) {
      size_t base = (size_t)(code << (HUF_DECBITS - l));
      size_t count = (size_t)1 << (HUF_DECBITS - l);
      if (base + count > (size_t)HUF_DECSIZE) return false;
      for (size_t j = 0; j < count; j++) {
        HufDec& pl = hdecod[base + j];
        if (pl.len || !pl.p.empty()) return false;
        pl.len = l;
        pl.lit = (uint32_t)sym;
      }
    } else {
      HufDec& pl = hdecod[code >> (l - HUF_DECBITS)];
      if (pl.len) return false;
      pl.lit++;
      pl.p.push_back((uint32_t)sym);
    }
  }
  return true;
}

static bool huf_decode(const std::vector<uint64_t>& hcode,
                       const std::vector<HufDec>& hdecod, const uint8_t* in,
                       int64_t nbits, uint32_t rlc, uint16_t* out,
                       size_t nout) {
  uint64_t c = 0;
  int lc = 0;
  const uint8_t* ie = in + (nbits + 7) / 8;
  size_t o = 0;

  auto emit = [&](uint32_t sym) -> bool {
    if (sym == rlc) {
      // run-length: next 8 bits = count of repeats of previous value
      if (lc < 8) {
        if (in >= ie) return false;
        c = (c << 8) | *in++;
        lc += 8;
      }
      lc -= 8;
      int cs = (int)((c >> lc) & 0xff);
      if (o == 0 || o + (size_t)cs > nout) return false;
      uint16_t prev = out[o - 1];
      while (cs--) out[o++] = prev;
    } else {
      if (o >= nout) return false;
      out[o++] = (uint16_t)sym;
    }
    return true;
  };

  while (in < ie) {
    c = (c << 8) | *in++;
    lc += 8;
    while (lc >= HUF_DECBITS) {
      const HufDec& pl = hdecod[(c >> (lc - HUF_DECBITS)) & HUF_DECMASK];
      if (pl.len) {
        lc -= pl.len;
        if (!emit(pl.lit)) return false;
      } else {
        if (pl.p.empty()) return false;
        bool found = false;
        for (uint32_t cand : pl.p) {
          int l = huf_len(hcode[cand]);
          while (lc < l && in < ie) {
            c = (c << 8) | *in++;
            lc += 8;
          }
          if (lc >= l &&
              huf_code(hcode[cand]) == ((c >> (lc - l)) & (((uint64_t)1 << l) - 1))) {
            lc -= l;
            if (!emit(cand)) return false;
            found = true;
            break;
          }
        }
        if (!found) return false;
      }
    }
  }
  // flush remaining whole bits
  int i = (int)((8 - (nbits & 7)) & 7);
  c >>= i;
  lc -= i;
  while (lc > 0) {
    const HufDec& pl = hdecod[(c << (HUF_DECBITS - lc)) & HUF_DECMASK];
    if (!pl.len) break;
    if (pl.len > lc) break;
    lc -= pl.len;
    if (!emit(pl.lit)) return false;
  }
  return o == nout;
}

static bool huf_uncompress(const uint8_t* src, size_t nsrc, uint16_t* out,
                           size_t nout) {
  if (nsrc < 20) { g_err="huf: short"; return false; }
  Reader r{src, src + nsrc};
  uint32_t im = r.u32();
  uint32_t iM = r.u32();
  r.u32();  // table length (unused)
  uint32_t nBits = r.u32();
  r.u32();  // reserved
  if (im >= HUF_ENCSIZE || iM >= HUF_ENCSIZE) { g_err="huf: bad im/iM"; return false; }
  std::vector<uint64_t> hcode;
  if (!huf_unpack_enc_table(r, (int)im, (int)iM, hcode)) { g_err="huf: enc table"; return false; }
  if (nBits > 8 * (uint64_t)(r.end - r.p)) { g_err="huf: nBits too big"; return false; }
  std::vector<HufDec> hdecod;
  if (!huf_build_dec_table(hcode, (int)im, (int)iM, hdecod)) { g_err="huf: dec table"; return false; }
  bool okd = huf_decode(hcode, hdecod, r.p, (int64_t)nBits, iM, out, nout);
  if (!okd && g_err.empty()) g_err = "huf: decode";
  return okd;
}

// ---------------------------------------------------------------- PIZ: wav
static inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int16_t ls = (int16_t)l;
  int16_t hs = (int16_t)h;
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  int16_t as = (int16_t)ai;
  int16_t bs = (int16_t)(ai - hi);
  a = (uint16_t)as;
  b = (uint16_t)bs;
}

static const int A_OFFSET = 1 << 15;
static const int MOD_MASK = (1 << 16) - 1;

static inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int m = l;
  int d = h;
  int bb = (m - (d >> 1)) & MOD_MASK;
  int aa = (d + bb - A_OFFSET) & MOD_MASK;
  b = (uint16_t)bb;
  a = (uint16_t)aa;
}

static void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy,
                        uint16_t mx) {
  bool w14 = (mx < (1 << 14));
  int n = (nx > ny) ? ny : nx;
  int p = 1;
  int p2;
  while (p <= n) p <<= 1;
  p >>= 1;
  p2 = p;
  p >>= 1;

  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + (size_t)oy * (ny - p2);
    int oy1 = oy * p;
    int oy2 = oy * p2;
    int ox1 = ox * p;
    int ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;

    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, i00, i10);
          wdec14(*p01, *p11, i01, i11);
          wdec14(i00, i01, *px, *p01);
          wdec14(i10, i11, *p10, *p11);
        } else {
          wdec16(*px, *p10, i00, i10);
          wdec16(*p01, *p11, i01, i11);
          wdec16(i00, i01, *px, *p01);
          wdec16(i10, i11, *p10, *p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10);
        else
          wdec16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }
    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + (size_t)ox * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01);
        else
          wdec16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }
    p2 = p;
    p >>= 1;
  }
}

// ---------------------------------------------------------------- PIZ: lut
static const int USHORT_RANGE = 1 << 16;
static const int BITMAP_SIZE = USHORT_RANGE >> 3;

static uint16_t reverse_lut_from_bitmap(const uint8_t* bitmap,
                                        std::vector<uint16_t>& lut) {
  lut.assign(USHORT_RANGE, 0);
  int k = 0;
  for (int i = 0; i < USHORT_RANGE; i++) {
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7)))) lut[k++] = (uint16_t)i;
  }
  int n = k - 1;
  while (k < USHORT_RANGE) lut[k++] = 0;
  return (uint16_t)n;  // maximum value stored in lut
}

// ---------------------------------------------------------------- channels
enum PixType { PT_UINT = 0, PT_HALF = 1, PT_FLOAT = 2 };

struct Channel {
  std::string name;
  int type;
  int xs, ys;  // sampling (must be 1)
};

struct Header {
  std::vector<Channel> channels;
  int compression = -1;
  int32_t dw_x0 = 0, dw_y0 = 0, dw_x1 = 0, dw_y1 = 0;
  int line_order = 0;
};

static int lines_per_block(int compression) {
  switch (compression) {
    case 0:  // NONE
    case 1:  // RLE
    case 2:  // ZIPS
      return 1;
    case 3:  // ZIP
      return 16;
    case 4:  // PIZ
      return 32;
    default:
      return -1;
  }
}

static bool parse_header(Reader& r, Header& h, std::string& err) {
  if (r.u32() != 20000630u) {
    err = "not an EXR file";
    return false;
  }
  uint32_t version = r.u32();
  if ((version & 0x200) || (version & 0x1000)) {
    err = "tiled/multipart EXR not supported";
    return false;
  }
  while (r.ok) {
    std::string name = r.cstr();
    if (name.empty()) break;
    std::string type = r.cstr();
    uint32_t size = r.u32();
    if (!r.ok || size > (size_t)(r.end - r.p)) {
      err = "truncated attribute";
      return false;
    }
    const uint8_t* val = r.p;
    if (name == "channels" && type == "chlist") {
      Reader cr{val, val + size};
      while (cr.ok) {
        std::string cn = cr.cstr();
        if (cn.empty()) break;
        Channel c;
        c.name = cn;
        c.type = cr.i32();
        cr.u32();  // pLinear + reserved
        c.xs = cr.i32();
        c.ys = cr.i32();
        h.channels.push_back(c);
      }
    } else if (name == "compression" && type == "compression") {
      if (size < 1) {
        err = "bad compression attribute";
        return false;
      }
      h.compression = val[0];
    } else if (name == "dataWindow" && type == "box2i") {
      Reader br{val, val + size};
      h.dw_x0 = br.i32();
      h.dw_y0 = br.i32();
      h.dw_x1 = br.i32();
      h.dw_y1 = br.i32();
    } else if (name == "lineOrder" && type == "lineOrder") {
      if (size < 1) {
        err = "bad lineOrder attribute";
        return false;
      }
      h.line_order = val[0];
    }
    r.skip(size);
  }
  if (!r.ok) {
    err = "truncated header";
    return false;
  }
  if (h.channels.empty() || h.compression < 0) {
    err = "missing required attributes";
    return false;
  }
  if (lines_per_block(h.compression) < 0) {
    err = "unsupported compression " + std::to_string(h.compression);
    return false;
  }
  for (auto& c : h.channels) {
    if (c.xs != 1 || c.ys != 1) {
      err = "subsampled channels not supported";
      return false;
    }
    if (c.type == PT_UINT) {
      err = "UINT channels not supported";
      return false;
    }
  }
  return true;
}

// decode one uncompressed scanline block (channel-planar rows) into the
// output float buffer (H x W x C interleaved, channels in file order).
static void unpack_block(const Header& h, const uint8_t* data, int y0,
                         int nlines, int width, int height, float* out) {
  int C = (int)h.channels.size();
  const uint8_t* p = data;
  for (int ly = 0; ly < nlines; ly++) {
    int y = y0 + ly;
    if (y >= height) break;
    for (int ci = 0; ci < C; ci++) {
      const Channel& c = h.channels[ci];
      float* row = out + ((size_t)y * width) * C + ci;
      if (c.type == PT_HALF) {
        for (int x = 0; x < width; x++) {
          uint16_t v;
          std::memcpy(&v, p + (size_t)x * 2, 2);
          row[(size_t)x * C] = half_to_float(v);
        }
        p += (size_t)width * 2;
      } else {
        for (int x = 0; x < width; x++) {
          float v;
          std::memcpy(&v, p + (size_t)x * 4, 4);
          row[(size_t)x * C] = v;
        }
        p += (size_t)width * 4;
      }
    }
  }
}

static bool piz_uncompress(const Header& h, const uint8_t* src, size_t nsrc,
                           int width, int nlines,
                           std::vector<uint8_t>& raw) {
  Reader r{src, src + nsrc};
  uint16_t lo = r.u8(), hi = r.u8();
  uint16_t minNonZero = (uint16_t)(lo | (hi << 8));
  lo = r.u8();
  hi = r.u8();
  uint16_t maxNonZero = (uint16_t)(lo | (hi << 8));
  std::vector<uint8_t> bitmap(BITMAP_SIZE, 0);
  if (maxNonZero >= BITMAP_SIZE) { g_err="piz: bad bitmap range"; return false; }
  if (minNonZero <= maxNonZero) {
    size_t n = (size_t)maxNonZero - minNonZero + 1;
    if ((size_t)(r.end - r.p) < n) { g_err="piz: truncated bitmap"; return false; }
    std::memcpy(bitmap.data() + minNonZero, r.p, n);
    r.skip(n);
  }
  std::vector<uint16_t> lut;
  uint16_t maxValue = reverse_lut_from_bitmap(bitmap.data(), lut);

  int32_t lengthOfCompressed = r.i32();
  if (!r.ok || lengthOfCompressed < 0 ||
      (size_t)lengthOfCompressed > (size_t)(r.end - r.p)) {
    g_err = "piz: bad huf length";
    return false;
  }

  // channel layout in 16-bit words
  struct CD {
    size_t start;
    int nx, ny, size;
  };
  std::vector<CD> cds;
  size_t total = 0;
  for (auto& c : h.channels) {
    CD cd;
    cd.nx = width;
    cd.ny = nlines;
    cd.size = (c.type == PT_FLOAT) ? 2 : 1;
    cd.start = total;
    total += (size_t)cd.nx * cd.ny * cd.size;
    cds.push_back(cd);
  }
  std::vector<uint16_t> tmp(total);
  if (!huf_uncompress(r.p, (size_t)lengthOfCompressed, tmp.data(), total)) {
    if (g_err.empty()) g_err = "piz: huf failed";
    return false;
  }

  for (auto& cd : cds) {
    for (int j = 0; j < cd.size; j++) {
      wav2_decode(tmp.data() + cd.start + j, cd.nx, cd.size, cd.ny,
                  cd.nx * cd.size, maxValue);
    }
  }
  for (size_t i = 0; i < total; i++) tmp[i] = lut[tmp[i]];

  // interleave to scanline order
  raw.resize(total * 2);
  uint8_t* out = raw.data();
  std::vector<size_t> pos(cds.size());
  for (size_t i = 0; i < cds.size(); i++) pos[i] = cds[i].start;
  for (int y = 0; y < nlines; y++) {
    for (size_t ci = 0; ci < cds.size(); ci++) {
      size_t nwords = (size_t)cds[ci].nx * cds[ci].size;
      std::memcpy(out, tmp.data() + pos[ci], nwords * 2);
      pos[ci] += nwords;
      out += nwords * 2;
    }
  }
  return true;
}

}  // namespace

// ==================================================================== C API
extern "C" {

const char* exr_last_error() { return g_err.c_str(); }

void exr_free(void* p) { std::free(p); }

// Reads an EXR. On success returns 0 and sets *out (malloc'd H*W*C floats,
// interleaved, channels in file (alphabetical) order), *names (malloc'd
// semicolon-joined channel names), *w, *h, *c.
int exr_read(const char* path, float** out, int* w, int* h, int* c,
             char** names) {
  g_err.clear();
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_err = "cannot open file";
    return 1;
  }
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)fsize);
  if (std::fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    std::fclose(f);
    g_err = "short read";
    return 1;
  }
  std::fclose(f);

  Reader r{buf.data(), buf.data() + buf.size()};
  Header hdr;
  if (!parse_header(r, hdr, g_err)) return 1;

  int width = hdr.dw_x1 - hdr.dw_x0 + 1;
  int height = hdr.dw_y1 - hdr.dw_y0 + 1;
  int C = (int)hdr.channels.size();
  if (width <= 0 || height <= 0 || C <= 0 || (size_t)width * height > (1ull << 30)) {
    g_err = "bad dimensions";
    return 1;
  }

  int lpb = lines_per_block(hdr.compression);
  int nblocks = (height + lpb - 1) / lpb;

  // chunk offset table
  std::vector<uint64_t> offsets(nblocks);
  for (int i = 0; i < nblocks; i++) offsets[i] = r.u64();
  if (!r.ok) {
    g_err = "truncated offset table";
    return 1;
  }

  size_t bytes_per_line = 0;
  for (auto& ch : hdr.channels)
    bytes_per_line += (size_t)width * (ch.type == PT_HALF ? 2 : 4);

  float* result = (float*)std::malloc((size_t)width * height * C * sizeof(float));
  if (!result) {
    g_err = "oom";
    return 1;
  }

  for (int b = 0; b < nblocks; b++) {
    if (offsets[b] + 8 > buf.size()) {
      std::free(result);
      g_err = "bad chunk offset";
      return 1;
    }
    Reader cr{buf.data() + offsets[b], buf.data() + buf.size()};
    int32_t y = cr.i32() - hdr.dw_y0;
    int32_t packed = cr.i32();
    if (!cr.ok || packed < 0 || (size_t)packed > (size_t)(cr.end - cr.p) ||
        y < 0 || y >= height) {
      std::free(result);
      g_err = "bad chunk";
      return 1;
    }
    int nlines = lpb;
    if (y + nlines > height) nlines = height - y;
    size_t rawsize = bytes_per_line * nlines;

    std::vector<uint8_t> rawbuf;
    bool ok = true;
    switch (hdr.compression) {
      case 0:  // NONE
        // `packed` is bounds-checked against the buffer above; the copy
        // must not exceed it (a truncated file would heap-over-read)
        if ((size_t)packed != rawsize) {
          ok = false;
          break;
        }
        rawbuf.assign(cr.p, cr.p + rawsize);
        break;
      case 1:  // RLE
        if ((size_t)packed >= rawsize) {
          rawbuf.assign(cr.p, cr.p + rawsize);
        } else {
          rawbuf.resize(rawsize);
          ok = rle_decode(cr.p, (size_t)packed, rawbuf);
          if (ok) postfilter(rawbuf);
        }
        break;
      case 2:  // ZIPS
      case 3:  // ZIP
        if ((size_t)packed >= rawsize) {
          rawbuf.assign(cr.p, cr.p + rawsize);
        } else {
          rawbuf.resize(rawsize);
          ok = zlib_inflate(cr.p, (size_t)packed, rawbuf);
          if (ok) postfilter(rawbuf);
        }
        break;
      case 4:  // PIZ
        if ((size_t)packed >= rawsize) {
          // stored uncompressed when compression did not shrink the block
          rawbuf.assign(cr.p, cr.p + rawsize);
        } else {
          ok = piz_uncompress(hdr, cr.p, (size_t)packed, width, nlines, rawbuf);
          if (ok && rawbuf.size() != rawsize) { ok = false; g_err = "piz: size mismatch"; }
        }
        break;
    }
    if (!ok) {
      std::free(result);
      g_err = "chunk decode failed (y=" + std::to_string(y) + "): " + g_err;
      return 1;
    }
    unpack_block(hdr, rawbuf.data(), y, nlines, width, height, result);
  }

  std::string joined;
  for (size_t i = 0; i < hdr.channels.size(); i++) {
    if (i) joined.push_back(';');
    joined += hdr.channels[i].name;
  }
  char* nm = (char*)std::malloc(joined.size() + 1);
  std::memcpy(nm, joined.c_str(), joined.size() + 1);

  *out = result;
  *w = width;
  *h = height;
  *c = C;
  *names = nm;
  return 0;
}

// Writes a scanline EXR with ZIP compression. `data` is H*W*C floats,
// channel names semicolon-separated in the SAME order as the data's last
// axis; they are sorted alphabetically on disk as the format requires.
// half=1 stores HALF channels, else FLOAT.
int exr_write(const char* path, const float* data, int width, int height,
              int nch, const char* names, int as_half) {
  g_err.clear();
  std::vector<std::string> chnames;
  {
    std::string cur;
    for (const char* p = names;; p++) {
      if (*p == ';' || *p == 0) {
        chnames.push_back(cur);
        cur.clear();
        if (*p == 0) break;
      } else
        cur.push_back(*p);
    }
  }
  if ((int)chnames.size() != nch) {
    g_err = "channel count mismatch";
    return 1;
  }
  // sort channels alphabetically, remember source index
  std::vector<int> order(nch);
  for (int i = 0; i < nch; i++) order[i] = i;
  for (int i = 0; i < nch; i++)
    for (int j = i + 1; j < nch; j++)
      if (chnames[order[j]] < chnames[order[i]]) std::swap(order[i], order[j]);

  FILE* f = std::fopen(path, "wb");
  if (!f) {
    g_err = "cannot open for write";
    return 1;
  }
  auto w8 = [&](uint8_t v) { std::fputc(v, f); };
  auto w32 = [&](uint32_t v) {
    for (int i = 0; i < 4; i++) w8((uint8_t)(v >> (8 * i)));
  };
  auto w64 = [&](uint64_t v) {
    for (int i = 0; i < 8; i++) w8((uint8_t)(v >> (8 * i)));
  };
  auto wstr = [&](const std::string& s) {
    std::fwrite(s.c_str(), 1, s.size() + 1, f);
  };
  auto wattr = [&](const char* name, const char* type,
                   const std::vector<uint8_t>& v) {
    wstr(name);
    wstr(type);
    w32((uint32_t)v.size());
    std::fwrite(v.data(), 1, v.size(), f);
  };

  w32(20000630u);
  w32(2u);  // version 2, scanline

  // channels
  {
    std::vector<uint8_t> v;
    auto push32 = [&](uint32_t x) {
      for (int i = 0; i < 4; i++) v.push_back((uint8_t)(x >> (8 * i)));
    };
    for (int i = 0; i < nch; i++) {
      const std::string& nm = chnames[order[i]];
      for (char ch : nm) v.push_back((uint8_t)ch);
      v.push_back(0);
      push32(as_half ? PT_HALF : PT_FLOAT);
      push32(0);  // pLinear + reserved
      push32(1);  // xSampling
      push32(1);  // ySampling
    }
    v.push_back(0);
    wattr("channels", "chlist", v);
  }
  {
    std::vector<uint8_t> v(1, 3);  // ZIP
    wattr("compression", "compression", v);
  }
  {
    std::vector<uint8_t> v;
    auto push32 = [&](int32_t x) {
      for (int i = 0; i < 4; i++) v.push_back((uint8_t)((uint32_t)x >> (8 * i)));
    };
    push32(0);
    push32(0);
    push32(width - 1);
    push32(height - 1);
    std::vector<uint8_t> v2 = v;
    wattr("dataWindow", "box2i", v);
    wattr("displayWindow", "box2i", v2);
  }
  {
    std::vector<uint8_t> v(1, 0);  // increasing y
    wattr("lineOrder", "lineOrder", v);
  }
  {
    std::vector<uint8_t> v(4);
    float pa = 1.0f;
    std::memcpy(v.data(), &pa, 4);
    wattr("pixelAspectRatio", "float", v);
  }
  {
    std::vector<uint8_t> v(8, 0);
    wattr("screenWindowCenter", "v2f", v);
  }
  {
    std::vector<uint8_t> v(4);
    float sw = 1.0f;
    std::memcpy(v.data(), &sw, 4);
    wattr("screenWindowWidth", "float", v);
  }
  w8(0);  // end of header

  int lpb = 16;
  int nblocks = (height + lpb - 1) / lpb;
  long offset_table_pos = std::ftell(f);
  for (int i = 0; i < nblocks; i++) w64(0);  // placeholder

  size_t px_bytes = as_half ? 2 : 4;
  std::vector<uint64_t> offsets(nblocks);
  std::vector<uint8_t> rawbuf;

  for (int b = 0; b < nblocks; b++) {
    int y0 = b * lpb;
    int nlines = (y0 + lpb > height) ? height - y0 : lpb;
    rawbuf.resize((size_t)width * nch * px_bytes * nlines);
    uint8_t* p = rawbuf.data();
    for (int ly = 0; ly < nlines; ly++) {
      int y = y0 + ly;
      for (int ci = 0; ci < nch; ci++) {
        int src_c = order[ci];
        const float* row = data + ((size_t)y * width) * nch + src_c;
        if (as_half) {
          for (int x = 0; x < width; x++) {
            uint16_t v = float_to_half(row[(size_t)x * nch]);
            std::memcpy(p + (size_t)x * 2, &v, 2);
          }
          p += (size_t)width * 2;
        } else {
          for (int x = 0; x < width; x++) {
            float v = row[(size_t)x * nch];
            std::memcpy(p + (size_t)x * 4, &v, 4);
          }
          p += (size_t)width * 4;
        }
      }
    }
    std::vector<uint8_t> filtered = rawbuf;
    prefilter(filtered);
    uLongf bound = compressBound((uLong)filtered.size());
    std::vector<uint8_t> comp(bound);
    compress2(comp.data(), &bound, filtered.data(), (uLong)filtered.size(), 6);
    const uint8_t* payload;
    size_t payload_n;
    if (bound >= rawbuf.size()) {
      payload = rawbuf.data();
      payload_n = rawbuf.size();
    } else {
      payload = comp.data();
      payload_n = bound;
    }
    offsets[b] = (uint64_t)std::ftell(f);
    w32((uint32_t)y0);
    w32((uint32_t)payload_n);
    std::fwrite(payload, 1, payload_n, f);
  }
  std::fseek(f, offset_table_pos, SEEK_SET);
  for (int i = 0; i < nblocks; i++) w64(offsets[i]);
  std::fclose(f);
  return 0;
}

}  // extern "C"
