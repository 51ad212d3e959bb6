// rawio — minimal native raw-image reader (C++).
//
// TPU-era stand-in for the reference's customized rawpy/LibRaw dependency
// (README.md:36-38): exposes exactly the surface the framework needs —
// the raw mosaic, black/white levels, CFA pattern, camera white balance,
// color matrix, and the EXIF ISO/ExposureTime pair used to compute the
// ELD exposure ratio (dataset/sid_dataset.py:21-34, 397-401).
//
// Scope: the TIFF/TIFF-EP container family (.dng/.ARW/.NEF/.CR2 share it).
// Decodes uncompressed (Compression=1) 8/16-bit mosaics, linear DNGs, and
// Sony ARW 2.3 lossy-compressed mosaics (Compression=32767, 1 byte/px —
// the SID dataset's format; see sony_arw2 below).  Other vendor-compressed
// payloads (CR2/NEF lossless JPEG) report RIO_E_UNSUPPORTED_COMPRESSION so
// callers can gate or pre-convert to DNG.
// C ABI for ctypes (eld_tpu/data/rawio.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

enum Err {
  RIO_OK = 0,
  RIO_E_IO = -1,
  RIO_E_FORMAT = -2,
  RIO_E_UNSUPPORTED_COMPRESSION = -3,
  RIO_E_NOT_FOUND = -4,
};

struct Entry {
  uint16_t tag;
  uint16_t type;
  uint32_t count;
  uint64_t value_off;  // offset of value data in file
  uint64_t inline_val; // value if it fits inline
  bool is_inline;
};

struct Ifd {
  std::vector<Entry> entries;
};

struct Raw {
  const uint8_t* d = nullptr;
  size_t n = 0;
  int fd = -1;
  bool le = true;  // little endian

  // parsed results
  double iso = 0, exposure = 0;
  uint32_t width = 0, height = 0;
  uint32_t compression = 0, bits = 0;
  uint64_t strip_off = 0, strip_bytes = 0;
  std::vector<uint64_t> strip_offs, strip_cnts;
  uint32_t rows_per_strip = 0;
  double black[4] = {0, 0, 0, 0};  // CFA-cell row-major order (DNG tag order)
  bool has_black = false;
  double white = 0;
  uint8_t cfa[4] = {0, 1, 1, 2};  // row-major 2x2, 0=R 1=G 2=B
  uint8_t cfa_dim = 2;            // CFA repeat dim: 2 (Bayer) or 6 (X-Trans)
  uint8_t cfa_full[36] = {0};     // row-major cfa_dim x cfa_dim codes
  double wb[4] = {1, 1, 1, 1};     // R G B G gains
  double ccm[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};  // DNG ColorMatrix: XYZ->cam
  bool has_ccm = false;

  // Sony ARW 2.3: tone-curve knots from maker-note tag 0x7010 (12-bit
  // domain). The curve is DATA-DRIVEN — shipped inside each ARW file —
  // so no unverifiable hardcoded constants are involved; absent the tag
  // we fall back to the documented default segmentation {0,0,0,0,4095}
  // (pure step-16 expansion) and raise a warning bit.
  uint16_t arw_knots[4] = {0, 0, 0, 0};
  bool has_arw_curve = false;
  uint32_t warnings = 0;  // bit 0: ARW2 default curve; bit 1: default black
};

enum Warn {
  RIO_W_ARW2_DEFAULT_CURVE = 1,
  RIO_W_DEFAULT_BLACK = 2,
};

uint16_t rd16(const Raw& r, size_t off) {
  if (off + 2 > r.n) return 0;
  return r.le ? (r.d[off] | r.d[off + 1] << 8) : (r.d[off] << 8 | r.d[off + 1]);
}
uint32_t rd32(const Raw& r, size_t off) {
  if (off + 4 > r.n) return 0;
  return r.le ? (r.d[off] | r.d[off + 1] << 8 | r.d[off + 2] << 16 |
                 (uint32_t)r.d[off + 3] << 24)
              : ((uint32_t)r.d[off] << 24 | r.d[off + 1] << 16 |
                 r.d[off + 2] << 8 | r.d[off + 3]);
}

size_t type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;   // byte/ascii/sbyte/undef
    case 3: case 8: return 2;                   // short
    case 4: case 9: case 11: return 4;          // long/slong/float
    case 5: case 10: case 12: return 8;         // rational/srational/double
    default: return 1;
  }
}

bool parse_ifd(const Raw& r, size_t off, Ifd* out, size_t* next) {
  if (off + 2 > r.n) return false;
  uint16_t cnt = rd16(r, off);
  if (cnt > 4096) return false;
  size_t p = off + 2;
  for (uint16_t i = 0; i < cnt; ++i, p += 12) {
    if (p + 12 > r.n) return false;
    Entry e;
    e.tag = rd16(r, p);
    e.type = rd16(r, p + 2);
    e.count = rd32(r, p + 4);
    size_t bytes = type_size(e.type) * (size_t)e.count;
    if (bytes <= 4) {
      e.is_inline = true;
      e.value_off = p + 8;
    } else {
      e.is_inline = false;
      e.value_off = rd32(r, p + 8);
    }
    out->entries.push_back(e);
  }
  if (next) *next = (p + 4 <= r.n) ? rd32(r, p) : 0;
  return true;
}

const Entry* find(const Ifd& ifd, uint16_t tag) {
  for (auto& e : ifd.entries)
    if (e.tag == tag) return &e;
  return nullptr;
}

double read_val(const Raw& r, const Entry& e, uint32_t idx) {
  size_t off = e.value_off + (size_t)idx * type_size(e.type);
  switch (e.type) {
    case 1: case 7: return off < r.n ? r.d[off] : 0;
    case 3: return rd16(r, off);
    case 4: return rd32(r, off);
    case 5: {  // rational
      double num = rd32(r, off), den = rd32(r, off + 4);
      return den != 0 ? num / den : 0;
    }
    case 8: return (int16_t)rd16(r, off);
    case 9: return (int32_t)rd32(r, off);
    case 10: {
      double num = (int32_t)rd32(r, off), den = (int32_t)rd32(r, off + 4);
      return den != 0 ? num / den : 0;
    }
    case 11: {
      uint32_t v = rd32(r, off);
      float f;
      std::memcpy(&f, &v, 4);
      return f;
    }
    default: return 0;
  }
}

void read_vec(const Raw& r, const Entry& e, double* out, uint32_t n) {
  for (uint32_t i = 0; i < n && i < e.count; ++i) out[i] = read_val(r, e, i);
}

// Collect raw-frame candidate IFDs: IFD0 chain + SubIFDs (DNG main image
// usually lives in a SubIFD with NewSubfileType==0).
void gather_ifds(const Raw& r, size_t off0, std::vector<Ifd>* out, int depth = 0) {
  if (depth > 6) return;
  size_t off = off0;
  int guard = 0;
  while (off && guard++ < 32) {
    Ifd ifd;
    size_t next = 0;
    if (!parse_ifd(r, off, &ifd, &next)) return;
    if (const Entry* sub = find(ifd, 0x014A)) {  // SubIFDs
      for (uint32_t i = 0; i < sub->count; ++i) {
        size_t soff = (size_t)read_val(r, *sub, i);
        if (soff) gather_ifds(r, soff, out, depth + 1);
      }
    }
    out->push_back(std::move(ifd));
    off = next;
  }
}

void parse_exif(Raw& r, const Ifd& ifd) {
  if (const Entry* e = find(ifd, 0x8827)) r.iso = read_val(r, *e, 0);
  if (const Entry* e = find(ifd, 0x829A)) r.exposure = read_val(r, *e, 0);
}

// Sony maker note (inside the EXIF IFD, tag 0x927C): a plain TIFF IFD with
// file-absolute value offsets.  Tags (exiftool Sony::Main / the dcraw
// parse_makernote semantics):
//   0x7010  tone-curve knots: 4 shorts, knot = (v >> 2) & 0xfff
//   0x7310  per-channel black level, 4 shorts in CFA-cell order (R G1 G2 B)
//   0x7313  WB_RGGBLevels: 4 shorts (R G1 G2 B multipliers)
//   0x787f  white level
void parse_sony_makernote(Raw& r, size_t off) {
  Ifd mk;
  size_t next = 0;
  // some bodies prefix "SONY DSC \0\0\0" (12 bytes); ARW maker notes
  // usually start directly with the IFD entry count
  if (!parse_ifd(r, off, &mk, &next) || mk.entries.empty() ||
      mk.entries.size() > 2048) {
    mk.entries.clear();
    if (!parse_ifd(r, off + 12, &mk, &next)) return;
  }
  if (const Entry* e = find(mk, 0x7010)) {
    if (e->count >= 4) {
      for (int i = 0; i < 4; ++i)
        r.arw_knots[i] = ((uint16_t)read_val(r, *e, i) >> 2) & 0xfff;
      r.has_arw_curve = true;
    }
  }
  if (const Entry* e = find(mk, 0x7310)) {
    if (e->count >= 4) {
      // CFA-cell row-major order (R G1 / G2 B for the Sony RGGB mosaic),
      // the same convention rio_black_level documents for DNG
      for (int i = 0; i < 4; ++i) r.black[i] = read_val(r, *e, i);
      r.has_black = true;
    }
  }
  if (const Entry* e = find(mk, 0x7313)) {
    if (e->count >= 4) {
      // R G1 G2 B -> packed (R, G, B, G2) multipliers
      r.wb[0] = read_val(r, *e, 0);
      r.wb[1] = read_val(r, *e, 1);
      r.wb[2] = read_val(r, *e, 3);
      r.wb[3] = read_val(r, *e, 2);
    }
  }
  if (const Entry* e = find(mk, 0x787f)) {
    double w = read_val(r, *e, 0);
    if (w > 0) r.white = w;
  }
}

// Sony ARW 2.3 lossy compression (the SID dataset's .ARW payload).
// Format (public; decoder semantics documented by dcraw/LibRaw's
// sony_arw2_load_raw and the RawDigger ARW2 analyses — implemented from
// the format spec, not translated code):
//   * 1 byte/pixel average; each row is `width` bytes.
//   * 16-byte block -> 16 pixels of ONE Bayer color (columns col, col+2,
//     ...); blocks alternate even/odd column phase across each 32-column
//     span.
//   * Block: 32-bit LE header = max(11) | min(11)<<11 | imax(4)<<22 |
//     imin(4)<<26; then fourteen 7-bit deltas starting at bit 30.
//     shift sh = smallest s in [0,4) with (0x80 << s) > max-min;
//     pix[i] = i==imax ? max : i==imin ? min : min(0x7ff, (delta<<sh)+min).
//   * The 11-bit values are companded; expansion runs through a
//     piecewise-linear curve over the 12-bit domain with slopes
//     1,2,4,8,16 between knots {0, k1..k4 (maker note 0x7010), 4095}:
//     out14 = curve[pix << 1] >> 2.
int decode_arw2(const Raw& r, const uint8_t* strip, uint64_t nbytes,
                uint16_t* dst) {
  const uint32_t w = r.width, h = r.height;
  if (nbytes < (uint64_t)w * h) return RIO_E_FORMAT;

  // build the expansion curve (16-bit range over the 12-bit domain)
  uint16_t knots[6] = {0, 0, 0, 0, 0, 4095};
  for (int i = 0; i < 4; ++i) knots[i + 1] = r.arw_knots[i];
  for (int i = 1; i < 6; ++i)
    if (knots[i] < knots[i - 1]) knots[i] = knots[i - 1];
  std::vector<uint32_t> curve(4096);
  curve[0] = 0;
  for (int seg = 0; seg < 5; ++seg)
    for (uint32_t j = knots[seg] + 1; j <= knots[seg + 1]; ++j)
      curve[j] = curve[j - 1] + (1u << seg);

  std::vector<uint8_t> rowbuf(w + 2, 0);  // +2: the bit reader's 16-bit
                                          // loads may touch 1 byte past
                                          // the last block (dcraw pads too)
  for (uint32_t row = 0; row < h; ++row) {
    std::memcpy(rowbuf.data(), strip + (uint64_t)row * w, w);
    const uint8_t* dp = rowbuf.data();
    uint16_t* out = dst + (uint64_t)row * w;
    for (uint32_t col = 0; col + 30 < w; dp += 16) {
      uint32_t val = dp[0] | dp[1] << 8 | dp[2] << 16 | (uint32_t)dp[3] << 24;
      int maxv = val & 0x7ff;
      int minv = (val >> 11) & 0x7ff;
      int imax = (val >> 22) & 0xf;
      int imin = (val >> 26) & 0xf;
      int sh;
      for (sh = 0; sh < 4 && (0x80 << sh) <= maxv - minv; ++sh) {}
      int bit = 30;
      uint16_t pix[16];
      for (int i = 0; i < 16; ++i) {
        if (i == imax) {
          pix[i] = (uint16_t)maxv;
        } else if (i == imin) {
          pix[i] = (uint16_t)minv;
        } else {
          uint32_t w16 = dp[bit >> 3] | (uint32_t)dp[(bit >> 3) + 1] << 8;
          uint32_t v = ((w16 >> (bit & 7)) & 0x7f) << sh;
          pix[i] = (uint16_t)(v + minv > 0x7ff ? 0x7ff : v + minv);
          bit += 7;
        }
      }
      for (int i = 0; i < 16; ++i, col += 2)
        out[col] = (uint16_t)(curve[(uint32_t)pix[i] << 1] >> 2);
      col -= (col & 1) ? 1 : 31;
    }
  }
  return RIO_OK;
}

int parse(Raw& r) {
  if (r.n < 16) return RIO_E_FORMAT;
  if (r.d[0] == 'I' && r.d[1] == 'I') r.le = true;
  else if (r.d[0] == 'M' && r.d[1] == 'M') r.le = false;
  else return RIO_E_FORMAT;
  if (rd16(r, 2) != 42) return RIO_E_FORMAT;

  std::vector<Ifd> ifds;
  gather_ifds(r, rd32(r, 4), &ifds);
  if (ifds.empty()) return RIO_E_FORMAT;

  // EXIF from IFD0's ExifIFD pointer, or inline; maker note via EXIF
  for (auto& ifd : ifds) {
    parse_exif(r, ifd);
    if (const Entry* e = find(ifd, 0x8769)) {
      Ifd exif;
      size_t next;
      if (parse_ifd(r, (size_t)read_val(r, *e, 0), &exif, &next)) {
        parse_exif(r, exif);
        if (const Entry* mk = find(exif, 0x927C))
          parse_sony_makernote(r, (size_t)mk->value_off);
      }
    }
  }

  // choose the raw frame: the largest CFA/uncompressed strip image
  uint64_t best_pixels = 0;
  for (auto& ifd : ifds) {
    const Entry* we = find(ifd, 0x0100);
    const Entry* he = find(ifd, 0x0101);
    const Entry* so = find(ifd, 0x0111);
    if (!we || !he || !so) continue;
    const Entry* pi = find(ifd, 0x0106);  // PhotometricInterpretation
    double photometric = pi ? read_val(r, *pi, 0) : -1;
    uint64_t w = (uint64_t)read_val(r, *we, 0);
    uint64_t h = (uint64_t)read_val(r, *he, 0);
    bool is_cfa = photometric == 32803;  // CFA
    // prefer CFA frames; otherwise biggest strip image
    uint64_t score = w * h * (is_cfa ? 16 : 1);
    if (score <= best_pixels) continue;
    best_pixels = score;

    r.width = (uint32_t)w;
    r.height = (uint32_t)h;
    r.cfa_dim = 2;  // reset per winning frame (a losing IFD may have set 6)
    const Entry* ce = find(ifd, 0x0103);
    r.compression = ce ? (uint32_t)read_val(r, *ce, 0) : 1;
    const Entry* be = find(ifd, 0x0102);
    r.bits = be ? (uint32_t)read_val(r, *be, 0) : 16;
    const Entry* sc = find(ifd, 0x0117);
    r.strip_offs.clear();
    r.strip_cnts.clear();
    for (uint32_t i = 0; i < so->count; ++i)
      r.strip_offs.push_back((uint64_t)read_val(r, *so, i));
    if (sc)
      for (uint32_t i = 0; i < sc->count; ++i)
        r.strip_cnts.push_back((uint64_t)read_val(r, *sc, i));
    const Entry* rps = find(ifd, 0x0116);
    r.rows_per_strip = rps ? (uint32_t)read_val(r, *rps, 0) : r.height;

    if (const Entry* e = find(ifd, 0xC61A)) {  // DNG BlackLevel
      double tmp[4] = {0, 0, 0, 0};
      read_vec(r, *e, tmp, 4);
      for (int i = 0; i < 4; ++i) r.black[i] = e->count >= 4 ? tmp[i] : tmp[0];
      r.has_black = true;
    }
    if (const Entry* e = find(ifd, 0xC61D)) r.white = read_val(r, *e, 0);
    if (const Entry* e = find(ifd, 0x828D)) {  // CFARepeatPatternDim
      uint32_t d0 = (uint32_t)read_val(r, *e, 0);
      if (d0 == 6 && (uint32_t)read_val(r, *e, 1) == 6) r.cfa_dim = 6;
    }
    if (const Entry* e = find(ifd, 0x828E)) {  // CFAPattern
      uint32_t n = r.cfa_dim == 6 ? 36 : 4;
      double tmp[36] = {0, 1, 1, 2};
      read_vec(r, *e, tmp, n);
      for (uint32_t i = 0; i < n; ++i) r.cfa_full[i] = (uint8_t)tmp[i];
      if (r.cfa_dim == 2)
        for (int i = 0; i < 4; ++i) r.cfa[i] = (uint8_t)tmp[i];
    }
  }
  if (!r.width) return RIO_E_NOT_FOUND;

  // DNG color tags live in IFD0
  for (auto& ifd : ifds) {
    if (const Entry* e = find(ifd, 0xC628)) {  // AsShotNeutral (RGB)
      double neu[3] = {1, 1, 1};
      read_vec(r, *e, neu, 3);
      if (neu[0] > 0 && neu[1] > 0 && neu[2] > 0) {
        r.wb[0] = neu[1] / neu[0];
        r.wb[1] = 1.0;
        r.wb[2] = neu[1] / neu[2];
        r.wb[3] = 1.0;
      }
    }
    if (const Entry* e = find(ifd, 0xC621)) {  // ColorMatrix1 (XYZ->cam)
      read_vec(r, *e, r.ccm, 9);
      r.has_ccm = true;
    }
    if (const Entry* e = find(ifd, 0xC622)) {  // ColorMatrix2 preferred
      read_vec(r, *e, r.ccm, 9);
      r.has_ccm = true;
    }
  }

  // Sony ARW 2.3 defaults where tags are absent: 14-bit white point and
  // black 512 (the A7S2 values the reference pipeline hardcodes,
  // dataset/sid_dataset.py:193); warn so callers can surface it.
  if (r.compression == 32767) {
    if (!r.has_arw_curve) r.warnings |= RIO_W_ARW2_DEFAULT_CURVE;
    if (!r.has_black) {
      for (int i = 0; i < 4; ++i) r.black[i] = 512.0;
      r.has_black = true;
      r.warnings |= RIO_W_DEFAULT_BLACK;
    }
    if (r.white <= 0) r.white = 16383.0;
  }
  return RIO_OK;
}

}  // namespace

extern "C" {

void* rio_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Raw();
  r->fd = fd;
  r->d = static_cast<const uint8_t*>(base);
  r->n = st.st_size;
  if (parse(*r) != RIO_OK) {
    munmap(base, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  return r;
}

double rio_iso(void* h) { return static_cast<Raw*>(h)->iso; }
double rio_exposure(void* h) { return static_cast<Raw*>(h)->exposure; }
uint32_t rio_width(void* h) { return static_cast<Raw*>(h)->width; }
uint32_t rio_height(void* h) { return static_cast<Raw*>(h)->height; }
uint32_t rio_compression(void* h) { return static_cast<Raw*>(h)->compression; }
uint32_t rio_bits(void* h) { return static_cast<Raw*>(h)->bits; }
double rio_white_level(void* h) { return static_cast<Raw*>(h)->white; }
// Black level in CFA-cell row-major order (the DNG tag layout); callers
// remap to packed channel order via the CFA pattern.
void rio_black_level(void* h, double* out) {
  std::memcpy(out, static_cast<Raw*>(h)->black, sizeof(double) * 4);
}
int rio_has_black(void* h) { return static_cast<Raw*>(h)->has_black ? 1 : 0; }
void rio_cfa_pattern(void* h, uint8_t* out) {
  std::memcpy(out, static_cast<Raw*>(h)->cfa, 4);
}
// CFA repeat dimension: 2 (Bayer) or 6 (X-Trans).
uint32_t rio_cfa_dim(void* h) { return static_cast<Raw*>(h)->cfa_dim; }
// Full row-major cfa_dim x cfa_dim pattern (out must hold dim*dim bytes).
void rio_cfa_pattern_full(void* h, uint8_t* out) {
  auto* r = static_cast<Raw*>(h);
  std::memcpy(out, r->cfa_dim == 6 ? r->cfa_full : r->cfa,
              (size_t)r->cfa_dim * r->cfa_dim);
}
void rio_wb(void* h, double* out) {
  std::memcpy(out, static_cast<Raw*>(h)->wb, sizeof(double) * 4);
}
int rio_ccm(void* h, double* out) {
  auto* r = static_cast<Raw*>(h);
  std::memcpy(out, r->ccm, sizeof(double) * 9);
  return r->has_ccm ? 0 : RIO_E_NOT_FOUND;
}

// Warning bitmask: 1 = ARW2 default tone curve, 2 = default black level.
uint32_t rio_warnings(void* h) { return static_cast<Raw*>(h)->warnings; }

// Decode the mosaic into dst (height*width uint16, row major).
int rio_read_raw(void* h, uint16_t* dst) {
  auto* r = static_cast<Raw*>(h);
  if (r->compression == 32767) {  // Sony ARW 2.3
    if (r->strip_offs.empty()) return RIO_E_FORMAT;
    uint64_t off = r->strip_offs[0];
    uint64_t nbytes = !r->strip_cnts.empty()
                          ? r->strip_cnts[0]
                          : (uint64_t)r->width * r->height;
    if (off + nbytes > r->n) return RIO_E_FORMAT;
    if (nbytes != (uint64_t)r->width * r->height)
      return RIO_E_UNSUPPORTED_COMPRESSION;  // older ARW variants
    return decode_arw2(*r, r->d + off, nbytes, dst);
  }
  if (r->compression != 1) return RIO_E_UNSUPPORTED_COMPRESSION;
  if (r->bits != 16 && r->bits != 8 && r->bits != 12 && r->bits != 14)
    return RIO_E_FORMAT;
  uint64_t total = (uint64_t)r->width * r->height;
  uint64_t out_i = 0;
  for (size_t s = 0; s < r->strip_offs.size() && out_i < total; ++s) {
    uint64_t off = r->strip_offs[s];
    uint64_t nbytes = s < r->strip_cnts.size()
                          ? r->strip_cnts[s]
                          : ((uint64_t)r->rows_per_strip * r->width * r->bits + 7) / 8;
    if (off + nbytes > r->n) return RIO_E_FORMAT;
    const uint8_t* p = r->d + off;
    if (r->bits == 16) {
      uint64_t cnt = nbytes / 2;
      for (uint64_t i = 0; i < cnt && out_i < total; ++i, ++out_i)
        dst[out_i] = r->le ? (p[2 * i] | p[2 * i + 1] << 8)
                           : (p[2 * i] << 8 | p[2 * i + 1]);
    } else if (r->bits == 8) {
      for (uint64_t i = 0; i < nbytes && out_i < total; ++i, ++out_i)
        dst[out_i] = p[i];
    } else {
      // 12/14-bit big-endian-packed bitstream (DNG packed layout)
      uint32_t acc = 0;
      int nbits = 0;
      for (uint64_t i = 0; i < nbytes && out_i < total; ++i) {
        acc = (acc << 8) | p[i];
        nbits += 8;
        while (nbits >= (int)r->bits && out_i < total) {
          nbits -= r->bits;
          dst[out_i++] = (acc >> nbits) & ((1u << r->bits) - 1);
        }
      }
    }
  }
  return out_i == total ? RIO_OK : RIO_E_FORMAT;
}

void rio_close(void* h) {
  auto* r = static_cast<Raw*>(h);
  if (r->d) munmap(const_cast<uint8_t*>(r->d), r->n);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
