// rawio — minimal native raw-image reader (C++).
//
// TPU-era stand-in for the reference's customized rawpy/LibRaw dependency
// (README.md:36-38): exposes exactly the surface the framework needs —
// the raw mosaic, black/white levels, CFA pattern, camera white balance,
// color matrix, and the EXIF ISO/ExposureTime pair used to compute the
// ELD exposure ratio (dataset/sid_dataset.py:21-34, 397-401).
//
// Scope: the TIFF/TIFF-EP container family (.dng/.ARW/.NEF/.CR2 share it).
// Decodes uncompressed (Compression=1) 8/16-bit mosaics, linear DNGs with
// ActiveArea cropping, Sony ARW 2.3 lossy-compressed mosaics
// (Compression=32767, 1 byte/px — the SID dataset's format; see sony_arw2
// below), Canon CR2 lossless-JPEG payloads (ITU-T81 SOF3, see read_cr2
// below), and Nikon NEF lossless payloads (see decode_nef below) — every
// raw format the SID/ELD datasets actually contain.  Genuinely unsupported
// compressions report RIO_E_UNSUPPORTED_COMPRESSION so callers can gate or
// pre-convert to DNG.
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

  // Canon CR2 (lossless JPEG + slicing + masked borders)
  bool is_ljpeg = false;        // raw strip is a lossless-JPEG stream
  uint16_t cr2_slices[3] = {0, 0, 0};  // [n, w_first_n, w_last] (tag 0xC640)

  // Nikon NEF (compression 34713): file offset of the maker-note
  // linearization table (tag 0x96), which carries the compression version
  // bytes and the initial vertical predictors
  uint64_t nef_meta_off = 0;
  // sensor borders from Canon maker-note SensorInfo (tag 0x00E0):
  // visible area = rows [top, bottom], cols [left, right] inclusive
  uint32_t sens_left = 0, sens_top = 0, sens_right = 0, sens_bottom = 0;
  bool has_sensor_info = false;
  uint32_t full_width = 0, full_height = 0;  // pre-crop mosaic dims

  // DNG ActiveArea (tag 0xC68D): the non-masked window of an uncompressed
  // DNG mosaic — top/left inclusive, bottom/right exclusive (DNG spec;
  // dcraw's parse_tiff_ifd case 50829 uses the same arithmetic)
  uint32_t act_top = 0, act_left = 0;
  bool has_active = false;
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

// rebase: added to non-inline value offsets — maker notes with an embedded
// TIFF header (Nikon) store offsets relative to that embedded header.
bool parse_ifd(const Raw& r, size_t off, Ifd* out, size_t* next,
               size_t rebase = 0) {
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
      e.value_off = rd32(r, p + 8) + rebase;
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

// Vendor maker note (inside the EXIF IFD, tag 0x927C): a plain TIFF IFD
// with file-absolute value offsets.  The Sony and Canon tag spaces are
// disjoint, so one opportunistic pass reads both.
// Sony tags (exiftool Sony::Main / the dcraw parse_makernote semantics):
//   0x7010  tone-curve knots: 4 shorts, knot = (v >> 2) & 0xfff
//   0x7310  per-channel black level, 4 shorts in CFA-cell order (R G1 G2 B)
//   0x7313  WB_RGGBLevels: 4 shorts (R G1 G2 B multipliers)
//   0x787f  white level
// Canon tags (exiftool Canon::Main):
//   0x00e0  SensorInfo: shorts [n, width, height, _, _, left, top, right,
//           bottom, ...] — the visible-area borders (inclusive)
// Nikon maker note: "Nikon\0" + 4 version bytes, then an EMBEDDED TIFF
// (header + IFD) whose value offsets are relative to the embedded header.
// Tags: 0x96 = linearization table (compression version bytes + initial
// vertical predictors + optional curve); 0x3d = per-channel black level
// (4 shorts, R G1 G2 B order).
void parse_nikon_makernote(Raw& r, size_t off) {
  size_t base = off + 10;  // skip "Nikon\0" + version
  if (base + 8 > r.n) return;
  // embedded TIFF header: byte order should match the file's
  size_t ifd_off = rd32(r, base + 4);
  Ifd mk;
  size_t next = 0;
  if (!parse_ifd(r, base + ifd_off, &mk, &next, base)) return;
  if (const Entry* e = find(mk, 0x0096)) r.nef_meta_off = e->value_off;
  if (const Entry* e = find(mk, 0x003d)) {
    if (e->count >= 4) {
      for (int i = 0; i < 4; ++i) r.black[i] = read_val(r, *e, i);
      r.has_black = true;
    }
  }
}

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
  if (const Entry* e = find(mk, 0x00e0)) {  // Canon SensorInfo
    if (e->count >= 9) {
      r.sens_left = (uint32_t)read_val(r, *e, 5);
      r.sens_top = (uint32_t)read_val(r, *e, 6);
      r.sens_right = (uint32_t)read_val(r, *e, 7);
      r.sens_bottom = (uint32_t)read_val(r, *e, 8);
      r.has_sensor_info = r.sens_right > r.sens_left && r.sens_bottom > r.sens_top;
    }
  }
}

// ---------------------------------------------------------------------------
// Lossless JPEG (ITU-T T.81 process 14, SOF3) — the entropy coding inside
// Canon CR2 raws.  Implemented from the JPEG spec: canonical Huffman DC
// tables select a bit-count class ssss, the difference is ssss extra bits
// with the T.81 sign extension, and samples are DPCM-predicted (psv 1 =
// left neighbor; first column predicts from the row above; the very first
// sample from 1 << (precision-1)).
// ---------------------------------------------------------------------------

struct LjHuff {
  // canonical table: code lengths histogram + values (T.81 DHT payload)
  uint16_t min_code[17];
  int32_t val_ptr[17];  // index into vals of first code of this length
  uint16_t max_code[17];
  uint8_t vals[256];
  bool valid = false;

  void build(const uint8_t counts[17], const uint8_t* values, size_t nvals) {
    uint16_t code = 0;
    size_t k = 0;
    for (int len = 1; len <= 16; ++len) {
      val_ptr[len] = (int32_t)k;
      min_code[len] = code;
      code = (uint16_t)(code + counts[len]);
      max_code[len] = counts[len] ? (uint16_t)(code - 1) : 0;
      if (!counts[len]) max_code[len] = 0, val_ptr[len] = -1;
      k += counts[len];
      code <<= 1;
    }
    for (size_t i = 0; i < nvals && i < 256; ++i) vals[i] = values[i];
    valid = k > 0;
  }
};

// Canonical-table code walk, shared by every Huffman bitstream here (the
// bit readers differ only in byte-stuffing rules).  Returns the decoded
// value or -1 on an invalid code.
template <typename Bits>
static int huff_decode(Bits& b, const LjHuff& h) {
  uint16_t code = 0;
  for (int len = 1; len <= 16; ++len) {
    code = (uint16_t)((code << 1) | b.get(1));
    if (h.val_ptr[len] >= 0 && code >= h.min_code[len] && code <= h.max_code[len])
      return h.vals[h.val_ptr[len] + (code - h.min_code[len])];
  }
  return -1;
}

struct LjBits {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int n = 0;

  void fill() {
    while (n <= 48 && p < end) {
      uint8_t b = *p++;
      if (b == 0xFF) {
        if (p < end && *p == 0x00) ++p;       // stuffed byte
        else { p = end; b = 0; }              // a marker terminates the scan
      }
      acc = (acc << 8) | b;
      n += 8;
    }
    if (p >= end && n <= 48) { acc <<= (56 - n); n = 56; }  // zero-pad tail
  }
  uint32_t get(int k) {
    if (k == 0) return 0;
    if (n < k) fill();
    n -= k;
    return (uint32_t)((acc >> n) & ((1u << k) - 1));
  }
  int decode(const LjHuff& h) {
    if (n < 16) fill();
    return huff_decode(*this, h);
  }
};

static int lj_extend(uint32_t v, int ssss) {
  // T.81 sign extension: values with MSB 0 are negative
  return (int)v < (1 << (ssss - 1)) ? (int)v - (1 << ssss) + 1 : (int)v;
}

struct LjFrame {
  int precision = 0, height = 0, width = 0, ncomp = 0;
  int comp_table[4] = {0, 0, 0, 0};
  int psv = 1;
  size_t scan_off = 0;  // entropy data start (relative to stream)
  LjHuff huff[4];
};

// Parse markers up to (and including) SOS.  Returns RIO_OK on success.
int lj_parse_header(const uint8_t* d, size_t n, LjFrame* f) {
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8) return RIO_E_FORMAT;
  size_t p = 2;
  while (p + 4 <= n) {
    if (d[p] != 0xFF) return RIO_E_FORMAT;
    uint8_t marker = d[p + 1];
    size_t len = ((size_t)d[p + 2] << 8) | d[p + 3];
    if (p + 2 + len > n) return RIO_E_FORMAT;
    const uint8_t* seg = d + p + 4;
    size_t seglen = len - 2;
    if (marker == 0xC4) {  // DHT (possibly several tables per segment)
      size_t q = 0;
      while (q + 17 <= seglen) {
        int th = seg[q] & 0x0F;
        uint8_t counts[17] = {0};
        size_t nv = 0;
        for (int i = 1; i <= 16; ++i) { counts[i] = seg[q + i]; nv += counts[i]; }
        // nv > 256 would make huff_decode index past LjHuff::vals
        if (q + 17 + nv > seglen || th > 3 || nv > 256) return RIO_E_FORMAT;
        f->huff[th].build(counts, seg + q + 17, nv);
        q += 17 + nv;
      }
    } else if (marker == 0xC3) {  // SOF3: lossless
      if (seglen < 6) return RIO_E_FORMAT;
      f->precision = seg[0];
      f->height = seg[1] << 8 | seg[2];
      f->width = seg[3] << 8 | seg[4];
      f->ncomp = seg[5];
      if (f->ncomp < 1 || f->ncomp > 4 || seglen < 6 + 3 * (size_t)f->ncomp)
        return RIO_E_FORMAT;
      // T.81 allows P in [2,16] for lossless; anything else would reach
      // shifts by negative/oversized exponents in lj_decode
      if (f->precision < 2 || f->precision > 16) return RIO_E_FORMAT;
    } else if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
               marker != 0xC8 && marker != 0xCC) {
      return RIO_E_UNSUPPORTED_COMPRESSION;  // a non-lossless SOF
    } else if (marker == 0xDA) {  // SOS
      if (seglen < 1) return RIO_E_FORMAT;
      int ns = seg[0];
      if (seglen < 1 + 2 * (size_t)ns + 3) return RIO_E_FORMAT;
      for (int i = 0; i < ns && i < 4; ++i) {
        int td = seg[2 + 2 * i] >> 4;
        // Td selects into huff[4]; the nibble can reach 15 in a crafted
        // file and would index the stack LjFrame out of bounds
        if (td > 3) return RIO_E_FORMAT;
        f->comp_table[i] = td;
      }
      f->psv = seg[1 + 2 * ns];  // Ss field = predictor selector
      f->scan_off = p + 2 + len;
      return (f->width && f->height && f->ncomp) ? RIO_OK : RIO_E_FORMAT;
    }
    p += 2 + len;
  }
  return RIO_E_FORMAT;
}

// Decode the full sample stream (h * w * ncomp values in frame raster
// order).  Only psv 1 (the CR2 predictor) is supported.
int lj_decode(const uint8_t* d, size_t n, const LjFrame& f,
              std::vector<uint16_t>* out) {
  if (f.psv != 1) return RIO_E_UNSUPPORTED_COMPRESSION;
  const int w = f.width, h = f.height, nc = f.ncomp;
  out->assign((size_t)w * h * nc, 0);
  LjBits bits{d + f.scan_off, d + n};
  uint16_t* buf = out->data();
  for (int row = 0; row < h; ++row) {
    for (int col = 0; col < w; ++col) {
      for (int c = 0; c < nc; ++c) {
        const LjHuff& hu = f.huff[f.comp_table[c]];
        if (!hu.valid) return RIO_E_FORMAT;
        int ssss = bits.decode(hu);
        // ssss is a file-controlled table byte; >16 would shift by up to
        // 255 in bits.get/lj_extend (UB) — T.81 caps DC classes at 16
        if (ssss < 0 || ssss > 16) return RIO_E_FORMAT;
        int diff = ssss == 0 ? 0
                 : ssss == 16 ? 32768
                              : lj_extend(bits.get(ssss), ssss);
        int pred;
        size_t i = ((size_t)row * w + col) * nc + c;
        if (col == 0)
          pred = row == 0 ? (1 << (f.precision - 1)) : buf[i - (size_t)w * nc];
        else
          pred = buf[i - nc];
        buf[i] = (uint16_t)(pred + diff);
      }
    }
  }
  return RIO_OK;
}

// ---------------------------------------------------------------------------
// Nikon NEF lossless compression (Compression=34713, version byte 0x46) —
// the D850's format.  Public format (documented by dcraw/LibRaw's
// nikon_load_raw): a plain MSB-first Huffman DPCM bitstream; the
// per-bit-depth code tables are format constants; columns 0 and 1 carry
// vertical predictors seeded from the maker-note linearization table
// (tag 0x96: ver0, ver1, vpred[2][2]); every later column predicts from
// the previous sample of the same column parity.  The lossless variants
// use the identity curve (no tone table).  Lossy NEF variants (ver0 !=
// 0x46) are not handled — they report unsupported.
// ---------------------------------------------------------------------------

// {16 code-length counts (lengths 1..16), then values} — format constants
// of the NEF bitstream (the "nikon tree" tables).
static const uint8_t kNefTree12[] = {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12};
static const uint8_t kNefTree14[] = {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
                                     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14};

struct NefBits {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int n = 0;
  uint32_t get(int k) {
    if (k == 0) return 0;
    while (n < k) {
      uint8_t b = p < end ? *p++ : 0;
      acc = (acc << 8) | b;
      n += 8;
    }
    n -= k;
    return (uint32_t)((acc >> n) & ((1u << k) - 1));
  }
};

int decode_nef(const Raw& r, uint16_t* dst) {
  if (!r.nef_meta_off || r.strip_offs.empty()) return RIO_E_FORMAT;
  size_t m = (size_t)r.nef_meta_off;
  if (m + 14 > r.n) return RIO_E_FORMAT;
  uint8_t ver0 = r.d[m], ver1 = r.d[m + 1];
  (void)ver1;
  if (ver0 != 0x46) return RIO_E_UNSUPPORTED_COMPRESSION;  // lossy variants
  if (r.bits != 12 && r.bits != 14) return RIO_E_FORMAT;
  int32_t vpred[2][2];
  for (int i = 0; i < 4; ++i) vpred[i >> 1][i & 1] = rd16(r, m + 2 + 2 * i);

  LjHuff huff;
  {
    const uint8_t* tree = r.bits == 14 ? kNefTree14 : kNefTree12;
    uint8_t counts[17] = {0};
    size_t nv = 0;
    for (int i = 1; i <= 16; ++i) { counts[i] = tree[i - 1]; nv += counts[i]; }
    huff.build(counts, tree + 16, nv);
  }

  uint64_t off = r.strip_offs[0];
  uint64_t nbytes = !r.strip_cnts.empty() ? r.strip_cnts[0] : r.n - off;
  if (off + nbytes > r.n) return RIO_E_FORMAT;
  NefBits bits{r.d + off, r.d + off + nbytes};

  const uint32_t W = r.width, H = r.height;
  const int32_t maxv = (1 << r.bits) - 1;
  int32_t hpred[2] = {0, 0};
  for (uint32_t row = 0; row < H; ++row) {
    for (uint32_t col = 0; col < W; ++col) {
      int i_val = huff_decode(bits, huff);
      if (i_val < 0) return RIO_E_FORMAT;
      int len = i_val & 15;
      int diff = (int)bits.get(len);
      if (len > 0 && (diff & (1 << (len - 1))) == 0) diff -= (1 << len) - 1;
      if (col < 2)
        hpred[col] = vpred[row & 1][col] += diff;
      else
        hpred[col & 1] += diff;
      int32_t v = hpred[col & 1];
      dst[(size_t)row * W + col] = (uint16_t)(v < 0 ? 0 : v > maxv ? maxv : v);
    }
  }
  return RIO_OK;
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
        if (const Entry* mk = find(exif, 0x927C)) {
          size_t moff = (size_t)mk->value_off;
          if (moff + 6 <= r.n && std::memcmp(r.d + moff, "Nikon\0", 6) == 0)
            parse_nikon_makernote(r, moff);
          else
            parse_sony_makernote(r, moff);
        }
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
    r.has_active = false;
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
    // DNG ActiveArea: crop the masked borders off the uncompressed
    // mosaic (reference semantics: rawpy's raw_image_visible,
    // sid_dataset.py:175).  CFAPattern needs NO re-phasing — the DNG
    // spec pins its origin to the TOP-LEFT OF THE ACTIVE AREA, not of
    // the stored image.  Vendor-compressed paths (ARW2/NEF/CR2) carry
    // their own maker-note border semantics, so the tag is honored for
    // uncompressed frames only.
    if (r.compression == 1) {
      if (const Entry* e = find(ifd, 0xC68D)) {
        double aa[4] = {0, 0, 0, 0};
        read_vec(r, *e, aa, 4);
        uint32_t top = (uint32_t)aa[0], left = (uint32_t)aa[1];
        uint32_t bot = (uint32_t)aa[2], rgt = (uint32_t)aa[3];
        if (bot > top && rgt > left && bot <= r.height && rgt <= r.width &&
            (top || left || bot < r.height || rgt < r.width)) {
          r.full_width = r.width;
          r.full_height = r.height;
          r.act_top = top;
          r.act_left = left;
          r.width = rgt - left;
          r.height = bot - top;
          r.has_active = true;
        }
      }
    }
  }
  // Canon CR2: the raw lives in an IFD with a lossless-JPEG strip and the
  // slice tag 0xC640, and carries NO width/height tags — dimensions come
  // from the SOF3 header.  This takes precedence over any preview frame
  // the generic selection above may have picked.
  for (auto& ifd : ifds) {
    const Entry* so = find(ifd, 0x0111);
    const Entry* sl = find(ifd, 0xC640);
    const Entry* ce = find(ifd, 0x0103);
    bool old_jpeg = ce && (uint32_t)read_val(r, *ce, 0) == 6;
    if (!so || !(sl || (old_jpeg && !find(ifd, 0x0100)))) continue;
    size_t off = (size_t)read_val(r, *so, 0);
    const Entry* sc = find(ifd, 0x0117);
    uint64_t nbytes = sc ? (uint64_t)read_val(r, *sc, 0) : r.n - off;
    if (off >= r.n || off + nbytes > r.n) continue;
    LjFrame f;
    if (lj_parse_header(r.d + off, nbytes, &f) != RIO_OK) continue;

    r.is_ljpeg = true;
    r.compression = 6;
    r.bits = f.precision;
    r.strip_offs.assign(1, off);
    r.strip_cnts.assign(1, nbytes);
    if (sl && sl->count >= 3)
      for (int i = 0; i < 3; ++i) r.cr2_slices[i] = (uint16_t)read_val(r, *sl, i);
    uint64_t total = (uint64_t)f.width * f.height * f.ncomp;
    r.full_width = r.cr2_slices[0]
                       ? (uint32_t)r.cr2_slices[0] * r.cr2_slices[1] + r.cr2_slices[2]
                       : (uint32_t)f.width * f.ncomp;
    r.full_height = r.full_width ? (uint32_t)(total / r.full_width) : 0;
    if ((uint64_t)r.full_width * r.full_height != total) return RIO_E_FORMAT;
    if (r.has_sensor_info && r.sens_right < r.full_width &&
        r.sens_bottom < r.full_height) {
      r.width = r.sens_right - r.sens_left + 1;
      r.height = r.sens_bottom - r.sens_top + 1;
    } else {
      r.sens_left = r.sens_top = 0;
      r.has_sensor_info = false;
      r.width = r.full_width;
      r.height = r.full_height;
    }
    if (r.white <= 0) r.white = (double)((1u << f.precision) - 1);
    // Canon mosaics are RGGB at the full-sensor origin; shift the visible
    // pattern by the crop parity
    {
      const uint8_t base[2][2] = {{0, 1}, {1, 2}};
      uint32_t t = r.sens_top & 1, l = r.sens_left & 1;
      r.cfa[0] = base[t][l];
      r.cfa[1] = base[t][l ^ 1];
      r.cfa[2] = base[t ^ 1][l];
      r.cfa[3] = base[t ^ 1][l ^ 1];
    }
    break;
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
  // Nikon NEF defaults where the maker-note black tag is absent: 400, the
  // commonly documented D850 level; warn so callers can surface it.
  if (r.compression == 34713) {
    if (!r.has_black) {
      for (int i = 0; i < 4; ++i) r.black[i] = 400.0;
      r.has_black = true;
      r.warnings |= RIO_W_DEFAULT_BLACK;
    }
    if (r.white <= 0 && r.bits && r.bits <= 16)
      r.white = (double)((1u << r.bits) - 1);
  }
  // Dimension sanity: corrupted width/height tags would otherwise drive
  // the decode loops for billions of iterations (a fuzz-found hang) or
  // huge allocations.  No real sensor exceeds 65535 px per side or
  // ~400 MP (largest shipping is ~150 MP); anything bigger is garbage.
  if (r.width == 0 || r.height == 0 || r.width > 65535 || r.height > 65535 ||
      (uint64_t)r.width * r.height > 400000000ull)
    return RIO_E_FORMAT;
  if ((uint64_t)r.full_width * r.full_height > 400000000ull)
    return RIO_E_FORMAT;
  // No raw format we decode exceeds 16 bits/sample; a corrupted
  // BitsPerSample tag would otherwise reach (1u << r.bits) below/at
  // decode with an oversized shift exponent (UB).
  if (r.bits > 16) return RIO_E_FORMAT;
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

// Canon CR2 read: lossless-JPEG decode -> un-slice -> per-channel black
// from the masked left border -> crop to the visible area.
int read_cr2(Raw& r, uint16_t* dst) {
  const uint8_t* d = r.d + r.strip_offs[0];
  size_t n = (size_t)r.strip_cnts[0];
  LjFrame f;
  int rc = lj_parse_header(d, n, &f);
  if (rc != RIO_OK) return rc;
  std::vector<uint16_t> flat;
  rc = lj_decode(d, n, f, &flat);
  if (rc != RIO_OK) return rc;

  const uint32_t FW = r.full_width, FH = r.full_height;
  std::vector<uint16_t> full((size_t)FW * FH);
  uint32_t ns = r.cr2_slices[0], w1 = r.cr2_slices[1], w2 = r.cr2_slices[2];
  if (!ns) { w1 = 0; w2 = FW; }  // unsliced: one band of the full width
  // the JPEG raster order IS slice-major order: each slice is a vertical
  // band written top to bottom (lclevy's CR2 format documentation)
  size_t t = 0;
  uint32_t x0 = 0;
  for (uint32_t s = 0; s <= ns; ++s) {
    uint32_t ws = s < ns ? w1 : w2;
    if (!ws) continue;
    if (x0 + ws > FW) return RIO_E_FORMAT;
    for (uint32_t row = 0; row < FH; ++row)
      for (uint32_t c = 0; c < ws; ++c) full[(size_t)row * FW + x0 + c] = flat[t++];
    x0 += ws;
  }

  // per-channel black from the masked left border (LibRaw semantics: the
  // optically black columns left of SensorLeftBorder), in VISIBLE-pattern
  // CFA-cell row-major order to match rio_black_level's contract
  if (r.has_sensor_info && r.sens_left >= 4) {
    double sum[2][2] = {{0, 0}, {0, 0}};
    uint64_t cnt[2][2] = {{0, 0}, {0, 0}};
    for (uint32_t row = r.sens_top; row <= r.sens_bottom; ++row)
      for (uint32_t col = 0; col + 2 < r.sens_left; ++col) {  // skip 2 junk cols
        int a = (row - r.sens_top) & 1;
        int b = (col & 1) ^ (r.sens_left & 1);  // cell col in VISIBLE phase
        sum[a][b] += full[(size_t)row * FW + col];
        cnt[a][b]++;
      }
    for (int a = 0; a < 2; ++a)
      for (int b = 0; b < 2; ++b)
        if (cnt[a][b]) r.black[a * 2 + b] = sum[a][b] / cnt[a][b];
    r.has_black = true;
  }

  for (uint32_t row = 0; row < r.height; ++row)
    std::memcpy(dst + (size_t)row * r.width,
                full.data() + ((size_t)(row + r.sens_top) * FW + r.sens_left),
                (size_t)r.width * 2);
  return RIO_OK;
}

// Decode the mosaic into dst (height*width uint16, row major).
int rio_read_raw(void* h, uint16_t* dst) {
  auto* r = static_cast<Raw*>(h);
  if (r->is_ljpeg) return read_cr2(*r, dst);
  if (r->compression == 34713) return decode_nef(*r, dst);  // Nikon NEF
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
  // with an ActiveArea crop, decode the full stored mosaic into a
  // scratch buffer first, then copy out the visible window
  const uint32_t W = r->has_active ? r->full_width : r->width;
  const uint32_t H = r->has_active ? r->full_height : r->height;
  std::vector<uint16_t> scratch;
  uint16_t* out = dst;
  if (r->has_active) {
    scratch.resize((size_t)W * H);
    out = scratch.data();
  }
  uint64_t total = (uint64_t)W * H;
  uint64_t out_i = 0;
  for (size_t s = 0; s < r->strip_offs.size() && out_i < total; ++s) {
    uint64_t off = r->strip_offs[s];
    uint64_t nbytes = s < r->strip_cnts.size()
                          ? r->strip_cnts[s]
                          : ((uint64_t)r->rows_per_strip * W * r->bits + 7) / 8;
    if (off + nbytes > r->n) return RIO_E_FORMAT;
    const uint8_t* p = r->d + off;
    if (r->bits == 16) {
      uint64_t cnt = nbytes / 2;
      for (uint64_t i = 0; i < cnt && out_i < total; ++i, ++out_i)
        out[out_i] = r->le ? (p[2 * i] | p[2 * i + 1] << 8)
                           : (p[2 * i] << 8 | p[2 * i + 1]);
    } else if (r->bits == 8) {
      for (uint64_t i = 0; i < nbytes && out_i < total; ++i, ++out_i)
        out[out_i] = p[i];
    } else {
      // 12/14-bit big-endian-packed bitstream (DNG packed layout)
      uint32_t acc = 0;
      int nbits = 0;
      for (uint64_t i = 0; i < nbytes && out_i < total; ++i) {
        acc = (acc << 8) | p[i];
        nbits += 8;
        while (nbits >= (int)r->bits && out_i < total) {
          nbits -= r->bits;
          out[out_i++] = (acc >> nbits) & ((1u << r->bits) - 1);
        }
      }
    }
  }
  if (out_i != total) return RIO_E_FORMAT;
  if (r->has_active)
    for (uint32_t row = 0; row < r->height; ++row)
      std::memcpy(dst + (size_t)row * r->width,
                  scratch.data() + ((size_t)(row + r->act_top) * W + r->act_left),
                  (size_t)r->width * 2);
  return RIO_OK;
}

void rio_close(void* h) {
  auto* r = static_cast<Raw*>(h);
  if (r->d) munmap(const_cast<uint8_t*>(r->d), r->n);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
