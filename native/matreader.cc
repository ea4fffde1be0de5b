// Native MAT 5 reader: the framework's C++ data-loader core.
//
// The ingest hot loop reads 19,208 small Level-5 MAT-files (zlib-compressed
// miMATRIX elements; see the header dump in SURVEY.md §2.8).  scipy.io's
// generic loader pays Python object construction per variable; this reader
// parses only what the pipeline needs -- numeric real arrays -- straight into
// flat double buffers behind a C ABI consumed via ctypes
// (mmego_tpu/data/native.py).
//
// Format notes (MAT 5):
//   * 128-byte text header, then a sequence of tagged elements
//     [u32 type][u32 bytes][data, padded to 8].
//   * type 15 (miCOMPRESSED) wraps one zlib stream containing one element.
//   * type 14 (miMATRIX) contains sub-elements: array flags (u32 x2),
//     dimensions (i32 array), name (i8 array), then the real-part data.
//   * "small element" packing: when the tag word's upper 16 bits are
//     non-zero the tag is [u16 type][u16 bytes] with <=4 data bytes inline.
//   * numeric data may be stored in a narrower type than the array class
//     (e.g. a double array stored as miUINT8) -- everything is widened to
//     double here, in MATLAB's column-major order.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

enum MiType : uint32_t {
  miINT8 = 1, miUINT8 = 2, miINT16 = 3, miUINT16 = 4,
  miINT32 = 5, miUINT32 = 6, miSINGLE = 7, miDOUBLE = 9,
  miINT64 = 12, miUINT64 = 13, miMATRIX = 14, miCOMPRESSED = 15,
  miUTF8 = 16,
};

struct Var {
  std::string name;
  std::vector<int64_t> dims;
  std::vector<double> data;  // column-major (MATLAB order)
};

struct MatFile {
  std::vector<Var> vars;
};

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t off = 0;

  bool read_tag(uint32_t* type, uint32_t* bytes, const uint8_t** data,
                size_t* advance) {
    if (off + 8 > n) return false;
    uint32_t word0, word1;
    memcpy(&word0, p + off, 4);
    memcpy(&word1, p + off + 4, 4);
    if (word0 >> 16) {  // small element format: payload inline, <= 4 bytes
      *type = word0 & 0xffff;
      *bytes = word0 >> 16;
      // The inline payload lives in the 4 bytes already bounds-checked
      // above; a "small" tag claiming more than 4 bytes is malformed and
      // would otherwise send widen()/name.assign() up to 64 KB out of
      // bounds.
      if (*bytes > 4) return false;
      *data = p + off + 4;
      *advance = 8;
      return true;
    }
    *type = word0;
    *bytes = word1;
    *data = p + off + 8;
    size_t padded = (*bytes + 7) & ~size_t(7);
    if (off + 8 + *bytes > n) return false;
    *advance = 8 + padded;
    return true;
  }
};

size_t type_size(uint32_t t) {
  switch (t) {
    case miINT8: case miUINT8: case miUTF8: return 1;
    case miINT16: case miUINT16: return 2;
    case miINT32: case miUINT32: case miSINGLE: return 4;
    case miDOUBLE: case miINT64: case miUINT64: return 8;
    default: return 0;
  }
}

void widen(uint32_t t, const uint8_t* src, size_t count, double* dst) {
  switch (t) {
    case miINT8:   for (size_t i = 0; i < count; i++) dst[i] = ((const int8_t*)src)[i]; break;
    case miUINT8:  for (size_t i = 0; i < count; i++) dst[i] = src[i]; break;
    case miINT16:  for (size_t i = 0; i < count; i++) dst[i] = ((const int16_t*)src)[i]; break;
    case miUINT16: for (size_t i = 0; i < count; i++) dst[i] = ((const uint16_t*)src)[i]; break;
    case miINT32:  for (size_t i = 0; i < count; i++) dst[i] = ((const int32_t*)src)[i]; break;
    case miUINT32: for (size_t i = 0; i < count; i++) dst[i] = ((const uint32_t*)src)[i]; break;
    case miSINGLE: for (size_t i = 0; i < count; i++) dst[i] = ((const float*)src)[i]; break;
    case miDOUBLE: memcpy(dst, src, count * 8); break;
    case miINT64:  for (size_t i = 0; i < count; i++) dst[i] = (double)((const int64_t*)src)[i]; break;
    case miUINT64: for (size_t i = 0; i < count; i++) dst[i] = (double)((const uint64_t*)src)[i]; break;
    default: break;
  }
}

// Parse one miMATRIX payload into a Var.  Returns false for non-numeric or
// malformed arrays (structs/cells/sparse/complex are skipped, not errors).
bool parse_matrix(const uint8_t* p, size_t n, Var* out) {
  Cursor c{p, n};
  uint32_t type, bytes;
  const uint8_t* data;
  size_t adv;

  // array flags
  if (!c.read_tag(&type, &bytes, &data, &adv) || type != miUINT32 || bytes < 8)
    return false;
  uint32_t flags;
  memcpy(&flags, data, 4);
  uint32_t cls = flags & 0xff;
  bool complex_flag = flags & 0x0800;
  c.off += adv;
  if (cls < 6 || cls > 15 || complex_flag) return false;  // numeric real only

  // dimensions
  if (!c.read_tag(&type, &bytes, &data, &adv) || type != miINT32) return false;
  size_t ndim = bytes / 4;
  out->dims.resize(ndim);
  size_t count = ndim ? 1 : 0;
  for (size_t i = 0; i < ndim; i++) {
    int32_t d;
    memcpy(&d, data + 4 * i, 4);
    out->dims[i] = d;
    count *= (size_t)d;
  }
  c.off += adv;

  // name
  if (!c.read_tag(&type, &bytes, &data, &adv)) return false;
  out->name.assign((const char*)data, bytes);
  c.off += adv;

  // real data
  if (!c.read_tag(&type, &bytes, &data, &adv)) return false;
  size_t esz = type_size(type);
  if (esz == 0 || bytes / esz < count) return false;
  out->data.resize(count);
  widen(type, data, count, out->data.data());
  return true;
}

bool inflate_buf(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  out->resize(n * 8 + 1024);
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)n;
  int ret = Z_OK;
  size_t written = 0;
  // Loop until stream end, NOT until input is consumed: zlib can hold
  // pending output after avail_in hits 0 (variables compressing > 8x fill
  // the initial buffer exactly), and exiting early would reject them.
  while (ret != Z_STREAM_END) {
    if (written == out->size()) out->resize(out->size() * 2);
    zs.next_out = out->data() + written;
    zs.avail_out = (uInt)(out->size() - written);
    ret = inflate(&zs, Z_NO_FLUSH);
    written = out->size() - zs.avail_out;
    if (ret != Z_OK && ret != Z_STREAM_END) { inflateEnd(&zs); return false; }
    if (ret == Z_OK && zs.avail_out != 0 && zs.avail_in == 0) {
      // Output space remained, input exhausted, stream not ended:
      // truncated deflate stream.
      inflateEnd(&zs);
      return false;
    }
  }
  out->resize(written);
  inflateEnd(&zs);
  return ret == Z_STREAM_END;
}

}  // namespace

extern "C" {

void* mat_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 128) { fclose(f); return nullptr; }
  std::vector<uint8_t> buf((size_t)sz);
  if (fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) { fclose(f); return nullptr; }
  fclose(f);

  // header: bytes 124-125 version, 126-127 endian indicator "IM"
  if (!(buf[126] == 'I' && buf[127] == 'M')) return nullptr;  // big-endian unsupported

  auto* mf = new MatFile();
  Cursor c{buf.data(), buf.size(), 128};
  uint32_t type, bytes;
  const uint8_t* data;
  size_t adv;
  while (c.off < c.n && c.read_tag(&type, &bytes, &data, &adv)) {
    if (type == miCOMPRESSED) {
      // compressed elements are written unpadded by MATLAB
      adv = 8 + bytes;
      std::vector<uint8_t> inflated;
      if (c.off + 8 + bytes <= c.n && inflate_buf(data, bytes, &inflated)) {
        Cursor ic{inflated.data(), inflated.size()};
        uint32_t it, ib;
        const uint8_t* idata;
        size_t iadv;
        if (ic.read_tag(&it, &ib, &idata, &iadv) && it == miMATRIX) {
          Var v;
          if (parse_matrix(idata, ib, &v)) mf->vars.push_back(std::move(v));
        }
      }
    } else if (type == miMATRIX) {
      Var v;
      if (parse_matrix(data, bytes, &v)) mf->vars.push_back(std::move(v));
    }
    c.off += adv;
  }
  if (mf->vars.empty()) { delete mf; return nullptr; }
  return mf;
}

int mat_num_vars(void* h) { return (int)((MatFile*)h)->vars.size(); }

const char* mat_var_name(void* h, int i) {
  return ((MatFile*)h)->vars[(size_t)i].name.c_str();
}

int mat_var_ndim(void* h, int i) {
  return (int)((MatFile*)h)->vars[(size_t)i].dims.size();
}

const int64_t* mat_var_dims(void* h, int i) {
  return ((MatFile*)h)->vars[(size_t)i].dims.data();
}

const double* mat_var_data(void* h, int i) {
  return ((MatFile*)h)->vars[(size_t)i].data.data();
}

void mat_close(void* h) { delete (MatFile*)h; }

}  // extern "C"
