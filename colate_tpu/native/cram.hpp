// From-scratch CRAM 3.0 + 2.x decoder (read path) for the BAM pileup
// engine.
//
// The reference reaches CRAM transparently through htslib's sam_open
// (include/vcf/htslib.cpp:171-230); this is an independent
// implementation of the CRAM specification's read path for the
// profile real encoders emit: EXTERNAL / constant-HUFFMAN /
// BYTE_ARRAY_STOP / BYTE_ARRAY_LEN record codecs over raw, gzip and
// rANS-4x8 (order 0/1) compressed blocks.  CRAM 2.x (2.0/2.1)
// containers differ only in the record counters (itf8, ltf8 since 3.0)
// and the absence of block/container CRC32 trailers; both profiles are
// parsed (tests/test_cram.py: 2.1 pileup byte-identical to BAM).
// Bit-packed core codecs (BETA, full HUFFMAN trees, SUBEXP, GAMMA) are
// not emitted by the encoders we target; hitting one raises a clear
// error instead of decoding garbage.
//
// Containers stream one at a time (bounded memory); each record is
// reconstructed into the BAM record wire layout (same byte offsets) so
// the BAM pileup code — including the reference's garbled-qual quirk,
// which reads the packed SEQ nibbles as qualities — works unchanged on
// CRAM input.  Sequence reconstruction (reference bases + substitution
// matrix + insertions/soft-clips) is deferred until the caller
// provides the contig's reference (`set_ref`), because the pileup
// learns each contig's reference only at query time.
//
// Nothing here is derived from htslib's source; the formats follow the
// public CRAM 3.0 specification.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>
#include <algorithm>

namespace cramdec {

struct ByteCursor {
  const uint8_t* p = nullptr;
  size_t n = 0, off = 0;
  bool ok = true;
  uint8_t u8() {
    if (off >= n) {
      ok = false;
      return 0;
    }
    return p[off++];
  }
  bool read(void* dst, size_t k) {
    if (off + k > n) {
      ok = false;
      return false;
    }
    std::memcpy(dst, p + off, k);
    off += k;
    return true;
  }
  int32_t itf8() {
    uint32_t b0 = u8();
    if (b0 < 0x80) return (int32_t)b0;
    if (b0 < 0xC0) return (int32_t)(((b0 & 0x3F) << 8) | u8());
    if (b0 < 0xE0) {
      uint32_t v = (b0 & 0x1F) << 16;
      v |= (uint32_t)u8() << 8;
      v |= u8();
      return (int32_t)v;
    }
    if (b0 < 0xF0) {
      uint32_t v = (b0 & 0x0F) << 24;
      v |= (uint32_t)u8() << 16;
      v |= (uint32_t)u8() << 8;
      v |= u8();
      return (int32_t)v;
    }
    uint32_t v = (b0 & 0x0F) << 28;
    v |= (uint32_t)u8() << 20;
    v |= (uint32_t)u8() << 12;
    v |= (uint32_t)u8() << 4;
    v |= u8() & 0x0F;
    return (int32_t)v;
  }
  int64_t ltf8() {
    uint8_t b0 = u8();
    int nb = 0;
    while (nb < 8 && ((b0 << nb) & 0x80)) nb++;
    uint64_t v = nb < 8 ? (uint64_t)(b0 & (0xFF >> nb)) : 0;
    for (int i = 0; i < nb; i++) v = (v << 8) | u8();
    return (int64_t)v;
  }
};

// ----------------------------------------------------------------- rANS ----
// rANS 4x8 static decoder (CRAM 3.0 spec): 12-bit frequencies, four
// interleaved states, byte-wise renormalisation below 2^23.

static constexpr uint32_t RANS_LOW = 1u << 23;
static constexpr int TF_SHIFT = 12;
static constexpr uint32_t TOTFREQ = 1u << TF_SHIFT;

struct RansTable {
  uint16_t freq[256] = {0};
  uint16_t cum[256] = {0};
  uint8_t lookup[TOTFREQ];  // slot -> symbol
};

// shared RLE'd (symbol, freq) table reader; returns false on corruption
static bool read_freqs(ByteCursor& c, RansTable& t) {
  uint32_t total = 0;
  int rle = 0;
  int j = c.u8();
  do {
    uint32_t f = c.u8();
    if (f >= 128) f = ((f & 127) << 8) | c.u8();
    if (!c.ok || j < 0 || j > 255) return false;
    t.freq[j] = (uint16_t)f;
    t.cum[j] = (uint16_t)total;
    if (total + f > TOTFREQ) return false;
    for (uint32_t k = 0; k < f; k++) t.lookup[total + k] = (uint8_t)j;
    total += f;
    if (rle) {
      rle--;
      j++;
    } else {
      int nxt = (c.off < c.n) ? c.p[c.off] : -1;
      if (nxt == j + 1) {
        j = c.u8();
        rle = c.u8();
      } else {
        j = c.u8();
      }
    }
  } while (j != 0 && c.ok);
  // slots above `total` never referenced (states stay within cum range)
  for (uint32_t k = total; k < TOTFREQ; k++) t.lookup[k] = 0;
  return c.ok;
}

static bool rans_decode(const uint8_t* in, size_t in_sz, std::vector<uint8_t>& out) {
  ByteCursor c{in, in_sz, 0, true};
  int order = c.u8();
  uint32_t comp_sz = 0, raw_sz = 0;
  c.read(&comp_sz, 4);
  c.read(&raw_sz, 4);
  if (!c.ok) return false;
  out.resize(raw_sz);
  if (raw_sz == 0) return true;

  if (order == 0) {
    RansTable t;
    if (!read_freqs(c, t)) return false;
    uint32_t x[4];
    for (int j = 0; j < 4; j++)
      if (!c.read(&x[j], 4)) return false;
    for (size_t i = 0; i < raw_sz; i++) {
      uint32_t& st = x[i & 3];
      uint32_t m = st & (TOTFREQ - 1);
      uint8_t s = t.lookup[m];
      out[i] = s;
      st = t.freq[s] * (st >> TF_SHIFT) + m - t.cum[s];
      while (st < RANS_LOW && c.off < c.n) st = (st << 8) | c.u8();
    }
    return true;
  }
  if (order == 1) {
    std::vector<RansTable> tabs(256);
    std::vector<uint8_t> have(256, 0);
    int rle_i = 0;
    int i = c.u8();
    do {
      if (i < 0 || i > 255) return false;
      if (!read_freqs(c, tabs[i])) return false;
      have[i] = 1;
      if (rle_i) {
        rle_i--;
        i++;
      } else {
        int nxt = (c.off < c.n) ? c.p[c.off] : -1;
        if (nxt == i + 1) {
          i = c.u8();
          rle_i = c.u8();
        } else {
          i = c.u8();
        }
      }
    } while (i != 0 && c.ok);
    if (!c.ok) return false;
    uint32_t x[4];
    for (int j = 0; j < 4; j++)
      if (!c.read(&x[j], 4)) return false;
    size_t q = raw_sz >> 2;
    size_t i4[4] = {0, q, 2 * q, 3 * q};
    uint8_t last[4] = {0, 0, 0, 0};
    // interleaved quarters; the remainder rides on state 3
    while (i4[0] < q) {
      for (int j = 0; j < 4; j++) {
        RansTable& t = tabs[last[j]];
        uint32_t& st = x[j];
        uint32_t m = st & (TOTFREQ - 1);
        uint8_t s = t.lookup[m];
        out[i4[j]] = s;
        st = t.freq[s] * (st >> TF_SHIFT) + m - t.cum[s];
        while (st < RANS_LOW && c.off < c.n) st = (st << 8) | c.u8();
        last[j] = s;
        i4[j]++;
      }
    }
    while (i4[3] < raw_sz) {
      RansTable& t = tabs[last[3]];
      uint32_t& st = x[3];
      uint32_t m = st & (TOTFREQ - 1);
      uint8_t s = t.lookup[m];
      out[i4[3]] = s;
      st = t.freq[s] * (st >> TF_SHIFT) + m - t.cum[s];
      while (st < RANS_LOW && c.off < c.n) st = (st << 8) | c.u8();
      last[3] = s;
      i4[3]++;
    }
    return true;
  }
  return false;  // unknown order
}

// -------------------------------------------------------------- blocks ----

static bool inflate_zlib(const uint8_t* in, size_t in_sz, std::vector<uint8_t>& out,
                         size_t raw_sz) {
  out.resize(raw_sz);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // zlib or gzip
  zs.next_in = const_cast<uint8_t*>(in);
  zs.avail_in = (uInt)in_sz;
  zs.next_out = out.data();
  zs.avail_out = (uInt)raw_sz;
  int r = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return r == Z_STREAM_END || (r == Z_OK && zs.avail_out == 0);
}

struct Block {
  int method = 0, ctype = 0;
  int32_t cid = 0;
  std::vector<uint8_t> data;  // uncompressed
};

static bool read_block(ByteCursor& c, Block& b, std::string& err,
                       int vmajor = 3) {
  b.method = c.u8();
  b.ctype = c.u8();
  b.cid = c.itf8();
  int32_t csize = c.itf8();
  int32_t rsize = c.itf8();
  if (!c.ok || csize < 0 || rsize < 0 || c.off + (size_t)csize > c.n) {
    err = "truncated CRAM block";
    return false;
  }
  const uint8_t* payload = c.p + c.off;
  c.off += (size_t)csize;
  if (vmajor >= 3) c.off += 4;  // crc32 (unchecked; absent before 3.0)
  switch (b.method) {
    case 0:
      b.data.assign(payload, payload + csize);
      break;
    case 1:
      if (!inflate_zlib(payload, (size_t)csize, b.data, (size_t)rsize)) {
        err = "CRAM gzip block inflate failed";
        return false;
      }
      break;
    case 4:
      if (!rans_decode(payload, (size_t)csize, b.data)) {
        err = "CRAM rANS block decode failed";
        return false;
      }
      break;
    default:
      err = "unsupported CRAM block compression method " +
            std::to_string(b.method) + " (bzip2/lzma not supported)";
      return false;
  }
  if ((int64_t)b.data.size() != rsize) {
    err = "CRAM block size mismatch";
    return false;
  }
  return true;
}

// ------------------------------------------------------------ encodings ----

struct Encoding {
  int codec = 0;       // 1 EXTERNAL, 3 HUFFMAN, 4 BYTE_ARRAY_LEN, 5 BYTE_ARRAY_STOP
  int32_t cid = -1;    // EXTERNAL / BYTE_ARRAY_STOP value stream
  int64_t const_val = 0;  // single-symbol HUFFMAN
  uint8_t stop = 0;    // BYTE_ARRAY_STOP terminator
  // BYTE_ARRAY_LEN sub-encodings
  int len_codec = 0;
  int32_t len_cid = -1;
  int64_t len_const = 0;
  int32_t val_cid = -1;
  bool present = false;
};

static bool parse_encoding(ByteCursor& c, Encoding& e, std::string& err) {
  e.codec = c.itf8();
  int32_t psz = c.itf8();
  if (!c.ok || psz < 0 || c.off + (size_t)psz > c.n) {
    err = "bad CRAM encoding params";
    return false;
  }
  ByteCursor pc{c.p + c.off, (size_t)psz, 0, true};
  c.off += (size_t)psz;
  e.present = true;
  switch (e.codec) {
    case 0:  // NULL: series never read
      e.present = false;
      return true;
    case 1:  // EXTERNAL
      e.cid = pc.itf8();
      return pc.ok;
    case 3: {  // HUFFMAN — only the canonical single-symbol (0-bit) form
      int32_t nsym = pc.itf8();
      if (nsym != 1) {
        err = "CRAM HUFFMAN with >1 symbol not supported (core bit codecs)";
        return false;
      }
      e.const_val = pc.itf8();
      int32_t nlen = pc.itf8();
      if (nlen != 1 || pc.itf8() != 0) {
        err = "CRAM HUFFMAN with nonzero code length not supported";
        return false;
      }
      return pc.ok;
    }
    case 4: {  // BYTE_ARRAY_LEN: len encoding + val encoding
      Encoding len, val;
      if (!parse_encoding(pc, len, err)) return false;
      if (!parse_encoding(pc, val, err)) return false;
      e.len_codec = len.codec;
      e.len_cid = len.cid;
      e.len_const = len.const_val;
      if (val.codec != 1) {
        err = "CRAM BYTE_ARRAY_LEN value encoding must be EXTERNAL";
        return false;
      }
      e.val_cid = val.cid;
      return true;
    }
    case 5:  // BYTE_ARRAY_STOP: stop byte + external cid
      e.stop = pc.u8();
      e.cid = pc.itf8();
      return pc.ok;
    default:
      err = "unsupported CRAM codec " + std::to_string(e.codec) +
            " (core bit stream)";
      return false;
  }
}

struct CompHeader {
  bool rn = true, ap_delta = true, rr = true;
  uint8_t sm[5] = {0x1B, 0x1B, 0x1B, 0x1B, 0x1B};
  std::vector<std::vector<std::string>> tag_lines;  // TD: tag ids per line
  Encoding series[26 * 26];  // by 2-letter key
  struct TagEnc {
    int32_t key;
    Encoding enc;
  };
  std::vector<TagEnc> tags;
  Encoding& S(const char* k) { return series[(k[0] - 'A') * 26 + (k[1] - 'A')]; }
};

static bool parse_comp_header(const Block& b, CompHeader& h, std::string& err) {
  ByteCursor c{b.data.data(), b.data.size(), 0, true};
  // preservation map
  c.itf8();  // byte size
  int32_t n = c.itf8();
  for (int32_t i = 0; i < n && c.ok; i++) {
    char k0 = (char)c.u8(), k1 = (char)c.u8();
    if (k0 == 'R' && k1 == 'N') h.rn = c.u8() != 0;
    else if (k0 == 'A' && k1 == 'P') h.ap_delta = c.u8() != 0;
    else if (k0 == 'R' && k1 == 'R') h.rr = c.u8() != 0;
    else if (k0 == 'S' && k1 == 'M') c.read(h.sm, 5);
    else if (k0 == 'T' && k1 == 'D') {
      int32_t ln = c.itf8();
      if (!c.ok || c.off + (size_t)ln > c.n) {
        err = "bad TD";
        return false;
      }
      const uint8_t* td = c.p + c.off;
      c.off += (size_t)ln;
      // \0-separated lines of 3-byte tag descriptors
      std::vector<std::string> cur;
      for (int32_t j = 0; j < ln; j++) {
        if (td[j] == 0) {
          h.tag_lines.push_back(cur);
          cur.clear();
        } else if (j + 2 < ln) {
          cur.emplace_back((const char*)td + j, 3);
          j += 2;
        }
      }
    } else {
      err = std::string("unknown CRAM preservation key ") + k0 + k1;
      return false;
    }
  }
  // data series encodings
  c.itf8();
  n = c.itf8();
  for (int32_t i = 0; i < n && c.ok; i++) {
    char k0 = (char)c.u8(), k1 = (char)c.u8();
    if (k0 < 'A' || k0 > 'Z' || k1 < 'A' || k1 > 'Z') {
      err = "bad CRAM series key";
      return false;
    }
    char key[3] = {k0, k1, 0};
    if (!parse_encoding(c, h.S(key), err)) return false;
  }
  // tag encodings
  c.itf8();
  n = c.itf8();
  for (int32_t i = 0; i < n && c.ok; i++) {
    CompHeader::TagEnc te;
    te.key = c.itf8();
    if (!parse_encoding(c, te.enc, err)) return false;
    h.tags.push_back(te);
  }
  if (!c.ok) err = "truncated CRAM compression header";
  return c.ok;
}

// -------------------------------------------------------------- slices ----

struct Slice {
  int32_t refid = 0, start = 0, span = 0, nrec = 0;
  std::vector<Block> ext;              // external blocks
  std::vector<ByteCursor> cur;         // cursor per external block
  ByteCursor* by_id[64] = {nullptr};
  ByteCursor* find(int32_t cid) {
    if (cid >= 0 && cid < 64) return by_id[cid];
    for (size_t i = 0; i < ext.size(); i++)
      if (ext[i].cid == cid) return &cur[i];
    return nullptr;
  }
};

// ------------------------------------------------------------- decoder ----

struct Record {
  int32_t refid = -1;
  int64_t pos = 0;  // 0-based
  int flag = 0, mapq = 0;
  int32_t l_seq = 0;
  std::string name;
  // deferred sequence reconstruction
  struct Feat {
    int32_t rpos;  // 1-based read position
    char code;
    int32_t val;          // BS code / DL len / BA base / pad...
    std::string bytes;    // IN / SC / BB payloads
  };
  std::vector<Feat> feats;
  std::vector<uint8_t> quals;
  bool unmapped = false;
};

struct Reader {
  FILE* f = nullptr;
  std::string err;
  std::vector<std::string> refs;     // refid -> name (from SAM header @SQ)
  std::vector<uint8_t> cbuf;         // current container payload
  CompHeader ch;
  Slice slice;
  int32_t srec = 0;                  // records consumed in current slice
  int64_t prev_pos1 = 0;             // 1-based AP delta state
  std::vector<std::pair<size_t, size_t>> slice_spans;  // offsets in cbuf
  size_t slice_idx = 0;
  bool eof_ = false;
  int vmaj = 3;  // CRAM major version (2.x / 3.0 read profiles)

  ~Reader() {
    if (f) fclose(f);
  }

  bool open(const char* path) {
    f = fopen(path, "rb");
    if (!f) {
      err = "cannot open CRAM file";
      return false;
    }
    uint8_t def[26];
    if (fread(def, 1, 26, f) != 26 || std::memcmp(def, "CRAM", 4) != 0) {
      err = "not a CRAM file";
      return false;
    }
    // 3.0 and 2.x (2.0/2.1) read profiles; 2.x differs only in the
    // container/slice record counters (itf8 vs ltf8) and the absence of
    // block/container CRC32 trailers (spec history; format studied from
    // the public CRAM specification)
    if (def[4] != 3 && def[4] != 2) {
      err = "unsupported CRAM major version " + std::to_string(def[4]);
      return false;
    }
    vmaj = def[4];
    // first container: SAM header text
    std::vector<uint8_t> body;
    int32_t refid;
    if (!read_container(body, refid)) return false;
    ByteCursor c{body.data(), body.size(), 0, true};
    Block hb;
    if (!read_block(c, hb, err, vmaj)) return false;
    // SAM header block: i32 text length + text
    if (hb.data.size() < 4) {
      err = "bad CRAM SAM header";
      return false;
    }
    int32_t tlen;
    std::memcpy(&tlen, hb.data.data(), 4);
    std::string text((const char*)hb.data.data() + 4,
                     std::min((size_t)tlen, hb.data.size() - 4));
    size_t p = 0;
    while (p < text.size()) {
      size_t e = text.find('\n', p);
      if (e == std::string::npos) e = text.size();
      if (text.compare(p, 4, "@SQ\t") == 0) {
        size_t sn = text.find("SN:", p);
        if (sn != std::string::npos && sn < e) {
          size_t se = text.find_first_of("\t\n", sn);
          if (se == std::string::npos || se > e) se = e;
          refs.emplace_back(text.substr(sn + 3, se - sn - 3));
        }
      }
      p = e + 1;
    }
    return true;
  }

  // read one container: header + body bytes; false at EOF
  bool read_container(std::vector<uint8_t>& body, int32_t& refid) {
    uint8_t hdr[128];
    size_t got = fread(hdr, 1, 4, f);
    if (got < 4) {
      eof_ = true;
      return false;
    }
    int32_t length;
    std::memcpy(&length, hdr, 4);
    if (length < 0) {
      err = "bad CRAM container length";
      return false;
    }
    // rest of the header is varint-coded; read generously then seek
    size_t more = fread(hdr + 4, 1, sizeof(hdr) - 4, f);
    ByteCursor c{hdr, 4 + more, 4, true};
    refid = c.itf8();
    c.itf8();  // start
    c.itf8();  // span
    c.itf8();  // n records
    if (vmaj >= 3)
      c.ltf8();  // counter (ltf8 since 3.0)
    else
      c.itf8();  // counter (itf8 in 2.x)
    c.ltf8();  // bases
    c.itf8();  // n blocks
    int32_t nl = c.itf8();
    for (int32_t i = 0; i < nl; i++) c.itf8();
    if (vmaj >= 3) c.off += 4;  // crc (absent before 3.0)
    if (!c.ok) {
      err = "truncated CRAM container header";
      return false;
    }
    long hdr_len = (long)c.off;
    if (fseek(f, hdr_len - (long)(4 + more), SEEK_CUR) != 0) {
      err = "CRAM seek failed";
      return false;
    }
    body.resize((size_t)length);
    if (length && fread(body.data(), 1, (size_t)length, f) != (size_t)length) {
      err = "truncated CRAM container body";
      return false;
    }
    return true;
  }

  // advance to the next slice with records; false at EOF
  bool next_slice() {
    for (;;) {
      if (slice_idx < slice_spans.size()) {
        auto [lo, hi] = slice_spans[slice_idx++];
        if (!load_slice(cbuf.data() + lo, hi - lo)) return false;
        if (slice.nrec > 0) return true;
        continue;
      }
      // next data container
      int32_t refid;
      if (!read_container(cbuf, refid)) return false;  // eof_ or err
      ByteCursor c{cbuf.data(), cbuf.size(), 0, true};
      Block first;
      if (!read_block(c, first, err, vmaj)) return false;
      if (first.ctype != 1) {
        if (cbuf.empty() || first.ctype == 0) continue;  // e.g. EOF marker
        err = "expected CRAM compression header block";
        return false;
      }
      ch = CompHeader();
      if (!parse_comp_header(first, ch, err)) return false;
      // remaining blocks: slice header + its data blocks, repeated
      slice_spans.clear();
      slice_idx = 0;
      while (c.off < c.n) {
        size_t lo = c.off;
        // peek: slice header block begins each slice
        Block sb;
        size_t save = c.off;
        if (!read_block(c, sb, err, vmaj)) return false;
        if (sb.ctype != 2) {
          err = "expected CRAM slice header block";
          return false;
        }
        ByteCursor sc{sb.data.data(), sb.data.size(), 0, true};
        sc.itf8();  // refid
        sc.itf8();  // start
        sc.itf8();  // span
        sc.itf8();  // nrec
        if (vmaj >= 3)
          sc.ltf8();  // counter (ltf8 since 3.0)
        else
          sc.itf8();  // counter (itf8 in 2.x)
        int32_t nb = sc.itf8();
        // skip this slice's data blocks
        for (int32_t i = 0; i < nb; i++) {
          Block db;
          if (!read_block(c, db, err, vmaj)) return false;
        }
        slice_spans.emplace_back(lo, c.off);
        (void)save;
      }
      if (slice_spans.empty() && cbuf.empty()) {
        eof_ = true;
        return false;
      }
    }
  }

  bool load_slice(const uint8_t* p, size_t n) {
    slice = Slice();
    ByteCursor c{p, n, 0, true};
    Block sb;
    if (!read_block(c, sb, err, vmaj)) return false;
    ByteCursor sc{sb.data.data(), sb.data.size(), 0, true};
    slice.refid = sc.itf8();
    slice.start = sc.itf8();
    slice.span = sc.itf8();
    slice.nrec = sc.itf8();
    if (vmaj >= 3)
      sc.ltf8();  // counter (ltf8 since 3.0)
    else
      sc.itf8();  // counter (itf8 in 2.x)
    int32_t nb = sc.itf8();
    int32_t nids = sc.itf8();
    for (int32_t i = 0; i < nids; i++) sc.itf8();
    sc.itf8();  // embedded ref content id (-1: none)
    // md5 (16 bytes) ignored
    slice.ext.reserve((size_t)nb);
    for (int32_t i = 0; i < nb; i++) {
      Block db;
      if (!read_block(c, db, err, vmaj)) return false;
      if (db.ctype == 4) slice.ext.push_back(std::move(db));
      // core block (ctype 5) must be empty for the supported profile
      else if (db.ctype == 5 && !db.data.empty()) {
        err = "CRAM core bit stream in use — unsupported codec profile";
        return false;
      }
    }
    slice.cur.resize(slice.ext.size());
    for (size_t i = 0; i < slice.ext.size(); i++) {
      slice.cur[i] =
          ByteCursor{slice.ext[i].data.data(), slice.ext[i].data.size(), 0, true};
      int32_t cid = slice.ext[i].cid;
      if (cid >= 0 && cid < 64) slice.by_id[cid] = &slice.cur[i];
    }
    srec = 0;
    prev_pos1 = slice.start;
    return true;
  }

  // ---- series readers ----
  bool ext_int(const Encoding& e, int64_t& v) {
    if (!e.present) {
      err = "CRAM series missing";
      return false;
    }
    if (e.codec == 3) {
      v = e.const_val;
      return true;
    }
    ByteCursor* c = slice.find(e.cid);
    if (!c || !c->ok) {
      err = "CRAM external block missing";
      return false;
    }
    v = c->itf8();
    return c->ok;
  }
  bool ext_byte(const Encoding& e, uint8_t& v) {
    if (e.codec == 3) {
      v = (uint8_t)e.const_val;
      return true;
    }
    ByteCursor* c = slice.find(e.cid);
    if (!c) {
      err = "CRAM external block missing";
      return false;
    }
    v = c->u8();
    return c->ok;
  }
  bool ext_bytes(const Encoding& e, int n, std::string& out) {
    ByteCursor* c = slice.find(e.cid);
    if (!c) {
      err = "CRAM external block missing";
      return false;
    }
    if (c->off + (size_t)n > c->n) {
      err = "CRAM byte series underrun";
      return false;
    }
    out.assign((const char*)c->p + c->off, (size_t)n);
    c->off += (size_t)n;
    return true;
  }
  bool byte_array_stop(const Encoding& e, std::string& out) {
    ByteCursor* c = slice.find(e.cid);
    if (!c) {
      err = "CRAM external block missing";
      return false;
    }
    size_t s = c->off;
    while (c->off < c->n && c->p[c->off] != e.stop) c->off++;
    out.assign((const char*)c->p + s, c->off - s);
    if (c->off < c->n) c->off++;  // stop byte
    return true;
  }
  bool byte_array(const Encoding& e, std::string& out) {
    if (e.codec == 5) return byte_array_stop(e, out);
    if (e.codec == 4) {
      int64_t len = 0;
      Encoding le;
      le.codec = e.len_codec;
      le.cid = e.len_cid;
      le.const_val = e.len_const;
      le.present = true;
      if (!ext_int(le, len)) return false;
      Encoding ve;
      ve.codec = 1;
      ve.cid = e.val_cid;
      ve.present = true;
      return ext_bytes(ve, (int)len, out);
    }
    err = "unsupported CRAM byte-array codec";
    return false;
  }

  // decode the next record; false at slice end (caller advances)
  bool next_record(Record& r) {
    if (srec >= slice.nrec) return false;
    r = Record();
    int64_t v;
    if (!ext_int(ch.S("BF"), v)) return false;
    r.flag = (int)v;
    int64_t cf;
    if (!ext_int(ch.S("CF"), cf)) return false;
    if (slice.refid == -2) {
      if (!ext_int(ch.S("RI"), v)) return false;
      r.refid = (int32_t)v;
    } else {
      r.refid = slice.refid;
    }
    if (!ext_int(ch.S("RL"), v)) return false;
    r.l_seq = (int32_t)v;
    if (!ext_int(ch.S("AP"), v)) return false;
    int64_t pos1 = ch.ap_delta ? prev_pos1 + v : v;
    prev_pos1 = ch.ap_delta ? pos1 : prev_pos1;
    r.pos = pos1 - 1;
    if (!ext_int(ch.S("RG"), v)) return false;
    if (ch.rn) {
      if (!byte_array(ch.S("RN"), r.name)) return false;
    }
    if (cf & 2) {  // detached mate
      if (!ext_int(ch.S("MF"), v)) return false;
      if (!ch.rn) {
        if (!byte_array(ch.S("RN"), r.name)) return false;
      }
      if (!ext_int(ch.S("NS"), v)) return false;
      if (!ext_int(ch.S("NP"), v)) return false;
      if (!ext_int(ch.S("TS"), v)) return false;
    } else if (cf & 4) {
      if (!ext_int(ch.S("NF"), v)) return false;
    }
    int64_t tl;
    if (!ext_int(ch.S("TL"), tl)) return false;
    if (tl < 0 || (size_t)tl >= std::max<size_t>(ch.tag_lines.size(), 1)) {
      err = "CRAM tag line out of range";
      return false;
    }
    if (!ch.tag_lines.empty()) {
      for (const std::string& tag : ch.tag_lines[(size_t)tl]) {
        // find the tag encoding and skip its value
        int32_t key = ((uint8_t)tag[0] << 16) | ((uint8_t)tag[1] << 8) |
                      (uint8_t)tag[2];
        bool found = false;
        for (auto& te : ch.tags) {
          if (te.key == key) {
            std::string blob;
            if (!byte_array(te.enc, blob)) return false;
            found = true;
            break;
          }
        }
        if (!found) {
          err = "CRAM tag without encoding";
          return false;
        }
      }
    }
    r.unmapped = (r.flag & 4) != 0;
    if (!r.unmapped) {
      int64_t fn;
      if (!ext_int(ch.S("FN"), fn)) return false;
      int32_t rp = 0;
      for (int64_t i = 0; i < fn; i++) {
        uint8_t fc;
        if (!ext_byte(ch.S("FC"), fc)) return false;
        int64_t fp;
        if (!ext_int(ch.S("FP"), fp)) return false;
        rp += (int32_t)fp;
        Record::Feat ft;
        ft.rpos = rp;
        ft.code = (char)fc;
        switch (fc) {
          case 'X': {  // substitution
            uint8_t bs;
            if (!ext_byte(ch.S("BS"), bs)) return false;
            ft.val = bs;
            break;
          }
          case 'S':
            if (!byte_array(ch.S("SC"), ft.bytes)) return false;
            break;
          case 'I':
            if (!byte_array(ch.S("IN"), ft.bytes)) return false;
            break;
          case 'i': {
            uint8_t ba;
            if (!ext_byte(ch.S("BA"), ba)) return false;
            ft.bytes.assign(1, (char)ba);
            break;
          }
          case 'B': {  // base + quality pair (ref-consuming)
            uint8_t ba, q;
            if (!ext_byte(ch.S("BA"), ba)) return false;
            if (!ext_byte(ch.S("QS"), q)) return false;
            ft.bytes.assign(1, (char)ba);
            ft.val = q;
            break;
          }
          case 'b':
            if (!byte_array(ch.S("BB"), ft.bytes)) return false;
            break;
          case 'q':
            if (!byte_array(ch.S("QQ"), ft.bytes)) return false;
            break;
          case 'D': {
            int64_t dl;
            if (!ext_int(ch.S("DL"), dl)) return false;
            ft.val = (int32_t)dl;
            break;
          }
          case 'N': {
            int64_t rs;
            if (!ext_int(ch.S("RS"), rs)) return false;
            ft.val = (int32_t)rs;
            break;
          }
          case 'P': {
            int64_t pd;
            if (!ext_int(ch.S("PD"), pd)) return false;
            ft.val = (int32_t)pd;
            break;
          }
          case 'H': {
            int64_t hc;
            if (!ext_int(ch.S("HC"), hc)) return false;
            ft.val = (int32_t)hc;
            break;
          }
          case 'Q': {
            uint8_t q;
            if (!ext_byte(ch.S("QS"), q)) return false;
            ft.val = q;
            break;
          }
          default:
            err = std::string("unsupported CRAM feature code ") + (char)fc;
            return false;
        }
        r.feats.push_back(std::move(ft));
      }
      int64_t mq;
      if (!ext_int(ch.S("MQ"), mq)) return false;
      r.mapq = (int)mq;
    } else {
      // unmapped with no reference: bases stored one by one
      r.feats.clear();
      std::string bases;
      Encoding ve = ch.S("BA");
      if (!ext_bytes(ve, r.l_seq, bases)) return false;
      Record::Feat ft;
      ft.rpos = 1;
      ft.code = 'b';
      ft.bytes = std::move(bases);
      r.feats.push_back(std::move(ft));
      r.mapq = 0;
    }
    if (cf & 1) {  // quality scores stored as array
      std::string q;
      Encoding qe = ch.S("QS");
      if (!ext_bytes(qe, r.l_seq, q)) return false;
      r.quals.assign(q.begin(), q.end());
    } else {
      r.quals.assign((size_t)r.l_seq, 0xFF);
    }
    srec++;
    return true;
  }
};

}  // namespace cramdec
