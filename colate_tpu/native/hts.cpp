// Streaming BGZF/BAM/BCF decoders — the native, bounded-memory
// replacements for the whole-file Python readers at real-data scale.
//
// The reference reads these formats through vendored htslib
// (include/vcf/htslib.cpp:379-436 read_entry; bgzf block streaming in
// include/vcf/bgzf.c).  This file re-implements the subset Colate
// touches from scratch, streaming:
//
// - ByteStream: incremental inflate of concatenated gzip members
//   (which is exactly what BGZF is), bounded input buffer;
// - BamStream: BAM header + record-at-a-time parse;
// - BamPileup: the bam_parser pileup engine (htslib.cpp:60-169) as a
//   query-driven cursor — per contig it answers a sorted list of
//   positions with (claimed, ACGT counts) while holding only the
//   current record, O(n_queries) output and O(1) window state, unlike
//   the flat per-contig count arrays of the Python oracle
//   (colate_tpu/models/bam_pileup.py, kept as the equivalence oracle);
// - BcfC: streaming BCF2 → columnar arrays matching formats/vcf.py's
//   VcfTable semantics exactly (first int-typed FORMAT field is GT,
//   (v>>1)-1 decode, missing -1, max-width padding).
//
// C ABI only (ctypes; no pybind11 in this environment).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

#include "cram.hpp"

namespace {

static void set_err(char* errbuf, int errlen, const char* msg) {
  if (errbuf && errlen > 0) {
    std::snprintf(errbuf, (size_t)errlen, "%s", msg);
  }
}

// ---------------------------------------------------------------------------
// Streaming byte source: plain file or concatenated gzip members (BGZF).
// ---------------------------------------------------------------------------
struct BgzfParallel;

struct ByteStream {
  FILE* f = nullptr;
  bool gz = false;
  bool z_live = false;
  z_stream zs{};
  std::vector<unsigned char> inbuf;
  size_t in_len = 0;   // valid bytes in inbuf
  size_t in_pos = 0;   // consumed bytes
  bool file_eof = false;
  void* bgzf = nullptr;  // BgzfParallel* when block-parallel decode is on
  // consumer-side staging: record-at-a-time readers issue millions of
  // tiny reads; refilling 1 MB at a time keeps the BGZF ring mutex (and
  // the serial inflate) off the per-record path
  std::vector<unsigned char> stage;
  size_t stage_pos = 0, stage_len = 0;
  bool stage_eof = false;

  bool open(const char* path, int nthreads = 2);

  void close();

  bool fill() {
    if (in_pos < in_len) return true;
    if (file_eof) return false;
    in_len = std::fread(inbuf.data(), 1, inbuf.size(), f);
    in_pos = 0;
    if (in_len == 0) {
      file_eof = true;
      return false;
    }
    return true;
  }

  // Read up to n bytes; returns bytes produced (0 at end of data).
  size_t read(unsigned char* dst, size_t n);

  size_t read_serial(unsigned char* dst, size_t n) {
    if (!gz) {
      size_t got = 0;
      while (got < n) {
        if (!fill()) break;
        size_t take = std::min(n - got, in_len - in_pos);
        std::memcpy(dst + got, inbuf.data() + in_pos, take);
        in_pos += take;
        got += take;
      }
      return got;
    }
    size_t got = 0;
    while (got < n) {
      if (zs.avail_in == 0) {
        if (!fill()) break;
        zs.next_in = inbuf.data() + in_pos;
        zs.avail_in = (uInt)(in_len - in_pos);
        in_pos = in_len;  // hand the whole buffer to zlib
      }
      zs.next_out = dst + got;
      zs.avail_out = (uInt)(n - got);
      int rc = inflate(&zs, Z_NO_FLUSH);
      got = n - zs.avail_out;
      if (rc == Z_STREAM_END) {
        // concatenated members (BGZF blocks / bgzip): start the next one
        if (inflateReset(&zs) != Z_OK) break;
        continue;
      }
      if (rc != Z_OK && rc != Z_BUF_ERROR) break;
      if (rc == Z_BUF_ERROR && zs.avail_in == 0 && file_eof) break;
    }
    return got;
  }

  bool read_exact(void* dst, size_t n) {
    return read((unsigned char*)dst, n) == n;
  }
};

// ---------------------------------------------------------------------------
// Block-parallel BGZF inflate.  BGZF members are independent raw-deflate
// blocks whose compressed size is announced in a BC extra subfield and
// whose decompressed size sits in the gzip ISIZE footer, so worker
// threads can inflate blocks concurrently while the consumer reads the
// output strictly in order.  (htslib ships the same idea in its thread
// pool, which the reference never enables — Colate runs it serially.)
// ---------------------------------------------------------------------------
struct BgzfParallel {
  struct Slot {
    std::vector<unsigned char> comp;  // raw deflate payload
    std::vector<unsigned char> out;
    uint32_t isize = 0;
    int state = 0;  // 0 free, 1 queued, 2 inflating, 3 done
    bool ok = true;
  };

  FILE* f = nullptr;
  std::vector<Slot> ring;
  uint64_t next_fill = 0;  // block id to read from the file next
  uint64_t next_out = 0;   // block id the consumer needs next
  size_t out_pos = 0;      // consumed bytes of the current block
  bool file_eof = false;
  bool failed = false;
  bool shutdown = false;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::vector<std::thread> workers;

  ~BgzfParallel() { stop(); }

  void start(FILE* file, int nthreads) {
    f = file;
    ring.resize(16);
    for (int i = 0; i < nthreads; i++)
      workers.emplace_back([this] { worker(); });
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutdown = true;
    }
    cv_work.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  // Read one BGZF block from the file into `slot` (caller holds no lock;
  // only the consumer thread calls this).  Returns false at EOF/garbage.
  bool read_block(Slot* slot) {
    unsigned char hdr[12];
    size_t got = std::fread(hdr, 1, 12, f);
    if (got != 12) {
      file_eof = true;
      return false;
    }
    if (hdr[0] != 0x1f || hdr[1] != 0x8b || !(hdr[3] & 4)) {
      failed = true;  // not BGZF mid-stream
      return false;
    }
    uint16_t xlen;
    std::memcpy(&xlen, hdr + 10, 2);
    std::vector<unsigned char> extra(xlen);
    if (std::fread(extra.data(), 1, xlen, f) != xlen) {
      failed = true;
      return false;
    }
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
      uint16_t slen;
      std::memcpy(&slen, extra.data() + p + 2, 2);
      if (extra[p] == 'B' && extra[p + 1] == 'C' && slen == 2) {
        uint16_t v;
        std::memcpy(&v, extra.data() + p + 4, 2);
        bsize = (int)v + 1;
      }
      p += 4 + slen;
    }
    if (bsize < 0) {
      failed = true;  // gzip member without BC: not BGZF
      return false;
    }
    int cdata = bsize - 12 - xlen - 8;
    if (cdata < 0) {
      failed = true;
      return false;
    }
    slot->comp.resize((size_t)cdata);
    if (std::fread(slot->comp.data(), 1, (size_t)cdata, f) != (size_t)cdata) {
      failed = true;
      return false;
    }
    unsigned char tail[8];
    if (std::fread(tail, 1, 8, f) != 8) {
      failed = true;
      return false;
    }
    std::memcpy(&slot->isize, tail + 4, 4);
    return true;
  }

  void worker() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      uint64_t id = UINT64_MAX;
      for (uint64_t b = next_out; b < next_fill; b++) {
        Slot& s = ring[b % ring.size()];
        if (s.state == 1) {
          id = b;
          break;
        }
      }
      if (id == UINT64_MAX) {
        if (shutdown) return;
        cv_work.wait(lk);
        continue;
      }
      Slot& s = ring[id % ring.size()];
      s.state = 2;
      lk.unlock();
      s.out.resize(s.isize);
      bool ok = true;
      if (s.isize) {
        z_stream zs{};
        ok = inflateInit2(&zs, -15) == Z_OK;
        if (ok) {
          zs.next_in = s.comp.data();
          zs.avail_in = (uInt)s.comp.size();
          zs.next_out = s.out.data();
          zs.avail_out = (uInt)s.out.size();
          int rc = inflate(&zs, Z_FINISH);
          ok = (rc == Z_STREAM_END) && zs.avail_out == 0;
          inflateEnd(&zs);
        }
      }
      lk.lock();
      s.ok = ok;
      s.state = 3;
      cv_done.notify_all();
    }
  }

  // Top up the ring from the file (consumer thread only).
  void fill_ring(std::unique_lock<std::mutex>& lk) {
    while (!file_eof && !failed && next_fill < next_out + ring.size()) {
      Slot& s = ring[next_fill % ring.size()];
      if (s.state != 0) break;
      lk.unlock();
      bool got = read_block(&s);
      lk.lock();
      if (!got) break;
      s.state = 1;
      next_fill++;
      cv_work.notify_one();
    }
  }

  size_t read(unsigned char* dst, size_t n) {
    size_t got = 0;
    std::unique_lock<std::mutex> lk(mu);
    while (got < n) {
      fill_ring(lk);
      if (next_out >= next_fill) break;  // nothing in flight: EOF/garbage
      Slot& s = ring[next_out % ring.size()];
      while (s.state != 3) cv_done.wait(lk);
      if (!s.ok) {
        failed = true;
        break;
      }
      size_t take = std::min(n - got, s.out.size() - out_pos);
      // empty slots (e.g. the BGZF EOF marker block) have a null
      // data(); memcpy's nonnull contract forbids it even for n=0
      if (take) std::memcpy(dst + got, s.out.data() + out_pos, take);
      out_pos += take;
      got += take;
      if (out_pos == s.out.size()) {
        s.state = 0;
        out_pos = 0;
        next_out++;
      }
    }
    return got;
  }
};

bool ByteStream::open(const char* path, int nthreads) {
  f = std::fopen(path, "rb");
  if (!f) return false;
  inbuf.resize(1 << 20);
  // sniff: gzip?  BGZF (FEXTRA with a BC subfield)?
  unsigned char head[18];
  size_t got = std::fread(head, 1, sizeof(head), f);
  std::rewind(f);
  gz = got >= 2 && head[0] == 0x1f && head[1] == 0x8b;
  bool is_bgzf = false;
  if (gz && got >= 18 && (head[3] & 4)) {
    uint16_t xlen;
    std::memcpy(&xlen, head + 10, 2);
    if (xlen >= 6 && head[12] == 'B' && head[13] == 'C') is_bgzf = true;
  }
  if (is_bgzf && nthreads > 0) {
    auto* bp = new BgzfParallel();
    bp->start(f, nthreads);
    bgzf = bp;
    return true;
  }
  if (gz) {
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 31) != Z_OK) return false;
    z_live = true;
  }
  return true;
}

void ByteStream::close() {
  if (bgzf) {
    delete (BgzfParallel*)bgzf;
    bgzf = nullptr;
  }
  if (z_live) inflateEnd(&zs);
  z_live = false;
  if (f) std::fclose(f);
  f = nullptr;
}

size_t ByteStream::read(unsigned char* dst, size_t n) {
  if (stage.empty()) stage.resize(1 << 20);
  size_t got = 0;
  while (got < n) {
    if (stage_pos == stage_len) {
      if (stage_eof) break;
      stage_len = bgzf ? ((BgzfParallel*)bgzf)->read(stage.data(), stage.size())
                       : read_serial(stage.data(), stage.size());
      stage_pos = 0;
      if (stage_len == 0) {
        stage_eof = true;
        break;
      }
    }
    size_t take = std::min(n - got, stage_len - stage_pos);
    std::memcpy(dst + got, stage.data() + stage_pos, take);
    stage_pos += take;
    got += take;
  }
  return got;
}

static const char NT16_STR[17] = "=ACMGRSVTWYHKDBN";

// ---------------------------------------------------------------------------
// BAM record stream.
// ---------------------------------------------------------------------------
struct BamStream {
  ByteStream bs;
  std::vector<std::string> refs;  // refID -> contig name
  std::vector<unsigned char> rec;  // current record payload (block_size bytes)
  // parsed fields of the current record
  int32_t refid = -1;
  int64_t pos = 0;
  int mapq = 0;
  int flag = 0;
  int32_t l_seq = 0;
  int l_read_name = 0;
  int n_cigar = 0;

  bool open(const char* path, char* errbuf, int errlen) {
    // One inflate worker pipelines decode against the consumer's record
    // parse + pileup — measured best on the 2-vCPU bench box (446 MB/s
    // vs 391 at 2 workers, 321 serial); raise on many-core hosts.
    int nthreads = 1;
    if (const char* e = std::getenv("COLATE_BGZF_THREADS"))
      nthreads = std::atoi(e);
    if (!bs.open(path, nthreads)) {
      set_err(errbuf, errlen, "cannot open BAM file");
      return false;
    }
    char magic[4];
    if (!bs.read_exact(magic, 4) || std::memcmp(magic, "BAM\1", 4) != 0) {
      set_err(errbuf, errlen, "not a BAM file (native path handles BAM only)");
      return false;
    }
    int32_t l_text = 0;
    if (!bs.read_exact(&l_text, 4) || l_text < 0) return false;
    std::vector<char> text((size_t)l_text);
    if (l_text && !bs.read_exact(text.data(), (size_t)l_text)) return false;
    int32_t n_ref = 0;
    if (!bs.read_exact(&n_ref, 4) || n_ref < 0) return false;
    refs.reserve((size_t)n_ref);
    for (int32_t i = 0; i < n_ref; i++) {
      int32_t l_name = 0, l_ref = 0;
      if (!bs.read_exact(&l_name, 4) || l_name <= 0) return false;
      std::vector<char> name((size_t)l_name);
      if (!bs.read_exact(name.data(), (size_t)l_name)) return false;
      if (!bs.read_exact(&l_ref, 4)) return false;
      refs.emplace_back(name.data());  // NUL-terminated in file
    }
    return true;
  }

  // Parse the next alignment; false at end of stream.
  bool next() {
    int32_t block_size = 0;
    if (!bs.read_exact(&block_size, 4) || block_size < 32) return false;
    rec.resize((size_t)block_size);
    if (!bs.read_exact(rec.data(), (size_t)block_size)) return false;
    const unsigned char* p = rec.data();
    std::memcpy(&refid, p, 4);
    int32_t pos32;
    std::memcpy(&pos32, p + 4, 4);
    pos = pos32;
    l_read_name = p[8];
    mapq = p[9];
    uint16_t ncig, flg;
    std::memcpy(&ncig, p + 12, 2);
    std::memcpy(&flg, p + 14, 2);
    n_cigar = ncig;
    flag = flg;
    std::memcpy(&l_seq, p + 16, 4);
    return true;
  }

  const char* contig() const {
    if (refid < 0 || (size_t)refid >= refs.size()) return "*";
    return refs[(size_t)refid].c_str();
  }
  // packed 4-bit sequence (and, contiguously after it, the quals — the
  // layout the reference's assign_contig garbled-qual quirk relies on)
  const unsigned char* seq4() const {
    return rec.data() + 32 + l_read_name + 4 * n_cigar;
  }
  const unsigned char* qual() const { return seq4() + (l_seq + 1) / 2; }
  char base_at(int j) const {
    unsigned v = seq4()[j >> 1];
    return NT16_STR[(j & 1) ? (v & 0xF) : (v >> 4)];
  }
};

// ---------------------------------------------------------------------------
// CRAM record stream: the from-scratch CRAM 3.0 decoder (cram.hpp)
// re-packed into the BAM wire layout so the pileup (and the reference's
// garbled-qual quirk) work identically on CRAM input.  Sequence
// reconstruction needs the contig's reference bases, which the pileup
// learns at query time — so bases materialise lazily via set_ref().
// ---------------------------------------------------------------------------
struct CramStream {
  cramdec::Reader rd;
  cramdec::Record cur;
  std::vector<unsigned char> rec;  // BAM-layout record (seq materialised)
  bool seq_done = false;
  const uint8_t* ref_ = nullptr;
  int64_t ref_len_ = 0;
  std::string err;

  int32_t refid = -1;
  int64_t pos = 0;
  int mapq = 0;
  int flag = 0;
  int32_t l_seq = 0;
  int l_read_name = 0;
  int n_cigar = 0;  // always 0 in the repacked layout

  bool open(const char* path, char* errbuf, int errlen) {
    if (!rd.open(path)) {
      set_err(errbuf, errlen, rd.err.c_str());
      return false;
    }
    return true;
  }

  void set_ref(const uint8_t* r, int64_t n) {
    ref_ = r;
    ref_len_ = n;
  }

  bool next() {
    for (;;) {
      if (rd.next_record(cur)) break;
      if (!rd.err.empty()) {
        err = rd.err;
        return false;
      }
      if (!rd.next_slice()) {
        // a parse error (e.g. unsupported codec) must not read as EOF
        if (!rd.err.empty()) err = rd.err;
        return false;
      }
    }
    refid = cur.refid;
    pos = cur.pos;
    mapq = cur.mapq;
    flag = cur.flag;
    l_seq = cur.l_seq;
    l_read_name = (int)cur.name.size() + 1;
    n_cigar = 0;
    seq_done = false;
    return true;
  }

  const char* contig() const {
    if (refid < 0 || (size_t)refid >= rd.refs.size()) return "*";
    return rd.refs[(size_t)refid].c_str();
  }

  static int nt16(char b) {
    switch (b & ~0x20) {  // uppercase
      case 'A': return 1;
      case 'C': return 2;
      case 'G': return 4;
      case 'T': return 8;
      case '=': return 0;
      default: return 15;  // N and anything else
    }
  }
  static int acgtn_row(uint8_t b) {
    switch (b & ~0x20) {
      case 'A': return 0;
      case 'C': return 1;
      case 'G': return 2;
      case 'T': return 3;
      default: return 4;
    }
  }

  // build the BAM-layout record: bases from reference + features, then
  // 4-bit packing and the quals straight after (BamStream layout)
  void materialize() {
    if (seq_done) return;
    seq_done = true;
    static const char ACGTN[5] = {'A', 'C', 'G', 'T', 'N'};
    const int32_t L = l_seq;
    std::string bases((size_t)L, 'N');
    int64_t gpos = cur.pos;
    int32_t rpos = 1;  // 1-based read cursor
    auto ref_base = [&](int64_t g) -> char {
      if (!ref_ || g < 0 || g >= ref_len_) return 'N';
      return (char)ref_[g];
    };
    auto fill_ref = [&](int32_t upto) {  // copy ref bases for read pos < upto
      while (rpos < upto && rpos <= L) {
        bases[(size_t)rpos - 1] = ref_base(gpos);
        gpos++;
        rpos++;
      }
    };
    for (const auto& ft : cur.feats) {
      fill_ref(ft.rpos);
      switch (ft.code) {
        case 'X': {
          char rb = ref_base(gpos);
          int row = acgtn_row((uint8_t)rb);
          // invert the substitution matrix row: codes are assigned to
          // the four non-ref bases in ACGTN order, two bits each from
          // the high end (CRAM 3.0 §10.4)
          uint8_t smrow = rd.ch.sm[row];
          char out = 'N';
          int slot = 0;
          for (int b = 0; b < 5; b++) {
            if (b == row) continue;
            int code = (smrow >> (6 - 2 * slot)) & 3;
            if (code == (int)ft.val) {
              out = ACGTN[b];
              break;
            }
            slot++;
          }
          if (rpos <= L) bases[(size_t)rpos - 1] = out;
          gpos++;
          rpos++;
          break;
        }
        case 'S':
        case 'I':
        case 'i': {
          for (char b : ft.bytes) {
            if (rpos <= L) bases[(size_t)rpos - 1] = b;
            rpos++;
          }
          break;
        }
        case 'b':
        case 'B': {  // 'B': single base+qual pair, ref-consuming
          for (char b : ft.bytes) {
            if (rpos <= L) bases[(size_t)rpos - 1] = b;
            rpos++;
            gpos++;
          }
          break;
        }
        case 'D':
        case 'N':
          gpos += ft.val;
          break;
        case 'P':
        case 'H':
        case 'Q':
        case 'q':
          break;  // no base/ref movement
        default:
          break;
      }
    }
    fill_ref(L + 1);

    const size_t n_seq4 = ((size_t)L + 1) / 2;
    rec.assign(32 + (size_t)l_read_name + n_seq4 + (size_t)L, 0);
    std::memcpy(rec.data(), &refid, 4);
    int32_t pos32 = (int32_t)pos;
    std::memcpy(rec.data() + 4, &pos32, 4);
    rec[8] = (unsigned char)l_read_name;
    rec[9] = (unsigned char)mapq;
    uint16_t flg = (uint16_t)flag;
    std::memcpy(rec.data() + 14, &flg, 2);
    std::memcpy(rec.data() + 16, &l_seq, 4);
    std::memcpy(rec.data() + 32, cur.name.data(), cur.name.size());
    unsigned char* s4 = rec.data() + 32 + l_read_name;
    for (int32_t j = 0; j < L; j++) {
      int v = nt16(bases[(size_t)j]);
      if (j & 1)
        s4[j >> 1] |= (unsigned char)v;
      else
        s4[j >> 1] = (unsigned char)(v << 4);
    }
    unsigned char* q = s4 + n_seq4;
    for (int32_t j = 0; j < L && (size_t)j < cur.quals.size(); j++)
      q[j] = cur.quals[(size_t)j];
  }

  const unsigned char* seq4() {
    materialize();
    return rec.data() + 32 + l_read_name;
  }
  const unsigned char* qual() { return seq4() + (l_seq + 1) / 2; }
  char base_at(int j) {
    unsigned v = seq4()[j >> 1];
    return NT16_STR[(j & 1) ? (v & 0xF) : (v >> 4)];
  }
};

// ---------------------------------------------------------------------------
// Stream wrapper: BAM (bgzf) or CRAM behind one interface, chosen by
// file magic — the reference reaches both through htslib's sam_open
// (include/vcf/htslib.cpp:171-230).
// ---------------------------------------------------------------------------
struct AlnStream {
  BamStream bam;
  CramStream cram;
  bool is_cram = false;
  // mirrored fields of the current record (BamPileup reads these)
  int32_t refid = -1;
  int64_t pos = 0;
  int mapq = 0;
  int flag = 0;
  int32_t l_seq = 0;

  bool open(const char* path, char* errbuf, int errlen) {
    FILE* probe = fopen(path, "rb");
    if (!probe) {
      set_err(errbuf, errlen, "cannot open alignment file");
      return false;
    }
    char magic[4] = {0};
    size_t got = fread(magic, 1, 4, probe);
    fclose(probe);
    is_cram = got == 4 && std::memcmp(magic, "CRAM", 4) == 0;
    return is_cram ? cram.open(path, errbuf, errlen)
                   : bam.open(path, errbuf, errlen);
  }
  void set_ref(const uint8_t* r, int64_t n) {
    if (is_cram) cram.set_ref(r, n);
  }
  bool next() {
    bool ok = is_cram ? cram.next() : bam.next();
    if (ok) {
      refid = is_cram ? cram.refid : bam.refid;
      pos = is_cram ? cram.pos : bam.pos;
      mapq = is_cram ? cram.mapq : bam.mapq;
      flag = is_cram ? cram.flag : bam.flag;
      l_seq = is_cram ? cram.l_seq : bam.l_seq;
    }
    return ok;
  }
  const char* contig() const {
    return is_cram ? cram.contig() : bam.contig();
  }
  // non-empty after next() returns false for a reason other than EOF
  // (e.g. an unsupported CRAM codec); BAM decode errors raise via their
  // own paths
  const std::string& stream_err() const {
    static const std::string none;
    return is_cram ? cram.err : none;
  }
  const unsigned char* seq4() { return is_cram ? cram.seq4() : bam.seq4(); }
  const unsigned char* qual() { return is_cram ? cram.qual() : bam.qual(); }
  char base_at(int j) { return is_cram ? cram.base_at(j) : bam.base_at(j); }
};

// ---------------------------------------------------------------------------
// Query-driven pileup cursor (bam_parser semantics, htslib.cpp:60-169).
// ---------------------------------------------------------------------------
struct BamPileup {
  AlnStream bam;
  int mapq_th = 20, len_th = 30, mismatch_th = 10, bq_th = 30;
  bool strandfilter = false;

  bool have_rec = false;   // a record is loaded (the "aln" slot)
  bool fetched_any = false;
  bool stream_end = false;
  bool eof = false;        // per-contig eof flag (reference semantics)
  std::string contig;      // active query contig
  int64_t prev_pos = -1;
  double coverage = 0, coverage_after = 0;
  std::string error;

  // per-contig query state
  const uint8_t* ref = nullptr;
  int64_t ref_len = 0;
  const uint8_t* anc = nullptr;
  int64_t anc_len = 0;
  const int64_t* q = nullptr;  // sorted 0-based positions
  int64_t nq = 0;
  uint8_t* out_claimed = nullptr;
  int32_t* out_counts = nullptr;  // [nq, 4]
  int64_t q_lo = 0;               // first query that can still be touched

  // the reference accepts the bare name or "chr"+name (htslib.cpp:394)
  bool cur_match() const {
    if (!fetched_any) return false;
    const char* c = bam.contig();
    return contig == c ||
           (std::strncmp(c, "chr", 3) == 0 && contig.size() &&
            std::string("chr") + contig == c);
  }

  bool fetch() {  // sam_read1
    if (stream_end) return false;
    if (!bam.next()) {
      stream_end = true;
      if (!bam.stream_err().empty() && error.empty())
        error = bam.stream_err();  // decode error, not EOF
      return false;
    }
    have_rec = true;
    fetched_any = true;
    return true;
  }

  static int base_code(char b) {
    switch (b) {
      case 'A': return 0;
      case 'C': return 1;
      case 'G': return 2;
      case 'T': return 3;
      default: return -1;
    }
  }

  // count_alleles_for_read (htslib.cpp:60-169) against the sorted
  // queries.  garbled: the assign_contig quirk — "qualities" are the
  // packed SEQ bytes, overrunning into the real quals (htslib.cpp:549).
  void count_alleles(bool garbled) {
    const int64_t len = bam.l_seq;
    if (bam.mapq < mapq_th || len < len_th) return;
    const int64_t start = 3, end = len - 3;
    if (end <= start) return;
    // clip window at the genome end (positions beyond ref_len break)
    int64_t n_in = ref_len - (bam.pos + start);
    if (n_in > end - start) n_in = end - start;
    if (n_in <= 0) return;
    const unsigned char* qv = garbled ? bam.seq4() : bam.qual();
    // pass 1: total quality bases + mismatches over the whole window
    int total = 0, matching = 0;
    for (int64_t j = 0; j < n_in; j++) {
      if (qv[start + j] < bq_th) continue;
      total++;
      char b = bam.base_at((int)(start + j));
      if ((char)ref[bam.pos + start + j] == b) matching++;
    }
    if (total == 0) return;
    // advance the query window: no later read can touch below pos+3
    while (q_lo < nq && q[q_lo] < bam.pos + start) q_lo++;
    const bool pass =
        (total - matching) <= mismatch_th;  // && total>0 established
    if (pass) coverage_after += (double)len;
    const bool rev = (bam.flag & 0x10) != 0;
    for (int64_t k = q_lo; k < nq && q[k] < bam.pos + start + n_in; k++) {
      const int64_t j = q[k] - bam.pos;  // in [start, start+n_in)
      if (qv[j] < bq_th) continue;
      out_claimed[k] = 1;  // claimed even when the mismatch filter fails
      if (!pass) continue;
      const int64_t g = q[k];
      if (strandfilter) {
        uint8_t rb = ref[g];
        uint8_t ab = (g < anc_len) ? anc[g] : 0;
        if (rev) {
          if (rb == 'G' || ab == 'G') continue;
        } else {
          if (rb == 'C' || ab == 'C') continue;
        }
      }
      int code = base_code(bam.base_at((int)j));
      if (code >= 0) out_counts[4 * k + code]++;
    }
  }

  // _process_loaded (the contig-matching body of read_entry)
  bool process_loaded(bool garbled) {
    count_alleles(garbled);
    if (bam.pos < prev_pos) {
      error = "BAM file not sorted by position";
      return false;
    }
    prev_pos = bam.pos;
    coverage += (double)bam.l_seq;
    return true;
  }

  bool read_entry() {  // htslib.cpp:379-423
    if (!fetch()) {
      eof = true;
      return false;
    }
    if (cur_match()) {
      if (!process_loaded(false)) return false;
    }
    return true;
  }

  // assign_contig + full-contig drain, answering the queries.
  int run_contig(const char* icontig) {
    eof = false;
    coverage = 0;
    coverage_after = 0;
    prev_pos = -1;
    q_lo = 0;
    if (icontig && icontig[0]) contig = icontig;
    bool ret = true;
    if (!fetched_any) ret = fetch();
    while (ret && !cur_match()) ret = fetch();
    if (ret) {
      if (contig.empty()) contig = bam.contig();
      if (!process_loaded(true)) return -1;  // garbled-qual first read
    } else {
      eof = true;
      return error.empty() ? 0 : -1;  // decode error, not a clean EOF
    }
    // drain_contig: provably count-equivalent to the reference's
    // horizon-limited read_to_pos walk for monotone queries
    // (htslib.cpp:426-436; see models/bam_pileup.py:drain_contig)
    while (!eof && cur_match()) {
      if (!read_entry()) {
        if (!error.empty()) return -1;
        break;
      }
    }
    return 0;
  }
};

// ---------------------------------------------------------------------------
// Streaming BCF2 → columnar (formats/vcf.py parity).
// ---------------------------------------------------------------------------
struct BcfC {
  std::vector<int64_t> pos;       // 1-based
  std::vector<int32_t> n_allele;
  std::vector<int32_t> chrom_id;
  // allele strings
  std::vector<char> ref_blob, alt_blob;
  std::vector<uint64_t> ref_off, alt_off;
  // GT rows (ragged until finish)
  std::vector<int8_t> gt;         // [n, width] after finish
  std::vector<int8_t> gt_ragged;
  std::vector<uint64_t> gt_row_off;
  // contig id -> name (from header)
  std::vector<char> cname_blob;
  std::vector<uint64_t> cname_off;
  std::vector<int64_t> cname_idx;
  int64_t n_samples = 0;
  int64_t ploidy = 2;
  int64_t width = 0;
  std::string header_text;
};

struct Cursor {
  const unsigned char* p;
  const unsigned char* end;
  bool ok = true;
  uint8_t u8() {
    if (p >= end) { ok = false; return 0; }
    return *p++;
  }
  void skip(size_t n) {
    if ((size_t)(end - p) < n) { ok = false; p = end; return; }
    p += n;
  }
  int64_t typed_int() {
    uint8_t t = u8();
    int ty = t & 0x0F;
    if (ty == 1) { int8_t v; if ((size_t)(end-p) < 1) {ok=false; return 0;} std::memcpy(&v, p, 1); p += 1; return v; }
    if (ty == 2) { int16_t v; if ((size_t)(end-p) < 2) {ok=false; return 0;} std::memcpy(&v, p, 2); p += 2; return v; }
    if (ty == 3) { int32_t v; if ((size_t)(end-p) < 4) {ok=false; return 0;} std::memcpy(&v, p, 4); p += 4; return v; }
    ok = false;
    return 0;
  }
  void type_desc(int* ty, int64_t* cnt) {
    uint8_t t = u8();
    *ty = t & 0x0F;
    *cnt = t >> 4;
    if (*cnt == 15) *cnt = typed_int();
  }
};

static int bcf_type_size(int ty) {
  switch (ty) {
    case 0: return 0;
    case 1: return 1;
    case 2: return 2;
    case 3: return 4;
    case 5: return 4;
    case 7: return 1;
    default: return 1;
  }
}

// split on commas outside double quotes (header contig lines)
static void split_csv(const std::string& s, std::vector<std::string>* out) {
  std::string cur;
  bool quoted = false;
  for (char ch : s) {
    if (ch == '"') quoted = !quoted;
    if (ch == ',' && !quoted) {
      out->push_back(cur);
      cur.clear();
    } else {
      cur.push_back(ch);
    }
  }
  if (!cur.empty()) out->push_back(cur);
}

static void parse_bcf_header(BcfC* out) {
  const std::string& text = out->header_text;
  size_t pos = 0;
  int64_t auto_idx = 0;
  while (pos < text.size()) {
    size_t nl = text.find('\n', pos);
    if (nl == std::string::npos) nl = text.size();
    std::string ln = text.substr(pos, nl - pos);
    pos = nl + 1;
    if (ln.rfind("##contig=<", 0) == 0) {
      size_t close = ln.rfind('>');
      if (close == std::string::npos) close = ln.size();
      std::string body = ln.substr(10, close - 10);
      std::vector<std::string> fields;
      split_csv(body, &fields);
      std::string name = "contig" + std::to_string(auto_idx);
      int64_t idx = auto_idx;
      for (const auto& kv : fields) {
        size_t eq = kv.find('=');
        if (eq == std::string::npos) continue;
        std::string k = kv.substr(0, eq), v = kv.substr(eq + 1);
        if (k == "ID") name = v;
        else if (k == "IDX") idx = std::strtoll(v.c_str(), nullptr, 10);
      }
      out->cname_idx.push_back(idx);
      out->cname_off.push_back(out->cname_blob.size());
      out->cname_blob.insert(out->cname_blob.end(), name.begin(), name.end());
      auto_idx++;
    } else if (ln.rfind("#CHROM", 0) == 0) {
      int64_t tabs = 0;
      for (char c : ln) tabs += (c == '\t');
      out->n_samples = tabs + 1 > 9 ? tabs + 1 - 9 : 0;
    }
  }
  out->cname_off.push_back(out->cname_blob.size());
}

static BcfC* read_bcf_stream(const char* path, char* errbuf, int errlen) {
  ByteStream bs;
  if (!bs.open(path)) {
    set_err(errbuf, errlen, "cannot open BCF file");
    return nullptr;
  }
  char magic[5];
  if (!bs.read_exact(magic, 5) || std::memcmp(magic, "BCF", 3) != 0) {
    bs.close();
    set_err(errbuf, errlen, "not-bcf");  // caller falls back to text parse
    return nullptr;
  }
  BcfC* out = new BcfC();
  uint32_t l_text = 0;
  if (!bs.read_exact(&l_text, 4)) { bs.close(); delete out; return nullptr; }
  std::vector<char> text(l_text);
  if (l_text && !bs.read_exact(text.data(), l_text)) {
    bs.close();
    delete out;
    return nullptr;
  }
  // strip trailing NULs like Python's rstrip(b"\0")
  size_t tl = text.size();
  while (tl && text[tl - 1] == '\0') tl--;
  out->header_text.assign(text.data(), tl);
  parse_bcf_header(out);

  std::vector<unsigned char> rec;
  out->gt_row_off.push_back(0);
  for (;;) {
    uint32_t l_shared = 0, l_indiv = 0;
    if (!bs.read_exact(&l_shared, 4)) break;
    if (!bs.read_exact(&l_indiv, 4)) break;
    rec.resize((size_t)l_shared + l_indiv);
    if (!bs.read_exact(rec.data(), rec.size())) break;  // truncated record
    if (l_shared < 24) break;
    const unsigned char* sh = rec.data();
    int32_t chrom_id, pos0;
    std::memcpy(&chrom_id, sh, 4);
    std::memcpy(&pos0, sh + 4, 4);
    uint32_t n_info_allele, n_fmt_sample;
    std::memcpy(&n_info_allele, sh + 16, 4);
    std::memcpy(&n_fmt_sample, sh + 20, 4);
    int64_t n_allele = n_info_allele >> 16;
    int64_t n_sample = n_fmt_sample & 0xFFFFFF;
    int n_fmt = (int)(n_fmt_sample >> 24);

    Cursor c{sh + 24, sh + l_shared};
    // ID (typed string)
    {
      int ty; int64_t cnt;
      c.type_desc(&ty, &cnt);
      c.skip((size_t)cnt * bcf_type_size(ty));
    }
    // alleles
    std::string a0, a1;
    for (int64_t i = 0; i < n_allele && c.ok; i++) {
      int ty; int64_t cnt;
      c.type_desc(&ty, &cnt);
      if ((size_t)(c.end - c.p) < (size_t)cnt) { c.ok = false; break; }
      if (i == 0) a0.assign((const char*)c.p, (size_t)cnt);
      else if (i == 1) a1.assign((const char*)c.p, (size_t)cnt);
      c.p += cnt;
    }
    // indiv block: first int-typed FORMAT field is GT (vcf.py parity)
    Cursor ind{rec.data() + l_shared, rec.data() + rec.size()};
    bool have_gt = false;
    int64_t row_len = 0;
    for (int fi = 0; fi < n_fmt && ind.ok; fi++) {
      // fmt key: typed scalar int
      {
        int ty; int64_t cnt;
        ind.type_desc(&ty, &cnt);
        int sz = bcf_type_size(ty);
        ind.skip((size_t)cnt * sz);
      }
      int ty; int64_t per_sample;
      ind.type_desc(&ty, &per_sample);
      int sz = bcf_type_size(ty);
      size_t total = (size_t)per_sample * (size_t)n_sample * (size_t)sz;
      if ((size_t)(ind.end - ind.p) < total) { ind.ok = false; break; }
      if (!have_gt && (ty == 1 || ty == 2 || ty == 3)) {
        have_gt = true;
        row_len = per_sample * n_sample;
        for (int64_t s = 0; s < n_sample * per_sample; s++) {
          int32_t v = 0;
          if (ty == 1) { int8_t x; std::memcpy(&x, ind.p + s, 1); v = x; }
          else if (ty == 2) { int16_t x; std::memcpy(&x, ind.p + 2 * s, 2); v = x; }
          else { int32_t x; std::memcpy(&x, ind.p + 4 * s, 4); v = x; }
          out->gt_ragged.push_back((int8_t)((v >> 1) - 1));
        }
        out->ploidy = per_sample;
      }
      ind.p += total;
    }
    if (!have_gt) {
      // Python fills a full -1 row of n_samples*ploidy
      row_len = out->n_samples * out->ploidy;
      for (int64_t s = 0; s < row_len; s++) out->gt_ragged.push_back(-1);
    }
    out->gt_row_off.push_back(out->gt_ragged.size());
    if (row_len > out->width) out->width = row_len;

    out->chrom_id.push_back(chrom_id);
    out->pos.push_back((int64_t)pos0 + 1);
    out->n_allele.push_back((int32_t)n_allele);
    out->ref_off.push_back(out->ref_blob.size());
    out->ref_blob.insert(out->ref_blob.end(), a0.begin(), a0.end());
    out->alt_off.push_back(out->alt_blob.size());
    out->alt_blob.insert(out->alt_blob.end(), a1.begin(), a1.end());
  }
  bs.close();
  out->ref_off.push_back(out->ref_blob.size());
  out->alt_off.push_back(out->alt_blob.size());
  // re-layout GT to [n, width], -1 padded
  size_t n = out->pos.size();
  out->gt.assign(n * (size_t)out->width, -1);
  for (size_t i = 0; i < n; i++) {
    uint64_t lo = out->gt_row_off[i], hi = out->gt_row_off[i + 1];
    std::memcpy(out->gt.data() + i * (size_t)out->width,
                out->gt_ragged.data() + lo, hi - lo);
  }
  out->gt_ragged.clear();
  out->gt_ragged.shrink_to_fit();
  if (out->n_samples == 0 && out->ploidy > 0)
    out->n_samples = out->width / out->ploidy;
  return out;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

void* cn_bam_open(const char* path, int mapq_th, int len_th, int mismatch_th,
                  int strandfilter, char* errbuf, int errlen) {
  BamPileup* h = new BamPileup();
  h->mapq_th = mapq_th;
  h->len_th = len_th;
  h->mismatch_th = mismatch_th;
  h->strandfilter = strandfilter != 0;
  if (!h->bam.open(path, errbuf, errlen)) {
    delete h;
    return nullptr;
  }
  return h;
}

// Process one contig: seek to it, stream every read, answer the sorted
// 0-based queries.  Returns 0 ok, -1 error (errbuf).
int cn_bam_contig(void* hv, const char* contig, const uint8_t* ref,
                  int64_t ref_len, const uint8_t* anc, int64_t anc_len,
                  const int64_t* q, int64_t nq, uint8_t* out_claimed,
                  int32_t* out_counts, double* out_cov,
                  double* out_cov_after, char* errbuf, int errlen) {
  BamPileup* h = (BamPileup*)hv;
  h->ref = ref;
  h->ref_len = ref_len;
  h->anc = anc;
  h->anc_len = anc_len;
  h->q = q;
  h->nq = nq;
  h->out_claimed = out_claimed;
  h->out_counts = out_counts;
  h->bam.set_ref(ref, ref_len);  // CRAM sequence reconstruction
  std::memset(out_claimed, 0, (size_t)nq);
  std::memset(out_counts, 0, (size_t)nq * 4 * sizeof(int32_t));
  int rc = h->run_contig(contig);
  if (rc != 0) {
    set_err(errbuf, errlen,
            h->error.empty() ? "BAM pileup failed" : h->error.c_str());
    return -1;
  }
  *out_cov = h->coverage;
  *out_cov_after = h->coverage_after;
  return 0;
}

void cn_bam_close(void* hv) { delete (BamPileup*)hv; }

void* cn_bcf_read(const char* path, char* errbuf, int errlen) {
  return read_bcf_stream(path, errbuf, errlen);
}

int64_t cn_bcf_n(void* hv) { return (int64_t)((BcfC*)hv)->pos.size(); }

int64_t cn_bcf_meta(void* hv, int which) {
  BcfC* h = (BcfC*)hv;
  switch (which) {
    case 0: return h->n_samples;
    case 1: return h->ploidy;
    case 2: return h->width;
    default: return -1;
  }
}

void* cn_bcf_col(void* hv, int col, int64_t* nbytes) {
  BcfC* h = (BcfC*)hv;
  switch (col) {
    case 0: *nbytes = (int64_t)(h->pos.size() * 8); return h->pos.data();
    case 1: *nbytes = (int64_t)(h->n_allele.size() * 4); return h->n_allele.data();
    case 2: *nbytes = (int64_t)(h->chrom_id.size() * 4); return h->chrom_id.data();
    case 3: *nbytes = (int64_t)h->ref_blob.size(); return h->ref_blob.data();
    case 4: *nbytes = (int64_t)(h->ref_off.size() * 8); return h->ref_off.data();
    case 5: *nbytes = (int64_t)h->alt_blob.size(); return h->alt_blob.data();
    case 6: *nbytes = (int64_t)(h->alt_off.size() * 8); return h->alt_off.data();
    case 7: *nbytes = (int64_t)h->gt.size(); return h->gt.data();
    case 8: *nbytes = (int64_t)h->cname_blob.size(); return h->cname_blob.data();
    case 9: *nbytes = (int64_t)(h->cname_off.size() * 8); return h->cname_off.data();
    case 10: *nbytes = (int64_t)(h->cname_idx.size() * 8); return h->cname_idx.data();
    default: *nbytes = -1; return nullptr;
  }
}

void cn_bcf_free(void* hv) { delete (BcfC*)hv; }

}  // extern "C"
