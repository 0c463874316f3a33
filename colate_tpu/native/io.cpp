// Native host-side decoders for the Colate file formats.
//
// The reference implements this layer as row-of-structs text parsing
// inside relate_lib (src/mutations.cpp:57-257) and record-at-a-time
// fread loops (coal/coal.cpp:2125-2145).  Here the same grammars are
// decoded in one pass into flat columnar buffers that numpy can wrap
// zero-copy — the TPU pipeline consumes columns, never rows.
//
// C ABI only (consumed via ctypes; no pybind11 in this environment).
//
// Columns exposed for a .mut table (cn_mut_col ids):
//   0 snp_id   int64[n]        5 num_branches int64[n]
//   1 pos      int64[n]        6 branch_flat  int32[sum(num_branches)]
//   2 dist     int64[n]        7 branch_off   int64[n+1]
//   3 tree     int64[n]        8 age_begin    float64[n] (strtof parity)
//   4 flipped  int64[n]        9 age_end      float64[n]
//  10 anc_code uint8[n]       13 mtype_off    uint64[n+1]
//  11 der_code uint8[n]       14 rsid_blob    char[]
//  12 valid    uint8[n]       15 rsid_off     uint64[n+1]
//  16 mtype_blob char[]       17 rest_blob    char[]
//  18 rest_off uint64[n+1]    19 header       char[]
//
// anc/der/valid replicate the mode-mut allele validation exactly
// (coal.cpp:2150-2176): valid iff mutation_type is "X/Y" with
// X in {A,C,G,T,0} and Y in {A,C,G,T,1}.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Blob {
  std::vector<char> data;
  std::vector<uint64_t> off;  // n+1 offsets
  void start() { off.push_back(data.size()); }
  void append(const char* p, size_t n) { data.insert(data.end(), p, p + n); }
  void finish() { off.push_back(data.size()); }
};

struct MutTableC {
  std::vector<int64_t> snp_id, pos, dist, tree, flipped, num_branches;
  std::vector<int32_t> branch_flat;
  std::vector<int64_t> branch_off;
  std::vector<double> age_begin, age_end;
  std::vector<uint8_t> anc_code, der_code, valid;
  Blob mtype, rsid, rest;
  std::string header;
};

// Slurp a file through zlib (transparently handles plain and gzip,
// mirroring the reference's .gz fallback at mutations.cpp:263-266).
bool slurp(const char* path, std::vector<char>& out, std::string& err) {
  std::string p = path;
  FILE* probe = fopen(p.c_str(), "rb");
  if (!probe) {
    p += ".gz";
    probe = fopen(p.c_str(), "rb");
    if (!probe) {
      err = "cannot open " + std::string(path);
      return false;
    }
  }
  fclose(probe);
  gzFile f = gzopen(p.c_str(), "rb");
  if (!f) {
    err = "gzopen failed: " + p;
    return false;
  }
  gzbuffer(f, 1 << 20);
  out.clear();
  size_t cap = 1 << 22;
  out.resize(cap);
  size_t n = 0;
  for (;;) {
    if (n == out.size()) out.resize(out.size() * 2);
    int got = gzread(f, out.data() + n, (unsigned)(out.size() - n));
    if (got < 0) {
      err = "gzread error: " + p;
      gzclose(f);
      return false;
    }
    if (got == 0) break;
    n += (size_t)got;
  }
  gzclose(f);
  out.resize(n);
  return true;
}

inline bool anc_ok(char c) {
  return c == 'A' || c == 'C' || c == 'G' || c == 'T' || c == '0';
}
inline bool der_ok(char c) {
  return c == 'A' || c == 'C' || c == 'G' || c == 'T' || c == '1';
}

inline int64_t parse_i64(const char* b, const char* e) {
  bool neg = false;
  if (b < e && (*b == '-' || *b == '+')) neg = (*b++ == '-');
  int64_t v = 0;
  while (b < e && *b >= '0' && *b <= '9') v = v * 10 + (*b++ - '0');
  return neg ? -v : v;
}

}  // namespace

extern "C" {

void* cn_mut_read(const char* path, char* errbuf, int errlen) {
  std::string err;
  std::vector<char> buf;
  if (!slurp(path, buf, err)) {
    snprintf(errbuf, errlen, "%s", err.c_str());
    return nullptr;
  }
  auto* t = new MutTableC();
  const char* p = buf.data();
  const char* end = p + buf.size();
  // header line
  const char* nl = (const char*)memchr(p, '\n', end - p);
  if (!nl) {
    snprintf(errbuf, errlen, "empty .mut file: %s", path);
    delete t;
    return nullptr;
  }
  t->header.assign(p, nl - p);
  p = nl + 1;

  size_t nlines = 0;
  for (const char* q = p; q < end;) {
    const char* e = (const char*)memchr(q, '\n', end - q);
    if (!e) e = end;
    if (e > q) nlines++;
    q = e + 1;
  }
  t->snp_id.reserve(nlines);
  t->pos.reserve(nlines);
  t->dist.reserve(nlines);
  t->tree.reserve(nlines);
  t->flipped.reserve(nlines);
  t->num_branches.reserve(nlines);
  t->branch_off.reserve(nlines + 1);
  t->age_begin.reserve(nlines);
  t->age_end.reserve(nlines);
  t->anc_code.reserve(nlines);
  t->der_code.reserve(nlines);
  t->valid.reserve(nlines);
  t->branch_off.push_back(0);

  const char* f[12];   // start of fields 0..10 + end sentinel
  while (p < end) {
    const char* e = (const char*)memchr(p, '\n', end - p);
    if (!e) e = end;
    if (e == p) {
      p = e + 1;
      continue;
    }
    // locate the first 11 ';'-separated fields
    int nf = 0;
    f[0] = p;
    const char* q = p;
    while (nf < 11 && q < e) {
      const char* s = (const char*)memchr(q, ';', e - q);
      if (!s) break;
      f[++nf] = s + 1;
      q = s + 1;
    }
    if (nf < 11) {
      snprintf(errbuf, errlen, "short .mut row at byte %ld",
               (long)(p - buf.data()));
      delete t;
      return nullptr;
    }
    t->snp_id.push_back(parse_i64(f[0], f[1] - 1));
    t->pos.push_back(parse_i64(f[1], f[2] - 1));
    t->dist.push_back(parse_i64(f[2], f[3] - 1));
    t->rsid.start();
    t->rsid.append(f[3], f[4] - 1 - f[3]);
    t->tree.push_back(parse_i64(f[4], f[5] - 1));
    // branch: space-separated ints
    {
      const char* b = f[5];
      const char* be = f[6] - 1;
      int64_t cnt = 0;
      while (b < be) {
        while (b < be && (*b == ' ' || *b == '\t')) b++;
        if (b >= be) break;
        const char* s = b;
        while (b < be && *b != ' ' && *b != '\t') b++;
        t->branch_flat.push_back((int32_t)parse_i64(s, b));
        cnt++;
      }
      t->num_branches.push_back(cnt);
      t->branch_off.push_back((int64_t)t->branch_flat.size());
    }
    // f[6] = is_not_mapping (ignored, like the reference parser)
    t->flipped.push_back(parse_i64(f[7], f[8] - 1));
    // ages with strtof: the reference uses std::stof (float32)
    {
      char tmp[64];
      size_t l8 = (size_t)(f[9] - 1 - f[8]);
      if (l8 >= sizeof(tmp)) l8 = sizeof(tmp) - 1;
      memcpy(tmp, f[8], l8);
      tmp[l8] = 0;
      t->age_begin.push_back((double)strtof(tmp, nullptr));
      size_t l9 = (size_t)(f[10] - 1 - f[9]);
      if (l9 >= sizeof(tmp)) l9 = sizeof(tmp) - 1;
      memcpy(tmp, f[9], l9);
      tmp[l9] = 0;
      t->age_end.push_back((double)strtof(tmp, nullptr));
    }
    // mutation_type: up to the 11th ';' (or line end if none)
    {
      const char* m = f[10];
      const char* s = (const char*)memchr(m, ';', e - m);
      const char* me = s ? s : e;
      t->mtype.start();
      t->mtype.append(m, me - m);
      size_t len = (size_t)(me - m);
      uint8_t v = (len == 3 && m[1] == '/' && anc_ok(m[0]) && der_ok(m[2]));
      t->valid.push_back(v);
      t->anc_code.push_back(v ? (uint8_t)m[0] : 0);
      t->der_code.push_back(v ? (uint8_t)m[2] : 0);
      t->rest.start();
      if (s && s + 1 < e) t->rest.append(s + 1, e - (s + 1));
    }
    p = e + 1;
  }
  t->rsid.finish();
  t->mtype.finish();
  t->rest.finish();
  return t;
}

int64_t cn_mut_n(void* h) { return (int64_t)((MutTableC*)h)->pos.size(); }

void* cn_mut_col(void* h, int col, int64_t* nbytes) {
  auto* t = (MutTableC*)h;
  auto ret = [&](void* p, size_t nb) {
    *nbytes = (int64_t)nb;
    return p;
  };
  switch (col) {
    case 0: return ret(t->snp_id.data(), t->snp_id.size() * 8);
    case 1: return ret(t->pos.data(), t->pos.size() * 8);
    case 2: return ret(t->dist.data(), t->dist.size() * 8);
    case 3: return ret(t->tree.data(), t->tree.size() * 8);
    case 4: return ret(t->flipped.data(), t->flipped.size() * 8);
    case 5: return ret(t->num_branches.data(), t->num_branches.size() * 8);
    case 6: return ret(t->branch_flat.data(), t->branch_flat.size() * 4);
    case 7: return ret(t->branch_off.data(), t->branch_off.size() * 8);
    case 8: return ret(t->age_begin.data(), t->age_begin.size() * 8);
    case 9: return ret(t->age_end.data(), t->age_end.size() * 8);
    case 10: return ret(t->anc_code.data(), t->anc_code.size());
    case 11: return ret(t->der_code.data(), t->der_code.size());
    case 12: return ret(t->valid.data(), t->valid.size());
    case 13: return ret(t->mtype.off.data(), t->mtype.off.size() * 8);
    case 14: return ret(t->rsid.data.data(), t->rsid.data.size());
    case 15: return ret(t->rsid.off.data(), t->rsid.off.size() * 8);
    case 16: return ret(t->mtype.data.data(), t->mtype.data.size());
    case 17: return ret(t->rest.data.data(), t->rest.data.size());
    case 18: return ret(t->rest.off.data(), t->rest.off.size() * 8);
    case 19: return ret((void*)t->header.data(), t->header.size());
    default: break;
  }
  *nbytes = -1;
  return nullptr;
}

void cn_mut_free(void* h) { delete (MutTableC*)h; }

// ---------------------------------------------------------------------------
// .colate.in binary site stream (record layout coal/coal.cpp:2503-2515)
// ---------------------------------------------------------------------------

struct ColateInC {
  std::vector<int32_t> bp, aaf, daf;
  std::vector<uint8_t> anc, der;
  Blob names;                    // one entry per chromosome run
  std::vector<int64_t> run_len;  // records per run
};

void* cn_colatein_read(const char* path, char* errbuf, int errlen) {
  std::string err;
  std::vector<char> buf;
  if (!slurp(path, buf, err)) {
    snprintf(errbuf, errlen, "%s", err.c_str());
    return nullptr;
  }
  auto* t = new ColateInC();
  const char* p = buf.data();
  const char* end = p + buf.size();
  std::string cur;
  int64_t cur_n = 0;
  while (p + 4 <= end) {
    int32_t lchrom;
    memcpy(&lchrom, p, 4);
    if (lchrom <= 0 || lchrom > 1023 || p + 4 + lchrom + 14 > end) break;
    const char* name = p + 4;
    p += 4 + lchrom;
    int32_t bp_, aaf_, daf_;
    memcpy(&bp_, p, 4);
    uint8_t anc_ = (uint8_t)p[4];
    uint8_t der_ = (uint8_t)p[5];
    memcpy(&aaf_, p + 6, 4);
    memcpy(&daf_, p + 10, 4);
    p += 14;
    if ((int64_t)cur.size() != lchrom || memcmp(cur.data(), name, lchrom)) {
      if (cur_n) {
        t->names.start();
        t->names.append(cur.data(), cur.size());
        t->run_len.push_back(cur_n);
      }
      cur.assign(name, lchrom);
      cur_n = 0;
    }
    t->bp.push_back(bp_);
    t->anc.push_back(anc_);
    t->der.push_back(der_);
    t->aaf.push_back(aaf_);
    t->daf.push_back(daf_);
    cur_n++;
  }
  if (cur_n) {
    t->names.start();
    t->names.append(cur.data(), cur.size());
    t->run_len.push_back(cur_n);
  }
  t->names.finish();
  return t;
}

int64_t cn_colatein_n(void* h) { return (int64_t)((ColateInC*)h)->bp.size(); }

void* cn_colatein_col(void* h, int col, int64_t* nbytes) {
  auto* t = (ColateInC*)h;
  auto ret = [&](void* p, size_t nb) {
    *nbytes = (int64_t)nb;
    return p;
  };
  switch (col) {
    case 0: return ret(t->bp.data(), t->bp.size() * 4);
    case 1: return ret(t->anc.data(), t->anc.size());
    case 2: return ret(t->der.data(), t->der.size());
    case 3: return ret(t->aaf.data(), t->aaf.size() * 4);
    case 4: return ret(t->daf.data(), t->daf.size() * 4);
    case 5: return ret(t->run_len.data(), t->run_len.size() * 8);
    case 6: return ret(t->names.data.data(), t->names.data.size());
    case 7: return ret(t->names.off.data(), t->names.off.size() * 8);
    default: break;
  }
  *nbytes = -1;
  return nullptr;
}

void cn_colatein_free(void* h) { delete (ColateInC*)h; }

// ---------------------------------------------------------------------------
// tmptmp join: the mode-mut hot loop over precomputed site streams
// (reference coal/coal.cpp:2071-2321).  Python pre-filters the .mut rows
// (flips/branches/ages/alleles/masks — coal.cpp:2150-2176) and passes the
// survivors; this walks both record streams with the reference's exact
// consumed-record cursor semantics and emits per-site weights.
// ---------------------------------------------------------------------------

namespace {

struct JoinOutC {
  std::vector<double> ab, ae, ws, wn, wsm, wnm;
  std::vector<int32_t> blk;
  int64_t num_blocks = 0;
};

struct StreamCur {
  const int32_t *bp, *aaf, *daf;
  const uint8_t *anc, *der;
  int64_t n;
  const char* name_blob;
  const int64_t* name_off;   // nr+1
  const int64_t* run_start;  // nr+1 record indices
  int64_t nr;
  int64_t idx = -1;  // last-read record
  int64_t run = 0;

  bool name_is(const char* c, size_t cl) const {
    if (idx < 0) return false;
    int64_t l = name_off[run + 1] - name_off[run];
    return (int64_t)cl == l && memcmp(name_blob + name_off[run], c, l) == 0;
  }
  bool read() {
    if (idx + 1 >= n) return false;
    idx++;
    while (run + 1 < nr && idx >= run_start[run + 1]) run++;
    return true;
  }
};

}  // namespace

void* cn_join_tmptmp(
    int n_chr, const char* chrom_blob, const int64_t* chrom_off,
    const int64_t* m_off, const int64_t* m_pos, const double* m_ab,
    const double* m_ae, const uint8_t* m_anc, const uint8_t* m_der,
    const int32_t* t_bp, const uint8_t* t_anc, const uint8_t* t_der,
    const int32_t* t_aaf, const int32_t* t_daf, int64_t t_n,
    const char* t_names, const int64_t* t_name_off, const int64_t* t_runs,
    int64_t t_nr,
    const int32_t* r_bp, const uint8_t* r_anc, const uint8_t* r_der,
    const int32_t* r_aaf, const int32_t* r_daf, int64_t r_n,
    const char* r_names, const int64_t* r_name_off, const int64_t* r_runs,
    int64_t r_nr, double ref_age, int64_t num_bases_per_block) {
  auto* out = new JoinOutC();
  StreamCur tgt{t_bp, t_aaf, t_daf, t_anc, t_der, t_n,
                t_names, t_name_off, t_runs, t_nr};
  StreamCur ref{r_bp, r_aaf, r_daf, r_anc, r_der, r_n,
                r_names, r_name_off, r_runs, r_nr};
  int64_t num_blocks = 0;

  for (int c = 0; c < n_chr; c++) {
    const char* chrom = chrom_blob + chrom_off[c];
    size_t cl = (size_t)(chrom_off[c + 1] - chrom_off[c]);
    // chromosome scan (coal.cpp:2125-2146): consume until name matches
    while (!ref.name_is(chrom, cl))
      if (!ref.read()) break;
    while (!tgt.name_is(chrom, cl))
      if (!tgt.read()) break;

    int64_t current_block_base = 0;
    for (int64_t i = m_off[c]; i < m_off[c + 1]; i++) {
      int64_t pos = m_pos[i];
      // --- reference stream (coal.cpp:2183-2199) ---
      int32_t DAF_ref = 0, AAF_ref = 0;
      while (ref.name_is(chrom, cl) && ref.bp[ref.idx] < pos) {
        if (!ref.read()) break;
        AAF_ref = ref.aaf[ref.idx];
        DAF_ref = ref.daf[ref.idx];
      }
      bool use = ref.name_is(chrom, cl) && ref.bp[ref.idx] == pos &&
                 ref.anc[ref.idx] == m_anc[i] && ref.der[ref.idx] == m_der[i];
      if (DAF_ref == 0) use = false;
      int32_t N_ref = DAF_ref + AAF_ref;
      if (!use) continue;
      // --- target stream (coal.cpp:2201-2222) ---
      int32_t DAF_t = 0, AAF_t = 0;
      while (tgt.name_is(chrom, cl) && tgt.bp[tgt.idx] < pos) {
        if (!tgt.read()) break;
        AAF_t = tgt.aaf[tgt.idx];
        DAF_t = tgt.daf[tgt.idx];
      }
      use = tgt.name_is(chrom, cl) && tgt.bp[tgt.idx] == pos &&
            tgt.anc[tgt.idx] == m_anc[i] && tgt.der[tgt.idx] == m_der[i];
      int32_t N_t = DAF_t + AAF_t;
      if (N_t == 0) use = false;
      if (!use) continue;

      while (current_block_base + num_bases_per_block < pos) {
        current_block_base += num_bases_per_block;
        num_blocks++;
      }
      // pseudo-diploid rounding in float (coal.cpp:2236-2242)
      float f_DAF = (float)DAF_t, f_AAF = (float)AAF_t;
      f_DAF = (float)(f_DAF / (N_t / 2.0));
      f_AAF = (float)(f_AAF / (N_t / 2.0));
      f_DAF = std::round(f_DAF);
      f_AAF = std::round(f_AAF);
      double ab = m_ab[i] < ref_age ? ref_age : m_ab[i];
      out->ab.push_back(ab);
      out->ae.push_back(m_ae[i]);
      out->ws.push_back((double)f_DAF * DAF_ref / (double)N_ref);
      out->wn.push_back((double)f_AAF * DAF_ref / (double)N_ref);
      out->wsm.push_back((double)f_DAF * DAF_ref / ((double)N_ref * 100.0));
      out->wnm.push_back((double)f_AAF * DAF_ref / ((double)N_ref * 100.0));
      out->blk.push_back((int32_t)num_blocks);
    }
    num_blocks++;  // end-of-chromosome block boundary (coal.cpp:2307-2312)
  }
  out->num_blocks = num_blocks;
  return out;
}

int64_t cn_join_n(void* h) { return (int64_t)((JoinOutC*)h)->ab.size(); }

int64_t cn_join_num_blocks(void* h) { return ((JoinOutC*)h)->num_blocks; }

void* cn_join_col(void* h, int col, int64_t* nbytes) {
  auto* t = (JoinOutC*)h;
  auto ret = [&](void* p, size_t nb) {
    *nbytes = (int64_t)nb;
    return p;
  };
  switch (col) {
    case 0: return ret(t->ab.data(), t->ab.size() * 8);
    case 1: return ret(t->ae.data(), t->ae.size() * 8);
    case 2: return ret(t->ws.data(), t->ws.size() * 8);
    case 3: return ret(t->wn.data(), t->wn.size() * 8);
    case 4: return ret(t->wsm.data(), t->wsm.size() * 8);
    case 5: return ret(t->wnm.data(), t->wnm.size() * 8);
    case 6: return ret(t->blk.data(), t->blk.size() * 4);
    default: break;
  }
  *nbytes = -1;
  return nullptr;
}

void cn_join_free(void* h) { delete (JoinOutC*)h; }

}  // extern "C"
