// ThreadSanitizer driver for the threaded native pipeline.
//
// The reader->worker pipeline in cn_tmptmp_fused_stream (native/io.cpp)
// and the sharded cn_mut_prefilter are the only concurrency in the
// native layer; running them under TSan from a tiny C++ host avoids the
// false-positive noise of LD_PRELOADing TSan into the whole Python
// interpreter.  Exercised by tools/native_sanitize.sh --tsan against
// the bench fixture.
//
// Usage: tsan_stream <fixture_dir> <n_chroms>
//   expects <dir>/synth_chr<i>.mut, <dir>/target.colate.in,
//   <dir>/ref.colate.in for i in 1..n (the bench.py fixture layout).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* cn_mut_prefilter(int n_chr, const char* mpath_blob,
                       const int64_t* mpath_off, const uint8_t* tmask_blob,
                       const int64_t* tmask_off, const uint8_t* rmask_blob,
                       const int64_t* rmask_off, double age, char* errbuf,
                       int errlen);
void* cn_tmptmp_fused_stream(void* prefilter, const char* t_path,
                             const char* r_path, const char* chrom_blob,
                             const int64_t* chrom_off, double ref_age,
                             int64_t nbpb, int nbins, const double* edges,
                             double age, double bin_c, char* errbuf,
                             int errlen);
int64_t cn_fused_num_blocks(void* h);
int64_t cn_fused_num_sites(void* h);
void* cn_fused_hist(void* h, int which, int64_t* nbytes);
void cn_fused_free(void* h);
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <fixture_dir> <n_chroms>\n", argv[0]);
    return 2;
  }
  const std::string dir = argv[1];
  const int n = atoi(argv[2]);

  std::string mpaths, chroms;
  std::vector<int64_t> moff{0}, coff{0};
  for (int c = 1; c <= n; c++) {
    mpaths += dir + "/synth_chr" + std::to_string(c) + ".mut";
    moff.push_back((int64_t)mpaths.size());
    chroms += std::to_string(c);
    coff.push_back((int64_t)chroms.size());
  }

  char err[512] = {0};
  void* pf = cn_mut_prefilter(n, mpaths.c_str(), moff.data(), nullptr,
                              nullptr, nullptr, nullptr, 0.0, err,
                              sizeof(err));
  if (!pf) {
    fprintf(stderr, "prefilter failed: %s\n", err);
    return 1;
  }

  // age-bin grid, same constants as config.py (C=10, 185 bins)
  const double bin_c = 10.0;
  const int nbins = (int)(std::log(1e8) * bin_c) + 1;
  std::vector<double> edges(nbins + 1);
  edges[0] = 0.0;
  for (int b = 1; b <= nbins; b++) edges[b] = std::exp((b - 1) / bin_c) / 10.0;

  const std::string tp = dir + "/target.colate.in";
  const std::string rp = dir + "/ref.colate.in";
  void* h = cn_tmptmp_fused_stream(pf, tp.c_str(), rp.c_str(), chroms.c_str(),
                                   coff.data(), 0.0, 30000000, nbins,
                                   edges.data(), 0.0, bin_c, err, sizeof(err));
  if (!h) {
    fprintf(stderr, "fused stream failed: %s\n", err);
    return 1;
  }
  int64_t nbytes = 0;
  double sum = 0.0;
  for (int w = 0; w < 4; w++) {
    auto* p = (double*)cn_fused_hist(h, w, &nbytes);
    for (int64_t i = 0; i < nbytes / 8; i++) sum += p[i];
  }
  printf("sites=%lld blocks=%lld histsum=%.6g\n",
         (long long)cn_fused_num_sites(h), (long long)cn_fused_num_blocks(h),
         sum);
  cn_fused_free(h);
  return 0;
}
