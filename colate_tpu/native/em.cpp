// Native EM for piecewise-constant coalescence rates — the
// latency-bound execution provider.
//
// Same numerics as colate_tpu/ops/em.py (itself a closed-form rewrite of
// the reference's coal_EM::EM_shared / EM_notshared E-steps,
// coal/coal_EM.cpp:153-468, for the point-age case mode `mut` uses), and
// the reference's EM fixed-point loop (coal/coal.cpp:3675-3825:
// converge when logl ratio > 1-1e-7 after >1000 iterations, rate floor
// 5e-9, num==0 fill-forward / den==0 keep-old M-step).
//
// Why it exists: a single-replicate EM is ~1000 iterations over
// [185, E] tensors — microseconds of arithmetic but milliseconds of
// dispatch per iteration on an accelerator, so a B=1 run is pure
// launch latency.  The framework dispatches by shape: small-B EMs run
// here on the host; large bootstrap batches and mesh-sharded runs keep
// the vectorised JAX path (ops/em.py) where the [B,185,E] batch fills
// the device.
//
// The E-step here is additionally *factorised*: the count-weighted
// accumulation over (age_bin × epoch) is O(bins + epochs) per iteration
// instead of O(bins × epochs).  For a bin with age t in epoch k, the
// shared-posterior terms for epochs e<k are global per-epoch quantities
// scaled by the bin's 1/Z, and the notshared terms for epochs e>k are
// global per-epoch quantities scaled by the bin's e^{H_t}/zrel — so both
// reduce to per-epoch bucket + prefix/suffix sums.  The e^{H_t} scale is
// carried as a streaming (mantissa, shift) pair so the factorisation
// stays finite when the cumulative hazard exceeds the f64 exponent range
// (the JAX path works in hazard-relative space for the same reason).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct EpochTables {
  int E;
  std::vector<double> dt, H, S, em1, edH, invlam, P, T1, tau;
  // dt[e]      epoch widths (dt[E-1]=0, open-ended)
  // H[e]       cumulative hazard at epoch starts
  // S[e]       e^{-H[e]}
  // em1[e]     1-e^{-lam_e dt_e}  (em1[E-1]=1 sentinel)
  // edH[e]     e^{-lam_e dt_e}
  // P[e]       P(T in epoch e) = S_e * em1_e   (last: S*[lam>0])
  // T1[e]      E[T 1{T in e}]
  // tau[e]     sum_{e'>=e} e^{-(H_e' - H_e)} em1g_e'  (hazard-relative tail)
  void resize(int e) {
    E = e;
    dt.resize(E); H.resize(E); S.resize(E); em1.resize(E); edH.resize(E);
    invlam.resize(E); P.resize(E); T1.resize(E);
    tau.resize(E + 1);
  }
};

void build_tables(const double* epochs, const double* lam, EpochTables& tb) {
  const int E = tb.E;
  for (int e = 0; e < E - 1; e++) tb.dt[e] = epochs[e + 1] - epochs[e];
  tb.dt[E - 1] = 0.0;
  tb.H[0] = 0.0;
  for (int e = 0; e < E - 1; e++) tb.H[e + 1] = tb.H[e] + lam[e] * tb.dt[e];
  for (int e = 0; e < E; e++) {
    tb.S[e] = std::exp(-tb.H[e]);
    tb.invlam[e] = lam[e] > 0 ? 1.0 / lam[e] : 0.0;
    if (e < E - 1) {
      const double dH = lam[e] * tb.dt[e];
      tb.em1[e] = -std::expm1(-dH);
      tb.edH[e] = std::exp(-dH);
    } else {
      tb.em1[e] = 1.0;
      tb.edH[e] = lam[e] > 0 ? 0.0 : 1.0;
    }
  }
  for (int e = 0; e < E - 1; e++)
    tb.P[e] = tb.S[e] * tb.em1[e];
  tb.P[E - 1] = lam[E - 1] > 0 ? tb.S[E - 1] : 0.0;
  for (int e = 0; e < E - 1; e++)
    tb.T1[e] = lam[e] > 0
                   ? tb.S[e] * ((epochs[e + 1] + tb.invlam[e]) * tb.em1[e] -
                                tb.dt[e])
                   : 0.0;
  tb.T1[E - 1] =
      lam[E - 1] > 0 ? (epochs[E - 1] + tb.invlam[E - 1]) * tb.S[E - 1] : 0.0;
  // hazard-relative tail mass: tau[e] = em1g[e] + edH[e] * tau[e+1]
  tb.tau[E] = 0.0;
  for (int e = E - 1; e >= 0; e--) {
    const double em1g = (e == E - 1) ? (lam[e] > 0 ? 1.0 : 0.0) : tb.em1[e];
    tb.tau[e] = em1g + tb.edH[e] * tb.tau[e + 1];
  }
}

// One EM iteration for one replicate: fills num_tot/den_tot [E] and
// returns the log-likelihood.  bins are the 185 point ages (ascending),
// k their epoch index (nondecreasing).
double em_iteration(const double* epochs, const double* lam, int E,
                    const double* t, const int* k, int nbins,
                    const double* sc, const double* nc, EpochTables& tb,
                    std::vector<double>& num_tot, std::vector<double>& den_tot,
                    std::vector<double>& buckA,  // shared: sum sc/Z at k
                    std::vector<double>& buckG,  // shared: sum sc*Pk-/Z at k
                    std::vector<double>& buckN,  // notshared: sum nc at k
                    std::vector<double>& buckMm, // notshared scaled mantissa
                    std::vector<double>& buckMs  // notshared scale shift
) {
  build_tables(epochs, lam, tb);
  for (int e = 0; e < E; e++) {
    num_tot[e] = 0.0;
    den_tot[e] = 0.0;
    buckA[e] = buckG[e] = buckN[e] = 0.0;
    buckMm[e] = 0.0;
    buckMs[e] = -HUGE_VAL;
  }
  double logl = 0.0;

  for (int b = 0; b < nbins; b++) {
    const int kb = k[b];
    const double tb_ = t[b];
    const double lam_k = lam[kb];
    const double dH_lo = lam_k * (tb_ - epochs[kb]);
    const double H_t = tb.H[kb] + dH_lo;
    const double em1_lo = -std::expm1(-dH_lo);
    const double Pk_m = tb.S[kb] * em1_lo;

    // ---- shared: coalescence before t ----
    const double Z = -std::expm1(-H_t);
    const double w_s = sc[b];
    if (Z > 0.0 && w_s != 0.0) {
      const double zi = 1.0 / Z;
      buckA[kb] += w_s * zi;
      const double pk_zi = Pk_m * zi;
      buckG[kb] += w_s * pk_zi;
      const double T1k_m =
          lam_k > 0
              ? tb.S[kb] * ((tb_ + tb.invlam[kb]) * em1_lo - (tb_ - epochs[kb]))
              : 0.0;
      num_tot[kb] += w_s * pk_zi;
      // no conditional mass remains above epoch k when T < t (suffix-sum
      // form: the e==k exposure tail is exactly zero)
      double den_k = (T1k_m - epochs[kb] * Pk_m) * zi;
      if (den_k < 0.0) den_k = 0.0;
      den_tot[kb] += w_s * den_k;
      logl += w_s * std::log(Z);
    }

    // ---- notshared: coalescence after t ----
    const double w_n = nc[b];
    double Pk_p, T1k_p;
    if (kb < E - 1) {
      const double dH_hi = lam_k * (epochs[kb + 1] - tb_);
      const double em1_hi = -std::expm1(-dH_hi);
      Pk_p = em1_hi;
      T1k_p = lam_k > 0 ? (epochs[kb + 1] + tb.invlam[kb]) * em1_hi -
                              (epochs[kb + 1] - tb_)
                        : 0.0;
    } else {
      Pk_p = lam_k > 0 ? 1.0 : 0.0;
      T1k_p = lam_k > 0 ? tb_ + tb.invlam[kb] : 0.0;
    }
    // tail mass relative to S_t: e^{-(H_{k+1}-H_t)} tau[k+1]
    const double edH_hi = kb < E - 1 ? std::exp(-(tb.H[kb + 1] - H_t)) : 0.0;
    const double zrel = Pk_p + edH_hi * tb.tau[kb + 1];
    if (zrel > 0.0 && w_n != 0.0) {
      const double zri = 1.0 / zrel;
      buckN[kb] += w_n;
      num_tot[kb] += w_n * Pk_p * zri;
      // remaining mass above k as the suffix tail (never 1 - Pk/zrel)
      const double integ_k = edH_hi * tb.tau[kb + 1] * zri;
      double den_k = (T1k_p - epochs[kb] * Pk_p) * zri + tb.dt[kb] * integ_k;
      if (den_k < 0.0) den_k = 0.0;
      den_tot[kb] += w_n * den_k;
      logl += w_n * (std::log(zrel) - H_t);
      // contribution to epochs e>k: per-epoch hazard-relative terms scaled
      // by e^{H_t} w_n/zrel — streamed as (mantissa, shift) at bucket k
      const double c = w_n * zri;
      if (H_t > buckMs[kb]) {
        buckMm[kb] = buckMm[kb] * std::exp(buckMs[kb] - H_t) + c;
        buckMs[kb] = H_t;
      } else {
        buckMm[kb] += c * std::exp(H_t - buckMs[kb]);
      }
    }
  }

  // ---- fold the buckets into per-epoch totals ----
  // shared (epochs e < k): suffix sums over buckets k>e.  The exposure
  // tail sum_{e<e'<k} P[e'] enters through the F recurrence
  // F(e-1) = F(e) + P[e]*A_gt[e] — all additions of nonnegative terms,
  // so no 1-cumsum cancellation at large hazards.
  double A = 0.0, G = 0.0, F = 0.0;
  for (int e = E - 1; e >= 0; e--) {
    // buckets at k=e contribute to epochs strictly below e
    num_tot[e] += tb.P[e] * A;
    den_tot[e] += (tb.T1[e] - epochs[e] * tb.P[e]) * A + tb.dt[e] * (F + G);
    F += tb.P[e] * A;
    A += buckA[e];
    G += buckG[e];
  }
  // notshared (epochs e > k): prefix accumulation with running rescale
  double m = 0.0, s = -HUGE_VAL;
  for (int e = 0; e < E; e++) {
    if (e > 0) {
      // merge bucket e-1 (bins whose epoch index is e-1)
      const double bm = buckMm[e - 1], bs = buckMs[e - 1];
      if (bm != 0.0) {
        if (bs > s) {
          m = m * std::exp(s - bs) + bm;
          s = bs;
        } else {
          m += bm * std::exp(bs - s);
        }
      }
    }
    if (m != 0.0) {
      const double factor = std::exp(s - tb.H[e]);  // <= 1: H_t <= H_e
      const double scaled = factor * m;
      const double p_rel = (e == E - 1) ? (lam[e] > 0 ? 1.0 : 0.0) : tb.em1[e];
      const double t1_rel =
          (e == E - 1)
              ? (lam[e] > 0 ? epochs[e] + tb.invlam[e] : 0.0)
              : (lam[e] > 0
                     ? (epochs[e + 1] + tb.invlam[e]) * tb.em1[e] - tb.dt[e]
                     : 0.0);
      const double c2_rel =
          t1_rel - epochs[e] * p_rel + tb.dt[e] * tb.edH[e] * tb.tau[e + 1];
      num_tot[e] += p_rel * scaled;
      den_tot[e] += c2_rel * scaled;
    }
  }
  // notshared epochs below k contribute denominator dt_e per unit count
  // (coal_EM.cpp:437-440): dt_e * sum_{k_b > e} nc_b — suffix of buckN
  double NN = 0.0;
  for (int e = E - 1; e >= 0; e--) {
    den_tot[e] += tb.dt[e] * NN;
    NN += buckN[e];
  }
  return logl;
}

void m_step(const double* rates_old, const double* num, const double* den,
            int E, double floor_, double* out) {
  int last = -1;
  double chosen_last = 0.0;
  for (int e = 0; e < E; e++) {
    double chosen;
    if (den[e] == 0.0) {
      chosen = rates_old[e];
    } else {
      double ratio = den[e] > 0.0 ? num[e] / den[e] : 0.0;
      chosen = ratio > floor_ ? ratio : floor_;
    }
    if (num[e] != 0.0) {
      last = e;
      chosen_last = chosen;
    }
    out[e] = last >= 0 ? chosen_last : 0.0;
  }
}

void em_one_replicate(const double* epochs, int E, const double* init_rates,
                      const double* sc, const double* nc, int nbins,
                      const double* t, const int* k, int max_iter,
                      int min_iter, double conv_ratio, double floor_,
                      double* out_rates, double* out_logl, int* out_iters) {
  EpochTables tb;
  tb.resize(E);
  std::vector<double> rates(init_rates, init_rates + E), new_rates(E);
  std::vector<double> num(E), den(E), bA(E), bG(E), bN(E), bMm(E), bMs(E);
  double ll_prev = -HUGE_VAL, ll = -HUGE_VAL;
  int it = 0, iters = 0;
  while (it < max_iter) {
    ll = em_iteration(epochs, rates.data(), E, t, k, nbins, sc, nc, tb, num,
                      den, bA, bG, bN, bMm, bMs);
    m_step(rates.data(), num.data(), den.data(), E, floor_, new_rates.data());
    rates.swap(new_rates);
    const double ratio = ll / ll_prev;
    iters = it + 1;
    const bool newly = (ratio > conv_ratio) && (it > min_iter);
    ll_prev = ll;
    it++;
    if (newly) break;
  }
  for (int e = 0; e < E; e++) out_rates[e] = rates[e];
  *out_logl = ll;
  *out_iters = iters;
}

}  // namespace

extern "C" {

// EM to convergence for B replicates (threaded over replicates).
// epochs [E]; init_rates [E]; sc/nc [B*nbins]; t [nbins] point ages
// (ascending); k [nbins] epoch index of each age.
// out_rates [B*E]; out_logl [B]; out_iters [B].
void cn_em_run(const double* epochs, int E, const double* init_rates,
               const double* sc, const double* nc, int B, int nbins,
               const double* t, const int* k, int max_iter, int min_iter,
               double conv_ratio, double rate_floor, double* out_rates,
               double* out_logl, int* out_iters) {
  unsigned nt = std::thread::hardware_concurrency();
  if (nt == 0) nt = 1;
  if (nt > 8) nt = 8;
  if ((int)nt > B) nt = (unsigned)B;
  std::atomic<int> next{0};
  auto work = [&] {
    for (;;) {
      const int b = next.fetch_add(1);
      if (b >= B) return;
      em_one_replicate(epochs, E, init_rates, sc + (size_t)b * nbins,
                       nc + (size_t)b * nbins, nbins, t, k, max_iter, min_iter,
                       conv_ratio, rate_floor, out_rates + (size_t)b * E,
                       out_logl + b, out_iters + b);
    }
  };
  if (nt <= 1) {
    work();
    return;
  }
  std::vector<std::thread> th;
  for (unsigned i = 0; i < nt; i++) th.emplace_back(work);
  for (auto& x : th) x.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Sorted-case coal_tree::populate (tree mode host fast path).
//
// Mirrors the batched device kernel's math for the contemporaneous-
// leaf case (every leaf at age 0): the stable merged node order is
// [all N leaves, internal nodes by (age, index)], so the reference's
// sweep (coal_tree.cpp:100-174) reduces to one monotone walk per tree
// over the stably-sorted K=N-1 internal ages evaluated at the E epoch
// edges.  The per-tree stable sort is done here (node ages recomputed
// from branch lengths carry tiny float inversions, so rows are only
// NEARLY sorted — the device fast path requires exact sortedness, this
// one does not).  f64 accumulation in the kernel's operation order;
// threads own contiguous tree ranges and their [nseg, E] partials
// merge in thread order.
// ---------------------------------------------------------------------------

#include <algorithm>
#include <thread>

extern "C" void cn_tree_populate_sorted(
    int64_t T, int64_t K, int64_t N,
    const float* ia,       // [T, K] internal ages (any order)
    const double* spans,   // [T]
    const int32_t* blocks, // [T] in [0, nseg)
    const double* epochs,  // [E] nondecreasing, epochs[0] >= 0
    int64_t E, int64_t nseg, int32_t nthreads,
    double* num, double* den) {  // [nseg, E] each, zeroed by caller
  unsigned hw = std::thread::hardware_concurrency();
  int nt = nthreads > 0 ? nthreads : (int)(hw ? hw : 1);
  nt = (int)std::min<int64_t>(nt, std::max<int64_t>(T, 1));

  std::vector<std::vector<double>> tnum((size_t)nt), tden((size_t)nt);
  auto worker = [&](int ti, int64_t lo, int64_t hi) {
    std::vector<double>& an = tnum[(size_t)ti];
    std::vector<double>& ad = tden[(size_t)ti];
    an.assign((size_t)(nseg * E), 0.0);
    ad.assign((size_t)(nseg * E), 0.0);
    std::vector<double> g_at((size_t)E), c_at((size_t)E);
    std::vector<float> sa((size_t)K);
    for (int64_t t = lo; t < hi; t++) {
      const float* araw = ia + t * K;
      // stable sort (ties keep node-index order — argsort parity)
      sa.assign(araw, araw + K);
      std::stable_sort(sa.begin(), sa.end());
      const float* a = sa.data();
      const double w = spans[t] / 1e9;
      double* bn = an.data() + (int64_t)blocks[t] * E;
      double* bd = ad.data() + (int64_t)blocks[t] * E;
      int64_t i = 0;
      double bp_prev = 0.0, G = 0.0;
      double kk = (double)(N);
      double slope = kk * (kk - 1.0) * 0.5;  // C(N - i, 2)
      for (int64_t e = 0; e < E; e++) {
        const double te = epochs[e];
        while (i < K && (double)a[i] <= te) {
          G += slope * ((double)a[i] - bp_prev);
          bp_prev = (double)a[i];
          i++;
          kk = (double)(N - i);
          slope = kk * (kk - 1.0) * 0.5;
        }
        g_at[(size_t)e] = G + slope * (te - bp_prev);
        c_at[(size_t)e] = (double)i;
      }
      // epoch 0 collects every event with age <= epochs[1] (kernel's
      // epoch-0 rule); last epoch contributes nothing (sweep stops)
      if (E >= 2) {
        bn[0] += c_at[1] * w;
        bd[0] += (g_at[1] - g_at[0]) * w;
        for (int64_t e = 1; e < E - 1; e++) {
          bn[e] += (c_at[(size_t)e + 1] - c_at[(size_t)e]) * w;
          bd[e] += (g_at[(size_t)e + 1] - g_at[(size_t)e]) * w;
        }
      }
    }
  };
  int64_t per = (T + nt - 1) / nt;
  std::vector<std::thread> th;
  for (int ti = 0; ti < nt; ti++) {
    int64_t lo = (int64_t)ti * per;
    int64_t hi = std::min<int64_t>(lo + per, T);
    if (lo >= hi) {
      tnum[(size_t)ti].assign((size_t)(nseg * E), 0.0);
      tden[(size_t)ti].assign((size_t)(nseg * E), 0.0);
      continue;
    }
    th.emplace_back(worker, ti, lo, hi);
  }
  for (auto& t : th) t.join();
  for (int ti = 0; ti < nt; ti++) {
    const double* an = tnum[(size_t)ti].data();
    const double* ad = tden[(size_t)ti].data();
    for (int64_t i = 0; i < nseg * E; i++) {
      num[i] += an[i];
      den[i] += ad[i];
    }
  }
}

// [T, M, 2] child indices (-1 for leaves) in ReadTree's fill order
// (anc.cpp:25-32: first-seen child on the left), threaded over trees.
extern "C" void cn_children(int64_t T, int64_t M, const int32_t* parent,
                            int32_t* ch) {
  unsigned hw = std::thread::hardware_concurrency();
  int nt = (int)std::min<int64_t>(hw ? hw : 1, std::max<int64_t>(T, 1));
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t t = lo; t < hi; t++) {
      const int32_t* par = parent + t * M;
      int32_t* c = ch + t * M * 2;
      for (int64_t j = 0; j < 2 * M; j++) c[j] = -1;
      for (int64_t j = 0; j < M; j++) {
        int32_t p = par[j];
        if (p < 0) continue;
        if (c[2 * p] < 0)
          c[2 * p] = (int32_t)j;
        else
          c[2 * p + 1] = (int32_t)j;
      }
    }
  };
  if (nt <= 1 || T < 1024) {
    worker(0, T);
    return;
  }
  std::vector<std::thread> th;
  int64_t per = (T + nt - 1) / nt;
  for (int ti = 0; ti < nt; ti++) {
    int64_t lo = (int64_t)ti * per, hi = std::min<int64_t>(lo + per, T);
    if (lo < hi) th.emplace_back(worker, lo, hi);
  }
  for (auto& x : th) x.join();
}
