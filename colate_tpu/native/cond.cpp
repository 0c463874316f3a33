// Conditional coalescence-rate kernel (mode CondCoalRates).
//
// Bit-exact re-implementation of the reference's
// GetConditionalCoalescentRate (coal/coal.cpp:4785-4999) over a whole
// chromosome of trees: same float32 accumulators, same scalar add order
// (focal x conditional pairs, root-path walk, sorted sibling-leaf
// enumeration), same float epoch grids and float `coord` accumulation of
// double branch lengths.  The accumulation order matters — the reference
// adds millions of float32 terms sequentially and the rounding pattern is
// part of its observable output — so this stays a scalar host kernel, at
// C++ speed, while the surrounding engine (I/O, bootstrap) is columnar.
//
// Nothing here is copied from the reference; the loop structure follows
// the cited semantics only.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <thread>

namespace {

struct LeafSets {
    // flattened sorted descendant-leaf ids per node (CSR layout);
    // buffers are reused across trees (no per-node allocations)
    std::vector<int32_t> ids;
    std::vector<int64_t> off;  // [M+1]
    std::vector<int32_t> sz;   // scratch subtree sizes
};

// sorted leaf sets per node, merge order as FindAllLeaves
// (src/anc.cpp:205-277): ascending merge of the two children.
// Subtree sizes fix the CSR offsets up front, then one ascending pass
// merges children in place — internal nodes are assumed numbered above
// their children (ReadTree layout), same as the original per-vector
// version.
static void build_leafsets(int64_t M, int64_t N, const int32_t* parent,
                           const int32_t* ch, LeafSets& ls) {
    ls.sz.assign((size_t)M, 0);
    for (int64_t i = 0; i < N; i++) ls.sz[(size_t)i] = 1;
    for (int64_t j = N; j < M; j++) {
        int32_t c0 = ch[2 * j], c1 = ch[2 * j + 1];
        if (c0 < 0 || c1 < 0) continue;
        ls.sz[(size_t)j] = ls.sz[(size_t)c0] + ls.sz[(size_t)c1];
    }
    ls.off.resize((size_t)M + 1);
    int64_t total = 0;
    for (int64_t j = 0; j < M; j++) {
        ls.off[(size_t)j] = total;
        total += ls.sz[(size_t)j];
    }
    ls.off[(size_t)M] = total;
    ls.ids.resize((size_t)total);
    for (int64_t i = 0; i < N; i++) ls.ids[(size_t)ls.off[(size_t)i]] = (int32_t)i;
    for (int64_t j = N; j < M; j++) {
        int32_t c0 = ch[2 * j], c1 = ch[2 * j + 1];
        if (c0 < 0 || c1 < 0) continue;
        const int32_t* a = ls.ids.data() + ls.off[(size_t)c0];
        const int32_t* ae = a + ls.sz[(size_t)c0];
        const int32_t* b = ls.ids.data() + ls.off[(size_t)c1];
        const int32_t* be = b + ls.sz[(size_t)c1];
        std::merge(a, ae, b, be, ls.ids.data() + ls.off[(size_t)j]);
    }
}

// children in ReadTree fill order (left = first by ascending node index)
static void build_children(int64_t M, const int32_t* parent, int32_t* ch) {
    for (int64_t j = 0; j < 2 * M; j++) ch[j] = -1;
    for (int64_t j = 0; j < M; j++) {
        int32_t p = parent[j];
        if (p < 0) continue;
        if (ch[2 * p] < 0)
            ch[2 * p] = (int32_t)j;
        else
            ch[2 * p + 1] = (int32_t)j;
    }
}

static inline bool contains(const LeafSets& ls, int32_t node, int32_t c) {
    const int32_t* b = ls.ids.data() + ls.off[node];
    const int32_t* e = ls.ids.data() + ls.off[node + 1];
    return std::binary_search(b, e, c);
}

struct Grids {
    const float* epochs;
    int64_t E;
    const float* epochs_focal;
    int64_t F;
    const int32_t* group_of_hap;
    int64_t G;
};

// one (focal, cond) pair, modern samples (coal.cpp:4788-4882)
static void pair_modern(int64_t M, const int32_t* parent, const double* blen,
                        const int32_t* ch, const LeafSets& ls, const Grids& g,
                        int32_t f, int32_t c, float factor, float* num,
                        float* denom) {
    int32_t node = f;
    int32_t par = parent[f];
    float coord = 0.0f, coal_age = 0.0f;
    int64_t ep_start = 0, ep_init = 0;
    bool use = (c == -1);
    while (par >= 0 && par < (int32_t)M) {
        if (!use) {
            if (contains(ls, node, c)) {
                coal_age = coord;
                use = true;
            }
            ep_start = 0;
            if (g.epochs_focal[0] <= coal_age) {
                while (ep_start < g.F && g.epochs_focal[ep_start] <= coal_age)
                    ep_start++;
                if (ep_start > 0) ep_start--;
            }
        }
        coord = (float)(coord + blen[node]);
        if (use) {
            ep_init = 0;
            if (coal_age > g.epochs[0]) {
                while (ep_init < g.E && coal_age > g.epochs[ep_init]) ep_init++;
                ep_init--;
            }
            int32_t child = ch[2 * par] == node ? ch[2 * par + 1] : ch[2 * par];
            const int32_t* ob = ls.ids.data() + ls.off[child];
            const int32_t* oe = ls.ids.data() + ls.off[child + 1];
            for (const int32_t* it = ob; it != oe; ++it) {
                float lower = coal_age;
                int64_t ep = ep_init;
                int64_t gi = g.group_of_hap[*it];
                float* drow = denom + (ep_start * g.E) * g.G + gi;
                float* nrow = num + (ep_start * g.E) * g.G + gi;
                while (ep + 1 < g.E && coord > g.epochs[ep + 1]) {
                    drow[ep * g.G] += factor * (g.epochs[ep + 1] - lower);
                    ep++;
                    lower = g.epochs[ep];
                }
                drow[ep * g.G] += factor * (coord - lower);
                nrow[ep * g.G] += factor;
            }
        }
        node = par;
        if (node == (int32_t)M - 1) break;
        par = parent[node];
    }
}

// one (focal, cond) pair, ancient samples (coal.cpp:4885-4999)
static void pair_ancient(int64_t M, const int32_t* parent, const double* blen,
                         const int32_t* ch, const LeafSets& ls, const Grids& g,
                         const double* sample_ages, int32_t f, int32_t c,
                         float factor, float* num, float* denom) {
    int32_t node = f;
    int32_t par = parent[f];
    double age = sample_ages[f];
    float coal_age = (float)age;
    float coord = (float)age;
    int64_t ep_coal = 0, ep_init = 0;
    bool use = (c == -1);
    while (par >= 0 && par < (int32_t)M) {
        if (!use) {
            if (contains(ls, node, c)) {
                coal_age = coord;
                use = true;
            }
            ep_coal = 0;
            if (g.epochs_focal[0] < coord) {
                while (ep_coal < g.F && g.epochs_focal[ep_coal] < coord)
                    ep_coal++;
                ep_coal--;
            }
        }
        coord = (float)(coord + blen[node]);
        if (use) {
            int32_t child = ch[2 * par] == node ? ch[2 * par + 1] : ch[2 * par];
            ep_init = 0;
            if (coal_age > g.epochs[0]) {
                while (ep_init < g.E && coal_age > g.epochs[ep_init]) ep_init++;
                ep_init--;
            }
            const int32_t* ob = ls.ids.data() + ls.off[child];
            const int32_t* oe = ls.ids.data() + ls.off[child + 1];
            for (const int32_t* it = ob; it != oe; ++it) {
                float lower = std::max((float)age, (float)sample_ages[*it]);
                lower = std::max(lower, coal_age);
                int64_t ep_start, ep;
                if (lower <= coal_age) {
                    ep_start = ep_coal;
                    ep = ep_init;
                } else {
                    ep_start = ep_coal;
                    if (g.epochs_focal[ep_start] < lower) {
                        while (ep_start < g.F && g.epochs_focal[ep_start] < lower)
                            ep_start++;
                        ep_start--;
                    }
                    ep = ep_init;
                    if (g.epochs[ep] < lower) {
                        while (ep < g.E && g.epochs[ep] < lower) ep++;
                        ep--;
                    }
                }
                int64_t gi = g.group_of_hap[*it];
                float* drow = denom + (ep_start * g.E) * g.G + gi;
                float* nrow = num + (ep_start * g.E) * g.G + gi;
                while (ep + 1 < g.E && coord > g.epochs[ep + 1]) {
                    drow[ep * g.G] += factor * (g.epochs[ep + 1] - lower);
                    ep++;
                    lower = g.epochs[ep];
                }
                drow[ep * g.G] += factor * (coord - lower);
                nrow[ep * g.G] += factor;
            }
        }
        node = par;
        if (node == (int32_t)M - 1) break;
        par = parent[node];
    }
}

}  // namespace

extern "C" {

// Accumulate a chromosome of trees into [NB, F, E, G] float32 num/denom.
// Trees with factor == NaN are skipped (mask/map filtered).  Sequential
// tree order is preserved WITHIN every block — it is part of the
// reference's observable float32 rounding pattern — and blocks are
// disjoint accumulator slices, so contiguous RANGES of blocks fan out
// over threads with the result byte-identical to the serial loop
// (tree_blocks must be nondecreasing, which the 30 Mb position binning
// guarantees; any decreasing input falls back to one thread).
void cn_cond_chrom(int64_t T, int64_t M, int64_t N,
                   const int32_t* parent,    // [T, M]
                   const double* blen,       // [T, M]
                   const float* factors,     // [T]; NaN = skip
                   const int32_t* tree_blocks,  // [T] nondecreasing
                   const int32_t* focal, int64_t n_focal,
                   const int32_t* cond, int64_t n_cond,  // may hold -1
                   const int32_t* group_of_hap,          // [N]
                   int64_t G, const float* epochs, int64_t E,
                   const float* epochs_focal, int64_t F,
                   const double* sample_ages,            // [N] or NULL
                   float* num, float* denom)             // [NB, F, E, G]
{
    Grids g{epochs, E, epochs_focal, F, group_of_hap, G};
    const int64_t block_sz = F * E * G;

    auto run_range = [&](int64_t t0, int64_t t1) {
        std::vector<int32_t> ch(2 * M);
        LeafSets ls;
        for (int64_t t = t0; t < t1; t++) {
            float factor = factors[t];
            if (std::isnan(factor)) continue;
            const int32_t* par_t = parent + t * M;
            const double* blen_t = blen + t * M;
            build_children(M, par_t, ch.data());
            build_leafsets(M, N, par_t, ch.data(), ls);
            float* num_b = num + (int64_t)tree_blocks[t] * block_sz;
            float* den_b = denom + (int64_t)tree_blocks[t] * block_sz;
            for (int64_t i = 0; i < n_focal; i++) {
                for (int64_t j = 0; j < n_cond; j++) {
                    if (focal[i] == cond[j]) continue;
                    if (sample_ages)
                        pair_ancient(M, par_t, blen_t, ch.data(), ls, g,
                                     sample_ages, focal[i], cond[j], factor,
                                     num_b, den_b);
                    else
                        pair_modern(M, par_t, blen_t, ch.data(), ls, g,
                                    focal[i], cond[j], factor, num_b, den_b);
                }
            }
        }
    };

    bool monotone = true;
    for (int64_t t = 1; t < T && monotone; t++)
        monotone = tree_blocks[t] >= tree_blocks[t - 1];
    unsigned hw = std::thread::hardware_concurrency();
    int nt = (int)std::min<int64_t>(hw ? hw : 1, 16);
    if (!monotone || T < 2048 || nt <= 1) {
        run_range(0, T);
        return;
    }
    // split at block boundaries so no block spans two threads
    std::vector<int64_t> bounds{0};
    for (int w = 1; w < nt; w++) {
        int64_t t = T * w / nt;
        while (t < T && t > 0 && tree_blocks[t] == tree_blocks[t - 1]) t++;
        if (t > bounds.back() && t < T) bounds.push_back(t);
    }
    bounds.push_back(T);
    std::vector<std::thread> th;
    for (size_t w = 0; w + 1 < bounds.size(); w++)
        th.emplace_back(run_range, bounds[w], bounds[w + 1]);
    for (auto& x : th) x.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Analytic f64 fast path (default CondCoalRates mode).
//
// Same accumulation semantics as the replay kernel above — the cited
// reference walk (coal/coal.cpp:4785-4882) — but order-free f64 with a
// prefix-sum factorisation, so it runs O(F·depth·E) per tree instead of
// O(F·C·depth·leaves·E) and parallelises over tree chunks:
//
//   For focal hap f with root path p_0..p_D (ages y_0<=..<=y_D) and
//   M_d = #conditional haps whose LCA with f is p_d, the reference adds,
//   for every pair (d, ancestor j>d) and every leaf `other` in the
//   sibling subtree s_j:
//     num[row(y_d)][bin(y_j)][g(other)]   += w
//     denom[row(y_d)][e][g(other)]        += w·|[y_d, y_j] ∩ epoch_e|
//   The epoch walk's exposure equals h_e(y_j) − h_e(y_d) with
//   h_e(x) = clamp(x, t_e, t_{e+1}) − t_e (open-ended last epoch), so
//   summing over d<j needs only the per-row prefix sums
//   P[r] = Σ M_d and Q[r][e] = Σ M_d·h_e(y_d):
//     denom[r][e][g] += w·s_j[g]·(P[r]·h_e(y_j) − Q[r][e])
//     num[r][bin(y_j)][g] += w·P[r]·s_j[g]
//
// Zero-width adds the replay performs at exact epoch boundaries vanish
// identically in the difference form.  Modern samples only (the
// sample-age-aware variant keeps the replay path).  Trees are processed
// in fixed 4096-tree chunks, each into its own buffer, merged in chunk
// order — results are independent of the thread count.

namespace {

struct FastScratch {
    std::vector<int32_t> ch;       // [2M] children
    std::vector<int32_t> cc;       // [M] conditional-hap subtree counts
    std::vector<int64_t> desc;     // [M*G] per-group subtree leaf counts
    std::vector<int32_t> path;     // root path nodes
    std::vector<double> y;         // root path ages (f64 prefix of blen)
    std::vector<double> P;         // [F]
    std::vector<double> Q;         // [F*E]
    std::vector<double> h;         // [E] h_e(y_j)
};

static inline int64_t bin_of_age(const double* ep, int64_t E, double a) {
    // largest e with ep[e] < a, min 0 — the endpoint of the reference's
    // epoch walk (it starts at ep_init(c) >= 0 and advances while
    // a > ep[e+1]; with c <= a that lands exactly here)
    int64_t lo = 0, hi = E - 1;
    while (lo < hi) {
        int64_t mid = (lo + hi + 1) / 2;
        if (ep[mid] < a) lo = mid; else hi = mid - 1;
    }
    return lo;
}

static inline int64_t row_of_age(const double* epf, int64_t F, double a) {
    // largest r with epf[r] <= a, min 0 (coal.cpp:4813-4822)
    int64_t lo = 0, hi = F - 1;
    while (lo < hi) {
        int64_t mid = (lo + hi + 1) / 2;
        if (epf[mid] <= a) lo = mid; else hi = mid - 1;
    }
    return lo;
}

static void fast_tree(int64_t M, int64_t N, const int32_t* parent,
                      const double* blen, double w,
                      const int32_t* focal, int64_t n_focal,
                      const int32_t* cond, int64_t n_cond, bool cond_empty,
                      const uint8_t* is_cond, const int32_t* group_of_hap,
                      int64_t G, const double* ep, int64_t E,
                      const double* epf, int64_t F, FastScratch& s,
                      double* num, double* denom) {
    build_children(M, parent, s.ch.data());
    // subtree counts (ascending node ids: children before parents)
    s.cc.assign((size_t)M, 0);
    if (!cond_empty)
        for (int64_t j = 0; j < n_cond; j++) s.cc[(size_t)cond[j]] = 1;
    s.desc.assign((size_t)(M * G), 0);
    for (int64_t i = 0; i < N; i++) s.desc[(size_t)(i * G + group_of_hap[i])] = 1;
    for (int64_t j = 0; j + 1 < M; j++) {
        int32_t p = parent[j];
        if (p < 0) continue;
        s.cc[(size_t)p] += s.cc[(size_t)j];
        for (int64_t g = 0; g < G; g++)
            s.desc[(size_t)(p * G + g)] += s.desc[(size_t)(j * G + g)];
    }
    const int64_t EG = E * G;
    for (int64_t i = 0; i < n_focal; i++) {
        int32_t f = focal[i];
        // root path + f64 ages
        s.path.clear();
        s.y.clear();
        s.path.push_back(f);
        s.y.push_back(0.0);
        {
            int32_t node = f;
            while (node != (int32_t)M - 1) {
                int32_t p = parent[node];
                if (p < 0 || p >= (int32_t)M) break;
                s.y.push_back(s.y.back() + blen[node]);
                s.path.push_back(p);
                node = p;
            }
        }
        int64_t D = (int64_t)s.path.size() - 1;
        std::fill(s.P.begin(), s.P.end(), 0.0);
        std::fill(s.Q.begin(), s.Q.end(), 0.0);
        for (int64_t j = 1; j <= D; j++) {
            // incorporate depth d = j-1
            double m;
            if (cond_empty)
                m = (j == 1) ? 1.0 : 0.0;
            else if (j == 1)
                m = (double)(s.cc[(size_t)f] - (is_cond[f] ? 1 : 0));
            else
                m = (double)(s.cc[(size_t)s.path[(size_t)(j - 1)]] -
                             s.cc[(size_t)s.path[(size_t)(j - 2)]]);
            if (m != 0.0) {
                double yd = s.y[(size_t)(j - 1)];
                // c == -1 never recomputes the focal row (coal.cpp:4806)
                int64_t r = (cond_empty && j == 1) ? 0 : row_of_age(epf, F, yd);
                s.P[(size_t)r] += m;
                double* Qr = s.Q.data() + r * E;
                for (int64_t e = 0; e < E; e++) {
                    double lo = ep[e];
                    double he;
                    if (e + 1 < E) {
                        double x = yd < ep[e + 1] ? yd : ep[e + 1];
                        he = x > lo ? x - lo : 0.0;
                    } else {
                        he = yd > lo ? yd - lo : 0.0;
                    }
                    Qr[e] += m * he;
                }
            }
            // contribution of ancestor path[j]
            int32_t a = s.path[(size_t)j];
            int32_t on_path = s.path[(size_t)(j - 1)];
            int32_t sib = s.ch[(size_t)(2 * a)] == on_path
                              ? s.ch[(size_t)(2 * a + 1)]
                              : s.ch[(size_t)(2 * a)];
            if (sib < 0) continue;
            double yj = s.y[(size_t)j];
            int64_t ea = bin_of_age(ep, E, yj);
            for (int64_t e = 0; e <= ea; e++) {
                double lo = ep[e];
                if (e + 1 < E) {
                    double x = yj < ep[e + 1] ? yj : ep[e + 1];
                    s.h[(size_t)e] = x > lo ? x - lo : 0.0;
                } else {
                    s.h[(size_t)e] = yj > lo ? yj - lo : 0.0;
                }
            }
            const int64_t* sg = s.desc.data() + (int64_t)sib * G;
            for (int64_t r = 0; r < F; r++) {
                double Pr = s.P[(size_t)r];
                if (Pr == 0.0) continue;
                const double* Qr = s.Q.data() + r * E;
                double* nrow = num + r * EG;
                double* drow = denom + r * EG;
                for (int64_t g = 0; g < G; g++) {
                    double sgv = (double)sg[g];
                    if (sgv == 0.0) continue;
                    nrow[ea * G + g] += w * Pr * sgv;
                    double ws = w * sgv;
                    for (int64_t e = 0; e <= ea; e++)
                        drow[e * G + g] += ws * (Pr * s.h[(size_t)e] - Qr[e]);
                }
            }
        }
    }
}

}  // namespace

extern "C" {

// Analytic f64 CondCoalRates over a chromosome: [NB, F, E, G] f64
// num/denom, deterministic for any thread count (fixed 4096-tree chunks
// merged in order).  Modern samples only; factors NaN = skip.
void cn_cond_chrom_fast(int64_t T, int64_t M, int64_t N,
                        const int32_t* parent,       // [T, M]
                        const double* blen,          // [T, M]
                        const float* factors,        // [T]; NaN = skip
                        const int32_t* tree_blocks,  // [T]
                        const int32_t* focal, int64_t n_focal,
                        const int32_t* cond, int64_t n_cond,  // may be {-1}
                        const int32_t* group_of_hap,          // [N]
                        int64_t G, const double* epochs, int64_t E,
                        const double* epochs_focal, int64_t F,
                        double* num, double* denom)  // [NB, F, E, G]
{
    const bool cond_empty = (n_cond == 1 && cond[0] == -1);
    std::vector<uint8_t> is_cond((size_t)N, 0);
    if (!cond_empty)
        for (int64_t j = 0; j < n_cond; j++)
            if (cond[j] >= 0 && cond[j] < N) is_cond[(size_t)cond[j]] = 1;
    const int64_t block_sz = F * E * G;
    const int64_t CH = 4096;
    const int64_t n_chunks = (T + CH - 1) / CH;
    // per-chunk touched block range (tree_blocks need not be monotone:
    // scan min/max)
    std::vector<int32_t> blo((size_t)n_chunks), bhi((size_t)n_chunks);
    for (int64_t c = 0; c < n_chunks; c++) {
        int32_t lo = INT32_MAX, hi = -1;
        for (int64_t t = c * CH; t < std::min(T, (c + 1) * CH); t++) {
            if (std::isnan(factors[t])) continue;
            lo = std::min(lo, tree_blocks[t]);
            hi = std::max(hi, tree_blocks[t]);
        }
        blo[(size_t)c] = lo;
        bhi[(size_t)c] = hi;
    }
    std::vector<std::vector<double>> cnum((size_t)n_chunks), cden((size_t)n_chunks);

    auto run_chunk = [&](int64_t c) {
        if (bhi[(size_t)c] < 0) return;
        int64_t nb = bhi[(size_t)c] - blo[(size_t)c] + 1;
        cnum[(size_t)c].assign((size_t)(nb * block_sz), 0.0);
        cden[(size_t)c].assign((size_t)(nb * block_sz), 0.0);
        FastScratch s;
        s.ch.resize((size_t)(2 * M));
        s.P.resize((size_t)F);
        s.Q.resize((size_t)(F * E));
        s.h.resize((size_t)E);
        for (int64_t t = c * CH; t < std::min(T, (c + 1) * CH); t++) {
            float factor = factors[t];
            if (std::isnan(factor)) continue;
            int64_t b = tree_blocks[t] - blo[(size_t)c];
            fast_tree(M, N, parent + t * M, blen + t * M, (double)factor,
                      focal, n_focal, cond, n_cond, cond_empty,
                      is_cond.data(), group_of_hap, G, epochs, E,
                      epochs_focal, F,
                      s, cnum[(size_t)c].data() + b * block_sz,
                      cden[(size_t)c].data() + b * block_sz);
        }
    };

    unsigned hw = std::thread::hardware_concurrency();
    int nt = (int)std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 16), n_chunks);
    if (nt <= 1) {
        for (int64_t c = 0; c < n_chunks; c++) run_chunk(c);
    } else {
        std::vector<std::thread> th;
        for (int w = 0; w < nt; w++)
            th.emplace_back([&, w]() {
                for (int64_t c = w; c < n_chunks; c += nt) run_chunk(c);
            });
        for (auto& x : th) x.join();
    }
    // merge in chunk order (deterministic, thread-count independent)
    for (int64_t c = 0; c < n_chunks; c++) {
        if (bhi[(size_t)c] < 0) continue;
        int64_t nb = bhi[(size_t)c] - blo[(size_t)c] + 1;
        for (int64_t b = 0; b < nb; b++) {
            double* dn = num + (int64_t)(blo[(size_t)c] + b) * block_sz;
            double* dd = denom + (int64_t)(blo[(size_t)c] + b) * block_sz;
            const double* sn = cnum[(size_t)c].data() + b * block_sz;
            const double* sd = cden[(size_t)c].data() + b * block_sz;
            for (int64_t k = 0; k < block_sz; k++) {
                dn[k] += sn[k];
                dd[k] += sd[k];
            }
        }
    }
}

}  // extern "C"
