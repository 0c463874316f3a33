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
