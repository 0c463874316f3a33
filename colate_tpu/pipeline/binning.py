"""Site-evidence → per-block age-bin histograms.

The reference draws 100 uniform ages per mutation in [age_begin, age_end]
and scatter-adds weights into 185 log-age bins (coal/coal.cpp:2260-2295).
Two implementations:

- :func:`bin_sites_analytic` (default): the *exact expectation* of that
  Monte-Carlo histogram — each site spreads its weight over the bins its
  age interval overlaps, conditional on landing inside the bin table
  (the reference resamples out-of-table draws).  This removes parser
  stochasticity entirely and runs as one dense vectorised pass on the
  TPU (VPU elementwise + segment-sum over blocks); millions of sites per
  second instead of 100 transcendental draws per site.

- :func:`bin_sites_mc_parity`: bit-exact replay of the reference's draw
  sequence (libstdc++ mt19937, see hostrng.py) for golden-file tests.

Semantics shared by both (coal.cpp:2244-2298):
- sites with age_begin <= age (==0 for tmp inputs) route their *shared*
  mass into the empirical matrix row keyed by bin(age_end) and their
  *notshared* mass both into that matrix and into the notshared
  histogram (ages drawn over [0, age_end], draws below `age` clamped);
- other sites add shared and notshared mass at the same sampled-age bin,
  with out-of-table draws rejected and redrawn.

Returns histograms in float64 [num_blocks, num_age_bins] plus the
[num_blocks, num_age_bins] emp matrices (row bin1=0 of the reference's
[bins x bins] matrix — the only row it ever populates: coal.cpp:2249-2256
force age_begin2=0.0 so bin_index1 is always 0).
"""

from __future__ import annotations

import numpy as np

from colate_tpu.config import (
    NUM_AGE_BINS,
    NUM_MC_SAMPLES,
    age_bin_edges,
    bin_of_age,
)
from colate_tpu.hostrng import MT19937
from colate_tpu.pipeline.join import JoinedSites


# Histograms are computed over a fixed padded block axis so the compiled
# kernel is shape-stable across datasets (the reference also allocates a
# fixed 500 blocks, coal.cpp:3141).  Sites are padded to power-of-two
# buckets for the same reason.
MAX_BLOCKS = 512


def _next_bucket(n: int) -> int:
    b = 1024
    while b < n:
        b *= 2
    return b


def bin_sites_analytic_native(sites: JoinedSites, age: float = 0.0):
    """Native (C++) analytic binning: O(sites) range-adds + prefix sums,
    exact f64 (io.cpp:cn_bin_analytic).  Returns None when the native
    library is unavailable; semantics match :func:`bin_sites_analytic`
    (which computes the same expectation in f32 on the device and stays
    the path for mesh-sharded runs)."""
    import ctypes

    from colate_tpu import native
    from colate_tpu.config import AGE_BIN_C

    lib = native.load()
    if lib is None:
        return None
    nb = sites.num_blocks
    n = len(sites)
    nbins = NUM_AGE_BINS
    edges = np.ascontiguousarray(age_bin_edges())
    ab = np.ascontiguousarray(sites.age_begin, np.float64)
    ae = np.ascontiguousarray(sites.age_end, np.float64)
    ws = np.ascontiguousarray(sites.w_shared, np.float64)
    wn = np.ascontiguousarray(sites.w_notshared, np.float64)
    blk = np.ascontiguousarray(sites.block_id, np.int32)
    outs = [np.zeros((max(nb, 1), nbins), np.float64) for _ in range(4)]
    p = lambda a: ctypes.c_void_p(a.ctypes.data)
    lib.cn_bin_analytic(
        n, p(ab), p(ae), p(ws), p(wn), p(blk), max(nb, 1), nbins, p(edges),
        float(age), AGE_BIN_C, *[p(o) for o in outs]
    )
    return tuple(o[:nb] for o in outs)


def bin_sites_analytic(sites: JoinedSites, age: float = 0.0):
    """Expected histograms over the MC sampling (device-friendly math).

    NOTE: tmp-mode parsing forces age=0 (coal.cpp:2073-2074) — `age` is
    accepted for the direct-BCF/BAM parsers which pass the real sample age.
    """
    nb = sites.num_blocks
    if nb > MAX_BLOCKS:
        raise ValueError(f"num_blocks={nb} exceeds MAX_BLOCKS={MAX_BLOCKS}")
    n = len(sites)
    # fixed-size chunks keep the [chunk, 186] intermediates bounded and the
    # compiled kernel shape-stable; small inputs use one snug bucket
    chunk = min(_next_bucket(max(n, 1)), 65536)
    acc = None
    for lo in range(0, max(n, 1), chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        pad = chunk - m
        ab = np.concatenate([sites.age_begin[lo:hi], np.full(pad, 1.0)])
        ae = np.concatenate([sites.age_end[lo:hi], np.full(pad, 2.0)])
        ws = np.concatenate([sites.w_shared[lo:hi], np.zeros(pad)])
        wn = np.concatenate([sites.w_notshared[lo:hi], np.zeros(pad)])
        # zero-weight padding keeps block ids nondecreasing (block_id is
        # globally sorted by construction) so the device segment-sum can
        # use the sorted fast path
        blk = np.concatenate(
            [sites.block_id[lo:hi], np.full(pad, MAX_BLOCKS - 1, np.int32)]
        ).astype(np.int32)
        out = _bin_analytic_jit(ab, ae, ws, wn, blk, MAX_BLOCKS, float(age))
        # accumulate on device (f64): chunks pipeline without host syncs
        if acc is None:
            acc = list(out)
        else:
            acc = [a + o for a, o in zip(acc, out)]
    return tuple(np.asarray(a[:nb]) for a in acc)


def _overlap_probs(a, b, edges):
    """P(U[a,b] in bin k) for each bin: [n, num_bins]; divides by (b-a)."""
    import jax.numpy as jnp

    lo = edges[:-1][None, :]
    hi = edges[1:][None, :]
    a_ = a[:, None]
    b_ = b[:, None]
    width = jnp.maximum(b_ - a_, 1e-300)
    ov = jnp.clip(jnp.minimum(b_, hi) - jnp.maximum(a_, lo), 0.0, None)
    return ov / width


def _make_bin_analytic():
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=(5,), static_argnames=())
    def fn(age_begin, age_end, w_shared, w_notshared, block_id, num_blocks, age):
        # The wide [n, nbins] overlap work runs in f32 (TPU-native; f64 is
        # software-emulated) and the per-chunk [blocks, nbins] reductions
        # are widened to f64 for cross-chunk accumulation.  Analytic mode
        # is an expectation of the reference's 100-draw MC — per-site f32
        # rounding (~1e-7 relative) is far inside that approximation; the
        # bit-exact path is bin_sites_mc_parity.
        edges = jnp.asarray(age_bin_edges())
        nbins = NUM_AGE_BINS
        is_emp = age_begin <= age
        f32 = jnp.float32
        ab32 = age_begin.astype(f32)
        ae32 = age_end.astype(f32)
        edges32 = edges.astype(f32)
        age32 = jnp.asarray(age, f32)

        # --- regular sites: conditional on bin <= nbins-1 (resampling) ---
        # clamp draws below `age` to `age` is only in the emp branch; in the
        # regular branch draws below `age` are rejected (skip=true) and
        # redrawn, so the distribution is U[max(age_begin,age), age_end]
        # conditional on landing in-table.  (For tmp inputs age==0: no-op.)
        a_reg = jnp.maximum(ab32, age32)
        p = _overlap_probs(a_reg, ae32, edges32)  # [n, nbins] f32
        norm = jnp.sum(p, axis=1, keepdims=True)
        p = jnp.where(norm > 0, p / jnp.maximum(norm, f32(1e-30)), f32(0.0))
        w_s = jnp.where(is_emp, 0.0, w_shared).astype(f32)
        w_n_reg = jnp.where(is_emp, 0.0, w_notshared).astype(f32)

        # --- emp sites: T = max(U[age_begin, age_end], age), no resampling.
        # Distribute via the clamped CDF: F_T(e) = cdf_U(e) if e > age else 0,
        # so mass below `age` collapses into the bin containing `age`.
        # (age==0 is the common case: plain uniform over [0, age_end].) ---
        width = jnp.maximum(ae32 - ab32, f32(1e-30))
        cdf_u = jnp.clip(
            (edges32[None, :] - ab32[:, None]) / width[:, None], 0.0, 1.0
        )
        f_t = jnp.where(edges32[None, :] > age32, cdf_u, f32(0.0))
        p_emp = f_t[:, 1:] - f_t[:, :-1]
        # out-of-table mass (beyond the last edge) is clipped into the last
        # bin — the reference would write out of bounds there (see
        # config.bin_of_age); unreachable with realistic ages.
        p_emp = p_emp.at[:, -1].add(1.0 - f_t[:, -1])
        w_n_emp = jnp.where(is_emp, w_notshared, 0.0).astype(f32)

        # --- emp matrices: keyed by bin(age_end), full site weight; the
        # bin index stays f64 (log-edge rounding must match the reference) ---
        bin2 = jnp.clip(
            jnp.where(
                age_end > 0,
                jnp.floor(jnp.log(10.0 * jnp.maximum(age_end, 1e-300)) * 10.0 + 0.5)
                .astype(jnp.int32)
                + 1,
                0,
            ),
            0,
            nbins - 1,
        )
        oh_bin2 = (
            bin2[:, None] == jnp.arange(nbins, dtype=jnp.int32)[None, :]
        ).astype(f32)
        w_se = jnp.where(is_emp, w_shared, 0.0).astype(f32)
        w_ne = jnp.where(is_emp, w_notshared, 0.0).astype(f32)

        # --- one block-one-hot matmul for all four [blocks, nbins]
        # reductions: the contraction over sites runs on the MXU instead
        # of a scatter (block ids are few: MAX_BLOCKS=512) ---
        oh_blk = (
            block_id[:, None] == jnp.arange(num_blocks, dtype=block_id.dtype)[None, :]
        ).astype(f32)
        M = jnp.concatenate(
            [
                p * w_s[:, None],
                p * w_n_reg[:, None] + p_emp * w_n_emp[:, None],
                oh_bin2 * w_se[:, None],
                oh_bin2 * w_ne[:, None],
            ],
            axis=1,
        )  # [n, 4*nbins]
        out = jnp.einsum(
            "nk,nc->kc", oh_blk, M, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.float64)
        shared_hist = out[:, :nbins]
        notshared_hist = out[:, nbins : 2 * nbins]
        shared_emp = out[:, 2 * nbins : 3 * nbins]
        notshared_emp = out[:, 3 * nbins :]
        return shared_hist, notshared_hist, shared_emp, notshared_emp

    return fn


_bin_analytic_cache = None


def _bin_analytic_jit(*args):
    global _bin_analytic_cache
    if _bin_analytic_cache is None:
        _bin_analytic_cache = _make_bin_analytic()
    return _bin_analytic_cache(*args)


def mc_bin_site(
    shared, notshared, shared_emp, notshared_emp,
    blk: int, ab: float, ae: float, ws: float, wn: float,
    rng: MT19937, age: float = 0.0,
    ws_mc: float | None = None, wn_mc: float | None = None,
) -> None:
    """Replay the reference's per-site sampling (coal.cpp:2244-2298) into
    preallocated [>=blk+1, num_age_bins] histograms, consuming `rng` in
    the reference's exact order.

    ws_mc/wn_mc are the per-draw weights in the reference's exact fp
    grouping x*DAF_ref/(N_ref*100.0); they default to ws/100 (one extra
    rounding — only visible under exact cancellation)."""
    nbins = NUM_AGE_BINS
    if ws_mc is None:
        ws_mc = ws / NUM_MC_SAMPLES
    if wn_mc is None:
        wn_mc = wn / NUM_MC_SAMPLES
    if ab <= age:
        bin2 = int(bin_of_age(ae))
        shared_emp[blk, bin2] += ws
        notshared_emp[blk, bin2] += wn
        # 100 unconditional draws over [ab, ae] (ab<=age), clamped up to age
        u = rng.uniform01(NUM_MC_SAMPLES)
        t = u * (ae - ab) + ab
        t = np.maximum(t, age)
        b = bin_of_age(t)
        np.add.at(notshared[blk], b, wn_mc)
    else:
        accepted = 0
        while accepted < NUM_MC_SAMPLES:
            u = rng.uniform01(NUM_MC_SAMPLES - accepted)
            t = u * (ae - ab) + ab
            with np.errstate(divide="ignore"):
                raw_bin = (
                    np.floor(np.log(10.0 * np.maximum(t, 1e-300)) * 10.0 + 0.5)
                ).astype(np.int64) + 1
            raw_bin = np.where(t > 0, np.maximum(raw_bin, 0), 0)
            keep = (t >= age) & (raw_bin < nbins)
            b = raw_bin[keep]
            np.add.at(shared[blk], b, ws_mc)
            np.add.at(notshared[blk], b, wn_mc)
            accepted += int(keep.sum())


def bin_sites_mc_parity(sites: JoinedSites, rng: MT19937, age: float = 0.0):
    """Bit-exact replay of the reference's sampling loop (coal.cpp:2244-2298).

    Draw order: sites in genome order; per site 100 uniforms (with
    rejection-redraw for out-of-table bins in the non-emp branch).
    Returns the same four [num_blocks, num_age_bins] float64 arrays.
    """
    nb = sites.num_blocks
    nbins = NUM_AGE_BINS
    shared = np.zeros((nb, nbins), np.float64)
    notshared = np.zeros((nb, nbins), np.float64)
    shared_emp = np.zeros((nb, nbins), np.float64)
    notshared_emp = np.zeros((nb, nbins), np.float64)

    ws_mc, wn_mc = sites.mc_weights()
    for i in range(len(sites)):
        mc_bin_site(
            shared, notshared, shared_emp, notshared_emp,
            int(sites.block_id[i]), sites.age_begin[i], sites.age_end[i],
            sites.w_shared[i], sites.w_notshared[i], rng, age,
            ws_mc=ws_mc[i], wn_mc=wn_mc[i],
        )
    return shared, notshared, shared_emp, notshared_emp
