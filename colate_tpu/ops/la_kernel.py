"""Device kernel for the local-ancestry estimator (coal_LA).

The reference walks every unordered leaf pair per coalescence event per
tree (coal_tree.cpp:447-527).  Here one chromosome's (tree, segment)
items become a single batched program over [S, K] arrays (K = N-1
internal nodes), mirroring the prefix-function trick of
``ops/tree_kernel.py``:

- subtree leaf-group counts come from one ascending-index scatter pass
  over the parent vector (``lax.fori_loop`` of M-1 [S, G] scatter-adds);
- per internal node u the unordered pair count into sorted group key
  (p >= q) is ``n1[p]·n2[q] + n1[q]·n2[p]`` (off-diagonal) /
  ``n1[p]·n2[p]`` (diagonal) with n1, n2 the children's count vectors —
  P = G(G+1)/2 static keys;
- the per-epoch pair exposure is NOT materialised as a [S, K, E]
  overlap tensor; ``H(t) = Σ_u cnt_u · min(age_u, t)`` is piecewise
  linear with breakpoints at the sorted node ages, so per item we build
  its prefix values (two cumsums) and evaluate at the E epoch edges —
  ``den[e] = H(ep[e+1]) − H(ep[e])``, last (open) epoch 0 by the
  reference sweep's early stop;
- event counts per epoch are differences of the cumulative
  count-weighted mass at the inner edges, with boundary semantics equal
  to the host oracle's ``searchsorted(epochs[1:], age, side='left')``
  clipped to the top epoch (ages at exactly an edge fall in the lower
  epoch; everything above the last edge lands in the open epoch).

Everything accumulates in f64 (golden tests compare rates to the
reference at 1e-5 rtol over ~1e5-item sums).  Items stream through
fixed-size slabs so compile counts stay bounded.
"""

from __future__ import annotations

import functools

import numpy as np

_ITEM_SLAB = 65536  # items per compiled slab


def _slab_bucket(n: int) -> int:
    b = 4096
    while b < n:
        b *= 4
    return min(b, _ITEM_SLAB)


def pair_keys(G: int) -> list[tuple[int, int]]:
    """Sorted group keys (p >= q) in a fixed order shared host/device."""
    return [(p, q) for p in range(G) for q in range(p + 1)]


@functools.lru_cache(maxsize=32)
def _la_fn(S: int, M: int, N: int, G: int, E: int, nseg: int):
    import jax
    import jax.numpy as jnp

    K = N - 1
    keys = pair_keys(G)

    def fn(parent_t, ages, lab, c1, c2, w, blocks, epochs):
        # parent_t [M, S] i32; ages [S, K] f64 internal-node ages;
        # lab [S, N] i32 leaf group labels; c1/c2 [S, K] i32 child rows;
        # w [S] f64 span weights; blocks [S] i32; epochs [E] f64
        C = jnp.zeros((S, M, G), jnp.float64)
        C = C.at[:, :N, :].set(jax.nn.one_hot(lab, G, dtype=jnp.float64))
        rows = jnp.arange(S)

        def body(j, C):
            p = parent_t[j]
            valid = p >= 0
            pc = jnp.where(valid, p, 0)
            add = jnp.where(valid[:, None], C[:, j, :], 0.0)
            return C.at[rows, pc].add(add)

        C = jax.lax.fori_loop(0, M - 1, body, C)
        n1 = jnp.take_along_axis(C, c1[:, :, None], axis=1)  # [S, K, G]
        n2 = jnp.take_along_axis(C, c2[:, :, None], axis=1)
        cols = []
        for p, q in keys:
            if p == q:
                cols.append(n1[:, :, p] * n2[:, :, p])
            else:
                cols.append(n1[:, :, p] * n2[:, :, q] + n1[:, :, q] * n2[:, :, p])
        cnt = jnp.stack(cols, axis=2)  # [S, K, P]
        P = len(keys)

        order = jnp.argsort(ages, axis=1, stable=True)
        sa = jnp.take_along_axis(ages, order, axis=1)  # [S, K]
        scnt = jnp.take_along_axis(cnt, order[:, :, None], axis=1)
        ccnt = jnp.cumsum(scnt, axis=1)  # [S, K, P]
        cA = jnp.cumsum(scnt * sa[:, :, None], axis=1)
        total = ccnt[:, -1, :]  # [S, P]

        if E == 1:
            # single-epoch grid: the one (open) epoch collects every
            # event and accrues no exposure (reference sweep stops at
            # the last edge) — the general concatenation below would
            # build a zero-width middle term and fail to reshape
            num = total[:, None, :]
            den = jnp.zeros((S, 1, P))
        else:
            # mass of ages <= each epoch edge (fused compare-and-count)
            le = jnp.sum(
                sa[:, :, None] <= epochs[None, None, :], axis=1,
                dtype=jnp.int32,
            )  # [S, E]
            idx = jnp.clip(le - 1, 0, K - 1)[:, :, None]
            has = (le > 0)[:, :, None]
            cnt_at = jnp.where(has, jnp.take_along_axis(ccnt, idx, axis=1), 0.0)
            A_at = jnp.where(has, jnp.take_along_axis(cA, idx, axis=1), 0.0)
            # H(t) = Σ cnt·min(age, t)  ->  den[e] = H(ep[e+1]) − H(ep[e])
            H = A_at + epochs[None, :, None] * (total[:, None, :] - cnt_at)
            den = jnp.concatenate(
                [H[:, 1:, :] - H[:, :-1, :], jnp.zeros((S, 1, P))], axis=1
            )  # [S, E, P]; open epoch contributes 0 (reference sweep stops)

            m = cnt_at[:, 1:, :]  # cumulative event mass at epochs[1..E-1]
            num = jnp.concatenate(
                [m[:, :1, :], m[:, 1:, :] - m[:, :-1, :],
                 total[:, None, :] - m[:, -1:, :]],
                axis=1,
            )  # [S, E, P]

        wnum = (num * w[:, None, None]).reshape(S, E * P)
        wden = (den * w[:, None, None]).reshape(S, E * P)
        num_b = jax.ops.segment_sum(wnum, blocks, num_segments=nseg)
        den_b = jax.ops.segment_sum(wden, blocks, num_segments=nseg)
        return num_b.reshape(nseg, E, P), den_b.reshape(nseg, E, P)

    return jax.jit(fn)


def la_accumulate_device(
    parent: np.ndarray,
    ages: np.ndarray,
    lab: np.ndarray,
    c1: np.ndarray,
    c2: np.ndarray,
    w: np.ndarray,
    blocks: np.ndarray,
    epochs: np.ndarray,
    num_groups: int,
    num_blocks: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched coal_LA accumulation on the default JAX backend.

    parent: [S, 2N-1] i32; ages: [S, N-1] f64 internal-node ages;
    lab: [S, N] i32 leaf groups; c1/c2: [S, N-1] i32 children of each
    internal node; w: [S] f64 item weights (span·frac/1e9); blocks: [S]
    block ids in [0, num_blocks).  Returns ([nb, E, P], [nb, E, P]) f64
    with P = G(G+1)/2 keys in ``pair_keys`` order.
    """
    from colate_tpu import enable_compilation_cache, enable_x64

    enable_x64()
    enable_compilation_cache()
    Sn, M = parent.shape
    N = (M + 1) // 2
    E = epochs.shape[0]
    P = len(pair_keys(num_groups))
    nseg = max(int(num_blocks), 1)
    num = np.zeros((nseg, E, P), np.float64)
    den = np.zeros((nseg, E, P), np.float64)
    ep = np.asarray(epochs, np.float64)
    i = 0
    while i < Sn:
        n = min(_ITEM_SLAB, Sn - i)
        S = _slab_bucket(n)
        pt = np.full((S, M), -1, np.int32)
        pt[:n] = parent[i : i + n]
        ag = np.zeros((S, N - 1), np.float64)
        ag[:n] = ages[i : i + n]
        lb = np.zeros((S, N), np.int32)
        lb[:n] = lab[i : i + n]
        cc1 = np.zeros((S, N - 1), np.int32)
        cc1[:n] = c1[i : i + n]
        cc2 = np.zeros((S, N - 1), np.int32)
        cc2[:n] = c2[i : i + n]
        ww = np.zeros(S, np.float64)
        ww[:n] = w[i : i + n]  # zero weight => padded rows contribute 0
        bb = np.zeros(S, np.int32)
        bb[:n] = blocks[i : i + n]
        fn = _la_fn(S, M, N, num_groups, E, nseg)
        num_d, den_d = fn(
            np.ascontiguousarray(pt.T), ag, lb, cc1, cc2, ww, bb, ep
        )
        num += np.asarray(num_d)
        den += np.asarray(den_d)
        i += n
    return num, den


def la_accumulate_native(
    parent: np.ndarray,
    ages: np.ndarray,
    lab: np.ndarray,
    c1: np.ndarray,
    c2: np.ndarray,
    w: np.ndarray,
    blocks: np.ndarray,
    epochs: np.ndarray,
    num_groups: int,
    num_blocks: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """C++ twin (native/la.cpp): no multi-MB temporaries, threaded over
    items — the one-shot host fast path.  Returns None if the native
    library is unavailable (callers fall back to the NumPy twin).

    ``COLATE_LA_THREADS=<n>`` pins the thread count (the per-thread
    partials are merged in thread order, so a fixed count fixes the f64
    reduction order — byte-reproducible goldens across machines with
    different core counts)."""
    import os

    from colate_tpu import native

    lib = native.load()
    if lib is None:
        return None
    import ctypes

    try:
        nthreads = int(os.environ.get("COLATE_LA_THREADS", "0"))
    except ValueError:
        nthreads = 0

    S, M = parent.shape
    N = (M + 1) // 2
    E = epochs.shape[0]
    Pk = len(pair_keys(num_groups))
    nseg = max(int(num_blocks), 1)
    num = np.zeros((nseg, E, Pk), np.float64)
    den = np.zeros((nseg, E, Pk), np.float64)
    if S == 0:
        return num, den
    c = np.ascontiguousarray
    pp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    pa = c(parent, dtype=np.int32)
    ag = c(ages, dtype=np.float64)
    lb = c(lab, dtype=np.int32)
    cc1 = c(c1, dtype=np.int32)
    cc2 = c(c2, dtype=np.int32)
    ww = c(w, dtype=np.float64)
    bb = c(blocks, dtype=np.int32)
    ep = c(epochs, dtype=np.float64)
    lib.cn_la_accumulate(
        S, M, N, num_groups, E, pp(pa), pp(ag), pp(lb), pp(cc1), pp(cc2),
        pp(ww), pp(bb), pp(ep), nseg, nthreads, pp(num), pp(den),
    )
    return num, den


def la_accumulate_host(
    parent: np.ndarray,
    ages: np.ndarray,
    lab: np.ndarray,
    c1: np.ndarray,
    c2: np.ndarray,
    w: np.ndarray,
    blocks: np.ndarray,
    epochs: np.ndarray,
    num_groups: int,
    num_blocks: int,
) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin of :func:`la_accumulate_device` (same math, same
    [nb, E, P] layout) — the host fast path and the kernel's oracle.

    Items stream through bounded chunks (~1<<24 scratch elements) so
    peak memory stays flat regardless of chromosome length — this is
    the auto-dispatch fallback when the native library is missing, and
    must not regress the native path's bounded-RSS property."""
    Sn, M = parent.shape
    N = (M + 1) // 2
    K = N - 1
    E = epochs.shape[0]
    G = num_groups
    keys = pair_keys(G)
    P = len(keys)
    nseg = max(int(num_blocks), 1)
    num = np.zeros((nseg, E, P), np.float64)
    den = np.zeros((nseg, E, P), np.float64)
    if Sn == 0:
        return num, den
    # the largest per-item temporaries are [S, M, G] and [S, K, E·P]
    chunk = max(1, (1 << 24) // max(M * G, K * max(E * P, G * 2), 1))

    for i0 in range(0, Sn, chunk):
        sl = slice(i0, min(i0 + chunk, Sn))
        par_c, ages_c, lab_c = parent[sl], ages[sl], lab[sl]
        c1_c, c2_c, w_c, blk_c = c1[sl], c2[sl], w[sl], blocks[sl]
        S = par_c.shape[0]

        C = np.zeros((S, M, G), np.float64)
        C[np.arange(S)[:, None], np.arange(N)[None, :], lab_c] = 1.0
        rows = np.arange(S)
        for j in range(M - 1):
            p = par_c[:, j]
            v = p >= 0
            # one write per row per level (parents are unique within a
            # row), so plain fancy-index += is safe and much faster
            # than add.at
            C[rows[v], p[v]] += C[v, j]
        n1 = C[rows[:, None], c1_c]  # [S, K, G]
        n2 = C[rows[:, None], c2_c]
        cnt = np.empty((S, K, P), np.float64)
        for ki, (p, q) in enumerate(keys):
            if p == q:
                cnt[:, :, ki] = n1[:, :, p] * n2[:, :, p]
            else:
                cnt[:, :, ki] = (
                    n1[:, :, p] * n2[:, :, q] + n1[:, :, q] * n2[:, :, p]
                )

        order = np.argsort(ages_c, axis=1, kind="stable")
        sa = np.take_along_axis(ages_c, order, axis=1)
        scnt = np.take_along_axis(cnt, order[:, :, None], axis=1)
        ccnt = np.cumsum(scnt, axis=1)
        cA = np.cumsum(scnt * sa[:, :, None], axis=1)
        total = ccnt[:, -1, :]

        if E == 1:
            # single (open) epoch: all events, no exposure — see _la_fn
            num_i = total[:, None, :]
            den_i = np.zeros((S, 1, P))
        else:
            le = (sa[:, :, None] <= epochs[None, None, :]).sum(axis=1)
            idx = np.clip(le - 1, 0, K - 1)[:, :, None]
            has = (le > 0)[:, :, None]
            cnt_at = np.where(
                has, np.take_along_axis(ccnt, idx, axis=1), 0.0
            )
            A_at = np.where(has, np.take_along_axis(cA, idx, axis=1), 0.0)
            H = A_at + epochs[None, :, None] * (total[:, None, :] - cnt_at)
            den_i = np.concatenate(
                [H[:, 1:, :] - H[:, :-1, :], np.zeros((S, 1, P))], axis=1
            )
            m = cnt_at[:, 1:, :]
            num_i = np.concatenate(
                [m[:, :1, :], m[:, 1:, :] - m[:, :-1, :],
                 total[:, None, :] - m[:, -1:, :]],
                axis=1,
            )
        wnum = (num_i * w_c[:, None, None]).reshape(S, E * P)
        wden = (den_i * w_c[:, None, None]).reshape(S, E * P)
        if np.all(blk_c[1:] >= blk_c[:-1]):
            # blocks follow tree order (nondecreasing): one reduceat pass
            present = np.unique(blk_c)
            starts = np.searchsorted(blk_c, present, side="left")
            num[present] += np.add.reduceat(wnum, starts, axis=0).reshape(
                present.size, E, P
            )
            den[present] += np.add.reduceat(wden, starts, axis=0).reshape(
                present.size, E, P
            )
        else:
            np.add.at(num, blk_c, wnum.reshape(S, E, P))
            np.add.at(den, blk_c, wden.reshape(S, E, P))
    return num, den
