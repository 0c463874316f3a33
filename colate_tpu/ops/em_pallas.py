"""Fused Pallas TPU kernel for the batched EM iteration (f32 path).

The device EM (ops/em.py:run_em) evaluates, per iteration, the point-age
E-step over all 185 age bins for every bootstrap replicate — the
reference's two hot calls per bin (coal/coal.cpp:3704-3733,
coal_EM.cpp:153-468) batched as [B, nbins, E] tensors.  Under plain XLA
that layout puts the epoch axis (E≈23) on the 128-lane dimension, so
every VPU op wastes >80% of its lanes and each of the ~10 intermediates
makes an HBM round trip per iteration.

This kernel flips the layout — bootstraps on lanes, epochs on sublanes,
bins chunked on the leading axis — and fuses K whole EM iterations
(E-step, count-weighted reduction, M-step) into one ``pallas_call``:

- grid over 128-replicate tiles; per tile everything lives in VMEM for
  all K iterations (HBM traffic = rates in/out + counts once);
- rate-dependent per-bin gathers (λ_k, H_k, 1/λ_k) become [C,E]×[E,128]
  one-hot matmuls on the MXU;
- the suffix sums the linear-space E-step needs (ops/em.py:115-121) and
  the cumulative hazard use log2(E)-step Hillis-Steele doubling on the
  sublane axis (no serial scan, no gather);
- the M-step's num==0 fill-forward cascade (coal.cpp:3775-3815) is a
  masked forward-fill by the same doubling trick.

Numerics match ops/em.py's f32 path op-for-op (same guards, same
clips); the per-bin log-likelihood terms are returned to the caller,
which accumulates them in f64 exactly as run_em's einsum does, so the
stopping rule sees the same values.  Bit-exactness with the XLA path is
not guaranteed (different reduction orders); equality is pinned to the
f32 contract tolerances in tests/test_em_pallas.py.

f64 is not available inside Mosaic kernels, so this is strictly the
float32 backend; f64/parity runs keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from colate_tpu.config import (
    COAL_RATE_FLOOR,
    EM_CONV_RATIO,
    EM_MAX_ITER,
    EM_MIN_ITER,
    age_bin_centers,
)

_LANES = 128  # bootstrap tile width (VPU lane count)
_BIN_CHUNK = 37  # 185 = 5 x 37; bounds the [C, E, 128] VMEM temporaries


def _one_minus_exp_neg(x):
    """1 - exp(-x) for x >= 0, f32-accurate near 0.

    Mosaic has no expm1 lowering; the naive 1-exp(-x) loses ~eps/x
    relative accuracy for small x, so switch to a 5-term alternating
    Taylor series below 0.1 (truncation < 1.4e-8 rel there, the direct
    form is < 1.2e-6 rel above)."""
    xs = jnp.minimum(x, 0.1)
    taylor = xs * (
        1.0 - xs / 2.0 * (1.0 - xs / 3.0 * (1.0 - xs / 4.0 * (1.0 - xs / 5.0)))
    )
    return jnp.where(x < 0.1, taylor, 1.0 - jnp.exp(-x))


def _shift_up(x, shift, axis):
    """x[..., e, ...] -> x[..., e+shift, ...] (zero fill past the end)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, shift)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(shift, None)
    return jnp.pad(x[tuple(sl)], pad)


def _shift_down(x, shift, axis):
    """x[..., e, ...] -> x[..., e-shift, ...] (zero fill before start)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (shift, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(None, -shift)
    return jnp.pad(x[tuple(sl)], pad)


def _suffix_sum(x, axis):
    """Inclusive suffix sum along ``axis`` via Hillis-Steele doubling
    (static log2(E) adds; Mosaic has no native sublane scan)."""
    n = x.shape[axis]
    s = x
    shift = 1
    while shift < n:
        s = s + _shift_up(s, shift, axis)
        shift *= 2
    return s


def _prefix_sum_exclusive(x, axis):
    n = x.shape[axis]
    s = x
    shift = 1
    while shift < n:
        s = s + _shift_down(s, shift, axis)
        shift *= 2
    return s - x


def _forward_fill(chosen, has, axis):
    """chosen at the last index f<=e with has[f], else 0 — the M-step's
    num==0 cascade (ops/em.py:_m_step) without the cummax+gather."""
    n = chosen.shape[axis]
    val = jnp.where(has, chosen, 0.0)
    ok = has
    shift = 1
    while shift < n:
        val = jnp.where(ok, val, _shift_down(val, shift, axis))
        ok = ok | (_shift_down(ok.astype(jnp.float32), shift, axis) > 0)
        shift *= 2
    return jnp.where(ok, val, 0.0)


def _epoch_tables_t(lam, epochs_col, dt_col, epochs_next_col, is_last_col):
    """Transposed-layout epoch tables (ops/em.py:_epoch_tables): all
    inputs/outputs [E, Bt] (lam) or [E, 1] (per-epoch constants)."""
    dH = lam * dt_col  # last row: dt=0 -> 0
    H = _prefix_sum_exclusive(dH, axis=0)
    S = jnp.exp(-H)
    em1 = _one_minus_exp_neg(dH)
    pos = lam > 0
    inv_lam = jnp.where(pos, 1.0 / jnp.where(pos, lam, 1.0), 0.0)
    P = jnp.where(is_last_col > 0, jnp.where(pos, S, 0.0), S * em1)
    T1_body = S * ((epochs_next_col + inv_lam) * em1 - dt_col)
    T1_last = (epochs_col + inv_lam) * S  # epochs_col row E-1 = epochs[-1]
    T1 = jnp.where(is_last_col > 0, T1_last, T1_body)
    T1 = jnp.where(pos, T1, 0.0)
    em1_full = jnp.where(is_last_col > 0, 1.0, em1)
    return lam, H, S, P, T1, inv_lam, em1_full


def _make_kernel(E: int, N: int, K: int, C: int):
    import jax.experimental.pallas as pl

    n_chunks = N // C
    assert n_chunks * C == N

    def kernel(
        rates_ref,      # [E, Bt] in
        sc_ref,         # [N, Bt]
        nc_ref,         # [N, Bt]
        t_ref,          # [N, 1]
        tmk_ref,        # [N, 1] t - epochs[k]
        tk1_ref,        # [N, 1] epochs[min(k+1, E-1)]
        klt_ref,        # [N, 1] 1.0 where k < E-1
        onehot_ref,     # [N, E]
        m_lt_ref,       # [N, E]
        m_eq_ref,       # [N, E]
        m_le_ref,       # [N, E]
        m_gt_ref,       # [N, E]
        epochs_ref,     # [E, 1]
        dt_ref,         # [E, 1] epoch widths, 0 for the open last epoch
        enext_ref,      # [E, 1] epochs[e+1], 0 at the last epoch
        islast_ref,     # [E, 1] 1.0 at e == E-1
        rates_out_ref,  # [E, Bt] out
        wsum_ref,       # [N, Bt] out: per-bin weighted logl terms
    ):
        epochs_col = epochs_ref[:]
        dt_col = dt_ref[:]
        enext_col = enext_ref[:]
        islast_col = islast_ref[:]
        ep3 = epochs_col[None, :, :]    # [1, E, 1]
        dt3 = dt_col[None, :, :]
        enext3 = enext_col[None, :, :]
        islast3 = islast_col[None, :, :]

        def e_step_chunk(c, tabs):
            lam, H, S, P, T1, inv_lam, em1_full = tabs
            # c is i32 (the chunk fori_loop uses i32 bounds) and C is a
            # weak-typed Python int, so the offset stays i32 under x64;
            # mixed i32*i64 here is rejected by Mosaic
            sl = pl.ds(c * C, C)
            onehot = onehot_ref[sl, :]          # [C, E]
            m_lt = m_lt_ref[sl, :][:, :, None]  # [C, E, 1]
            m_eq = m_eq_ref[sl, :][:, :, None]
            m_le = m_le_ref[sl, :][:, :, None]
            m_gt = m_gt_ref[sl, :][:, :, None]
            t_c = t_ref[sl, :]                  # [C, 1]
            tmk_c = tmk_ref[sl, :]
            tk1_c = tk1_ref[sl, :]
            klt_c = klt_ref[sl, :]
            sc_c = sc_ref[sl, :]                # [C, Bt]
            nc_c = nc_ref[sl, :]

            # HIGHEST precision: these matmuls are one-hot gathers of f32
            # epoch tables — default TPU matmul precision truncates the
            # operands to bf16 (8 mantissa bits, ~0.4% error on the
            # gathered rates), which compounds over 1000+ EM iterations
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            lam_k = dot(onehot, lam)            # [C, Bt]
            H_k = dot(onehot, H)
            inv_lam_k = dot(onehot, inv_lam)
            S_k = jnp.exp(-H_k)
            lam_k_pos = lam_k > 0

            # ---------- shared: T < t (ops/em.py:103-129) ----------
            dH_lo = lam_k * tmk_c
            H_t = H_k + dH_lo
            em1_lo = _one_minus_exp_neg(dH_lo)
            Pk_minus = S_k * em1_lo
            T1k_minus = jnp.where(
                lam_k_pos,
                S_k * ((t_c + inv_lam_k) * em1_lo - tmk_c),
                0.0,
            )
            num_lin = P[None, :, :] * m_lt + Pk_minus[:, None, :] * m_eq
            T1v = T1[None, :, :] * m_lt + T1k_minus[:, None, :] * m_eq
            Z_s = _one_minus_exp_neg(H_t)
            guard_s = Z_s > 0
            zinv = jnp.where(guard_s, 1.0 / jnp.where(guard_s, Z_s, 1.0), 0.0)
            zinv3 = zinv[:, None, :]
            post = num_lin * zinv3
            texp = T1v * zinv3
            integ = (_suffix_sum(num_lin, 1) - num_lin) * zinv3
            den = texp - ep3 * post + dt3 * integ
            den = jnp.where(m_le > 0, den, 0.0)
            den = jnp.clip(den, 0.0, None)
            g3 = guard_s[:, None, :]
            num_s = jnp.where(g3, post, 0.0)
            den_s = jnp.where(g3, den, 0.0)

            # ---------- notshared: T > t (ops/em.py:131-188) ----------
            dH_hi = jnp.where(klt_c > 0, lam_k * (tk1_c - t_c), 0.0)
            em1_hi = _one_minus_exp_neg(dH_hi)
            G = H[None, :, :] - H_t[:, None, :]
            Srel = jnp.exp(-jnp.where(m_gt > 0, G, 0.0))
            lam3 = lam[None, :, :]
            lam3_pos = lam3 > 0
            P_rel = jnp.where(
                islast3 > 0,
                jnp.where(lam3_pos, Srel, 0.0),
                Srel * em1_full[None, :, :],
            )
            T1_rel_body = Srel * (
                (enext3 + inv_lam[None, :, :]) * em1_full[None, :, :] - dt3
            )
            T1_rel_last = (ep3 + inv_lam[None, :, :]) * Srel
            T1_rel = jnp.where(islast3 > 0, T1_rel_last, T1_rel_body)
            T1_rel = jnp.where(lam3_pos, T1_rel, 0.0)

            Pk_plus = jnp.where(
                klt_c > 0, em1_hi, jnp.where(lam_k_pos, 1.0, 0.0)
            )
            T1k_plus = jnp.where(
                klt_c > 0,
                jnp.where(
                    lam_k_pos,
                    (tk1_c + inv_lam_k) * em1_hi - (tk1_c - t_c),
                    0.0,
                ),
                jnp.where(lam_k_pos, t_c + inv_lam_k, 0.0),
            )
            raw_n = Pk_plus[:, None, :] * m_eq + P_rel * m_gt
            raw_t = T1k_plus[:, None, :] * m_eq + T1_rel * m_gt
            zrel = jnp.sum(raw_n, axis=1)
            guard_n = zrel > 0
            zrel_inv = jnp.where(
                guard_n, 1.0 / jnp.where(guard_n, zrel, 1.0), 0.0
            )
            zi3 = zrel_inv[:, None, :]
            post_n = raw_n * zi3
            texp_n = raw_t * zi3
            integ_n = (_suffix_sum(raw_n, 1) - raw_n) * zi3
            den_n = texp_n - ep3 * post_n + dt3 * integ_n
            den_n = jnp.clip(den_n, 0.0, None)
            gn3 = guard_n[:, None, :]
            num_n = jnp.where(gn3, post_n, 0.0)
            den_n = jnp.where(gn3, den_n, 0.0)

            # count-weighted reduction over this chunk's bins -> [E, Bt]
            num_c = jnp.sum(
                sc_c[:, None, :] * num_s + nc_c[:, None, :] * num_n, axis=0
            )
            den_c = jnp.sum(
                sc_c[:, None, :] * den_s + nc_c[:, None, :] * den_n, axis=0
            )
            # per-bin weighted logl terms, overwritten every iteration —
            # after the loop the buffer holds the K-th E-step's values
            # (the stopping rule reads only the final iteration's logl)
            logl_s = jnp.where(
                guard_s, jnp.log(jnp.where(guard_s, Z_s, 1.0)), 0.0
            )
            logl_n = jnp.where(
                guard_n,
                jnp.log(jnp.where(guard_n, zrel, 1.0)) - H_t,
                0.0,
            )
            wsum_ref[sl, :] = sc_c * logl_s + nc_c * logl_n
            return num_c, den_c

        def m_step(rates, num_tot, den_tot):
            # reference rate update, transposed (ops/em.py:_m_step)
            den_pos = den_tot > 0
            ratio = jnp.where(
                den_pos, num_tot / jnp.where(den_pos, den_tot, 1.0), 0.0
            )
            ratio = jnp.maximum(ratio, COAL_RATE_FLOOR)
            chosen = jnp.where(den_pos, ratio, rates)
            return _forward_fill(chosen, num_tot != 0, axis=0)

        def iteration(_, rates):
            tabs = _epoch_tables_t(
                rates, epochs_col, dt_col, enext_col, islast_col
            )

            def chunk_body(c, acc):
                num_tot, den_tot = acc
                num_c, den_c = e_step_chunk(c, tabs)
                return num_tot + num_c, den_tot + den_c

            zero = jnp.zeros(rates.shape, jnp.float32)
            num_tot, den_tot = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_chunks), chunk_body, (zero, zero)
            )
            return m_step(rates, num_tot, den_tot)

        rates_out_ref[:] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(K), iteration, rates_ref[:]
        )

    return kernel


@functools.lru_cache(maxsize=8)
def _bin_constants(epochs_key: bytes, E: int):
    """Rate-independent per-bin constants (fixed across EM iterations)."""
    epochs = np.frombuffer(epochs_key, np.float64)
    t = age_bin_centers()
    N = t.shape[0]
    k = np.clip(np.searchsorted(epochs, t, side="right") - 1, 0, E - 1)
    e_idx = np.arange(E)
    m_lt = (e_idx[None, :] < k[:, None]).astype(np.float32)
    m_eq = (e_idx[None, :] == k[:, None]).astype(np.float32)
    onehot = m_eq.copy()
    m_le = m_lt + m_eq
    m_gt = (e_idx[None, :] > k[:, None]).astype(np.float32)
    dt = np.append(np.diff(epochs), 0.0)
    enext = np.append(epochs[1:], 0.0)
    islast = (e_idx == E - 1).astype(np.float32)
    f32c = lambda a: jnp.asarray(
        np.asarray(a, np.float32).reshape(-1, 1)
    )
    return dict(
        t=f32c(t),
        tmk=f32c(t - epochs[k]),
        tk1=f32c(epochs[np.minimum(k + 1, E - 1)]),
        klt=f32c((k < E - 1).astype(np.float32)),
        onehot=jnp.asarray(onehot),
        m_lt=jnp.asarray(m_lt),
        m_eq=jnp.asarray(m_eq),
        m_le=jnp.asarray(m_le),
        m_gt=jnp.asarray(m_gt),
        epochs=f32c(epochs),
        dt=f32c(dt),
        enext=f32c(enext),
        islast=f32c(islast),
        N=N,
    )


def _pallas_step(epochs_key: bytes, E: int, Bp: int, K: int, interpret: bool):
    """One fused K-iteration EM step over padded transposed arrays.

    Returns f(rates_T [E,Bp] f32, sc_p [N,Bp] f32, nc_p [N,Bp] f32) ->
    (rates_T' [E,Bp] f32, wsum [N,Bp] f32 per-bin logl terms of the K-th
    E-step).  Constants are baked from the static epoch grid.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cst = _bin_constants(epochs_key, E)
    N = cst["N"]
    C = _BIN_CHUNK if N % _BIN_CHUNK == 0 else N
    grid = (Bp // _LANES,)
    tile = lambda rows: pl.BlockSpec(
        (rows, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    const = lambda rows, cols: pl.BlockSpec(
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_kernel(E, N, int(K), C)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(E),            # rates
            tile(N),            # sc
            tile(N),            # nc
            const(N, 1),        # t
            const(N, 1),        # tmk
            const(N, 1),        # tk1
            const(N, 1),        # klt
            const(N, E),        # onehot
            const(N, E),        # m_lt
            const(N, E),        # m_eq
            const(N, E),        # m_le
            const(N, E),        # m_gt
            const(E, 1),        # epochs
            const(E, 1),        # dt
            const(E, 1),        # enext
            const(E, 1),        # islast
        ],
        out_specs=[tile(E), tile(N)],
        out_shape=[
            jax.ShapeDtypeStruct((E, Bp), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp), jnp.float32),
        ],
        interpret=interpret,
    )

    def step(rates_T, sc_p, nc_p):
        # trace/lower the kernel with x64 disabled: under jax_enable_x64
        # the grid index maps come out i64 and Mosaic aborts on any
        # >32-bit layout (reproduced with a trivial gridded kernel on
        # this platform); every tensor here is f32 regardless
        with jax.enable_x64(False):
            return call(
                rates_T, sc_p, nc_p,
                cst["t"], cst["tmk"], cst["tk1"], cst["klt"],
                cst["onehot"], cst["m_lt"], cst["m_eq"], cst["m_le"],
                cst["m_gt"],
                cst["epochs"], cst["dt"], cst["enext"], cst["islast"],
            )

    return step, N


def _pad_width(B: int) -> int:
    return max(_LANES, ((B + _LANES - 1) // _LANES) * _LANES)


def em_chunk_pallas(epochs, rates, sc_T, nc_T, K: int, interpret: bool = False):
    """K fused EM iterations on a [B]-batch (f32, TPU Pallas).

    epochs: np.ndarray [E] f64 (static per run — hashed for constants);
    rates [B, E] f32; sc_T/nc_T [N, B] f32 (bin-major count layout).
    Returns (rates_after_K [B, E] f32, ll [B] f64) where ll is the
    log-likelihood surface evaluated during the K-th iteration's E-step,
    matching ops/em.py:run_em's chunked stopping rule.
    """
    epochs = np.asarray(epochs, np.float64)
    E = int(epochs.shape[0])
    B = rates.shape[0]
    Bp = _pad_width(B)
    step, _ = _pallas_step(epochs.tobytes(), E, Bp, int(K), interpret)
    padB = lambda a: (
        jnp.pad(a, ((0, 0), (0, Bp - B))) if Bp != B else a
    )
    rates_out, wsum = step(
        padB(rates.astype(jnp.float32).T),
        padB(sc_T.astype(jnp.float32)),
        padB(nc_T.astype(jnp.float32)),
    )
    # f64 accumulation of the f32 per-bin terms — same precision contract
    # as run_em's preferred_element_type=f64 einsum (ops/em.py:481-483)
    ll = jnp.sum(wsum[:, :B].astype(jnp.float64), axis=0)
    return rates_out[:, :B].T, ll


def make_run_fn(
    epochs_key: bytes,
    E: int,
    Bp: int,
    K: int,
    max_iter: int,
    min_iter: int,
    interpret: bool,
):
    """Traceable EM-to-convergence loop around the fused Pallas step.

    Mirrors ops/em.py:run_em's chunked stopping rule exactly: per-chunk
    convergence ratio 1 - K*(1-EM_CONV_RATIO), replicate freezing, f64
    log-likelihood accumulation (coal.cpp:3686-3825 semantics).

    Returns run(rates_T [E,Bp] f32, sc_p [N,Bp] f32, nc_p [N,Bp] f32,
    conv0 [Bp] bool) -> (rates_T [E,Bp] f32, ll [Bp] f64, iters [Bp]
    i32).  Not jitted — usable directly inside shard_map (each device
    runs the kernel on its local bootstrap shard; see
    parallel/mesh.py:sharded_run_em)."""
    step, _N = _pallas_step(epochs_key, E, Bp, K, interpret)
    conv_ratio = 1.0 - K * (1.0 - EM_CONV_RATIO)

    def run(rates_T, sc_p, nc_p, conv0):
        f64 = jnp.float64
        zero_b = jnp.zeros((Bp,), f64)

        def cond(state):
            it, rates, ll_prev, conv, iters = state
            return (it < max_iter) & ~jnp.all(conv)

        def body(state):
            it, rates, ll_prev, conv, iters = state
            new_rates, wsum = step(rates, sc_p, nc_p)
            ll = jnp.sum(wsum.astype(f64), axis=0)
            ratio = ll / ll_prev
            newly = (ratio > conv_ratio) & (it + K - 1 > min_iter)
            rates = jnp.where(conv[None, :], rates, new_rates)
            ll_out = jnp.where(conv, ll_prev, ll)
            iters = jnp.where(conv, iters, it + K)
            return (it + K, rates, ll_out, conv | newly, iters)

        state0 = (
            jnp.zeros((), jnp.int32),
            rates_T,
            zero_b - jnp.inf,
            conv0,
            jnp.zeros((Bp,), jnp.int32),
        )
        it, rates, ll, conv, iters = jax.lax.while_loop(cond, body, state0)
        return rates, ll, iters

    return run


@functools.lru_cache(maxsize=8)
def _run_em_pallas_jit(
    epochs_key: bytes,
    E: int,
    Bp: int,
    K: int,
    max_iter: int,
    min_iter: int,
    interpret: bool,
):
    """Jit-compiled single-device entry around :func:`make_run_fn`."""
    return jax.jit(
        make_run_fn(epochs_key, E, Bp, K, max_iter, min_iter, interpret)
    )


def run_em_pallas(
    epochs,
    init_rates,
    shared_counts,
    notshared_counts,
    max_iter: int = EM_MAX_ITER,
    min_iter: int = EM_MIN_ITER,
    check_every: int = 8,
    interpret: bool = False,
):
    """EM to convergence on the fused Pallas backend (f32 E-step).

    Drop-in for ops/em.py:run_em(dtype="float32", check_every=K) with the
    same stopping rule and freezing semantics; returns (rates [B,E] in
    epochs' dtype, logl [B] f64, iters [B] i32).  The per-iteration math
    satisfies the same f32 accuracy contract (tests/test_em_f32.py);
    reduction order differs from the XLA path so results are close, not
    bit-equal (pinned in tests/test_em_pallas.py)."""
    epochs = np.asarray(epochs, np.float64)
    E = int(epochs.shape[0])
    sc = np.asarray(shared_counts, np.float32)
    nc = np.asarray(notshared_counts, np.float32)
    B = sc.shape[0]
    Bp = _pad_width(B)
    run = _run_em_pallas_jit(
        epochs.tobytes(), E, Bp, int(check_every),
        int(max_iter), int(min_iter), bool(interpret),
    )
    padB = lambda a: (
        np.pad(a, ((0, 0), (0, Bp - B))) if Bp != B else a
    )
    rates_T = jnp.asarray(
        padB(np.broadcast_to(
            np.asarray(init_rates, np.float32)[:, None], (E, B)
        ).copy())
    )
    # padding lanes carry zero counts -> logl stays 0 and the ratio rule
    # never fires for them; mark them converged up front
    conv0 = jnp.asarray(np.arange(Bp) >= B)
    rates, ll, iters = run(
        rates_T, jnp.asarray(padB(sc.T)), jnp.asarray(padB(nc.T)), conv0
    )
    return (
        jnp.asarray(rates[:, :B].T, dtype=np.asarray(epochs).dtype),
        ll[:B],
        iters[:B],
    )
