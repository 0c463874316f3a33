"""Exact piecewise EM E-step oracle (arbitrary precision, mpmath).

Independent re-derivation of the quantities the reference's
``coal_EM::EM_shared`` / ``EM_notshared`` compute (coal_EM.cpp:153-468),
playing the role of its ``coal_EM_simplified`` test oracle
(coal_EM_old.cpp, swept in test_aDNA.cpp:68-212) but exact for
*piecewise* rates and *interval* ages, not just constant rates at point
ages.

Model: mutation age t ~ U[a, b] (a == b: point age); coalescence time T
piecewise-exponential with epochs t_0=0 < ... < t_{E-1} (last open) and
rates λ_e > 0.  Event = {T < t} (shared) or {T > t} (not shared).

    Z       = P(event) = ∫ f(T)·w(T) dT
    num[e]  = P(T ∈ epoch e | event)
    den[e]  = E[(min(T, t_{e+1}) - t_e)^+ | event]   (t_E = ∞)
    logl    = log Z

where w(T) = P(t > T) (shared) or P(t < T) (not shared) under the
uniform age prior — piecewise linear in T.  All pieces are delimited by
epoch edges and {a, b}, so every integral is ∫ poly(T)·λ e^{-H(T)} dT
over a smooth piece, evaluated in closed form with mpmath.
"""

from __future__ import annotations

import mpmath as mp


def _piece_moments(lam, Hlo, lo, hi):
    """(I0, I1, I2): ∫ T^k f(T) dT over [lo, hi] with f = λ e^{-H(T)},
    H(T) = Hlo + λ(T - lo).  hi may be mp.inf."""
    Slo = mp.e ** (-Hlo)
    if hi == mp.inf:
        Shi = mp.mpf(0)
        hi_t = mp.mpf(0)  # terms with Shi vanish
    else:
        Shi = mp.e ** (-(Hlo + lam * (hi - lo)))
        hi_t = hi
    inv = 1 / lam
    i0 = Slo - Shi
    i1 = (lo + inv) * Slo - (hi_t + inv) * Shi
    i2 = (lo * lo + 2 * lo * inv + 2 * inv * inv) * Slo - (
        hi_t * hi_t + 2 * hi_t * inv + 2 * inv * inv
    ) * Shi
    return i0, i1, i2


def em_oracle(epochs, rates, a, b, shared: bool, dps: int = 60):
    """Returns (num[E], den[E], logl) as Python floats."""
    with mp.workdps(dps):
        epochs = [mp.mpf(x) for x in epochs]
        rates = [mp.mpf(x) for x in rates]
        a = mp.mpf(a)
        b = mp.mpf(b)
        E = len(epochs)
        point = a == b

        # piece boundaries: epoch edges + {a, b}, deduplicated
        bounds = sorted(set(epochs + [a, b]))
        pieces = []  # (lo, hi, epoch_index)
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if hi <= lo:
                continue
            k = 0
            while k + 1 < E and epochs[k + 1] <= lo:
                k += 1
            pieces.append((lo, hi, k))
        last = bounds[-1]
        k = E - 1
        pieces.append((last, mp.inf, k))

        # cumulative hazard at piece starts
        H = []
        acc = mp.mpf(0)
        prev = mp.mpf(0)
        prev_k = 0
        for lo, hi, k in pieces:
            acc += rates[prev_k] * (lo - prev)
            H.append(acc)
            prev, prev_k = lo, k

        def wpoly(lo, hi):
            """(c0, c1) of w(T) on the piece."""
            if point:
                if shared:
                    return (mp.mpf(1), mp.mpf(0)) if hi <= a else (mp.mpf(0), mp.mpf(0))
                return (mp.mpf(1), mp.mpf(0)) if lo >= a else (mp.mpf(0), mp.mpf(0))
            width = b - a
            if shared:
                if hi <= a:
                    return (mp.mpf(1), mp.mpf(0))
                if lo >= b:
                    return (mp.mpf(0), mp.mpf(0))
                return (b / width, -1 / width)
            if hi <= a:
                return (mp.mpf(0), mp.mpf(0))
            if lo >= b:
                return (mp.mpf(1), mp.mpf(0))
            return (-a / width, 1 / width)

        Z = mp.mpf(0)
        mass = [mp.mpf(0)] * E
        expo = [mp.mpf(0)] * E
        for (lo, hi, k), Hlo in zip(pieces, H):
            lam = rates[k]
            c0, c1 = wpoly(lo, hi)
            if c0 == 0 and c1 == 0:
                continue
            i0, i1, i2 = _piece_moments(lam, Hlo, lo, hi)
            m = c0 * i0 + c1 * i1
            Z += m
            mass[k] += m
            for e in range(E):
                if k < e:
                    continue
                if k == e:
                    # exposure = T - t_e (within epoch e; for the open
                    # last epoch this is also unbounded-correct)
                    d0, d1, d2 = -epochs[e] * c0, c0 - epochs[e] * c1, c1
                    expo[e] += d0 * i0 + d1 * i1 + d2 * i2
                else:
                    expo[e] += (epochs[e + 1] - epochs[e]) * m

        if Z <= 0:
            return [0.0] * E, [0.0] * E, 0.0
        num = [float(x / Z) for x in mass]
        den = [float(x / Z) for x in expo]
        return num, den, float(mp.log(Z))
