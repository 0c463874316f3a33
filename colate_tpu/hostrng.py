"""libstdc++-compatible random draws, for bitwise parity with the reference.

The reference binary's results depend on the exact draw sequence of GNU
libstdc++'s ``std::mt19937`` with ``std::uniform_real_distribution<double>``
(mutation-age Monte-Carlo sampling, reference include/coal/coal.cpp:2260-2295)
and ``std::uniform_int_distribution<int>`` (block bootstrap, coal.cpp:3355).
This module replays those sequences so golden tests can compare outputs
bit-for-bit.  The production engine uses the analytic expected histogram
instead (see pipeline/binning.py); this exists for validation only.

Verified against a compiled probe of g++ 12 (tests/test_rng_parity.py).
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)


class MT19937:
    """std::mt19937 with numpy-vectorised block generation."""

    def __init__(self, seed: int):
        mt = np.empty(_N, dtype=np.uint32)
        mt[0] = np.uint32(seed & 0xFFFFFFFF)
        # standard initialization_multiplier seeding
        prev = int(mt[0])
        for i in range(1, _N):
            prev = (1812433253 * (prev ^ (prev >> 30)) + i) & 0xFFFFFFFF
            mt[i] = prev
        self._mt = mt
        self._buf = np.empty(0, dtype=np.uint32)
        self._pos = 0

    def _twist(self) -> None:
        mt = self._mt
        out = np.empty(_N, dtype=np.uint32)

        def step(y: np.ndarray, src: np.ndarray) -> np.ndarray:
            mag = np.where((y & np.uint32(1)).astype(bool), _MATRIX_A, np.uint32(0))
            return src ^ (y >> np.uint32(1)) ^ mag

        # The in-place recurrence mt[i] = f(mt[i], mt[i+1], mt[(i+M)%N]) reads
        # original values for i < N-M and already-updated values after; emulate
        # with dependency-respecting chunks of width N-M.
        y = (mt[: _N - _M] & _UPPER) + (mt[1 : _N - _M + 1] & _LOWER)
        out[: _N - _M] = step(y, mt[_M:])
        i = _N - _M
        while i < _N - 1:
            j = min(i + (_N - _M), _N - 1)
            y = (mt[i:j] & _UPPER) + (mt[i + 1 : j + 1] & _LOWER)
            out[i:j] = step(y, out[i - (_N - _M) : j - (_N - _M)])
            i = j
        # last element wraps to the freshly-updated out[0]
        y_last = (mt[_N - 1] & _UPPER) + (out[0] & _LOWER)
        out[_N - 1] = step(np.atleast_1d(y_last), np.atleast_1d(out[_M - 1]))[0]
        # temper
        t = out.copy()
        t ^= t >> np.uint32(11)
        t ^= (t << np.uint32(7)) & np.uint32(0x9D2C5680)
        t ^= (t << np.uint32(15)) & np.uint32(0xEFC60000)
        t ^= t >> np.uint32(18)
        self._mt = out
        self._buf = t
        self._pos = 0

    def raw(self, n: int) -> np.ndarray:
        """Next n tempered uint32 outputs."""
        chunks = []
        need = n
        while need > 0:
            if self._pos >= self._buf.size:
                self._twist()
            take = min(need, self._buf.size - self._pos)
            chunks.append(self._buf[self._pos : self._pos + take])
            self._pos += take
            need -= take
        return np.concatenate(chunks) if len(chunks) != 1 else chunks[0]

    def uniform01(self, n: int) -> np.ndarray:
        """n draws of uniform_real_distribution<double>(0,1).

        libstdc++ generate_canonical<double,53>: two 32-bit draws g0, g1
        combine as (g0 + g1*2^32) / 2^64.
        """
        bits = self.raw(2 * n).astype(np.uint64)
        g0 = bits[0::2]
        g1 = bits[1::2]
        val = (g0.astype(np.float64) + g1.astype(np.float64) * 4294967296.0) * (
            1.0 / 18446744073709551616.0
        )
        return val

    def uniform01_scalar(self) -> float:
        return float(self.uniform01(1)[0])

    def uniform_int(self, lo: int, hi: int, n: int) -> np.ndarray:
        """n draws of uniform_int_distribution<int>(lo, hi), hi inclusive.

        libstdc++ downscaling with rejection: scaling = floor((2^32-1)/range),
        past = range*scaling; reject raw >= past; result = raw // scaling.
        """
        urange = hi - lo + 1
        scaling = (2**32 - 1) // urange
        past = urange * scaling
        # Draw exactly the deficit each round so the raw stream position
        # matches the reference's one-at-a-time rejection loop.
        out = np.empty(n, dtype=np.int64)
        filled = 0
        while filled < n:
            draw = self.raw(n - filled).astype(np.uint64)
            good = draw[draw < past]
            out[filled : filled + good.size] = (good // scaling).astype(np.int64)
            filled += good.size
        return out + lo
