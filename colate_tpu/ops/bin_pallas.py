"""Fused Pallas TPU kernel for analytic age-bin histograms.

Same math as ``pipeline/binning.py:_chunk_hist`` (the exact expectation
of the reference's 100-draw MC binning, coal/coal.cpp:2244-2298), as one
fused kernel with sites on the LANE axis: each grid step streams a chunk
of C sites (five contiguous f32 feature rows — ages, weights, and one
packed aux row carrying block id / emp flag / emp bin), builds the
[bins, C] overlap + one-hot matrices in VMEM, and contracts them on the
MXU against the block one-hot into a resident [blocks, 4*bins]
accumulator.  Nothing intermediate ever touches HBM.

Why not the XLA slab path (``bin_sites_analytic``): XLA materialises the
[n, 4*bins] weight matrix in HBM before its block contraction —
gigabytes of traffic per slab — and its [n, 8]-style gathers issue
degenerate row-at-a-time DMAs.  Feature-major rows stream as dense
lane-tiles instead.

Block capacity: the resident accumulator is sized from a ladder
(128..1024 rows, ≤4 MB of the ~16 MB VMEM), so whole-genome block
counts (~125 thirty-Mb blocks for a human genome; the reference
pre-allocates 500, coal.cpp:3139-3153) run the fused kernel.  Packing
is *block-aligned*: chunk boundaries restart at every block-id change
(pad lanes carry zero weight), so a chunk always touches exactly one
block — the 16-slot accumulator window is always sufficient, block ids
need not be sorted, and a block's partial sums are bitwise invariant to
any block-aligned sharding of the site stream (parallel/mesh.py relies
on this for the byte-identical mesh dry run).

The f64-exact pieces (emp flag, ``bin_of_age`` index) are precomputed on
host exactly like the XLA path; outputs match it to f32 tolerance
(tests/test_bin_pallas.py) and the f64 native oracle within the
documented analytic-mode f32 contract.
"""

from __future__ import annotations

import functools

import numpy as np

from colate_tpu.config import NUM_AGE_BINS, age_bin_edges

_C = 512          # sites per grid step (lane axis)
_ROWS = 8         # feature rows (5 used, padded to the sublane tile)
_BINS_SUB = 256   # bins padded on sublanes (185 -> 256)
_NB_CAPS = (128, 256, 512, 1024)  # accumulator row ladder (f32: 0.5-4 MB)
# aux row packing: aux = blk * 2048 + emp * 1024 + bin2   (exact in f32:
# max aux ~ 1008*2048 + 1024 + 184 < 2^21 << 2^24)
_AUX_BLK = 2048
_AUX_EMP = 1024


def _nb_cap(nb: int) -> int | None:
    """Smallest ladder capacity whose 16-slot write window fits nb
    blocks, or None when nb exceeds the ladder (XLA path territory)."""
    for cap in _NB_CAPS:
        if nb + 16 <= cap:
            return cap
    return None


def supports(nb: int) -> bool:
    return _nb_cap(nb) is not None


def _pad_pow2(n: int, lo: int = 1 << 15) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=16)
def _make_fn(n_pad: int, age: float, interpret: bool, cap: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nbins = NUM_AGE_BINS
    C = _C
    n_chunks = n_pad // C
    edges = age_bin_edges().astype(np.float32)
    elo_np = np.full((_BINS_SUB, 1), edges[-1], np.float32)
    ehi_np = np.full((_BINS_SUB, 1), edges[-1], np.float32)
    elo_np[:nbins, 0] = edges[:-1]
    ehi_np[:nbins, 0] = edges[1:]
    age32 = np.float32(age)

    def kernel(fv_ref, elo_ref, ehi_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        f32 = jnp.float32
        ab = fv_ref[0:1, :]    # [1, C]
        ae = fv_ref[1:2, :]
        ws = fv_ref[2:3, :]
        wn = fv_ref[3:4, :]
        aux = fv_ref[4:5, :].astype(jnp.int32)
        elo = elo_ref[:]       # [BINS_SUB, 1]
        ehi = ehi_ref[:]

        blk = aux // _AUX_BLK
        rem = aux - blk * _AUX_BLK
        empi = rem // _AUX_EMP
        bin2 = rem - empi * _AUX_EMP
        is_emp = empi > 0

        # regular sites: U[max(ab, age), ae] conditional on landing
        # in-table (p normalised by the total in-table overlap)
        a_reg = jnp.maximum(ab, age32)
        ov = jnp.clip(
            jnp.minimum(ae, ehi) - jnp.maximum(a_reg, elo), 0.0, None
        )  # [BINS_SUB, C]
        s = jnp.sum(ov, axis=0, keepdims=True)  # [1, C]
        p = jnp.where(s > 0, ov / jnp.where(s > 0, s, f32(1.0)), f32(0.0))

        w_s = jnp.where(is_emp, f32(0.0), ws)
        w_nr = jnp.where(is_emp, f32(0.0), wn)
        w_ne = jnp.where(is_emp, wn, f32(0.0))
        w_se = jnp.where(is_emp, ws, f32(0.0))

        # emp sites: T = max(U[ab, ae], age) clamped-CDF law
        width = jnp.maximum(ae - ab, f32(1e-30))
        cl = jnp.where(
            elo > age32, jnp.clip((elo - ab) / width, 0.0, 1.0), f32(0.0)
        )
        ch = jnp.where(
            ehi > age32, jnp.clip((ehi - ab) / width, 0.0, 1.0), f32(0.0)
        )
        p_emp = ch - cl
        sub = jax.lax.broadcasted_iota(jnp.int32, (_BINS_SUB, C), 0)
        # beyond-table mass clips into the last real bin
        fh_last = ch[nbins - 1 : nbins, :]
        p_emp = p_emp + jnp.where(
            sub == nbins - 1, f32(1.0) - fh_last, f32(0.0)
        )
        p_emp = jnp.where(sub < nbins, p_emp, f32(0.0))

        oh2 = (sub == bin2).astype(f32)

        Mall = jnp.concatenate(
            [
                p * w_s,
                p * w_nr + p_emp * w_ne,
                oh2 * w_se,
                oh2 * w_ne,
            ],
            axis=0,
        )  # [4*BINS_SUB, C]

        # block-aligned packing => one block id per chunk; anchor the
        # 16-slot window at the 8-aligned row below it (sublane stores
        # need 8-aligned offsets)
        first = pl.multiple_of((blk[0, 0] // 8) * 8, 8)
        subb = jax.lax.broadcasted_iota(jnp.int32, (16, C), 0)
        ohb = (subb == (blk - first)).astype(f32)  # [16, C]
        part = jax.lax.dot_general(
            ohb,
            Mall,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [16, 4*BINS_SUB]
        cur = acc_ref[pl.ds(first, 16), :]
        acc_ref[pl.ds(first, 16), :] = cur + part

    fn = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda i: (0, i)),
            pl.BlockSpec((_BINS_SUB, 1), lambda i: (0, 0)),
            pl.BlockSpec((_BINS_SUB, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((cap, 4 * _BINS_SUB), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cap, 4 * _BINS_SUB), jnp.float32),
        interpret=interpret,
    )
    elo_j = jnp.asarray(elo_np)
    ehi_j = jnp.asarray(ehi_np)
    return jax.jit(lambda fv: fn(fv, elo_j, ehi_j))


def segments(block_id) -> tuple:
    """Block-aligned packing plan over a site stream.

    Splits the stream into contiguous same-block runs and pads each run
    to a multiple of the chunk width, so every kernel chunk touches
    exactly one block.  Returns ``(starts, ends, poff, blkseg)``: run
    boundaries in site coordinates, the packed offset of each run
    (``poff[-1]`` = total packed length, a multiple of _C), and each
    run's block id.
    """
    blk = np.asarray(block_id, np.int64)
    n = blk.size
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(1, np.int64), z
    cut = np.flatnonzero(np.diff(blk)) + 1
    starts = np.concatenate([[0], cut]).astype(np.int64)
    ends = np.concatenate([cut, [n]]).astype(np.int64)
    plens = -(-(ends - starts) // _C) * _C
    poff = np.zeros(starts.size + 1, np.int64)
    np.cumsum(plens, out=poff[1:])
    return starts, ends, poff, blk[starts]


def _fill_cols(fv, d0: int, sites, lo: int, hi: int, age: float, nbins: int):
    """Write sites[lo:hi] into feature columns fv[:, d0:d0+(hi-lo)]."""
    d1 = d0 + (hi - lo)
    ab64 = np.asarray(sites.age_begin[lo:hi], np.float64)
    ae64 = np.asarray(sites.age_end[lo:hi], np.float64)
    blk = np.asarray(sites.block_id[lo:hi], np.int64)
    fv[0, d0:d1] = ab64
    fv[1, d0:d1] = ae64
    fv[2, d0:d1] = sites.w_shared[lo:hi]
    fv[3, d0:d1] = sites.w_notshared[lo:hi]
    emp = ab64 <= age  # f64-exact emp flag
    aux = blk * _AUX_BLK + np.where(emp, _AUX_EMP, 0)
    if emp.any():
        # f64-exact bin(age_end) — only emp rows ever read it
        ae_e = ae64[emp]
        with np.errstate(divide="ignore"):
            b2 = np.floor(np.log(np.maximum(10.0 * ae_e, 1e-300)) * 10.0 + 0.5) + 1
        b2 = np.clip(np.where(ae_e > 0, b2, 0), 0, nbins - 1).astype(np.int64)
        aux[emp] += b2
    fv[4, d0:d1] = aux


def pack_packed(sites, age: float, nbins: int, seg, plo: int, phi: int,
                n_pad: int) -> np.ndarray:
    """[ROWS, n_pad] f32 feature slab covering packed range [plo, phi)
    of the block-aligned plan ``seg`` (from :func:`segments`).  plo/phi
    must be multiples of _C.  Pad lanes carry zero weight and their
    run's block id (any in-window id is harmless — they contribute
    exact +0.0)."""
    starts, ends, poff, blkseg = seg
    fv = np.zeros((_ROWS, n_pad), np.float32)
    fv[0, :] = 1.0
    fv[1, :] = 2.0
    if starts.size == 0 or phi <= plo:
        return fv
    s0 = max(int(np.searchsorted(poff, plo, "right")) - 1, 0)
    for s in range(s0, starts.size):
        seg_plo = int(poff[s])
        if seg_plo >= phi:
            break
        real_len = int(ends[s] - starts[s])
        r_lo = max(plo, seg_plo)
        r_hi = min(phi, seg_plo + real_len)
        if r_hi > r_lo:
            src_lo = int(starts[s]) + (r_lo - seg_plo)
            _fill_cols(fv, r_lo - plo, sites, src_lo, src_lo + (r_hi - r_lo),
                       age, nbins)
        p_lo = max(plo, seg_plo + real_len)
        p_hi = min(phi, int(poff[s + 1]))
        if p_hi > p_lo:
            fv[4, p_lo - plo : p_hi - plo] = float(blkseg[s] * _AUX_BLK)
    return fv


def bin_sites_pallas(sites, age: float = 0.0, interpret: bool | None = None):
    """Fused-kernel analytic binning; returns the four [num_blocks,
    nbins] f64 histograms, or None when the kernel does not apply
    (non-TPU backend without interpret, or more blocks than the
    capacity ladder).  Sites stream in slabs so host packing and the
    device pipeline overlap."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if jax.default_backend() not in ("tpu", "axon") and not interpret:
        return None
    nb = sites.num_blocks
    cap = _nb_cap(nb)
    if cap is None:
        return None  # ladder exceeded; XLA slab path handles it
    n = len(sites)
    nbins = NUM_AGE_BINS
    if n == 0:
        z = np.zeros((nb, nbins), np.float64)
        return z, z.copy(), z.copy(), z.copy()
    seg = segments(sites.block_id)
    n_packed = int(seg[2][-1])

    slab = 1 << 22  # 4.2M sites (~84 MB packed) per async round-trip
    pending = []
    acc = np.zeros((max(nb, 1), 4 * _BINS_SUB), np.float64)
    try:
        for plo in range(0, n_packed, slab):
            phi = min(plo + slab, n_packed)
            n_pad = _pad_pow2(phi - plo)
            fv = pack_packed(sites, age, nbins, seg, plo, phi, n_pad)
            fn = _make_fn(n_pad, float(age), bool(interpret), cap)
            pending.append(fn(fv))
            if len(pending) > 2:
                acc += np.asarray(pending.pop(0), np.float64)[: max(nb, 1)]
        for out in pending:
            acc += np.asarray(out, np.float64)[: max(nb, 1)]
    except Exception as exc:  # Mosaic/platform gaps -> XLA path
        from colate_tpu.utils.progress import log_event

        log_event("bin_pallas_fallback", error=repr(exc))
        return None
    res = []
    for j in range(4):
        res.append(acc[:nb, j * _BINS_SUB : j * _BINS_SUB + nbins])
    return tuple(res)
