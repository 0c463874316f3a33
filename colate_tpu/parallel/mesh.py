"""Device-mesh execution of the mut pipeline.

The reference is strictly single-core (SURVEY §2.9); the parallel axes
live in the data model.  Mapping onto a TPU mesh (axis "d"):

- **binning** (throughput-bound): sites are sharded along the genome
  axis; every device scatter-adds its shard into a full
  [num_blocks, 185] histogram and the partials are merged with one
  ``psum`` — the classic data-parallel sufficient-statistic reduction.
- **EM** (latency-bound, tiny tensors): the bootstrap axis is sharded —
  replicates are independent EM fixed-points, so B replicates run
  embarrassingly parallel across devices, then ``all_gather``.

Both are expressed with ``shard_map`` over a 1-D ``jax.sharding.Mesh``
so the same code runs on 1 chip, a v5e-8, or a multi-host slice (the
mesh simply gets more devices; cross-host merges ride DCN through the
same psum).
"""

from __future__ import annotations

import functools

import numpy as np

from colate_tpu.config import NUM_AGE_BINS, age_bin_edges


def make_mesh(n_devices: int | None = None):
    """1-D mesh over the default backend's devices; when it has too few
    (e.g. the single tunnelled TPU chip) fall back to the virtual
    multi-device CPU platform (``--xla_force_host_platform_device_count``)
    so sharded programs always compile+execute with real collectives.

    COLATE_MESH_BACKEND pins the device pool to one backend (the
    multichip dryrun sets "cpu" so every mesh size draws from the SAME
    pool — mixing the tunnelled TPU chip for N=1 with CPU devices for
    N=8 would compare different backends' f64 rounding)."""
    import os

    import jax
    from jax.sharding import Mesh

    backend = os.environ.get("COLATE_MESH_BACKEND")
    devs = jax.local_devices(backend=backend) if backend else jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # same virtual-CPU fallback on both branches (no-op when the
        # pinned backend already is cpu)
        devs = jax.local_devices(backend="cpu")
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


def _pad_to(x: np.ndarray, n: int, fill=0):
    if x.shape[0] == n:
        return x
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


def _balanced_cuts(allowed: np.ndarray, total: int, nd: int) -> np.ndarray:
    """[nd+1] nondecreasing boundaries drawn from the `allowed` cut
    points (which must start at 0 and end at `total`), each nearest to
    its even-split target."""
    bounds = np.zeros(nd + 1, np.int64)
    bounds[nd] = total
    for d in range(1, nd):
        target = (total * d) // nd
        i = int(np.searchsorted(allowed, target, "left"))
        if i >= allowed.size:
            i = allowed.size - 1
        elif i > 0 and target - allowed[i - 1] <= allowed[i] - target:
            i -= 1
        bounds[d] = allowed[i]
    return np.maximum.accumulate(bounds)


def _block_aligned_site_bounds(blk: np.ndarray, nd: int) -> np.ndarray:
    """[nd+1] site-index device boundaries that only cut at block-id
    changes, balancing site counts.  With nondecreasing ids this puts
    every block wholly on one device, so the per-device histogram
    partials are disjoint and the psum merge is exact (+0 elsewhere) —
    the same argument the multihost chromosome partition makes
    (parallel/multihost.py)."""
    n = blk.size
    if n == 0:
        return np.zeros(nd + 1, np.int64)
    cut = np.flatnonzero(np.diff(blk)) + 1
    allowed = np.concatenate([[0], cut, [n]]).astype(np.int64)
    return _balanced_cuts(allowed, n, nd)


def sharded_bin_sites(mesh, age_begin, age_end, w_shared, w_notshared, block_id,
                      num_blocks: int, age: float = 0.0,
                      backend: str = "auto"):
    """Data-parallel analytic binning: shard sites, psum block histograms.

    Inputs are host numpy arrays; returns the four [num_blocks, 185]
    float64 histograms (replicated).

    Sites are sharded on BLOCK boundaries (``_block_aligned_site_bounds``)
    so each block's histogram is computed entirely on one device and the
    psum adds exact zeros from the others — the meshed result is bitwise
    identical to a 1-device run of the same path, which is what the
    driver's ``dryrun_multichip`` asserts.

    backend="pallas" runs the fused TPU kernel (ops/bin_pallas.py) on
    each device's local shard — the [bins, C] overlap matrices and the
    block contraction stay in VMEM, and only the [blocks, 4*bins]
    partials cross the mesh in the final psum.  "xla" keeps the
    segment-sum path; "auto" picks pallas on TPU meshes when the block
    count fits the accumulator ladder.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    nd = mesh.devices.size
    n = age_begin.shape[0]
    nbins = NUM_AGE_BINS

    if backend == "auto":
        on_cpu = all(d.platform == "cpu" for d in mesh.devices.ravel())
        from colate_tpu.ops import bin_pallas as _bp

        backend = (
            "pallas" if (not on_cpu and _bp.supports(num_blocks)) else "xla"
        )
    if backend == "pallas":
        out = _sharded_bin_pallas(
            mesh, age_begin, age_end, w_shared, w_notshared, block_id,
            num_blocks, age,
        )
        if out is not None:
            return out
        # fall through to the XLA path on any inapplicability

    blk64 = np.asarray(block_id, np.int64)
    bounds = _block_aligned_site_bounds(blk64, nd)
    m = max(int(np.max(bounds[1:] - bounds[:-1])), 1)
    ab = np.full((nd, m), 1.0, np.float64)
    ae = np.full((nd, m), 2.0, np.float64)
    ws = np.zeros((nd, m), np.float64)
    wn = np.zeros((nd, m), np.float64)
    blk = np.zeros((nd, m), np.int32)
    for d in range(nd):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        c = hi - lo
        if c:
            ab[d, :c] = np.asarray(age_begin[lo:hi], np.float64)
            ae[d, :c] = np.asarray(age_end[lo:hi], np.float64)
            ws[d, :c] = np.asarray(w_shared[lo:hi], np.float64)
            wn[d, :c] = np.asarray(w_notshared[lo:hi], np.float64)
            blk[d, :c] = blk64[lo:hi]
            # zero-weight pads reuse the device's last real block id:
            # they contribute exact +0.0 to that block's sums
            blk[d, c:] = blk64[hi - 1]

    fn = _sharded_bin_fn(mesh, num_blocks, float(age))
    sh = NamedSharding(mesh, P("d"))
    args = [jax.device_put(a, sh) for a in (ab, ae, ws, wn, blk)]
    out = fn(*args)
    return tuple(np.asarray(o) for o in out)


def _sharded_bin_pallas(mesh, age_begin, age_end, w_shared, w_notshared,
                        block_id, num_blocks: int, age: float):
    """Fused-kernel binning per shard + one psum (see sharded_bin_sites).

    Every device runs the Pallas kernel over its local block-aligned
    feature slab (grid over chunks, [blocks, 4*bins] accumulator
    resident in VMEM); the cross-device merge is one psum of those
    partials.  Because packing restarts chunks at block boundaries
    (ops/bin_pallas.py:segments), a device's per-block partial sums are
    bitwise identical to the 1-device run's, and the psum adds exact
    zeros — meshed == single, bit for bit.  Returns None when the block
    count exceeds the accumulator ladder or the kernel fails to build.
    """
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from colate_tpu.config import NUM_AGE_BINS
    from colate_tpu.ops import bin_pallas as bp

    nd = mesh.devices.size
    n = age_begin.shape[0]
    nbins = NUM_AGE_BINS
    cap = bp._nb_cap(num_blocks)
    if cap is None:
        return None
    if n == 0:
        z = np.zeros((num_blocks, nbins), np.float64)
        return z, z.copy(), z.copy(), z.copy()

    sites = type(
        "S", (), dict(
            age_begin=np.asarray(age_begin, np.float64),
            age_end=np.asarray(age_end, np.float64),
            w_shared=np.asarray(w_shared, np.float64),
            w_notshared=np.asarray(w_notshared, np.float64),
            block_id=np.asarray(block_id, np.int64),
        ),
    )()
    seg = bp.segments(sites.block_id)
    poff = seg[2]
    total = int(poff[-1])
    # device boundaries in packed coordinates, cut at run boundaries
    # (balancing packed length); every block stays whole on one device
    dev_off = _balanced_cuts(poff.astype(np.int64), total, nd)
    m = max(int(np.max(dev_off[1:] - dev_off[:-1])), 1)
    n_pad = bp._pad_pow2(m)
    slabs = np.zeros((nd, bp._ROWS, n_pad), np.float32)
    for d in range(nd):
        slabs[d] = bp.pack_packed(
            sites, age, nbins, seg, int(dev_off[d]), int(dev_off[d + 1]), n_pad
        )

    on_cpu = all(dv.platform == "cpu" for dv in mesh.devices.ravel())
    try:
        kern = bp._make_fn(n_pad, float(age), bool(on_cpu), cap)

        def local(fv):
            acc = kern(fv[0])
            return jax.lax.psum(acc, "d")

        mapped = jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=(P("d"),), out_specs=P(),
                check_vma=False,
            )
        )
        sh = NamedSharding(mesh, P("d"))
        acc = np.asarray(mapped(jax.device_put(slabs, sh)), np.float64)
    except Exception as exc:  # Mosaic/platform gaps -> caller's XLA path
        from colate_tpu.utils.progress import log_event

        log_event("sharded_bin_pallas_fallback", error=repr(exc))
        return None
    nb = max(num_blocks, 1)
    return tuple(
        acc[:nb, j * bp._BINS_SUB : j * bp._BINS_SUB + nbins][:num_blocks]
        for j in range(4)
    )


@functools.lru_cache(maxsize=8)
def _sharded_bin_fn(mesh, num_blocks: int, age: float):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from colate_tpu.pipeline.binning import _overlap_probs

    edges_np = age_bin_edges()
    nbins = NUM_AGE_BINS

    def local_bin(ab, ae, ws, wn, blk):
        # [1, m] local slab rows (block-aligned device ranges)
        ab, ae, ws, wn, blk = ab[0], ae[0], ws[0], wn[0], blk[0]
        edges = jnp.asarray(edges_np)
        is_emp = ab <= age
        a_reg = jnp.maximum(ab, age)
        p = _overlap_probs(a_reg, ae, edges)
        norm = jnp.sum(p, axis=1, keepdims=True)
        p = jnp.where(norm > 0, p / jnp.maximum(norm, 1e-300), 0.0)
        w_s = jnp.where(is_emp, 0.0, ws)
        w_n_reg = jnp.where(is_emp, 0.0, wn)
        width = jnp.maximum(ae - ab, 1e-300)
        cdf_u = jnp.clip((edges[None, :] - ab[:, None]) / width[:, None], 0.0, 1.0)
        f_t = jnp.where(edges[None, :] > age, cdf_u, 0.0)
        p_emp = f_t[:, 1:] - f_t[:, :-1]
        p_emp = p_emp.at[:, -1].add(1.0 - f_t[:, -1])
        w_n_emp = jnp.where(is_emp, wn, 0.0)
        shared = jax.ops.segment_sum(p * w_s[:, None], blk, num_segments=num_blocks)
        notshared = jax.ops.segment_sum(
            p * w_n_reg[:, None] + p_emp * w_n_emp[:, None],
            blk,
            num_segments=num_blocks,
        )
        bin2 = jnp.clip(
            jnp.where(
                ae > 0,
                jnp.floor(jnp.log(10.0 * jnp.maximum(ae, 1e-300)) * 10.0 + 0.5).astype(
                    jnp.int32
                )
                + 1,
                0,
            ),
            0,
            nbins - 1,
        )
        key = blk * nbins + bin2
        se = jax.ops.segment_sum(
            jnp.where(is_emp, ws, 0.0), key, num_segments=num_blocks * nbins
        ).reshape(num_blocks, nbins)
        ne = jax.ops.segment_sum(
            jnp.where(is_emp, wn, 0.0), key, num_segments=num_blocks * nbins
        ).reshape(num_blocks, nbins)
        # merge partial sufficient statistics across the mesh
        return tuple(
            jax.lax.psum(h, "d") for h in (shared, notshared, se, ne)
        )

    mapped = shard_map(
        local_bin,
        mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d"), P("d")),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(mapped)


def sharded_run_em(mesh, epochs, init_rates, shared_counts, notshared_counts,
                   max_iter: int | None = None, backend: str = "xla",
                   min_iter: int | None = None, interpret: bool = False):
    """Bootstrap-parallel EM: shard replicates over the mesh.

    shared/notshared_counts: [B, nbins] host arrays.  B is padded to a
    multiple of the mesh size (padded replicates see the replicate-0
    counts and are discarded).  Returns (rates [B,E], logl [B], iters [B]).

    backend="xla" runs ops/em.py:run_em_sequential per shard (f64
    reference numerics, replicate-sequential so results are bitwise
    identical for ANY mesh size).  backend="pallas" runs the fused f32 TPU kernel
    (ops/em_pallas.py) on each device's local bootstrap shard — the
    kernel's 128-lane grid simply becomes per-device, so an N-chip mesh
    runs N kernels concurrently with no cross-device traffic until the
    final all_gather (``interpret=True`` for CPU test meshes).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from colate_tpu.config import EM_MAX_ITER, EM_MIN_ITER
    from colate_tpu.ops.em import run_em_sequential

    nd = mesh.devices.size
    B = shared_counts.shape[0]
    mi = max_iter if max_iter is not None else EM_MAX_ITER
    mn = min_iter if min_iter is not None else EM_MIN_ITER
    sh_b = NamedSharding(mesh, P("d"))
    rep = NamedSharding(mesh, P())

    if backend == "pallas":
        from colate_tpu.ops.em_pallas import _pad_width, make_run_fn

        ep64 = np.asarray(epochs, np.float64)
        E = int(ep64.shape[0])
        # every device's local shard is lane-padded to the same width
        Bl = _pad_width((B + nd - 1) // nd)
        B_pad = Bl * nd
        sc = _pad_to(np.asarray(shared_counts, np.float32), B_pad)
        nc = _pad_to(np.asarray(notshared_counts, np.float32), B_pad)
        conv0 = np.arange(B_pad) >= B  # padding lanes start converged
        run = make_run_fn(
            ep64.tobytes(), E, Bl, 8, int(mi), int(mn), interpret
        )

        def local_em(ir, s, n, c0):
            # [Bl, ...] local shard -> kernel's transposed layout
            rates_T = jnp.broadcast_to(
                ir.astype(jnp.float32)[:, None], (E, Bl)
            )
            r_T, ll, iters = run(rates_T, s.T, n.T, c0)
            return r_T.T, ll, iters

        mapped = shard_map(
            local_em,
            mesh=mesh,
            in_specs=(P(), P("d"), P("d"), P("d")),
            out_specs=(P("d"), P("d"), P("d")),
            # pallas_call's out_shape carries no vma annotation; the
            # kernel is purely local so the varying-axis check adds
            # nothing here
            check_vma=False,
        )
        rates, logl, iters = jax.jit(mapped)(
            jax.device_put(np.asarray(init_rates), rep),
            jax.device_put(sc, sh_b),
            jax.device_put(nc, sh_b),
            jax.device_put(conv0, sh_b),
        )
        return (
            np.asarray(rates)[:B].astype(np.asarray(epochs).dtype),
            np.asarray(logl)[:B],
            np.asarray(iters)[:B],
        )

    B_pad = ((B + nd - 1) // nd) * nd
    sc = _pad_to(np.asarray(shared_counts, np.float64), B_pad)
    nc = _pad_to(np.asarray(notshared_counts, np.float64), B_pad)
    if B_pad > B:
        sc[B:] = sc[0]
        nc[B:] = nc[0]

    def local_em(ep, ir, s, n):
        # replicate-sequential so the per-replicate rounding is bitwise
        # independent of the local shard size (meshed == single)
        return run_em_sequential(ep, ir, s, n, max_iter=mi)

    mapped = shard_map(
        local_em,
        mesh=mesh,
        in_specs=(P(), P(), P("d"), P("d")),
        out_specs=(P("d"), P("d"), P("d")),
    )
    rates, logl, iters = jax.jit(mapped)(
        jax.device_put(np.asarray(epochs), rep),
        jax.device_put(np.asarray(init_rates), rep),
        jax.device_put(sc, sh_b),
        jax.device_put(nc, sh_b),
    )
    return (
        np.asarray(rates)[:B],
        np.asarray(logl)[:B],
        np.asarray(iters)[:B],
    )
