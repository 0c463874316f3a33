"""Multi-host execution of mode ``mut`` (jax.distributed).

The reference is one process on one core (SURVEY §2.9); its only
scaling story is "run more processes by hand".  Here a pod/multi-host
run is first-class:

- every process calls :func:`init_distributed` (coordinator + rank from
  args or the standard JAX env vars), then :func:`run_mut_multihost`;
- chromosomes are partitioned contiguously across processes; each host
  decodes and bins ONLY its own chromosome files (the host-bound stage
  — htslib-class decode in the reference — is what multi-host buys);
- per-host partial [blocks, 185] histograms are placed at their global
  block offsets and merged with ONE ``psum`` over a process-axis mesh —
  the sufficient-statistic reduction rides DCN (or Gloo on CPU);
- because each chromosome starts a fresh 30 Mb block (coal.cpp:
  2113-2120), per-process block ranges are disjoint, so the psum is a
  pure concatenation in float terms: the merged tensors are BIT-EXACT
  equal to the single-process run, and the downstream bootstrap + EM
  (seeded MT19937 + deterministic f64/f32 kernels) reproduce the
  single-process ``.coal`` byte-for-byte (tested in
  tests/test_multihost.py with 2 CPU processes).

Bootstrap replicates then run sharded across *local* devices via
parallel/mesh.py if desired; this driver keeps them replicated so every
process ends with identical results and rank 0 writes the output.
"""

from __future__ import annotations

import os

import numpy as np

from colate_tpu.config import NUM_AGE_BINS, MutRunConfig


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise the JAX distributed runtime (idempotent).

    Falls back to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID or cloud auto-detection) when
    arguments are omitted.
    """
    import jax

    if getattr(init_distributed, "_done", False):
        return
    # The JAX_PLATFORMS env var is authoritative for distributed runs:
    # site hooks (e.g. a TPU-plugin sitecustomize) may have overridden
    # the jax_platforms *config* after env processing, which would
    # silently bind the distributed runtime to the wrong backend.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    # Do NOT call any backend-initialising JAX API (jax.process_count(),
    # jax.devices(), ...) before jax.distributed.initialize(): touching the
    # backend first makes initialize() raise "must be called before any JAX
    # computations are executed".  Idempotency is checked through the
    # distributed global state instead.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            init_distributed._done = True
            return
    except Exception:
        pass
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    init_distributed._done = True


def _process_mesh():
    """1-device-per-process mesh over axis "h" (host)."""
    import jax
    from jax.sharding import Mesh

    devs = []
    for p in range(jax.process_count()):
        for d in jax.devices():
            if d.process_index == p:
                devs.append(d)
                break
    return Mesh(np.array(devs), ("h",))


def partition_chromosomes(chroms: list, num_processes: int, process_id: int):
    """Contiguous partition: preserves global block order under
    concatenation of the per-process block ranges."""
    n = len(chroms)
    lo = n * process_id // num_processes
    hi = n * (process_id + 1) // num_processes
    return lo, hi


def psum_histograms(local_hists, local_offset: int, total_blocks: int):
    """Merge per-host [local_blocks, nbins] partials into global
    [total_blocks, nbins] tensors with one psum over the process mesh.

    Block ranges are disjoint across processes, so each f64 cell is
    0 + ... + value + ... + 0 — the sum is exact (bit-equal to a
    single-process concatenation)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from colate_tpu import enable_x64

    enable_x64()
    mesh = _process_mesh()
    nbins = local_hists[0].shape[1]
    padded = []
    for h in local_hists:
        g = np.zeros((total_blocks, nbins), np.float64)
        g[local_offset : local_offset + h.shape[0]] = h
        padded.append(g[None])  # leading axis: this process's shard

    def merge(*hs):
        return tuple(jax.lax.psum(h[0], "h") for h in hs)

    fn = jax.jit(
        shard_map(
            merge,
            mesh=mesh,
            in_specs=tuple(P("h") for _ in padded),
            out_specs=tuple(P() for _ in padded),
        )
    )
    sh = NamedSharding(mesh, P("h"))
    garrs = [
        jax.make_array_from_process_local_data(sh, h) for h in padded
    ]
    out = fn(*garrs)
    return tuple(np.asarray(o) for o in out)


def allgather_scalars(*vals: int) -> np.ndarray:
    """[num_processes, len(vals)] int64 table of per-process scalars."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.array(vals, np.int64))
    ).reshape(-1, len(vals))


def run_mut_multihost(cfg: MutRunConfig):
    """Mode mut with chromosome decode+binning sharded across processes.

    Requires an initialised jax.distributed runtime and analytic
    sampling (mc_parity replays one global RNG stream through the
    parser, which is inherently sequential).  Every process returns the
    identical MutResult; only rank 0 writes ``<out>.coal``.
    """
    import time

    import jax

    from colate_tpu.formats.coal import write_mut_coal
    from colate_tpu.models import mut_em
    from colate_tpu.utils.progress import log_event

    if cfg.sampling == "mc_parity":
        raise ValueError("multihost runs require analytic sampling")
    if cfg.target_bcf and not cfg.reference_bcf:
        # The half-split parser (parse_vcf, coal.cpp:594-904) consumes ONE
        # continuous MT19937(seed) stream across all chromosomes for its
        # haplotype split; per-process replay over a chromosome subset
        # would realise a different split than the single-process run, so
        # the merged suffstats would not match.  Only RNG-free parsers
        # (tmp/bam/vcfvcf) are supported multi-host.
        raise ValueError(
            "multihost mode mut does not support the single-BCF half-split "
            "parser (its haplotype split draws from one sequential RNG "
            "stream across chromosomes); run it single-process or use "
            "make_tmp first"
        )
    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc <= 1:
        raise RuntimeError(
            "jax.distributed is not initialised (or single-process); "
            "use run_mut instead"
        )

    timings: dict = {}
    age = max(
        float(np.float32(cfg.target_age)), float(np.float32(cfg.reference_age))
    ) / float(np.float32(cfg.years_per_gen))
    ref_age = float(np.float32(cfg.reference_age)) / float(
        np.float32(cfg.years_per_gen)
    )
    seed = cfg.seed if cfg.seed is not None else 1
    chroms, mut_files, tmask_files, rmask_files = mut_em.resolve_tmp_inputs(cfg)

    lo, hi = partition_chromosomes(chroms, nproc, pid)
    t0 = time.time()
    sub = slice(lo, hi)
    if lo < hi:
        sh, ns, se, ne, nsites_loc, nb_loc = mut_em.compute_suffstats(
            cfg,
            chroms[sub],
            mut_files[sub],
            tmask_files[sub] if tmask_files else None,
            rmask_files[sub] if rmask_files else None,
            age,
            ref_age,
            False,
            None,
            seed,
            timings,
        )
    else:  # more processes than chromosomes: empty shard
        nbins = NUM_AGE_BINS
        sh = ns = se = ne = np.zeros((0, nbins), np.float64)
        nsites_loc, nb_loc = 0, 0
    timings["parse_local"] = time.time() - t0

    t0 = time.time()
    table = allgather_scalars(nb_loc, nsites_loc)
    offsets = np.concatenate([[0], np.cumsum(table[:, 0])])
    total_blocks = int(offsets[-1])
    num_sites = int(table[:, 1].sum())
    sh_b, ns_b, se_b, ne_b = psum_histograms(
        (sh, ns, se, ne), int(offsets[pid]), total_blocks
    )
    timings["dcn_merge"] = time.time() - t0
    log_event(
        "multihost_merge",
        process=pid,
        processes=nproc,
        chroms_local=hi - lo,
        blocks_local=nb_loc,
        blocks_total=total_blocks,
        sites_total=num_sites,
    )

    # downstream (bootstrap + EM) is deterministic given the merged
    # sufficient statistics — run replicated so every rank can serve the
    # result; rank 0 writes.  The seed MUST be forwarded: without it
    # finish_from_suffstats re-derives time+pid per rank, so with
    # cfg.seed=None the bootstrap weights would differ across ranks and
    # break the "every process returns the identical MutResult"
    # contract (the reference seeds once, coal.cpp:3157-3162).
    res = mut_em.finish_from_suffstats(
        cfg, sh_b, ns_b, se_b, ne_b, num_sites, total_blocks, timings,
        seed=seed, write_outputs=(pid == 0),
    )
    if pid == 0:
        write_mut_coal(
            cfg.output + ".coal",
            res.epochs,
            res.rates,
            is_ancient=res.is_ancient,
            ep_null=res.ep_null,
        )
    return res
