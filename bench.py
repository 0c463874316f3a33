"""Benchmark: mode `mut` end-to-end sites/s vs the reference binary.

Workload: synthetic whole-genome-scale tmptmp run (4 chromosomes x 300k
mutation rows, ~500k accepted sites) with default bins 3,7,0.2 — the
BASELINE.json north-star configuration.  The reference binary is built
from /root/reference on demand; its wall-clock on the identical inputs
is the baseline (there are no published numbers, BASELINE.md).  If the
reference can't be built here, the last measured baseline stored in
BENCH_BASELINE.json is used.

Prints ONE json line:
  {"metric": "mut_sites_per_sec", "value": N, "unit": "sites/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

BENCH_DIR = "/tmp/colate_bench"
BASELINE_FILE = os.path.join(REPO, "BENCH_BASELINE.json")
N_CHROMS = 4
N_PER_CHROM = 300_000
SEED = 1234


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_fixture():
    from helpers.synth import make_fixture

    marker = os.path.join(BENCH_DIR, "ready.json")
    chroms = [str(i + 1) for i in range(N_CHROMS)]
    if os.path.exists(marker):
        with open(marker) as fh:
            meta = json.load(fh)
        if meta.get("n") == N_PER_CHROM and meta.get("chroms") == chroms:
            log("bench fixture cached")
            fix = dict(
                root=BENCH_DIR,
                chroms=chroms,
                mut_prefix=os.path.join(BENCH_DIR, "synth"),
                target=os.path.join(BENCH_DIR, "target.colate.in"),
                reference=os.path.join(BENCH_DIR, "ref.colate.in"),
                chrfile=os.path.join(BENCH_DIR, "chr.txt"),
            )
            return fix
    log(f"generating bench fixture ({N_CHROMS}x{N_PER_CHROM} rows)...")
    t0 = time.time()
    fix = make_fixture(
        BENCH_DIR, chroms=tuple(chroms), n_per_chrom=N_PER_CHROM, seed=SEED
    )
    fix.pop("mut_tables", None)
    with open(marker, "w") as fh:
        json.dump({"n": N_PER_CHROM, "chroms": chroms}, fh)
    log(f"fixture generated in {time.time() - t0:.1f}s")
    return fix


def ensure_oracle() -> str | None:
    path = "/tmp/refbin/Colate"
    if os.path.exists(path):
        return path
    try:
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference_oracle.sh")],
            check=True,
            capture_output=True,
            timeout=600,
        )
        return path if os.path.exists(path) else None
    except Exception as e:  # no toolchain / no reference mount
        log(f"oracle build unavailable: {e}")
        return None


def time_reference(fix, oracle: str) -> tuple[float, float]:
    out = os.path.join(BENCH_DIR, "ref_bench_out")
    for f in (out + ".coal", out + ".colate_mat"):
        if os.path.exists(f):
            os.remove(f)
    cmd = [
        oracle, "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"],
        "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"],
        "--bins", "3,7,0.2",
        "--seed", "1",
        "-o", out,
    ]
    # best-of-2: the box has 2 shared vCPUs, single runs are noisy
    best = None
    for _ in range(2):
        for f in (out + ".coal", out + ".colate_mat"):
            if os.path.exists(f):
                os.remove(f)
        t0 = time.time()
        subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, t0


def time_ours(fix) -> tuple[float, int, dict]:
    from colate_tpu.config import MutRunConfig
    from colate_tpu.models.mut_em import run_mut_and_write

    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=os.path.join(BENCH_DIR, "our_bench_out"),
        chr_list=fix["chroms"],
        target_tmp=fix["target"],
        reference_tmp=fix["reference"],
        bins="3,7,0.2",
        seed=1,
        sampling="analytic",
    )
    # warm-up absorbs one-time XLA compiles (shape-stable kernels)
    log("warm-up run...")
    res = run_mut_and_write(cfg)
    # best-of-3 timed runs: the 2 shared vCPUs make single runs noisy
    best = None
    for i in range(3):
        log(f"timed run {i}...")
        t0 = time.time()
        res = run_mut_and_write(cfg)
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, res.num_sites, res.timings)
    return best


def main() -> None:
    fix = ensure_fixture()
    oracle = ensure_oracle()

    ref_sites_per_sec = None
    if oracle is not None:
        log("timing reference binary...")
        ref_dt, _ = time_reference(fix, oracle)
        log(f"reference: {ref_dt:.1f}s")
    else:
        ref_dt = None

    our_dt, num_sites, timings = time_ours(fix)
    ours_sps = num_sites / our_dt
    log(
        f"ours: {our_dt:.2f}s for {num_sites} sites "
        f"({ours_sps:.0f} sites/s), stages={ {k: round(v, 2) for k, v in timings.items()} }"
    )

    if ref_dt is not None:
        ref_sites_per_sec = num_sites / ref_dt
        with open(BASELINE_FILE, "w") as fh:
            json.dump(
                {
                    "metric": "mut_sites_per_sec",
                    "reference_sites_per_sec": ref_sites_per_sec,
                    "reference_wall_s": ref_dt,
                    "num_sites": num_sites,
                    "workload": f"{N_CHROMS}x{N_PER_CHROM} rows tmptmp, bins 3,7,0.2",
                    "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                },
                fh,
                indent=1,
            )
    elif os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            ref_sites_per_sec = json.load(fh)["reference_sites_per_sec"]

    vs = (ours_sps / ref_sites_per_sec) if ref_sites_per_sec else 0.0
    print(
        json.dumps(
            {
                "metric": "mut_sites_per_sec",
                "value": round(ours_sps, 1),
                "unit": "sites/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
