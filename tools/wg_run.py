"""Subprocess runner for one whole-genome mode-`mut` bench variant.

Runs the full pipeline twice in one fresh process (cold = first run,
carrying every compile; warm = second run) so the parent bench gets a
per-variant max-RSS that is not polluted by fixture generation or other
bench stages sharing the process (ru_maxrss is a lifetime max).

Usage: wg_run.py <fixture_dir> <tag> <em_dtype> <host_max_b> <bootstraps>
Prints one JSON line on stdout; saves rates to <fixture_dir>/wg_<tag>_rates.npy.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    fixture_dir, tag, em_dtype, host_max_b, bootstraps = sys.argv[1:6]
    os.environ.setdefault("COLATE_NATIVE_REQUIRED", "1")

    import numpy as np

    from colate_tpu import config as _cfg
    from colate_tpu.config import MutRunConfig
    from colate_tpu.models.mut_em import run_mut_and_write

    _cfg.EM_HOST_MAX_B = int(host_max_b)
    chroms = [
        c.strip()
        for c in open(os.path.join(fixture_dir, "chr.txt"))
        if c.strip()
    ]
    cfg = MutRunConfig(
        mut=os.path.join(fixture_dir, "synth"),
        output=os.path.join(fixture_dir, f"wg_{tag}"),
        chr_list=chroms,
        target_tmp=os.path.join(fixture_dir, "target.colate.in"),
        reference_tmp=os.path.join(fixture_dir, "ref.colate.in"),
        bins="3,7,0.2",
        seed=1,
        num_bootstrap=int(bootstraps),
        sampling="analytic",
        em_dtype=em_dtype,
    )
    t0 = time.time()
    res = run_mut_and_write(cfg)
    cold = time.time() - t0
    t0 = time.time()
    res = run_mut_and_write(cfg)
    warm = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    np.save(
        os.path.join(fixture_dir, f"wg_{tag}_rates.npy"), np.asarray(res.rates)
    )
    print(
        json.dumps(
            {
                "tag": tag,
                "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "num_sites": res.num_sites,
                "timings": {k: round(v, 2) for k, v in res.timings.items()},
                "max_rss_mb": round(rss, 1),
                "em_provider": getattr(res, "em_provider", None),
            }
        )
    )


if __name__ == "__main__":
    main()
