"""Engine-level checkpoint/resume of the sufficient-statistic pipeline."""

import numpy as np

from colate_tpu.config import MutRunConfig
from colate_tpu.models.mut_em import run_mut_and_write
from colate_tpu.utils.checkpoint import (
    input_fingerprint,
    load_suffstats,
    save_suffstats,
)
from helpers.synth import make_fixture


def test_suffstats_roundtrip(tmp_path):
    g = np.random.default_rng(0)
    arrs = [g.random((7, 185)) for _ in range(4)]
    path = str(tmp_path / "s.suffstats.npz")
    fp = input_fingerprint(["/etc/hostname", None], extra={"age": 0.0})
    save_suffstats(path, fp, *arrs, num_sites=123)
    hit = load_suffstats(path, fp)
    assert hit is not None
    for a, b in zip(hit[:4], arrs):
        np.testing.assert_array_equal(a, b)
    assert hit[4] == 123
    # stale fingerprint -> miss
    assert load_suffstats(path, "deadbeef" * 4) is None


def test_mut_checkpoint_resume(tmp_path):
    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=800, seed=21)

    def cfg(out):
        return MutRunConfig(
            mut=fix["mut_prefix"],
            output=out,
            chr_list=fix["chroms"],
            target_tmp=fix["target"],
            reference_tmp=fix["reference"],
            bins="3,7,0.2",
            seed=7,
            sampling="analytic",
            checkpoint=True,
        )

    r1 = run_mut_and_write(cfg(str(tmp_path / "a")))
    import os

    assert os.path.exists(str(tmp_path / "a") + ".suffstats.npz")
    r2 = run_mut_and_write(cfg(str(tmp_path / "a")))
    np.testing.assert_array_equal(r1.rates, r2.rates)
    assert r2.timings["binning"] == 0.0  # resumed from checkpoint
    assert r2.num_sites == r1.num_sites
