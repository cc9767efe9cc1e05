"""bench.py degraded-mode contract (VERDICT r4 missing #1).

BENCH_r04.json was a stack trace: the chip was wedge-locked at driver
capture time and `require_live_chip` raised, so the round shipped with no
parseable perf record. The contract now: a wedged chip must still yield
the single JSON-able result dict with `status == "chip_wedged"`,
`value == None` (latency is unmeasurable off-chip), and REAL quality
gains computed on the CPU backend — rc 0, parseable, honest partial.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _args(**kw):
    base = dict(border=32, model="flagship", speed_model="",
                mc_model="", mc_gt_spp=0,
                probe_timeout=5.0, wedged_height=128, wedged_width=192)
    base.update(kw)
    return argparse.Namespace(**base)


def test_wedged_chip_yields_parseable_partial(monkeypatch):
    import bench
    from deepdenoiser_tpu.utils import tpu_guard

    monkeypatch.setattr(tpu_guard, "probe_compute", lambda timeout_s=60.0: False)
    result = bench.run(_args())

    # driver schema: the line must parse and keep the metric keys
    line = json.dumps(result)
    parsed = json.loads(line)
    assert parsed["metric"] == "1080p_full_multipass_denoise_throughput"
    assert parsed["status"] == "chip_wedged"
    assert parsed["value"] is None
    assert parsed["vs_baseline"] is None
    assert parsed["unit"] == "frames/sec/chip"
    assert "note" in parsed

    # quality is platform-independent and must be REAL numbers per family
    head = parsed["headline"]
    assert head["ms"] is None and head["fps"] is None
    for fam in ("fourier", "holdout", "holdout2"):
        assert np.isfinite(head[f"db_{fam}"])
        assert 0.0 < head[f"ssim_{fam}"] <= 1.0
    # release weights denoise: the training family must show a real gain
    assert head["db_fourier"] > 1.0


def test_wedged_skips_speed_model_when_same(monkeypatch):
    import bench
    from deepdenoiser_tpu.utils import tpu_guard

    monkeypatch.setattr(tpu_guard, "probe_compute", lambda timeout_s=60.0: False)
    result = bench.run(_args(speed_model="flagship"))  # same as --model
    assert "speed" not in result


def test_wedged_mc_family_and_endpoint(monkeypatch):
    """r5: the traced-MC quality column and the flagship-mc endpoint must
    survive the wedged fallback too (tiny GT spp keeps the CPU render
    test-sized; the family contract — genuine MC estimate vs converged GT
    of the SAME estimator — is unchanged)."""
    import bench
    from deepdenoiser_tpu.utils import tpu_guard

    monkeypatch.setattr(tpu_guard, "probe_compute", lambda timeout_s=60.0: False)
    result = bench.run(_args(mc_model="flagship-mc", mc_gt_spp=64))

    head = result["headline"]
    assert np.isfinite(head["db_mc"])
    mc = result["mc"]
    assert mc["model"] == "flagship-mc" and mc["ms"] is None
    for fam in ("fourier", "holdout", "holdout2", "mc"):
        assert np.isfinite(mc[f"db_{fam}"])
    # the mixed-MC fine-tune must beat the Gaussian-trained speed model on
    # genuine MC noise when release weights are present
    if mc["weights"] == "release" and head["weights"] == "release":
        assert mc["db_mc"] > head["db_mc"]
