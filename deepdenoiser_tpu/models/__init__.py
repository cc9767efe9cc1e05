"""Model zoo: Flax/NHWC backbones for pass denoising.

Rebuilds the reference's architecture layer (upstream:
TensorFlow/Conv2dUtilities.py, UNet.py, Tiramisu.py,
MultiScalePrediction.py, KernelPrediction.py — SURVEY.md C10-C14) as
TPU-first Flax modules: NHWC layout, bfloat16-capable, static shapes,
resize-conv upsampling, and analytic receptive-field accounting that the
tiled-inference engine uses to pick halo widths.
"""

from deepdenoiser_tpu.models.factory import build_model, ModelConfig  # noqa: F401
