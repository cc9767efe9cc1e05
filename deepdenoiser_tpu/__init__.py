"""deepdenoiser_tpu — a TPU-native Monte-Carlo render denoiser framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
DeepBlender/DeepDenoiser reference (TF1-era Blender/Cycles denoiser):
render-pass registry, per-pass normalization, multi-scale CNN denoising,
pass-group demodulation + recomposition, tiled full-frame inference with
halo-aware overlap, and data-parallel training over a TPU mesh.

Reference parity map (upstream paths per SURVEY.md; the reference mount was
empty at build time, citations are to the survey's component inventory):
  passes.py        ← TensorFlow/RenderPasses.py, Naming.py, FeatureFlags.py (C1-C3)
  transforms.py    ← TensorFlow/FeatureEngineering.py (C4)
  data/            ← TensorFlow/OpenEXRDirectory.py, TrainingData.py,
                     DataAugmentation.py, DataStatistics.py (C5-C9)
  models/          ← TensorFlow/Conv2dUtilities.py, UNet.py, Tiramisu.py,
                     MultiScalePrediction.py, KernelPrediction.py (C10-C14)
  ops/losses.py    ← TensorFlow/LossDifference.py (C15)
  training/        ← TensorFlow/DeepDenoiser.py train mode (C16)
  inference/       ← upstream inference tooling + BASELINE configs 2/3/5 (C20)
  config.py, cli.py← argparse + JSON configs (C18, L8)
"""

__version__ = "0.1.0"

from deepdenoiser_tpu import passes, transforms  # noqa: F401
