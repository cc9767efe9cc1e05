"""Inference layer: tiled full-frame denoising, multi-pass pipeline,
sequence benchmarking (upstream: partial tooling in DeepDenoiser.py —
SURVEY.md C20; the tiling/halo behavior is the rebuild contract of
BASELINE configs 2/3/5).
"""
