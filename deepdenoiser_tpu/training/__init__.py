"""Training engine (upstream: TensorFlow/DeepDenoiser.py model_fn +
estimator loop — SURVEY.md C16, L6), rebuilt as jitted functional steps:
one compiled program per step (fwd + bwd + gradient pmean over ICI + optax
update), orbax checkpointing with auto-resume.
"""
