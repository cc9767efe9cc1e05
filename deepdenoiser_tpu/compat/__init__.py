"""Interop layer: TensorFlow-checkpoint compatibility (SURVEY.md N3)."""
