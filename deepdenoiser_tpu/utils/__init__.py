"""Small shared utilities (upstream: TensorFlow/Utilities.py — SURVEY.md C17)."""
