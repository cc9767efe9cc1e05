"""Data layer: EXR ingest, synthetic fixtures, dataset preparation, loaders.

Rebuilds the reference's data stack (upstream: TensorFlow/OpenEXRDirectory.py,
TrainingData.py, DataStatistics.py, DataAugmentation.py — SURVEY.md C5-C9)
with a sharded array-shard format + Grain loader replacing TFRecords
(BASELINE.json:5).
"""
