"""Monocular metric-depth subsystem — TPU-native equivalent of the
reference's vendored ZoeDepth framework (SURVEY.md §2.10): metric-bins
models (flax), SILog-family losses, depth metrics with eval crops, a
data-parallel trainer, layered configs, and TTA inference."""
