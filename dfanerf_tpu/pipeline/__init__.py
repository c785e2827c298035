"""Preprocessing pipeline: jittable reimplementations of the reference's
data_util stack — per-identity 3DMM fitting, bundle adjustment, audio
frontends and encoders, expression disentanglement, perception models, and
the step driver that reproduces the on-disk dataset contract."""
