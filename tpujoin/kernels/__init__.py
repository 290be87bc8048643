"""Pallas TPU kernels for hot operator paths.

The jnp-level ops in :mod:`tpujoin.ops` are the semantic reference; kernels
here replace their hot inner stages (binary-search probe, compaction) with
hand-scheduled VMEM-resident Pallas implementations when profitable.
"""
