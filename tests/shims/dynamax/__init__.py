"""Shim of the ``dynamax`` API surface the reference imports.

Only ``dynamax.nonlinear_gaussian_ssm`` exists (reference imports:
/root/reference/eks/core.py:11-15 and
/root/reference/eks/ibl_pupil_smoother.py:20-23).
"""
