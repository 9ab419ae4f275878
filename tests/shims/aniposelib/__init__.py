"""Shim of the ``aniposelib`` surface the reference imports
(/root/reference/eks/multicam_smoother.py:20)."""
