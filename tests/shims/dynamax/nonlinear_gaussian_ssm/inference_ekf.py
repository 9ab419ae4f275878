"""The reference's pupil smoother imports from this submodule path
(/root/reference/eks/ibl_pupil_smoother.py:20-23)."""

from . import (  # noqa: F401
    ParamsNLGSSM,
    PosteriorGSSMFiltered,
    PosteriorGSSMSmoothed,
    extended_kalman_filter,
    extended_kalman_smoother,
)
