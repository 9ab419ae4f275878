"""``aniposelib.cameras`` stand-in.

``eks_tpu.geometry``'s calibration container already exposes the exact
surface the reference touches: ``CameraGroup.load`` (Anipose TOML),
``CameraGroup.triangulate(points, fast=..., disable_64bit=...)`` (extra
kwargs ignored), ``.cameras`` with ``name`` and the ``get_rotation`` /
``get_translation`` / ``get_camera_matrix`` / ``get_distortions``
accessors (reference call sites: eks/multicam_smoother.py:233-239,868-873,902).
"""

from eks_tpu.geometry import Camera, CameraGroup  # noqa: F401
