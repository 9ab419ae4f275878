"""eks-tpu: TPU-native Ensemble Kalman Smoother for pose estimation.

From-scratch JAX/XLA rebuild of the Ensemble Kalman Smoother post-processor
(reference capability set: paninski-lab/eks). Public API mirrors the
reference's five entry points plus the MarkerArray container
(reference: eks/__init__.py:7-25).
"""

from typing import Any

from eks_tpu.marker_array import MarkerArray

__all__ = [
    "MarkerArray",
    "fit_eks_singlecam",
    "fit_eks_singlecam_sessions",
    "fit_eks_multicam",
    "fit_eks_mirrored_multicam",
    "fit_eks_pupil",
    "fit_eks_pupil_sessions",
    "fit_eks_multicam_ibl_paw",
]

def _resolve_version() -> str:
    """Installed-distribution version with a static fallback for source
    checkouts (reference behavior: eks/__init__.py:28-60)."""
    try:
        import importlib.metadata

        return importlib.metadata.version("eks-tpu")
    except Exception:
        return "0.1.0"


__version__ = _resolve_version()


def __dir__() -> list:
    # lazy attributes must still appear in dir()/tab-completion, matching
    # the reference's discoverable surface
    return sorted(set(globals()) | set(__all__))


def __getattr__(name: str) -> Any:
    # lazy imports keep `import eks_tpu` light and avoid pandas/jax costs
    # until a smoother is actually used
    if name == "fit_eks_singlecam":
        from eks_tpu.models.singlecam import fit_eks_singlecam

        return fit_eks_singlecam
    if name == "fit_eks_singlecam_sessions":
        from eks_tpu.models.singlecam import fit_eks_singlecam_sessions

        return fit_eks_singlecam_sessions
    if name == "fit_eks_multicam":
        from eks_tpu.models.multicam import fit_eks_multicam

        return fit_eks_multicam
    if name == "fit_eks_mirrored_multicam":
        from eks_tpu.models.multicam import fit_eks_mirrored_multicam

        return fit_eks_mirrored_multicam
    if name == "fit_eks_pupil":
        from eks_tpu.models.ibl_pupil import fit_eks_pupil

        return fit_eks_pupil
    if name == "fit_eks_pupil_sessions":
        from eks_tpu.models.ibl_pupil import fit_eks_pupil_sessions

        return fit_eks_pupil_sessions
    if name == "fit_eks_multicam_ibl_paw":
        from eks_tpu.models.ibl_paw import fit_eks_multicam_ibl_paw

        return fit_eks_multicam_ibl_paw
    if name == "version":
        return __version__
    raise AttributeError(f"module {__name__} has no attribute {name}")
