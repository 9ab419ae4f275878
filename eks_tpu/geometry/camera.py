"""Pinhole camera model: Rodrigues, OpenCV distortion, projection, calibration.

First-party replacement for the reference's cv2/aniposelib usage
(reference: eks/multicam_smoother.py:771-911). Everything on the compute path
is pure JAX; the Anipose calibration TOML is parsed with stdlib ``tomllib``.

Distortion follows the full OpenCV *rational* model
``radial = (1 + k1 r² + k2 r⁴ + k3 r⁶) / (1 + k4 r² + k5 r⁴ + k6 r⁶)``
plus tangential (p1, p2) and thin-prism (s1..s4) terms; tilt (tx, ty) is
ignored. Note the reference instead extrapolates k4..k6 as higher-order
polynomial terms (eks/multicam_smoother.py:843-844), which diverges from
OpenCV whenever those coefficients are nonzero; the rational form here matches
``cv2.projectPoints`` for every coefficient count (both agree for the <=5-term
calibrations the reference is tested on).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rodrigues",
    "inverse_rodrigues",
    "parse_dist",
    "make_projection_fn",
    "undistort_points",
    "Camera",
    "CameraGroup",
    "make_projection_from_camgroup",
    "stack_camera_params",
    "project_point",
    "project_multiview",
]


def rodrigues(rvec) -> jnp.ndarray:
    """Rotation vector (3,) -> rotation matrix (3,3), OpenCV convention.

    Uses the first-order approximation ``I + K`` below 1e-12 rotation angle
    (cv2.Rodrigues parity at machine precision for both branches).
    """
    rvec = jnp.asarray(rvec)
    theta = jnp.linalg.norm(rvec)

    def skew(v):
        vx, vy, vz = v[0], v[1], v[2]
        return jnp.array(
            [[0.0, -vz, vy], [vz, 0.0, -vx], [-vy, vx, 0.0]], dtype=rvec.dtype
        )

    def near_zero(_):
        return jnp.eye(3, dtype=rvec.dtype) + skew(rvec)

    def general(_):
        axis = rvec / theta
        K = skew(axis)
        return (
            jnp.eye(3, dtype=rvec.dtype)
            + jnp.sin(theta) * K
            + (1.0 - jnp.cos(theta)) * (K @ K)
        )

    return jax.lax.cond(theta < 1e-12, near_zero, general, operand=None)


def inverse_rodrigues(R: np.ndarray) -> np.ndarray:
    """Rotation matrix (3,3) -> rotation vector (3,), host-side numpy.

    Replaces the reference's host-side ``cv2.Rodrigues(rot)`` call
    (eks/multicam_smoother.py:870).
    """
    R = np.asarray(R, dtype=np.float64)
    tr = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(tr)
    if theta < 1e-10:
        return np.zeros(3)
    if np.pi - theta < 1e-6:
        # near pi: axis from the symmetric part, R = I + 2 aaᵀ - ... use
        # largest diagonal of (R + I)/2 = aaᵀ
        M = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.clip(np.diagonal(M), 0.0, None))
        # fix signs from off-diagonals relative to the largest component
        k = int(np.argmax(axis))
        if axis[k] > 0:
            for i in range(3):
                if i != k:
                    axis[i] = M[i, k] / axis[k]
        axis = axis / np.linalg.norm(axis)
        return theta * axis
    axis = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2.0 * np.sin(theta))
    )
    return theta * axis


def parse_dist(dist_coeffs) -> dict[str, jnp.ndarray]:
    """Pad/label OpenCV distortion coefficients.

    Ordering: ``[k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tx, ty]``;
    shorter vectors are zero-padded, tilt terms are dropped.
    """
    dc = jnp.asarray(dist_coeffs).ravel()
    dc = jnp.pad(dc, (0, max(0, 14 - dc.shape[0])))
    names = ["k1", "k2", "p1", "p2", "k3", "k4", "k5", "k6", "s1", "s2", "s3", "s4"]
    return {name: dc[i] for i, name in enumerate(names)}


def _distort(x, y, d):
    """Apply OpenCV rational + tangential + thin-prism distortion to
    normalized coordinates."""
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + d["k1"] * r2 + d["k2"] * r4 + d["k3"] * r6) / (
        1.0 + d["k4"] * r2 + d["k5"] * r4 + d["k6"] * r6
    )
    x_tan = 2.0 * d["p1"] * x * y + d["p2"] * (r2 + 2.0 * x * x)
    y_tan = d["p1"] * (r2 + 2.0 * y * y) + 2.0 * d["p2"] * x * y
    xd = x * radial + x_tan + d["s1"] * r2 + d["s2"] * r4
    yd = y * radial + y_tan + d["s3"] * r2 + d["s4"] * r4
    return xd, yd


def make_projection_fn(
    rvec: np.ndarray,
    tvec: np.ndarray,
    K: np.ndarray,
    dist_coeffs: np.ndarray,
) -> Callable:
    """Build ``project(points (..., 3)) -> (..., 2)``: world -> pixel, with
    full distortion and optional intrinsic skew (cv2.projectPoints parity)."""
    rvec = jnp.asarray(rvec)
    tvec = jnp.asarray(tvec).ravel()
    K = jnp.asarray(K)
    fx, fy, cx, cy, skew = K[0, 0], K[1, 1], K[0, 2], K[1, 2], K[0, 1]
    d = parse_dist(dist_coeffs)
    R = rodrigues(rvec)

    @jax.jit
    def project(points) -> jnp.ndarray:
        Xc = jnp.asarray(points) @ R.T + tvec
        x = Xc[..., 0] / Xc[..., 2]
        y = Xc[..., 1] / Xc[..., 2]
        xd, yd = _distort(x, y, d)
        u = fx * xd + skew * yd + cx
        v = fy * yd + cy
        return jnp.stack([u, v], axis=-1)

    return project


def undistort_points(
    points: jnp.ndarray,  # (..., 2) pixel coordinates
    K: np.ndarray,
    dist_coeffs: np.ndarray,
    num_iters: int = 5,
) -> jnp.ndarray:
    """Pixel coordinates -> undistorted *normalized* coordinates.

    Fixed-point inversion of the distortion model (the same compensation
    iteration cv2.undistortPoints uses, 5 iterations by default).
    """
    K = jnp.asarray(K)
    d = parse_dist(dist_coeffs)
    pts = jnp.asarray(points)
    fx, fy, cx, cy, skew = K[0, 0], K[1, 1], K[0, 2], K[1, 2], K[0, 1]
    yd = (pts[..., 1] - cy) / fy
    xd = (pts[..., 0] - cx - skew * yd) / fx

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        inv_radial = (1.0 + d["k4"] * r2 + d["k5"] * r4 + d["k6"] * r6) / (
            1.0 + d["k1"] * r2 + d["k2"] * r4 + d["k3"] * r6
        )
        dx = (
            2.0 * d["p1"] * x * y
            + d["p2"] * (r2 + 2.0 * x * x)
            + d["s1"] * r2
            + d["s2"] * r4
        )
        dy = (
            d["p1"] * (r2 + 2.0 * y * y)
            + 2.0 * d["p2"] * x * y
            + d["s3"] * r2
            + d["s4"] * r4
        )
        return ((xd - dx) * inv_radial, (yd - dy) * inv_radial)

    x, y = jax.lax.fori_loop(0, num_iters, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


# --------------------------------------------------------------------------- #
# calibration container
# --------------------------------------------------------------------------- #
@dataclass
class Camera:
    """One calibrated camera (Anipose TOML section)."""

    name: str
    matrix: np.ndarray  # (3, 3) intrinsics
    dist: np.ndarray  # distortion coefficients, OpenCV order
    rvec: np.ndarray  # (3,) rotation vector (world -> camera)
    tvec: np.ndarray  # (3,) translation
    size: tuple | None = None
    _project: Callable | None = field(default=None, repr=False)

    # aniposelib-compatible accessors (reference calls these at
    # eks/multicam_smoother.py:869-873)
    def get_name(self) -> str:
        return self.name

    def get_rotation(self) -> np.ndarray:
        return self.rvec

    def get_translation(self) -> np.ndarray:
        return self.tvec

    def get_camera_matrix(self) -> np.ndarray:
        return self.matrix

    def get_distortions(self) -> np.ndarray:
        return self.dist

    def extrinsics(self) -> np.ndarray:
        """(3, 4) [R | t] world->camera matrix (host, float64)."""
        rv = np.asarray(self.rvec, dtype=np.float64)
        theta = np.linalg.norm(rv)
        if theta < 1e-12:
            K = np.array(
                [[0, -rv[2], rv[1]], [rv[2], 0, -rv[0]], [-rv[1], rv[0], 0]]
            )
            R = np.eye(3) + K
        else:
            a = rv / theta
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
            R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        t = np.asarray(self.tvec, dtype=np.float64).reshape(3, 1)
        return np.concatenate([R, t], axis=1)

    def projection_fn(self) -> Callable:
        if self._project is None:
            self._project = make_projection_fn(
                self.rvec, self.tvec, self.matrix, self.dist
            )
        return self._project

    def undistort(self, points) -> jnp.ndarray:
        return undistort_points(points, self.matrix, self.dist)


class CameraGroup:
    """A set of calibrated cameras with batched triangulation."""

    def __init__(self, cameras: list[Camera], metadata: dict | None = None):
        self.cameras = cameras
        self.metadata = metadata or {}

    @classmethod
    def load(cls, path: str) -> "CameraGroup":
        """Parse an Anipose-style calibration TOML
        (format: reference data/fly/calibration.toml)."""
        with open(path, "rb") as f:
            data = tomllib.load(f)
        cameras = []
        for key in sorted(k for k in data if k.startswith("cam")):
            sec = data[key]
            rot = np.asarray(sec["rotation"], dtype=np.float64)
            if rot.shape == (3, 3):
                rvec = inverse_rodrigues(rot)
            else:
                rvec = rot.ravel()
            cameras.append(
                Camera(
                    name=str(sec.get("name", key)),
                    matrix=np.asarray(sec["matrix"], dtype=np.float64),
                    dist=np.asarray(sec["distortions"], dtype=np.float64).ravel(),
                    rvec=rvec,
                    tvec=np.asarray(sec["translation"], dtype=np.float64).ravel(),
                    size=tuple(sec["size"]) if "size" in sec else None,
                )
            )
        return cls(cameras, metadata=data.get("metadata", {}))

    def triangulate(self, points, undistort: bool = True, **_ignored) -> np.ndarray:
        """Batched DLT triangulation: (C, N, 2) pixel points -> (N, 3).

        Points with NaN in any coordinate are dropped per camera; rows with
        fewer than 2 valid views come back NaN (aniposelib.triangulate
        semantics, reference call site eks/multicam_smoother.py:902).
        """
        from eks_tpu.geometry.triangulate import triangulate_dlt

        pts = np.asarray(points, dtype=np.float64)
        if undistort:
            und = np.stack(
                [
                    np.asarray(cam.undistort(jnp.asarray(pts[c])))
                    for c, cam in enumerate(self.cameras)
                ]
            )
        else:
            und = pts
        extr = np.stack([cam.extrinsics() for cam in self.cameras])  # (C, 3, 4)
        return np.asarray(triangulate_dlt(jnp.asarray(und), jnp.asarray(extr)))


def project_multiview(rvecs, tvecs, Ks, dists, x: jnp.ndarray) -> jnp.ndarray:
    """Multi-view projector with explicit parameters: world point ``x`` (3,)
    -> concatenated pixels (2C,) in camera order.

    Module-level so it can be bound with ``jax.tree_util.Partial`` and passed
    *through* jit as a traced argument: the jit cache then keys on the stable
    function identity + shapes, not on a per-call closure object, so repeated
    sessions (or different calibrations of the same camera count) reuse one
    compilation. Arithmetic mirrors :func:`make_projection_fn` per camera."""
    outs = []
    for c in range(Ks.shape[0]):
        R = rodrigues(rvecs[c])
        K, d = Ks[c], parse_dist(dists[c])
        Xc = x @ R.T + tvecs[c]
        xn = Xc[..., 0] / Xc[..., 2]
        yn = Xc[..., 1] / Xc[..., 2]
        xd, yd = _distort(xn, yn, d)
        u = K[0, 0] * xd + K[0, 1] * yd + K[0, 2]
        v = K[1, 1] * yd + K[1, 2]
        outs.append(jnp.stack([u, v], axis=-1))
    return jnp.concatenate(outs, axis=-1)


def make_projection_from_camgroup(camgroup: CameraGroup):
    """Combined multi-view projector ``h_fn: (3,) -> (2C,)`` plus per-camera
    heads, for use as the EKF emission function.

    ``h_fn`` is a ``jax.tree_util.Partial`` over :func:`project_multiview`
    with the camera parameters as pytree leaves — a legal *traced* jit
    argument, so the smoother/optimizer programs compile once per shape
    rather than once per calibration closure."""
    h_cams = [cam.projection_fn() for cam in camgroup.cameras]
    rvecs = np.stack([np.asarray(c.rvec, dtype=np.float64).ravel() for c in camgroup.cameras])
    tvecs = np.stack([np.asarray(c.tvec, dtype=np.float64).ravel() for c in camgroup.cameras])
    Ks, dists, _ = stack_camera_params(camgroup)
    # leaves stay host-side numpy: uploaded on trace/call, never committed to
    # the ambient default backend (matters when running under a CPU test mesh
    # next to a real TPU — see parallel/mesh.py)
    h_fn = jax.tree_util.Partial(project_multiview, rvecs, tvecs, Ks, dists)
    return h_fn, h_cams


def stack_camera_params(camgroup: CameraGroup):
    """Stack a camera group's parameters into fixed-shape host arrays so
    every per-camera geometry op can run as ONE batched device program
    (vmapped over the camera axis) instead of C separate dispatches.

    Returns (Ks (C, 3, 3), dists (C, 14) zero-padded, extr (C, 3, 4)).
    """
    Ks = np.stack([np.asarray(c.matrix, dtype=np.float64) for c in camgroup.cameras])
    dists = np.zeros((len(camgroup.cameras), 14))
    for i, c in enumerate(camgroup.cameras):
        d = np.asarray(c.dist, dtype=np.float64).ravel()
        dists[i, : d.shape[0]] = d[:14]
    extr = np.stack([c.extrinsics() for c in camgroup.cameras])
    return Ks, dists, extr


def project_point(pt: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                  K: jnp.ndarray, dist14: jnp.ndarray) -> jnp.ndarray:
    """World point (3,) -> pixel (2,) with explicit camera parameters.

    Same model as :func:`make_projection_fn` but parameter-passing instead of
    closure-capturing, so it composes with ``vmap`` over a camera axis and
    with ``jacfwd`` for covariance projection."""
    d = parse_dist(dist14)
    Xc = R @ pt + t
    x = Xc[0] / Xc[2]
    y = Xc[1] / Xc[2]
    xd, yd = _distort(x, y, d)
    u = K[0, 0] * xd + K[0, 1] * yd + K[0, 2]
    v = K[1, 1] * yd + K[1, 2]
    return jnp.stack([u, v])
