"""MarkerArray: named-axis 5-D container for ensemble pose predictions.

Axes are fixed as ``(models, cameras, frames, keypoints, fields)``; fields are
named (e.g. ``["x", "y", "likelihood"]``). API parity with the reference
container (reference: eks/marker_array.py:15-266) so downstream smoothers can
slice/stack without positional-axis bookkeeping.

The container is host-side (NumPy-backed by default): it exists to organise
I/O and packaging. Device compute takes raw arrays extracted from it; nothing
in the hot path loops over MarkerArray.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

try:  # jax arrays are accepted but never required
    import jax.numpy as jnp

    _ARRAY_TYPES: tuple = (np.ndarray, jnp.ndarray)
except Exception:  # pragma: no cover
    jnp = None
    _ARRAY_TYPES = (np.ndarray,)

__all__ = [
    "MarkerArray",
    "input_dfs_to_markerArray",
    "mA_to_stacked_array",
    "stacked_array_to_mA",
]

# canonical axis order for every MarkerArray
_AXES = ("models", "cameras", "frames", "keypoints", "fields")


class MarkerArray:
    """A 5-D array of shape (n_models, n_cameras, n_frames, n_keypoints, n_fields)
    with named axes and named fields.

    Construct from an array, an empty shape, or by cloning another instance.
    """

    def __init__(
        self,
        array: Union[np.ndarray, "jnp.ndarray", None] = None,
        shape: tuple | None = None,
        data_fields: list[str] | None = None,
        marker_array: Optional["MarkerArray"] = None,
        dtype: type = np.float32,
    ):
        if marker_array is not None:
            assert isinstance(marker_array, MarkerArray), (
                "marker_array must be a MarkerArray."
            )
            if array is not None:
                # clone-with-override (used by reorder)
                self.array = array
            else:
                self.array = np.array(marker_array.array, dtype=dtype)
            self.data_fields = (
                marker_array.data_fields if data_fields is None else data_fields
            )
        elif array is not None:
            assert isinstance(array, _ARRAY_TYPES), (
                "Input must be a NumPy or JAX array."
            )
            assert array.ndim == 5, (
                "Expected shape (n_models, n_cameras, n_frames, n_keypoints, n_fields)."
            )
            self.array = array
            self.data_fields = data_fields
        elif shape is not None:
            assert len(shape) == 5, (
                "Shape must be (n_models, n_cameras, n_frames, n_keypoints, n_fields)."
            )
            self.array = np.zeros(tuple(int(s) for s in shape), dtype=dtype)
            self.data_fields = data_fields
        else:
            raise AssertionError("Provide either `array`, `shape`, or `marker_array`.")

        (
            self.n_models,
            self.n_cameras,
            self.n_frames,
            self.n_keypoints,
            self.n_fields,
        ) = self.array.shape
        self.axis_map = {name: i for i, name in enumerate(_AXES)}

    # ------------------------------------------------------------------ #
    @property
    def shape(self) -> tuple:
        return tuple(self.array.shape)

    def get_array(self, squeeze: bool = False) -> np.ndarray:
        """Underlying array, with singleton axes squeezed out if requested."""
        return np.squeeze(self.array) if squeeze else self.array

    # ------------------------------------------------------------------ #
    def slice(self, axis: str, indices) -> "MarkerArray":
        """Take ``indices`` along a named axis; the axis is kept (len >= 1)."""
        assert axis in self.axis_map, (
            f"Invalid slice axis: {axis}. Must be one of {list(self.axis_map.keys())}."
        )
        if isinstance(indices, (int, np.integer)):
            indices = [int(indices)]
        return MarkerArray(
            np.take(self.array, indices, axis=self.axis_map[axis]),
            data_fields=self.data_fields,
        )

    def slice_fields(self, *fields: str) -> "MarkerArray":
        """Keep only the named fields (in the order given)."""
        for f in fields:
            assert f in self.data_fields, (
                f"Field '{f}' not found in data_fields: {self.data_fields}"
            )
        idxs = [self.data_fields.index(f) for f in fields]
        return MarkerArray(
            np.take(self.array, idxs, axis=4), data_fields=list(fields)
        )

    # ------------------------------------------------------------------ #
    @staticmethod
    def stack(others: Sequence["MarkerArray"], axis: str) -> "MarkerArray":
        """Concatenate multiple MarkerArrays along a named axis."""
        assert len(others) > 0, "At least one MarkerArray must be provided for stacking."
        ref = others[0]
        assert axis in ref.axis_map, (
            f"Invalid stack axis: {axis}. Must be one of {list(ref.axis_map.keys())}."
        )
        ax = ref.axis_map[axis]
        for other in others[1:]:
            assert isinstance(other, MarkerArray), (
                "All elements in 'others' must be MarkerArray instances."
            )
            ref_rest = ref.array.shape[:ax] + ref.array.shape[ax + 1:]
            oth_rest = other.array.shape[:ax] + other.array.shape[ax + 1:]
            assert ref_rest == oth_rest, (
                f"Shape mismatch: Cannot stack along '{axis}' due to differing dimensions."
            )
        return MarkerArray(
            np.concatenate([o.array for o in others], axis=ax),
            data_fields=ref.data_fields,
        )

    def stack_fields(*marker_arrays: "MarkerArray") -> "MarkerArray":
        """Concatenate along the fields axis, merging field names."""
        assert len(marker_arrays) > 0, (
            "At least one MarkerArray must be provided for stacking."
        )
        ref = marker_arrays[0]
        for other in marker_arrays[1:]:
            assert isinstance(other, MarkerArray), (
                "All inputs must be MarkerArray instances."
            )
            assert ref.array.shape[:4] == other.array.shape[:4], (
                "Shape mismatch: Cannot stack along 'fields' due to differing dimensions."
            )
        merged_fields: list[str] = []
        for other in marker_arrays:
            assert other.data_fields is not None, (
                "All MarkerArrays must have data_fields defined."
            )
            merged_fields.extend(other.data_fields)
        return MarkerArray(
            np.concatenate([o.array for o in marker_arrays], axis=4),
            data_fields=merged_fields,
        )

    def reorder_data_fields(self, new_order: list[str]) -> "MarkerArray":
        """Permute the fields axis to match ``new_order``."""
        assert set(new_order) == set(self.data_fields), (
            f"Mismatch in data fields: Expected {self.data_fields}, but got {new_order}"
        )
        idxs = [self.data_fields.index(f) for f in new_order]
        return MarkerArray(
            marker_array=self,
            array=np.take(self.array, idxs, axis=4),
            data_fields=new_order,
        )

    # ------------------------------------------------------------------ #
    def __repr__(self) -> str:
        dims = ", ".join(
            f"{n}={s}" for n, s in zip(_AXES, self.array.shape, strict=True)
        )
        backend = "NumPy" if isinstance(self.array, np.ndarray) else "JAX"
        return f"MarkerArray({dims}, data_fields={self.data_fields}, type={backend})"


# ---------------------------------------------------------------------- #
# converters
# ---------------------------------------------------------------------- #
def input_dfs_to_markerArray(
    input_dfs_list,
    bodypart_list: list[str],
    camera_names: list[str],
    data_fields: list[str] = ["x", "y", "likelihood"],
) -> MarkerArray:
    """Build a (models, cameras, frames, keypoints, fields) MarkerArray from a
    per-camera list of per-model DataFrames with flat ``{kp}_{field}`` columns.

    Reference semantics: eks/marker_array.py:269-299.
    """
    n_keypoints = len(bodypart_list)
    n_cameras = len(camera_names)
    n_models = len(input_dfs_list[0])
    n_frames = input_dfs_list[0][0].shape[0]
    n_fields = len(data_fields)

    out = np.zeros((n_models, n_cameras, n_frames, n_keypoints, n_fields))
    for c in range(n_cameras):
        for m in range(n_models):
            df = input_dfs_list[c][m]
            # one gather per (keypoint, field) column
            for k, kp in enumerate(bodypart_list):
                for d, field in enumerate(data_fields):
                    out[m, c, :, k, d] = df[f"{kp}_{field}"].to_numpy()
    return MarkerArray(out, data_fields=data_fields)


def mA_to_stacked_array(marker_array: MarkerArray, keypoint_idx: int) -> np.ndarray:
    """Flatten one keypoint of a single-model MarkerArray to (n_frames, n_cameras*n_fields),
    with per-frame layout [cam0 fields..., cam1 fields..., ...].

    Reference semantics: eks/marker_array.py:302-324.
    """
    _, n_cameras, n_frames, n_keypoints, n_fields = marker_array.shape
    assert 0 <= keypoint_idx < n_keypoints, (
        f"keypoint_idx {keypoint_idx} is out of range (0-{n_keypoints - 1})"
    )
    sel = marker_array.slice("keypoints", keypoint_idx).get_array()[0]
    # (cameras, frames, 1, fields) -> (frames, cameras*fields)
    return sel.transpose(1, 0, 2, 3).reshape(-1, n_cameras * n_fields)


def stacked_array_to_mA(
    stacked: np.ndarray,
    n_cameras: int,
    data_fields: list[str],
) -> MarkerArray:
    """Inverse of :func:`mA_to_stacked_array` for a single keypoint:
    (n_frames, n_cameras*n_fields) -> MarkerArray (1, n_cameras, n_frames, 1, n_fields).
    """
    n_frames, total = stacked.shape
    assert total % n_cameras == 0, (
        "Input shape mismatch: total fields must be divisible by n_cameras."
    )
    n_fields = total // n_cameras
    arr = stacked.reshape(n_frames, n_cameras, n_fields).transpose(1, 0, 2)
    return MarkerArray(arr[None, :, :, None, :], data_fields=data_fields)
