"""Host-side utilities: data I/O, format conversion, frame cropping, centering."""

from eks_tpu.utils.frames import (
    build_R_from_vars,
    center_predictions,
    crop_frames,
    crop_R,
)
from eks_tpu.utils.profiling import cost_summary, device_trace, stage_timer
from eks_tpu.utils.io import (
    convert_lp_dlc,
    convert_slp_dlc,
    format_data,
    get_keypoint_names,
    make_dlc_pandas_index,
    save_dlc_csv,
)

__all__ = [
    "build_R_from_vars",
    "center_predictions",
    "crop_frames",
    "crop_R",
    "convert_lp_dlc",
    "convert_slp_dlc",
    "format_data",
    "get_keypoint_names",
    "make_dlc_pandas_index",
    "save_dlc_csv",
    "cost_summary",
    "device_trace",
    "stage_timer",
]
