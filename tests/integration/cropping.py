"""Deterministic session cropping for the fast-tier parity goldens.

The fast tier (``pytest -m "not slow"``) must fail when any family's output
pipeline breaks reference parity (VERDICT r4 item 3), but the full-length
golden runs are slow-tier. The fix: both ``scripts/make_reference_goldens.py``
(running the ACTUAL reference through the dependency shims) and
``tests/integration/test_golden_fast.py`` (running this package) crop the
SAME bundled session through THIS function, so the two sides consume
byte-identical inputs and the cropped goldens are an exact contract.
"""

import os
import shutil

import numpy as np
import pandas as pd

#: fast-tier session length — long enough to exercise every pipeline stage
#: (centering quantiles, PCA, triangulation, TV-R smoothing), short enough
#: that a fixed-s end-to-end run takes seconds on CPU
FAST_N_FRAMES = 200


def make_cropped_session(src_dir: str, dst_dir: str,
                         n_frames: int = FAST_N_FRAMES) -> str:
    """Copy a session directory with every CSV truncated to its first
    ``n_frames`` data rows and every ``.npy`` timestamp array truncated to
    match; calibration TOMLs and anything else copy verbatim.

    CSVs are rewritten with ``%.17g`` so float64 values round-trip exactly —
    the cropped rows are bit-identical to the source rows.
    """
    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(src_dir)):
        src = os.path.join(src_dir, fname)
        dst = os.path.join(dst_dir, fname)
        if not os.path.isfile(src):
            continue
        if fname.endswith(".csv"):
            df = pd.read_csv(src, header=[0, 1, 2], index_col=0)
            df.iloc[:n_frames].to_csv(dst, float_format="%.17g")
        elif fname.endswith(".npy"):
            np.save(dst, np.load(src)[:n_frames])
        else:
            shutil.copy(src, dst)
    return dst_dir
