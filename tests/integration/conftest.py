"""Integration tier: golden-file parity on the bundled example sessions.

Mirrors the reference's integration strategy (tests/conftest.py:52-103 there):
every smoother runs end-to-end on bundled data and each output CSV must match
a stored golden snapshot at atol=1e-4. Regenerate after intentional numeric
changes with:

    pytest tests/integration --generate-golden
"""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)


def pytest_addoption(parser):
    parser.addoption(
        "--generate-golden",
        action="store_true",
        default=False,
        help="write golden snapshots instead of comparing against them",
    )


@pytest.fixture
def golden(request):
    generate = request.config.getoption("--generate-golden")

    def compare(name: str, df: pd.DataFrame):
        path = os.path.join(GOLDEN_DIR, f"{name}.csv")
        if generate:
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            # %.17g round-trips float64 exactly; the default shortest-repr
            # formatting of float32 columns re-parses as float64 with ~6e-8
            # relative error, which breaks atol=1e-4 on large variances
            df.to_csv(path, float_format="%.17g")
            return  # generation mode: write every golden the test produces
        if not os.path.exists(path):
            pytest.skip(f"golden missing: {path} (run --generate-golden)")
        ref = pd.read_csv(path, header=[0, 1, 2], index_col=0)
        assert ref.shape == df.shape, f"{name}: shape {df.shape} != golden {ref.shape}"
        np.testing.assert_allclose(
            df.to_numpy(), ref.to_numpy(), rtol=0, atol=1e-4,
            err_msg=f"golden mismatch: {name}",
        )

    return compare
