"""Load the actual reference implementation (/root/reference/eks) with
first-party dependency shims (tests/shims) so it runs end-to-end in this
environment and produces true reference outputs to diff against.

The reference's own parity contract for outputs is
``assert_allclose(rtol=0, atol=1e-4)`` (/root/reference/tests/conftest.py:95-101);
the parity suite in test_reference_parity.py holds this package to that
contract against CSVs produced by the reference itself.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SHIMS = os.path.join(REPO, "tests", "shims")
REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "eks"))


def load_reference_eks():
    """Put the shims and the reference checkout on sys.path and import the
    reference ``eks`` package. Shims go first so ``dynamax``/``aniposelib``/
    ``sleap_io``/``toml`` resolve to tests/shims."""
    for p in (REFERENCE, SHIMS):
        if p not in sys.path:
            sys.path.insert(0, p)
    import eks  # the reference package, not this repo

    assert os.path.dirname(os.path.abspath(eks.__file__)).startswith(REFERENCE), (
        f"imported eks from {eks.__file__}, expected the reference checkout"
    )
    return eks
