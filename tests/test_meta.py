"""Suite-level invariants.

The README's advertised test count drifted in rounds 2, 3 and 4 (nothing
checked it); this pins it to the live collection so the next added test
fails here until the README is updated with it.
"""

import glob
import os
import re

import pytest

import conftest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_test_count_matches_collection():
    n_test_files = len(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if conftest.COLLECTION["n_files"] < n_test_files:
        pytest.skip("partial collection (subset run) — count only "
                    "meaningful for the full suite")
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    m = re.search(r"(\d+)\s+tests", readme)
    assert m, "README no longer states the test count"
    claimed = int(m.group(1))
    actual = conftest.COLLECTION["n_items"]
    assert claimed == actual, (
        f"README says {claimed} tests but the suite collects {actual} — "
        f"update the README count")
