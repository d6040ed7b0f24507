"""The pinned expected-value oracles are only valid for the exact
parquet bytes they were generated from. The driver regenerates
/root/testdata between rounds; if the bytes move (even float-noise
that flips one stop boundary), this test fails IMMEDIATELY with the
regeneration command instead of letting the correctness gate produce
confusing off-by-a-few row mismatches."""

import hashlib
import os

import pytest

from movingspark.pinned_oracles_sf001 import DATA_FINGERPRINT


@pytest.mark.parametrize("sf_dir", sorted(DATA_FINGERPRINT))
def test_pinned_oracles_match_current_testdata(sf_dir):
    path = f"{sf_dir}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    with open(path, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    assert digest == DATA_FINGERPRINT[sf_dir], (
        f"{path} changed since the pinned oracles were generated — "
        "run `python tools/gen_pinned_oracles.py` to regenerate "
        "movingspark/pinned_oracles_sf001.py"
    )
