"""Checkpoint/lineage layer: resume skips completed stages."""

import json

from movingspark.checkpoint import Checkpointer
from tests.conftest import rows_to_points


def test_stage_writes_manifest_and_resumes(spark, tmp_path):
    df = rows_to_points(
        spark,
        [(1, "2020-01-01T00:00:00", 0, 0), (1, "2020-01-01T00:00:10", 1, 1)],
    )
    ck = Checkpointer(spark, str(tmp_path))

    calls = {"n": 0}

    def thunk():
        calls["n"] += 1
        return df

    out1 = ck.stage("s1", thunk)
    assert out1.count() == 2
    assert calls["n"] == 1
    m = ck.manifest("s1")
    assert m["rows"] == 2
    assert m["n_files"] >= 1
    assert sum(m["per_partition_rows"].values()) == 2
    assert "skew" in m

    # resume: thunk must NOT re-run
    ck2 = Checkpointer(spark, str(tmp_path))
    out2 = ck2.stage("s1", thunk)
    assert out2.count() == 2
    assert calls["n"] == 1
    assert ck2.log[-1]["action"] == "resumed"

    # invalidate forces recompute
    ck2.invalidate("s1")
    ck2.stage("s1", thunk)
    assert calls["n"] == 2
