"""Golden-parquet freshness guard: regenerating a (fast) subset of the
sf0.001 goldens must reproduce the committed files exactly. Catches the
failure mode CLAUDE.md warns about — changing kernel numerics (or the
generator) without re-running scripts/make_goldens.py — locally, before
the driver's correctness gate does."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from make_goldens import GOLDENS  # noqa: E402

_SF = "/root/testdata/sf0.001"
_GOLD = os.path.join(os.path.dirname(__file__), "..", "golden", "sf0.001")

# fast, kernel-touching subset (~15 s); the full regeneration is ~40 s and
# belongs to scripts/make_goldens.py runs
FAST = ["drift_1h_1d", "dtwnn_series", "knn_series", "gorilla_roundtrip",
        "transcripts_rollup", "simhash", "minhash_pairs", "lsh_ann_topk",
        "ivf_ann_topk"]


@pytest.mark.parametrize("name", FAST)
def test_committed_golden_is_fresh(name):
    df, schema = GOLDENS[name](_SF)
    path = os.path.join(_GOLD, f"{name}.parquet")
    assert os.path.exists(path), f"missing golden: run make_goldens.py"
    want = pd.read_parquet(path)
    got = df.reset_index(drop=True)
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(
        got.sort_values(list(got.columns)).reset_index(drop=True),
        want.sort_values(list(want.columns)).reset_index(drop=True),
        check_dtype=False, check_exact=True)
