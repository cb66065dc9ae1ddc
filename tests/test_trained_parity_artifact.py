"""Trained-checkpoint cross-framework parity, pinned at suite level.

scripts/trained_parity.py generates docs/TRAINED_PARITY.json from the
campaign checkpoints (export to the reference torch modules, run the
reference's own inference loop, compare). The artifact asserts thresholds
at generation time; this test keeps the COMMITTED artifact honest — if it
ever goes red or stale-invalid, the suite fails loudly (same pattern as
the PARITY_TPU threshold assertions)."""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "TRAINED_PARITY.json")


@pytest.mark.skipif(not os.path.isfile(ART), reason="artifact not generated")
def test_trained_parity_artifact_is_green():
    d = json.load(open(ART))
    assert d["ok"] is True
    assert d["mel_maxabs"] <= d["mel_threshold"]
    assert d["attn_maxabs"] <= d["attn_threshold"]
    assert d["ssrn_lin_maxabs"] <= d["mel_threshold"]
    assert d["ref_mel_mean_abs"] > 0.01          # non-vacuous comparison
    assert d["roundtrip_maxdiff"]["text2mel"] == 0.0
    assert d["roundtrip_maxdiff"]["ssrn"] == 0.0
    assert d["resume_checkpoint_keys_ok"] is True
