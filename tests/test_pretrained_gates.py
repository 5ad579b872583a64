"""Shipped student fidelity gates must be self-verifying.

Round-3 VERDICT "Weak #1": the h64/h80 bundles shipped fidelity gates
measured against a teacher that no longer existed in the repo.  The gate
record now carries the teacher weight hash (checkpoint.bundle_hash), and
this test asserts every shipped passing gate's hash matches the teacher
bundle actually shipped — so a stale gate can never silently ride along
after a teacher retrain.
"""

import glob
import json
import os

import pytest

from scmgan_tpu.train.checkpoint import bundle_hash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FID_PATHS = sorted(
    glob.glob(os.path.join(REPO, "pretrained_models", "*student*",
                           "fidelity.json")))


@pytest.mark.parametrize("fid_path", FID_PATHS,
                         ids=[os.path.basename(os.path.dirname(p))
                              for p in FID_PATHS])
def test_shipped_gate_matches_shipped_teacher(fid_path):
    with open(fid_path) as f:
        fid = json.load(f)
    if not fid.get("within_1pct"):
        pytest.skip("gate not claimed passing — nothing to verify")
    assert "teacher_hash" in fid, (
        f"{fid_path} claims within_1pct but records no teacher_hash — "
        "re-run scripts/distill_student.py (or --fidelity-only) against "
        "the shipped teacher")
    rec = fid.get("teacher", "")
    candidates = [
        os.path.join(REPO, rec),
        os.path.join(REPO, "pretrained_models",
                     os.path.basename(rec.rstrip("/"))),
    ]
    hashes = {c: bundle_hash(c) for c in candidates if os.path.isdir(c)}
    assert hashes, f"{fid_path}: teacher bundle {rec!r} not found in repo"
    assert fid["teacher_hash"] in hashes.values(), (
        f"{fid_path}: teacher_hash {fid['teacher_hash']} matches none of "
        f"{hashes} — the gate was measured against a teacher that is not "
        "the shipped one; re-distill or re-measure")


@pytest.mark.parametrize("fid_path", FID_PATHS,
                         ids=[os.path.basename(os.path.dirname(p))
                              for p in FID_PATHS])
def test_shipped_student_bundle_is_self_contained(fid_path):
    """Served program == measured program: a passing student bundle must
    ship the decoder it was measured with (ADVICE r3)."""
    with open(fid_path) as f:
        fid = json.load(f)
    if not fid.get("within_1pct"):
        pytest.skip("gate not claimed passing")
    d = os.path.dirname(fid_path)
    assert os.path.exists(os.path.join(d, "model-transition.npz"))
    assert os.path.exists(os.path.join(d, "model-decoder.npz")), (
        f"{d} claims a passing gate but ships no decoder")
