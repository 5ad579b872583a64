"""Pretrained-bundle export (scripts/export_pretrained.py) and bench.py's
student-path discovery across runs/ and pretrained_models/.

The reference ships pretrained weights (start.sh wget of a tarball,
reference start.sh:15-22); this framework tracks them in-repo under
pretrained_models/ so a fresh checkout can evaluate/serve/bench without
retraining.  These tests pin the contract: the exporter copies exactly the
checkpoint + record files with a provenance MANIFEST, and bench.py's
fidelity gate admits students found in either location."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_teacher(tmp_path):
    """Minimal teacher bundle whose bundle_hash the student gates cite
    (gates without a verifiable teacher_hash are refused — round-4
    self-verifying-gate rule)."""
    from scmgan_tpu.train.checkpoint import bundle_hash

    teacher = tmp_path / "pretrained_models" / "minipacman_cf"
    teacher.mkdir(parents=True, exist_ok=True)
    for f in ("model-encoder.npz", "model-transition.npz",
              "model-decoder.npz", "model-reward_predictor.npz"):
        np.savez(teacher / f, w=np.ones(2, np.float32))
    return str(teacher), bundle_hash(str(teacher))


@pytest.fixture()
def fake_run(tmp_path):
    teacher, thash = _fake_teacher(tmp_path)
    run = tmp_path / "runs" / "minipacman_student_h48"
    run.mkdir(parents=True)
    np.savez(run / "model-transition.npz", w=np.zeros(3, np.float32))
    np.savez(run / "model-decoder.npz", w=np.zeros(3, np.float32))
    (run / "fidelity.json").write_text(json.dumps({
        "env": "minipacman", "hidden": 48, "within_1pct": True,
        "mse10_delta_pct": 0.4, "teacher": "pretrained_models/minipacman_cf",
        "teacher_hash": thash}))
    (run / "evaluation_metrics_123.txt").write_text("score 1.0\n")
    (run / "ignored.avi").write_text("not exported")
    return run


def test_export_copies_records_with_manifest(fake_run, tmp_path):
    exporter = _load_module(
        os.path.join(REPO, "scripts", "export_pretrained.py"),
        "export_pretrained")
    dst = exporter.export(str(fake_run), root=str(tmp_path / "pm"))
    names = sorted(os.listdir(dst))
    assert "model-transition.npz" in names
    assert "fidelity.json" in names
    assert "evaluation_metrics_123.txt" in names
    assert "ignored.avi" not in names
    manifest = json.loads(open(os.path.join(dst, "MANIFEST.json")).read())
    assert manifest["source"] == str(fake_run)
    assert manifest["files"]["fidelity.json"]["bytes"] > 0


def test_bench_student_lookup_prefers_smallest_and_searches_both(
        fake_run, tmp_path, monkeypatch):
    bench = _load_module(os.path.join(REPO, "bench.py"), "bench_mod")
    exporter = _load_module(
        os.path.join(REPO, "scripts", "export_pretrained.py"),
        "export_pretrained")
    # a second, smaller student only in pretrained_models/
    exporter.export(str(fake_run), name="minipacman_student_h32",
                    root=str(tmp_path / "pretrained_models"))
    from scmgan_tpu.train.checkpoint import bundle_hash

    thash = bundle_hash(str(tmp_path / "pretrained_models"
                            / "minipacman_cf"))
    fid = tmp_path / "pretrained_models" / "minipacman_student_h32" / \
        "fidelity.json"
    fid.write_text(json.dumps({
        "env": "minipacman", "hidden": 32, "within_1pct": True,
        "mse10_delta_pct": 0.9, "teacher": "pretrained_models/minipacman_cf",
        "teacher_hash": thash}))
    monkeypatch.chdir(tmp_path)
    got = bench._validated_student()
    assert got is not None
    hidden, npz, record = got
    assert hidden == 32 and "pretrained_models" in npz
    # failed gates and non-flagship envs are refused
    fid.write_text(json.dumps({
        "env": "minipacman", "hidden": 32, "within_1pct": False}))
    assert bench._validated_student()[0] == 48
    # a stale teacher hash (teacher retrained since the gate) is refused
    fid.write_text(json.dumps({
        "env": "minipacman", "hidden": 32, "within_1pct": True,
        "mse10_delta_pct": 0.9, "teacher": "pretrained_models/minipacman_cf",
        "teacher_hash": "deadbeefdeadbeef"}))
    assert bench._validated_student()[0] == 48
    (fake_run / "fidelity.json").write_text(json.dumps({
        "env": "gridworld", "hidden": 48, "within_1pct": True}))
    assert bench._validated_student() is None


def test_pretrained_patterns_are_tracked_by_git():
    """The global model-*.npz ignore must not swallow pretrained bundles
    (the round-2 reset lost every trained artifact this way)."""
    out = subprocess.run(
        ["git", "-C", REPO, "check-ignore",
         "pretrained_models/x/model-encoder.npz",
         "pretrained_models/x/fidelity.json"],
        capture_output=True, text=True)
    assert out.returncode == 1, f"still ignored: {out.stdout}"
