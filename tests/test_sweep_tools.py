"""Unit tests for the MPC sweep tooling (scripts/merge_sweeps.py and
scripts/promote_winning_arm.py) — pure-host JSON/file logic."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True)


def test_merge_sweeps_concatenates_and_recomputes(tmp_path):
    base = {"env": "pong", "bundle": "runs/pong_cf",
            "arms": {"ref": {"episodes": [1.0, 2.0], "mean": 1.5,
                             "std": 0.707, "stderr": 0.5, "n": 2,
                             "seeds": ["ds0+0", "ds0+1"],
                             "config": "{'lookahead': 2}"}}}
    extra = {"env": "pong", "bundle": "pretrained_models/pong_cf",
             "arms": {"ref": {"episodes": [3.0, 4.0], "mean": 3.5,
                              "std": 0.707, "stderr": 0.5, "n": 2,
                              "seeds": ["ds100+0", "ds100+1"]},
                      "greedy": {"episodes": [9.0], "mean": 9.0,
                                 "std": 0.0, "stderr": 0.0, "n": 1}}}
    b, e = tmp_path / "b.json", tmp_path / "e.json"
    b.write_text(json.dumps(base))
    e.write_text(json.dumps(extra))
    out = _run("merge_sweeps.py", str(b), str(e),
               "--out", str(tmp_path / "m.json"))
    assert out.returncode == 0, out.stderr
    m = json.loads((tmp_path / "m.json").read_text())
    assert m["arms"]["ref"]["episodes"] == [1.0, 2.0, 3.0, 4.0]
    assert m["arms"]["ref"]["n"] == 4
    assert abs(m["arms"]["ref"]["mean"] - 2.5) < 1e-9
    assert m["arms"]["ref"]["config"] == "{'lookahead': 2}"
    assert m["arms"]["ref"]["seeds"] == ["ds0+0", "ds0+1",
                                         "ds100+0", "ds100+1"]
    assert m["arms"]["greedy"]["n"] == 1
    # provenance refreshed to the tracked bundle path
    assert m["bundle"] == "pretrained_models/pong_cf"


def test_merge_sweeps_overlap_guard(tmp_path):
    """Same-name arm merges REQUIRE seeds and REFUSE overlapping ranges
    (ADVICE r4 'high': a seed0=0 rerun once duplicated the original
    episodes verbatim into the tracked JSON)."""
    base = {"env": "pong", "arms": {
        "ref": {"episodes": [1.0, 2.0], "mean": 1.5, "std": 0.707,
                "stderr": 0.5, "n": 2, "seeds": [0, 1]}}}
    b = tmp_path / "b.json"
    b.write_text(json.dumps(base))

    # overlapping seeds -> refuse
    e1 = tmp_path / "e1.json"
    e1.write_text(json.dumps({"env": "pong", "arms": {
        "ref": {"episodes": [1.0, 9.0], "mean": 5.0, "std": 5.66,
                "stderr": 4.0, "n": 2, "seeds": [1, 2]}}}))
    out = _run("merge_sweeps.py", str(b), str(e1),
               "--out", str(tmp_path / "m1.json"))
    assert out.returncode != 0
    assert "overlap" in (out.stdout + out.stderr).lower()

    # --allow-overlap drops the duplicates instead of duplicating them
    out = _run("merge_sweeps.py", str(b), str(e1), "--allow-overlap",
               "--out", str(tmp_path / "m2.json"))
    assert out.returncode == 0, out.stderr
    m = json.loads((tmp_path / "m2.json").read_text())
    assert m["arms"]["ref"]["episodes"] == [1.0, 2.0, 9.0]
    assert m["arms"]["ref"]["seeds"] == [0, 1, 2]

    # missing seeds on either side -> refuse (independence unprovable)
    e2 = tmp_path / "e2.json"
    e2.write_text(json.dumps({"env": "pong", "arms": {
        "ref": {"episodes": [3.0], "mean": 3.0, "std": 0.0,
                "stderr": 0.0, "n": 1}}}))
    out = _run("merge_sweeps.py", str(b), str(e2),
               "--out", str(tmp_path / "m3.json"))
    assert out.returncode != 0
    assert "seeds" in (out.stdout + out.stderr).lower()


def test_promote_winning_arm_copies_scores(tmp_path):
    sweep = {"env": "pong", "bundle": "x", "arms": {
        "random": {"episodes": [0.0], "mean": 0.0, "stderr": 0, "n": 1},
        "oracle_ref": {"episodes": [99.0], "mean": 99.0, "stderr": 0,
                       "n": 1},
        "ref": {"episodes": [1.0], "mean": 1.0, "stderr": 0, "n": 1,
                "config": "a"},
        "greedy": {"episodes": [5.0], "mean": 5.0, "stderr": 0, "n": 1,
                   "config": "b"},
    }}
    sweep_path = tmp_path / "mpc_sweep_pong.json"
    sweep_path.write_text(json.dumps(sweep))
    score_dir = tmp_path / "mpc_scores_pong" / "greedy"
    score_dir.mkdir(parents=True)
    for i in range(3):
        (score_dir / f"evaluation_metrics_{1000 + i}.txt").write_text(
            f"Finished at t=301 with cumulative reward {i}\n")
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    (bundle / "eval").mkdir()
    (bundle / "eval" / "evaluation_metrics_9.txt").write_text("stale\n")

    out = _run("promote_winning_arm.py", "--sweep", str(sweep_path),
               "--bundle", str(bundle))
    assert out.returncode == 0, out.stderr
    files = sorted(os.listdir(bundle / "eval"))
    # stale score file replaced; oracle/random ineligible -> greedy wins
    assert "evaluation_metrics_9.txt" not in files
    assert sum(f.startswith("evaluation_metrics_") for f in files) == 3
    note = json.loads((bundle / "eval" / "mpc_arm.json").read_text())
    assert note["winning_arm"] == "greedy"
    assert note["random_baseline"] == 0.0
