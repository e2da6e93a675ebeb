"""Learning evidence: trained controllers must beat the random baseline.

The reference's whole point is reproducible trained controllers
(reference README.md:253-291).  artifacts/learning/ holds committed
metrics.jsonl curves from full 400-episode TPU runs of MATD3 and MAPPO on
case33 (train.py --n-envs 512, seed 7) plus a uniform-random-action
baseline evaluated on the identical env (scripts/learning_report.py).
These tests assert the committed evidence is real and self-consistent:
final/best eval reward and totally-controllable ratio must improve over
both the first eval and the random baseline by clear margins.

Regenerate with:
  python train.py --alg matd3 --scenario case33_3min_final --n-envs 512 \
      --episodes 400 --save-path artifacts/learning/matd3 --seed 7
  (same for mappo), then python scripts/learning_report.py
"""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "learning")


@pytest.fixture(scope="module")
def summary():
    path = os.path.join(ART, "summary.json")
    assert os.path.exists(path), (
        "artifacts/learning/summary.json missing — run the training commands "
        "in this file's docstring")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("alg,reward_margin,ratio_margin", [
    ("matd3", 0.02, 0.15),
    ("mappo", 0.01, 0.10),
])
def test_trained_beats_random_baseline(summary, alg, reward_margin,
                                       ratio_margin):
    assert alg in summary, f"no committed curve for {alg}"
    rnd = summary["random_baseline"]
    late_r = summary[alg]["late_mean_test_reward"]
    late_c = summary[alg]["late_mean_test_totally_controllable_ratio"]
    assert late_r > rnd["mean_test_reward"] + reward_margin, (
        f"{alg}: late eval reward {late_r:.4f} does not beat random "
        f"{rnd['mean_test_reward']:.4f} by {reward_margin}")
    assert late_c > rnd["mean_test_totally_controllable_ratio"] + ratio_margin


@pytest.mark.parametrize("alg", ["matd3", "mappo"])
def test_curve_improves_over_training(summary, alg):
    s = summary[alg]
    assert s["n_episodes"] >= 400
    assert s["late_mean_test_reward"] > s["first"]["mean_test_reward"], (
        f"{alg}: no improvement over training")
    # the committed raw curve must exist and match the summary
    path = os.path.join(os.path.dirname(ART), "..", s["metrics_path"])
    assert os.path.exists(path), s["metrics_path"]
    recs = [json.loads(l) for l in open(path)]
    evals = [r for r in recs if "mean_test_reward" in r]
    assert len(evals) == s["n_evals"]
    assert abs(evals[-1]["mean_test_reward"]
               - s["final"]["mean_test_reward"]) < 1e-9
