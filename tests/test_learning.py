"""Learning evidence: the WHOLE algorithm zoo must demonstrably learn.

The reference's core deliverable is reproducible trained controllers for
every algorithm (reference train_case33.sh:7-21; README.md:253-291).
artifacts/learning/ holds committed metrics.jsonl curves from full
400-episode TPU runs of all 10 algorithms on case33 (train protocol:
n_envs 512, seed 7, reference cadences), plus one decentralised-mode run
and one case322 run, plus a uniform-random-action baseline evaluated on
the identical env with the same per-episode mean-of-means weighting
(scripts/learning_report.py; the reference's RandomAgent role,
models/random.py:7-18).

These tests assert the committed evidence is real and self-consistent:
late (last-3-evals) reward and totally-controllable ratio must beat the
random baseline by per-algorithm margins chosen as floors under the
measured results, and every curve must improve over its own first eval.
FACMADDPG was round-3's one weak learner (late ratio 0.678 at the
reference's exact hyperparameters).  The committed sweep
(artifacts/facmaddpg_sweep/summary.json) isolated the cause: the
reference's own target_update_freq of 4800 freezes the soft targets
(~20 refreshes per run).  At the zoo-standard 120
(configs/alg/facmaddpg.yaml, documented deviation) it learns like the
rest of the DDPG family and is held to the same margins below.

Regenerate with:  python scripts/train_zoo.py --force
                  python scripts/learning_report.py
"""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "learning")

# run -> (reward_margin over random, ratio_margin over random);
# None = no margin assertion on that metric (self-improvement only)
MARGINS = {
    "iddpg": (0.02, 0.20),
    "maddpg": (0.02, 0.20),
    "matd3": (0.02, 0.20),
    "ippo": (0.02, 0.30),
    "mappo": (0.02, 0.30),
    "iac": (0.02, 0.30),
    "coma": (0.02, 0.30),
    "sqddpg": (0.02, 0.30),
    "maac": (0.02, 0.30),
    "facmaddpg": (0.02, 0.20),
    "maddpg_decentralised": (0.02, 0.20),
    # case322's synthetic feeder is near-controllable even untrained
    # (random baseline ratio 0.979): assert the reward gap, which is where
    # learning shows (q_loss/voltage-deviation trade-off)
    "mappo_case322": (0.02, 0.01),
    # case69 (the second REAL feeder, Baran-Wu 1989): random is only 52%
    # controllable; trained runs reach 0.83/0.73.  Reward margins are
    # small: the case69 zero-action point is reward-benign (the reward
    # mixes the voltage barrier with q_loss), so control quality shows in
    # the ratio
    "maddpg_case69": (0.005, 0.20),
    "mappo_case69": (0.005, 0.15),
}

# runs whose SELF-improvement is asserted on the controllable ratio rather
# than reward: on case69 an untrained policy's first eval lands at a
# reward-benign operating point (-0.023) while controlling only ~44% of
# buses; training trades a little q_loss reward for +0.3-0.4 absolute
# controllability, which is the objective that matters
RATIO_IMPROVEMENT_RUNS = {"maddpg_case69", "mappo_case69"}


@pytest.fixture(scope="module")
def summary():
    path = os.path.join(ART, "summary.json")
    assert os.path.exists(path), (
        "artifacts/learning/summary.json missing — run "
        "scripts/train_zoo.py then scripts/learning_report.py")
    with open(path) as f:
        return json.load(f)


def _baseline_for(summary, run):
    for suffix in ("case322", "case141", "case69"):
        if run.endswith("_" + suffix):
            return summary["random_baseline_" + suffix]
    return summary["random_baseline"]


def test_all_zoo_runs_committed(summary):
    missing = [r for r in MARGINS if r not in summary]
    assert not missing, f"no committed curves for {missing}"


@pytest.mark.parametrize("run", sorted(MARGINS))
def test_trained_beats_random_baseline(summary, run):
    if run not in summary:
        pytest.fail(f"no committed curve for {run}")
    reward_margin, ratio_margin = MARGINS[run]
    rnd = _baseline_for(summary, run)
    late_r = summary[run]["late_mean_test_reward"]
    late_c = summary[run]["late_mean_test_totally_controllable_ratio"]
    if reward_margin is not None:
        assert late_r > rnd["mean_test_reward"] + reward_margin, (
            f"{run}: late eval reward {late_r:.4f} does not beat random "
            f"{rnd['mean_test_reward']:.4f} by {reward_margin}")
    if ratio_margin is not None:
        assert late_c > (rnd["mean_test_totally_controllable_ratio"]
                         + ratio_margin), (
            f"{run}: late controllable ratio {late_c:.3f} vs random "
            f"{rnd['mean_test_totally_controllable_ratio']:.3f} "
            f"margin {ratio_margin}")


@pytest.mark.parametrize("run", sorted(MARGINS))
def test_curve_improves_over_training(summary, run):
    if run not in summary:
        pytest.fail(f"no committed curve for {run}")
    s = summary[run]
    assert s["n_episodes"] >= 400
    if run in RATIO_IMPROVEMENT_RUNS:
        assert (s["late_mean_test_totally_controllable_ratio"]
                > s["first"]["mean_test_totally_controllable_ratio"] + 0.1), (
            f"{run}: no controllability improvement over training")
    else:
        assert s["late_mean_test_reward"] > s["first"]["mean_test_reward"], (
            f"{run}: no improvement over training")
    # the committed raw curve must exist and match the summary
    path = os.path.join(os.path.dirname(ART), "..", s["metrics_path"])
    assert os.path.exists(path), s["metrics_path"]
    recs = [json.loads(l) for l in open(path)]
    evals = [r for r in recs if "mean_test_reward" in r]
    assert len(evals) == s["n_evals"]
    assert abs(evals[-1]["mean_test_reward"]
               - s["final"]["mean_test_reward"]) < 1e-9


def test_engineering_baselines_present(summary):
    """Droop + OPF context (the reference's traditional_control/*.m role):
    committed so controller quality is judged against engineering
    baselines, not only against random actions."""
    for key in ("droop_baseline", "opf_baseline"):
        assert key in summary, key
        assert "mean_test_totally_controllable_ratio" in summary[key]
        assert summary[key]["n_samples"] > 0
