"""Train the full algorithm zoo and commit learning-curve artifacts.

The reference's core deliverable is reproducible trained controllers for
every algorithm (reference train_case33.sh:7-21 launches the zoo;
README.md:253-291 reproduces the paper curves).  This driver reruns that
sweep on the TPU rebuild: sequential train.py runs (one chip), then copies
each run's metrics.jsonl + log.txt into artifacts/learning/<run>/ — a
layout deliberately outside any .gitignore pattern so the curves are
actually committed.

Runs: all 10 algorithms on case33 (distributed, 400 episodes, n_envs 512,
seed 7) + one decentralised run + one case322 run.

Usage:
  python scripts/train_zoo.py             # everything missing
  python scripts/train_zoo.py maddpg coma # just these runs
  python scripts/train_zoo.py --force     # rerun everything
Afterwards: python scripts/learning_report.py
"""
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts", "learning")
SCRATCH = "/tmp/zoo_runs"

ALGS = ["iddpg", "maddpg", "matd3", "ippo", "mappo", "iac", "coma",
        "sqddpg", "maac", "facmaddpg"]

# run name -> (alg, extra CLI args)
RUNS = {a: (a, []) for a in ALGS}
RUNS["maddpg_decentralised"] = ("maddpg", ["--mode", "decentralised"])
RUNS["mappo_case322"] = ("mappo", ["--scenario", "case322_3min_final"])


def run_one(name, alg, extra, episodes=400, n_envs=512, seed=7):
    scratch = os.path.join(SCRATCH, name)
    shutil.rmtree(scratch, ignore_errors=True)
    cmd = [sys.executable, "-u", os.path.join(ROOT, "train.py"),
           "--alg", alg, "--scenario", "case33_3min_final",
           "--n-envs", str(n_envs), "--episodes", str(episodes),
           "--seed", str(seed), "--save-path", scratch] + extra
    print(f"[{name}] {' '.join(cmd[2:])}", flush=True)
    t0 = time.time()
    log_path = os.path.join(SCRATCH, f"{name}.log")
    os.makedirs(SCRATCH, exist_ok=True)
    with open(log_path, "w") as log:
        rc = subprocess.call(cmd, stdout=log, stderr=subprocess.STDOUT,
                             cwd=ROOT)
    dt = time.time() - t0
    if rc != 0:
        print(f"[{name}] FAILED rc={rc} after {dt:.0f}s — see {log_path}",
              flush=True)
        return False

    # find the produced metrics.jsonl (tensorboard/<log_name>/metrics.jsonl)
    hits = []
    for dirpath, _, files in os.walk(scratch):
        if "metrics.jsonl" in files:
            hits.append(os.path.join(dirpath, "metrics.jsonl"))
    assert len(hits) == 1, hits
    dest = os.path.join(ART, name)
    os.makedirs(dest, exist_ok=True)
    shutil.copy(hits[0], os.path.join(dest, "metrics.jsonl"))
    logtxt = os.path.join(os.path.dirname(hits[0]), "log.txt")
    if os.path.exists(logtxt):
        shutil.copy(logtxt, os.path.join(dest, "log.txt"))
    n_lines = sum(1 for _ in open(hits[0]))
    print(f"[{name}] done in {dt:.0f}s ({n_lines} records) -> {dest}",
          flush=True)
    return True


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    force = "--force" in sys.argv
    wanted = args or list(RUNS)
    failed = []
    for name in wanted:
        # NOTE: extra may repeat --scenario; argparse keeps the last value
        alg, extra = RUNS[name]
        done = os.path.exists(os.path.join(ART, name, "metrics.jsonl"))
        if done and not force:
            print(f"[{name}] already present, skipping", flush=True)
            continue
        if not run_one(name, alg, extra):
            failed.append(name)
    if failed:
        print(f"FAILED runs: {failed}", flush=True)
        sys.exit(1)
    print("zoo complete", flush=True)


if __name__ == "__main__":
    main()
