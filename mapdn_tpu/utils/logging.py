"""Metrics logging: tensorboard scalars + JSONL fallback.

Mirrors the reference's logging surface (reference trainer.py:115-117 logs
every stat under 'data/<name>'; train.py:92,107-111 dumps the config to
log.txt) while always writing a machine-readable metrics.jsonl.
"""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, stats: dict, step: int):
        rec = {"step": step, "time": time.time(), **stats}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in stats.items():
                # reference tag scheme 'data/<stat>' (trainer.py:115-117)
                self._tb.add_scalar("data/" + k, v, step)

    def log_config(self, alg_config, env_config):
        """Config dump (reference train.py:107-111 log.txt)."""
        with open(os.path.join(self.log_dir, "log.txt"), "w") as f:
            f.write("alg_params:\n")
            for k, v in sorted(vars(alg_config).items() if not hasattr(
                    alg_config, "__dataclass_fields__") else
                    alg_config.__dict__.items()):
                f.write(f"\t{k}: {v}\n")
            f.write("env_params:\n")
            for k, v in sorted(env_config.items()):
                f.write(f"\t{k}: {v}\n")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
