"""Algorithm registry (reference models/model_registry.py:14-36).

All ten algorithms map to the 'pg' training strategy, exactly as in the
reference (its 'q' branch is a NotImplementedError, train.py:102).
"""
from __future__ import annotations

from mapdn_tpu.algos.coma import COMA
from mapdn_tpu.algos.facmaddpg import FACMADDPG
from mapdn_tpu.algos.iac import IAC
from mapdn_tpu.algos.iddpg import IDDPG
from mapdn_tpu.algos.ippo import IPPO
from mapdn_tpu.algos.maac import MAAC
from mapdn_tpu.algos.maddpg import MADDPG
from mapdn_tpu.algos.mappo import MAPPO
from mapdn_tpu.algos.matd3 import MATD3
from mapdn_tpu.algos.random_agent import RandomAgent
from mapdn_tpu.algos.sqddpg import SQDDPG

MODEL_REGISTRY = dict(
    maddpg=MADDPG,
    sqddpg=SQDDPG,
    iac=IAC,
    iddpg=IDDPG,
    coma=COMA,
    maac=MAAC,
    matd3=MATD3,
    ippo=IPPO,
    mappo=MAPPO,
    facmaddpg=FACMADDPG,
    random=RandomAgent,
)

STRATEGY_REGISTRY = {name: "pg" for name in MODEL_REGISTRY}


def make_model(alg: str, cfg):
    if alg not in MODEL_REGISTRY:
        raise KeyError(f"unknown algorithm '{alg}'; "
                       f"available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[alg](cfg)
