"""mapdn_tpu — a TPU-native multi-agent RL framework for active voltage control.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Future-Power-Networks/MAPDN (NeurIPS 2021): MARL training of PV-inverter
reactive-power controllers on power distribution networks, with the AC
power-flow solve executed as a batched, jit-compiled Newton-Raphson kernel
on-device instead of a per-step CPU pandapower call.

Layer map (mirrors reference SURVEY.md section 1, rebuilt TPU-first):

    cli        train.py / test.py            (repo root)
    config     mapdn_tpu.utils.config        (3-layer YAML merge -> dataclass)
    runtime    mapdn_tpu.learn               (fused trainer, replay, tester)
    algorithms mapdn_tpu.algos               (10 actor-critic MARL algorithms)
    networks   mapdn_tpu.nets                (flax policies/critics)
    environment mapdn_tpu.envs               (pure-functional voltage control)
    physics    mapdn_tpu.pf + mapdn_tpu.grid (batched NR power flow, Y-bus)
    parallel   mapdn_tpu.parallel            (mesh/sharding for multi-chip)
"""

__version__ = "0.1.0"

from mapdn_tpu.grid.model import Grid
from mapdn_tpu.grid.cases import make_case
