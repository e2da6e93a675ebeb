from mapdn_tpu.envs.voltage_control import (
    VoltageControlEnv, EnvConfig, EnvState, StepOutput, make_env,
)
from mapdn_tpu.envs.wrapper import VoltageControlWrapper
