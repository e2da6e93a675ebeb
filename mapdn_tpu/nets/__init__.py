from mapdn_tpu.nets.agents import MLPAgent, RNNAgent, MLPAgentGaussian, RNNAgentGaussian
from mapdn_tpu.nets.critics import MLPCritic, QMixer, AttentionCritic
