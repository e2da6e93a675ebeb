from mapdn_tpu.algos.registry import MODEL_REGISTRY, STRATEGY_REGISTRY, make_model
