from mapdn_tpu.parallel.mesh import (
    make_env_mesh, shard_carry, ShardedPGTrainer)
