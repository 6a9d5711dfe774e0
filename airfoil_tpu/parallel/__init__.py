from airfoil_tpu.parallel.mesh import (
    batch_mesh,
    shard_polar_inputs,
    sharded_polar,
)

__all__ = ["batch_mesh", "shard_polar_inputs", "sharded_polar"]
