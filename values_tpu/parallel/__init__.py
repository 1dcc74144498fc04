from .mesh import (DATA_AXIS, SAMPLE_AXIS, batch_sharding, make_mesh,
                   make_parallel_pass_predict, make_parallel_sample_predict,
                   make_parallel_train_step, replicated, sample_sharding,
                   shard_batch)

__all__ = ["DATA_AXIS", "SAMPLE_AXIS", "make_mesh", "batch_sharding",
           "sample_sharding", "replicated", "shard_batch",
           "make_parallel_train_step", "make_parallel_sample_predict",
           "make_parallel_pass_predict"]
