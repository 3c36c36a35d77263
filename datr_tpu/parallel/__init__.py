from .mesh import make_mesh, shard_batch, shard_train_state, param_sharding_tree
