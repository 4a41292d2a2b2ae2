from .mesh import batch_sharded, get_mesh, pad_batch_to_devices, replicate_state, replicated, shard_batch  # noqa: F401
