from .mesh import make_mesh, shard_batch_spec, replicated_spec, jit_step

__all__ = ["make_mesh", "shard_batch_spec", "replicated_spec", "jit_step"]
