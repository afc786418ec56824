from .mesh import create_mesh, shard_batch, shard_variables, variable_shardings

__all__ = ["create_mesh", "shard_batch", "shard_variables", "variable_shardings"]
