from .mesh import CHAIN_AXIS, make_mesh, replicated, shard_state, state_shardings

__all__ = ["CHAIN_AXIS", "make_mesh", "replicated", "shard_state", "state_shardings"]
