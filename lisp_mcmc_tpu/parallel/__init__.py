from .mesh import (
    CHAIN_AXIS,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_state,
    state_shardings,
)

__all__ = [
    "CHAIN_AXIS",
    "initialize_distributed",
    "make_mesh",
    "replicated",
    "shard_state",
    "state_shardings",
]
