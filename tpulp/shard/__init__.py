"""Multi-chip column-partitioned solving over a device mesh."""

from .sharded import (
    ShardedState,
    from_sharded_state,
    make_mesh,
    run_simplex_gspmd,
    run_simplex_sharded,
    shard_state,
    to_sharded_state,
)
from .sharded_blocked import run_simplex_sharded_blocked
from .sharded_bounded import (
    ShardedBoundedState,
    from_sharded_bounded_state,
    run_simplex_sharded_bounded,
    to_sharded_bounded_state,
)

__all__ = [
    "ShardedState",
    "make_mesh",
    "shard_state",
    "run_simplex_gspmd",
    "to_sharded_state",
    "from_sharded_state",
    "run_simplex_sharded",
    "run_simplex_sharded_blocked",
    "ShardedBoundedState",
    "to_sharded_bounded_state",
    "from_sharded_bounded_state",
    "run_simplex_sharded_bounded",
]
