"""Device-mesh parallelism for scenario-batched NMPC."""

from .sharding import (
    initialize_multihost,
    SCENARIO_AXIS,
    BatchStats,
    make_batched_step,
    make_mesh,
    replicate_inputs,
    shard_batch,
    stack_tree,
)
