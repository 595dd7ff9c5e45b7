from mitsuba_tpu.parallel.mesh import (
    make_mesh,
    render_sharded,
    shard_lanes,
    training_step_sharded,
)

__all__ = ["make_mesh", "render_sharded", "shard_lanes", "training_step_sharded"]
