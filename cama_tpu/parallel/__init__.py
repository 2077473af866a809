from cama_tpu.parallel.sharding import (
    make_mesh,
    pad_to_multiple,
    sharded_map_metrics,
    sharded_overlay_step,
)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "sharded_map_metrics",
    "sharded_overlay_step",
]
