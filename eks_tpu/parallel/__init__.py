"""Device-mesh parallelism: keypoint-axis sharding of the smoothing step."""

from eks_tpu.parallel.mesh import (
    make_mesh,
    optimize_and_smooth_sharded,
    shard_leading,
)

__all__ = ["make_mesh", "optimize_and_smooth_sharded", "shard_leading"]
