"""Device-mesh sharding plan.

The reference's only parallelism is single-node DDP over frames
(/root/reference/train_nerv_all.py:159-168, 253-254; NCCL all-reduce of
grads/metrics). The TPU-native equivalent is a ('data', 'spatial') mesh:

 - 'data': frame-batch data parallelism. Batches are sharded on the leading
   axis, parameters are replicated; jit + NamedSharding makes XLA insert the
   gradient psum over ICI — the 1:1 replacement for DDP's all-reduce
   (SURVEY.md §5.8).
 - 'spatial': optional sharding of the decoder feature maps' H axis for
   large-frame decode; XLA SPMD inserts conv halo exchanges automatically.

Single-chip runs use a 1x1 mesh and compile to exactly the unsharded
program, so there is one code path for 1..N devices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    mesh: Mesh
    dp: int
    sp: int

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch_sharding(self, ndim: int, spatial_axis: Optional[int] = None
                       ) -> NamedSharding:
        """Leading axis over 'data'; optionally one spatial axis over
        'spatial' (e.g. H of an NHWC image batch)."""
        spec = [None] * ndim
        spec[0] = "data"
        if spatial_axis is not None and self.sp > 1:
            spec[spatial_axis] = "spatial"
        return NamedSharding(self.mesh, P(*spec))

    def shard_batch(self, tree, spatial_axis: Optional[int] = None):
        def put(x):
            ax = spatial_axis if (getattr(x, "ndim", 0) >= 4) else None
            return jax.device_put(
                x, self.batch_sharding(max(getattr(x, "ndim", 1), 1), ax))
        return jax.tree_util.tree_map(put, tree)

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)


def make_mesh_plan(dp: int = 1, sp: int = 1,
                   devices: Optional[Sequence] = None) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    need = dp * sp
    if need > len(devices):
        raise ValueError(f"mesh {dp}x{sp} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, sp)
    return MeshPlan(mesh=Mesh(arr, ("data", "spatial")), dp=dp, sp=sp)
