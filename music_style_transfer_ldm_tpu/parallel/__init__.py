"""Device mesh + sharding. New design — the reference is single-GPU with no
parallelism at all (SURVEY.md section 2.6)."""

from music_style_transfer_ldm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, sequence_sharding,
)
from music_style_transfer_ldm_tpu.parallel.sharding import (  # noqa: F401
    batch_validity_weights, global_batch_from_local, param_partition_spec,
    shard_params, shard_batch,
)
