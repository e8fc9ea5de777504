"""Parallelism toolkit: mesh construction and sharding rules.

DP shards the batch over the "data" axis (GSPMD inserts the gradient
all-reduce over ICI); retrieval corpora shard their row dimension; the
"model" axis is reserved for tensor-parallel encoder runs. See SURVEY.md
§2.9 — the reference itself is single-device, so every strategy here is new
capability, not a port.
"""

from mmd_tpu.core.mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, corpus_sharding, local_mesh,
    make_mesh, replicated, shard_batch,
)
from mmd_tpu.ops.topk import make_sharded_topk
from mmd_tpu.parallel.pp import pipeline_encode, pipeline_encode_deberta
from mmd_tpu.parallel.sp import (
    sequence_parallel_encode, sequence_parallel_encode_deberta,
)
from mmd_tpu.parallel.tp import (
    encoder_specs, shard_encoder, shard_tree, state_specs,
    validate_tp_config,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "corpus_sharding",
    "local_mesh", "make_mesh", "replicated", "shard_batch",
    "make_sharded_topk", "pipeline_encode", "pipeline_encode_deberta",
    "sequence_parallel_encode", "sequence_parallel_encode_deberta",
    "encoder_specs", "shard_encoder", "shard_tree",
    "state_specs", "validate_tp_config",
]
