# SPDX-License-Identifier: Apache-2.0
from .mesh import make_mesh, make_hybrid_mesh, local_mesh  # noqa: F401
from .sharding import shard_params, tree_shardings  # noqa: F401
from .tp import (  # noqa: F401
    AllGatherLinear,
    RowParallelLinear,
    prepare_tp,
    prepare_tp_llama,
    tp_embeds_forward_fn,
    tp_forward_fn,
    tp_paged_forward_fn,
    tp_serving_forward_fn,
)
from .ring import ring_attention, ring_attention_sharded  # noqa: F401
from .cp import cp_forward_fn  # noqa: F401
from .sp import sp_paged_forward_fn  # noqa: F401
