# SPDX-License-Identifier: Apache-2.0
"""GSPMD sharding of PACKED quantized weights (VERDICT r1 item 3).

Column-parallel `wq` must actually shard over the mesh — at 70B 4-bit a
replicated packed tree is ~35 GB/device. `regroup_packed` repacks codes
block-locally (pack_blocks=tp) so dim-0 shards decode independently (the
TPU equivalent of the reference's unpack→shard→repack vLLM loaders,
`/root/reference/hqq/utils/vllm.py:119-150`)."""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu.core.quantize import (
    BaseQuantizeConfig,
    dequantize,
    quantize,
    regroup_packed,
)
from hqq_tpu.models import llama
from hqq_tpu.models.base import quantize_model
from hqq_tpu.parallel import make_mesh, shard_params


def test_regroup_preserves_values():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32) / 16
    for nbits in (4, 2, 1):
        qt = quantize(w, nbits=nbits, group_size=32, axis=1,
                      round_zero=(nbits == 4))
        for blocks in (2, 4):
            qt2 = regroup_packed(qt, blocks)
            assert qt2.pack_blocks == blocks
            np.testing.assert_array_equal(
                np.asarray(dequantize(qt, jnp.float32)),
                np.asarray(dequantize(qt2, jnp.float32)),
            )


def test_regroup_3bit_falls_back():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    qt = quantize(w, nbits=3, group_size=32, axis=1)
    assert regroup_packed(qt, 4) is qt  # per-block 3-bit padding unsupported


def test_packed_wq_shards_over_mesh():
    """After shard_params, column-parallel wq spans the mesh with per-device
    bytes ≈ global/tp; the GSPMD forward matches the unsharded one."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    tokens = jnp.asarray([[3, 17, 29, 5]], jnp.int32)
    ref_logits, _ = llama.forward(qparams, cfg, tokens)

    mesh = make_mesh(data=1, model=4)
    sharded = shard_params(qparams, mesh)

    layer0 = sharded["layers"][0]
    tp = mesh.shape["model"]
    for tag in ("q_proj", "k_proj", "v_proj"):
        wq = layer0["self_attn"][tag].qweight.wq
        assert len(wq.sharding.device_set) == tp, tag
        shard_rows = {s.data.shape[0] for s in wq.addressable_shards}
        assert shard_rows == {wq.shape[0] // tp}, (tag, shard_rows)
    for tag in ("o_proj",):  # row-parallel: lane (within-group) axis shards
        wq = layer0["self_attn"][tag].qweight.wq
        assert len(wq.sharding.device_set) == tp, tag
        shard_cols = {s.data.shape[1] for s in wq.addressable_shards}
        assert shard_cols == {wq.shape[1] // tp}, (tag, shard_cols)

    with mesh:
        got_logits, _ = jax.jit(lambda p, t: llama.forward(p, cfg, t))(
            sharded, tokens
        )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=0, atol=2e-4
    )


def test_regrouped_checkpoint_roundtrip(tmp_path):
    """pack_blocks survives save/load (sidecar metadata)."""
    from hqq_tpu.models.base import from_quantized, save_quantized

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_model(
        params, BaseQuantizeConfig(nbits=4, group_size=32),
        compute_dtype=jnp.float32,
    )
    from hqq_tpu.parallel.sharding import regroup_for_mesh

    mesh = make_mesh(data=1, model=4)
    rparams = regroup_for_mesh(qparams, mesh)
    qt = rparams["layers"][0]["self_attn"]["q_proj"].qweight
    assert qt.pack_blocks == 4
    save_quantized(rparams, str(tmp_path / "m"))
    loaded, _ = from_quantized(str(tmp_path / "m"))
    lqt = loaded["layers"][0]["self_attn"]["q_proj"].qweight
    assert lqt.pack_blocks == 4
    np.testing.assert_array_equal(
        np.asarray(dequantize(qt, jnp.float32)),
        np.asarray(dequantize(lqt, jnp.float32)),
    )
