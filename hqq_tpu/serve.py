# SPDX-License-Identifier: Apache-2.0
"""CLI inference server: the one-command deployment path.

    python -m hqq_tpu.serve --model /path/to/checkpoint --port 8000 \\
        --backend w4a8 --engine paged --slots 8

`--model` accepts (auto-detected): an hqq_tpu quantized checkpoint
(`from_quantized`), a GPTQ checkpoint (`load_gptq`), or a plain HF fp
checkpoint — quantized on the fly (`--nbits/--group-size`), ≙ the
reference's vLLM on-the-fly mode (`/root/reference/hqq/utils/vllm.py:578+`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_engine(args):
    import jax.numpy as jnp

    from .engine.hf import HQQModelForCausalLM
    from .core.quantize import BaseQuantizeConfig
    from .utils.patching import fuse_for_decode, prepare_for_inference

    model_dir = args.model
    vl_type = _detect_vl(model_dir)
    if vl_type == "llava":
        return _build_llava_engine(args, model_dir)
    if vl_type:
        raise SystemExit(
            f"VL type {vl_type!r} serves through the Python API "
            f"(engine.vl.AutoHQQVLModel — M-RoPE decode needs per-request "
            f"positions the CLI engines don't carry); only llava (plain "
            f"RoPE) serves via the CLI"
        )
    if os.path.exists(os.path.join(model_dir, "hqq_config.json")):
        # native hqq_tpu quantized checkpoint
        model = HQQModelForCausalLM.from_quantized(model_dir)
        params, cfg = model.params, model.cfg
        family_fwd = model._arch["forward"]
    else:
        with open(os.path.join(model_dir, "config.json")) as f:
            conf = json.load(f)
        if conf.get("quantization_config", {}).get("quant_method") == "gptq":
            from .models import llama
            from .models.interop import load_gptq

            params, cfg = load_gptq(model_dir, compute_dtype=jnp.bfloat16)
            family_fwd = llama.forward
        else:
            model = HQQModelForCausalLM.from_pretrained(model_dir)
            model.quantize_model(
                BaseQuantizeConfig(nbits=args.nbits, group_size=args.group_size)
            )
            params, cfg = model.params, model.cfg
            family_fwd = model._arch["forward"]

    if args.tp > 1:
        # TP deployment: shard over the local chips (shard_map TP — the
        # vLLM `tensor_parallel_size=N` role). prepare_tp consumes the
        # QUANTIZED tree (it does its own kernel-layout conversion), so the
        # single-device prepare/fuse steps are skipped.
        from .parallel import make_mesh, prepare_tp, tp_serving_forward_fn

        mesh = make_mesh(data=1, model=args.tp)
        backend = args.backend if args.backend in ("pallas", "w4a8") else "pallas"
        if backend != args.backend:
            print(f"# --tp: backend {args.backend!r} has no sharded kernel "
                  f"path; using {backend!r}", file=sys.stderr)
        tp_params, tp_specs, local_cfg = prepare_tp(
            params, cfg, mesh, backend=backend
        )
        # quantize_kv must match the engine's cache pytree or shard_map's
        # in_specs disagree with the (scale-carrying) int8 cache
        fwd = tp_serving_forward_fn(
            mesh, tp_specs, local_cfg, page_size=args.page_size,
            quantize_kv=args.int8_kv, forward=family_fwd,
        )
        return _engine_for(args, tp_params, cfg, forward_fn=fwd)

    params = prepare_for_inference(params, args.backend)
    if args.fuse:
        params = fuse_for_decode(params)
    if args.engine == "paged":
        import inspect

        if "page_indices" not in inspect.signature(family_fwd).parameters:
            # families without a paged decode branch (gpt2/bloom/falcon/...)
            # serve on the dense-slot engine instead of crashing at prefill
            print(f"# {type(cfg).__name__}: family forward has no paged "
                  f"branch; falling back to --engine dense", file=sys.stderr)
            args.engine = "dense"
    fwd = (
        lambda p, toks, cache, pos, ptab=None: family_fwd(
            p, cfg, toks, cache, pos, page_indices=ptab
        )
    ) if args.engine == "paged" else (
        lambda p, toks, cache, pos: family_fwd(p, cfg, toks, cache, pos)
    )
    return _engine_for(args, params, cfg, forward_fn=fwd)


def _detect_vl(model_dir: str):
    """VL model_type of a checkpoint dir ('llava' / 'qwen2_vl'), else None.
    Covers HF fp dirs (config.json) and hqq_tpu quantized saves
    (hqq_config.json carries model_type)."""
    for name in ("hqq_config.json", "config.json"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            with open(path) as f:
                conf = json.load(f)
            # hqq checkpoints nest the user config under "config"
            mt = conf.get("config", conf).get("model_type") or conf.get("model_type")
            return mt if mt in ("llava", "qwen2_vl") else None
    return None


def _build_llava_engine(args, model_dir):
    """Serve a LLaVA checkpoint: quantized language model through the
    batching engine + an `embedder` the HTTP server calls for multimodal
    requests (pixel_values -> CLIP tower -> projector -> placeholder splice).
    ≙ vLLM serving a VLM (`/root/reference/examples/vllm_qwenvl.py` role)."""
    import numpy as np
    import jax.numpy as jnp

    from .core.quantize import BaseQuantizeConfig
    from .engine.vl import AutoHQQVLModel
    from .models import llava
    from .utils.patching import fuse_for_decode, prepare_for_inference

    if os.path.exists(os.path.join(model_dir, "hqq_config.json")):
        m = AutoHQQVLModel.from_quantized(model_dir)
    else:
        m = AutoHQQVLModel.from_pretrained(model_dir).quantize_model(
            BaseQuantizeConfig(nbits=args.nbits, group_size=args.group_size)
        )
    cfg = m.cfg
    vision_tree = m.params["vision"]  # {"vision", "projector"} (fp)

    if args.tp > 1:
        # TP × VL serving: the quantized text tower shards like any llama
        # tree; prefill over inputs_embeds runs through tp_embeds_forward_fn
        # (prepare_tp consumes the QUANTIZED tree, so the single-device
        # prepare/fuse steps are skipped — same as the text-only --tp path)
        from .parallel import (
            make_mesh, prepare_tp, tp_embeds_forward_fn, tp_serving_forward_fn,
        )

        mesh = make_mesh(data=1, model=args.tp)
        backend = args.backend if args.backend in ("pallas", "w4a8") else "pallas"
        if backend != args.backend:
            print(f"# --tp: backend {args.backend!r} has no sharded kernel "
                  f"path; using {backend!r}", file=sys.stderr)
        text, tp_specs, local_cfg = prepare_tp(
            m.params["text"], cfg.text, mesh, backend=backend
        )
        fwd = tp_serving_forward_fn(
            mesh, tp_specs, local_cfg, page_size=args.page_size,
            quantize_kv=args.int8_kv,
        )
        efwd = tp_embeds_forward_fn(mesh, tp_specs, local_cfg)
        eng = _engine_for(args, text, cfg.text, forward_fn=fwd,
                          embeds_forward_fn=efwd)
    else:
        text = prepare_for_inference(m.params["text"], args.backend)
        if args.fuse:
            text = fuse_for_decode(text)
        eng = _engine_for(args, text, cfg.text)

    def embedder(prompt_ids, vl_inputs):
        px = jnp.asarray(np.asarray(vl_inputs["pixel_values"], np.float32))
        img = llava.vision_forward(vision_tree, cfg, px).reshape(
            -1, cfg.text.hidden_size
        )
        toks = jnp.asarray([list(prompt_ids)], jnp.int32)
        # embed_multimodal reads only text["embed_tokens"] (replicated
        # under TP), so the serving tree works for both paths
        full = {"text": text, **vision_tree}
        emb = llava.embed_multimodal(full, cfg, toks, img)
        return np.asarray(emb[0])

    eng._vl_embedder = embedder  # picked up by main() for the server
    return eng


def _infer_cache_dtype(params):
    """The KV cache dtype must match the model's ACTIVATION dtype (the
    in-place cache update requires equal dtypes), which is set by the
    quantized layers' compute_dtype — not by fp leaves like norms. Walk the
    tree for the first layer that carries one; bf16 otherwise."""
    import jax.numpy as jnp

    stack = [params]
    while stack:
        node = stack.pop()
        if isinstance(node, dict):
            stack.extend(node.values())
            continue
        if isinstance(node, (list, tuple)):
            stack.extend(node)
            continue
        for holder in (node, getattr(node, "kqt", None),
                       getattr(node, "qweight", None)):
            cd = getattr(holder, "compute_dtype", None)
            if cd is not None:
                return cd
    return jnp.bfloat16


def _engine_for(args, params, cfg, forward_fn=None, embeds_forward_fn=None):
    cache_dtype = _infer_cache_dtype(params)
    if args.engine == "paged":
        from .serving.paged import PagedBatchingEngine

        return PagedBatchingEngine(
            params, cfg, batch_slots=args.slots, num_pages=args.num_pages,
            page_size=args.page_size, max_pages_per_seq=args.max_pages_per_seq,
            eos_token_id=args.eos, do_sample=args.sample, horizon=args.horizon,
            quantize_kv=args.int8_kv, enable_prefix_cache=args.prefix_cache,
            prefill_chunk=args.prefill_chunk, forward_fn=forward_fn,
            embeds_forward_fn=embeds_forward_fn, cache_dtype=cache_dtype,
        )
    from .serving.batching import ContinuousBatchingEngine

    return ContinuousBatchingEngine(
        params, cfg, batch_slots=args.slots, max_len=args.max_len,
        eos_token_id=args.eos, do_sample=args.sample, horizon=args.horizon,
        quantize_kv=args.int8_kv, forward_fn=forward_fn,
        embeds_forward_fn=embeds_forward_fn, cache_dtype=cache_dtype,
    )


def make_parser():
    p = argparse.ArgumentParser("hqq_tpu.serve")
    p.add_argument("--model", required=True, help="checkpoint directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--backend", default="w4a8",
                   choices=("w4a8", "int8", "pallas", "xla"))
    p.add_argument("--engine", default="paged", choices=("paged", "dense"))
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over local devices "
                        "(shard_map TP; ≙ vLLM tensor_parallel_size)")
    p.add_argument("--fuse", action="store_true", default=True)
    p.add_argument("--no-fuse", dest="fuse", action="store_false")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--num-pages", type=int, default=512)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--max-pages-per-seq", type=int, default=64)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--int8-kv", action="store_true")
    p.add_argument("--prefix-cache", action="store_true")
    p.add_argument("--prefill-chunk", type=int, default=None)
    p.add_argument("--eos", type=int, default=None)
    p.add_argument("--sample", action="store_true")
    p.add_argument("--nbits", type=int, default=4, help="on-the-fly quant bits")
    p.add_argument("--group-size", type=int, default=64)
    p.add_argument("--tokenizer", action="store_true",
                   help="load an HF tokenizer from --model for text I/O")
    return p


def main(argv=None, serve: bool = True):
    args = make_parser().parse_args(argv)
    engine = build_engine(args)
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model)

    from .serving.server import InferenceServer

    srv = InferenceServer(engine, host=args.host, port=args.port,
                          tokenizer=tokenizer,
                          embedder=getattr(engine, "_vl_embedder", None))
    print(f"serving {args.model} [{args.backend}/{args.engine}] "
          f"on {args.host}:{srv.port}")
    if serve:  # pragma: no cover — interactive entry
        srv.serve_forever()
    return srv


if __name__ == "__main__":  # pragma: no cover
    main()
