# SPDX-License-Identifier: Apache-2.0
"""Library-level demo (≙ reference `examples/hqq_lib_demo.py`): quantize a
weight, inspect the QTensor, build a QuantLinear, pick a backend.

Run anywhere (CPU ok):  PYTHONPATH=. python examples/lib_demo.py
On the TPU chip:        PYTHONPATH=.:/root/.axon_site python examples/lib_demo.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from hqq_tpu import BaseQuantizeConfig, dequantize, quantize
from hqq_tpu.nn import QuantLinear
from hqq_tpu.utils.patching import prepare_for_inference

rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32) / 20)

# -- core API: pure functions on arrays -------------------------------------
for nbits in (8, 4, 3, 2):
    qt = quantize(w, nbits=nbits, group_size=64, axis=1, round_zero=(nbits == 4))
    err = jnp.abs(w - dequantize(qt, jnp.float32)).mean()
    ratio = w.size * 4 / qt.nbytes
    print(f"nbits={nbits}: packed {qt.wq.dtype} {qt.wq.shape}, "
          f"mean|err|={float(err):.5f}, compression vs fp32 {ratio:.1f}x")

# -- layer API ---------------------------------------------------------------
cfg = BaseQuantizeConfig(nbits=4, group_size=64)
layer = QuantLinear.quantize(w, bias=None, quant_config=cfg)
x = jnp.asarray(rng.standard_normal((8, 4096), dtype=np.float32), jnp.bfloat16)
y = jax.jit(lambda l, xx: l(xx))(layer, x)
print("QuantLinear out:", y.shape, y.dtype)

# -- inference backends -------------------------------------------------------
tree = {"proj": layer}
for backend in ("pallas", "int8"):
    fast = prepare_for_inference(tree, backend=backend)
    yb = jax.jit(lambda l, xx: l(xx))(fast["proj"], x)
    rel = jnp.abs(yb.astype(jnp.float32) - y.astype(jnp.float32)).mean() / (
        jnp.abs(y.astype(jnp.float32)).mean() + 1e-9
    )
    print(f"backend={backend}: rel diff vs xla = {float(rel):.4f}")
