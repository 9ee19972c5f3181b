"""Linear projection with optional weight-only quantization.

All model projections route through :func:`linear`, which dispatches on the
weight type: plain ``jnp`` arrays use an XLA einsum (fp32 accumulation);
:class:`QTensor` weights (int8, per-output-channel scales) use the Pallas
dequant-matmul kernel on TPU decode shapes and a dequant+einsum fallback
elsewhere.  This is the INT8 weight-only path of the north star: decode is
weight-bandwidth-bound, so halving weight bytes halves cycle time.
"""

from __future__ import annotations

import os
from typing import Union

import jax
import jax.numpy as jnp

# QTensor matmul backend.  Whole-loop A/B on a v5e chip (Qwen3-4B int8, 512
# decode steps; op-level microbenches are unreliable through the tunneled TPU
# runtime) measured the XLA dequant+einsum path at AR 6.62 ms/tok vs 9.03 for
# the best Pallas tiling — XLA's on-the-fly int8->bf16 convert fused into the
# matmul pipeline wins at these skinny decode shapes — so XLA is the default
# and DFLASH_MM=pallas opts into the hand kernel (kernels/matmul_q.py).
_FORCE_PALLAS_MM = os.environ.get("DFLASH_MM", "").lower() == "pallas"

# W8A8: dynamic per-token symmetric int8 activation quantization feeding an
# int8 x int8 MXU matmul (int32 accumulate).  Single-stream decode is
# weight-bandwidth-bound and gains nothing, but at batched row counts
# (lanes x B >= ~128 rows) the bf16 matmuls go compute-bound on v5e and the
# int8 MXU path doubles matmul throughput.  Opt-in: the quantized activations
# change logits slightly, so acceptance parity vs bf16 activations must be
# validated per checkpoint (weights are already int8 in both modes).
_W8A8 = os.environ.get("DFLASH_W8A8", "") == "1"


def set_w8a8(enabled: bool) -> None:
    """Toggle the W8A8 activation-quant path (tests; takes effect on next
    trace — call ``jax.clear_caches()`` if flipping under an existing jit)."""
    global _W8A8
    _W8A8 = bool(enabled)


def w8a8_enabled() -> bool:
    return _W8A8


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Weight-only quantized matrix: ``w ~= q.astype(f32) * scale``.

    ``q`` is [K, N_pad] int8 (padded to kernel tiles), ``scale`` [1, N_pad]
    float32 per output channel, ``n`` the logical output width (static aux
    data, so QTensors can be stacked/sliced through scan and vmap).
    """

    def __init__(self, q: jax.Array, scale: jax.Array, n: int):
        self.q = q
        self.scale = scale
        self.n = n

    def tree_flatten(self):
        return (self.q, self.scale), self.n

    @classmethod
    def tree_unflatten(cls, n, children):
        return cls(children[0], children[1], n)

    def __repr__(self):
        return f"QTensor(q={getattr(self.q, 'shape', self.q)}, n={self.n})"


Weight = Union[jax.Array, QTensor]


def quantize_weight(w: jax.Array, pad_to: int = 1) -> QTensor:
    """Per-output-channel symmetric int8 quantization of ``w`` [K, N]."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)  # [1, N]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    if pad_to > 1 and N % pad_to:
        pad = pad_to - N % pad_to
        q = jnp.pad(q, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, ((0, 0), (0, pad)), constant_values=1.0)
    return QTensor(q=q, scale=scale, n=N)


def dequantize(w: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)[:, : w.n]


def _use_pallas(x2d: jax.Array, w: QTensor) -> bool:
    if not _FORCE_PALLAS_MM or jax.devices()[0].platform != "tpu":
        return False
    K, Np = w.q.shape
    return K % 256 == 0 and Np % 256 == 0


def linear(x: jax.Array, w: Weight, out_dtype=None) -> jax.Array:
    """``x @ w`` with fp32 accumulation; returns ``out_dtype`` (default x.dtype).

    x: [..., K]; dense w: [K, N]; quantized w: QTensor.
    """
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        K = x.shape[-1]
        x2d = x.reshape(-1, K)
        if _use_pallas(x2d, w):
            from dflash_tpu.kernels.matmul_q import matmul_int8

            out = matmul_int8(x2d, w.q, w.scale)
        elif _W8A8:
            # Dynamic per-row activation quant -> int8 x int8 MXU matmul with
            # int32 accumulation; both scales applied to the f32 output.
            xf = x2d.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [S, 1]
            xs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
            out = jax.lax.dot_general(
                xq, w.q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * xs * w.scale
        else:
            # Scale on the OUTPUT, not the weight: int8 -> bf16 is exact (no
            # rounding), the bare convert fuses into the matmul instead of
            # materializing a dequantized copy of the matrix (profiling showed
            # XLA materializing the full bf16 lm_head per batched cycle when
            # the weight-side multiply chain was CSE'd across two call sites),
            # and the f32 accumulator absorbs the per-channel scale at the end.
            out = jnp.einsum(
                "sk,kn->sn", x2d, w.q.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * w.scale
        out = out[:, : w.n].reshape(*lead, w.n)
        return out.astype(out_dtype)
    return jnp.einsum(
        "...k,kn->...n", x, w, preferred_element_type=jnp.float32
    ).astype(out_dtype)
