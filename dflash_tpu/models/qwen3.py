"""Functional Qwen3/Llama-family target model with mid-layer feature taps.

Pure-pytree parameters (layers stacked on a leading axis, forward is a single
``lax.scan``), designed so the verify pass of the speculative loop is one
fixed-shape jitted call.  The hidden states of the configured tap layers are
captured during the scan and concatenated along the feature axis — the
TPU-native equivalent of the reference's ``output_hidden_states=True`` +
``extract_context_feature`` (reference model/utils.py:16-25; the tap at
``hidden_states[layer_id + 1]`` means *output of layer ``layer_id``*, i.e.
after that layer's residual adds and before the final norm).

Covers Qwen3 dense (q/k per-head RMSNorm), Llama-3.1 (no qk-norm, llama3 rope
scaling), and Qwen3-MoE (top-k routed experts, Qwen3-Coder-30B-A3B shapes).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dflash_tpu.cache.kv import KVCache, QuantKVCache, update_any, update_layer
from dflash_tpu.core.config import ModelConfig
from dflash_tpu.ops.attention import (
    attention_buckets,
    gqa_attention,
    gqa_attention_bucketed,
    gqa_attention_quant,
    gqa_attention_quant_bucketed,
)
from dflash_tpu.ops.linear import QTensor, linear
from dflash_tpu.ops.norms import rms_norm
from dflash_tpu.ops.rope import apply_rope, rope_cos_sin


class ForwardResult(NamedTuple):
    hidden: jax.Array  # [B, S, H] — final-norm'd hidden states
    taps: jax.Array  # [B, S, n_taps * H] — concatenated tap-layer outputs
    kv: KVCache  # or QuantKVCache


def _attend_cache(q, cache_layer, mask, scale, limit=None):
    """Attention over a cache-layer slice; with ``limit`` (a dynamic scalar
    upper bound on valid key rows) the read is bucketed to the smallest
    static prefix covering it — O(frontier) HBM traffic instead of O(T)."""
    # NB: cache_layer here is a per-layer slice [B, T, n_kv, d] (the stacked
    # [L, ...] layout's .max_len property does not apply) — T is axis 1.
    T = cache_layer.k.shape[1]
    if isinstance(cache_layer, QuantKVCache):
        if limit is not None:
            return gqa_attention_quant_bucketed(
                q, cache_layer.k, cache_layer.k_scale, cache_layer.v,
                cache_layer.v_scale, mask, scale, limit, attention_buckets(T),
            )
        return gqa_attention_quant(
            q, cache_layer.k, cache_layer.k_scale, cache_layer.v,
            cache_layer.v_scale, mask, scale,
        )
    if limit is not None:
        return gqa_attention_bucketed(
            q, cache_layer.k, cache_layer.v, mask, scale, limit, attention_buckets(T)
        )
    return gqa_attention(q, cache_layer.k, cache_layer.v, mask, scale)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def init_layer_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Stacked decoder-layer parameters, leading axis = layer."""
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = iter(jax.random.split(key, 16))

    def w(shape, k):
        # Generate stacked weights layer-by-layer: a single fused normal of
        # [L, K, N] would materialize an f32 transient of several GB (wgu on
        # a 4B model is 7.2GB f32), which can OOM a chip that comfortably
        # holds the bf16 params.
        if len(shape) >= 3:
            kk = jax.random.split(k, shape[0])
            return jnp.stack(
                [(jax.random.normal(ki, shape[1:], jnp.float32) * 0.02).astype(dtype) for ki in kk]
            )
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    params = {
        "input_ln": jnp.ones((L, H), dtype),
        "post_ln": jnp.ones((L, H), dtype),
        "wq": w((L, H, nh * d), next(keys)),
        "wk": w((L, H, nkv * d), next(keys)),
        "wv": w((L, H, nkv * d), next(keys)),
        "wo": w((L, nh * d, H), next(keys)),
    }
    if cfg.use_qk_norm:
        params["q_norm"] = jnp.ones((L, d), dtype)
        params["k_norm"] = jnp.ones((L, d), dtype)
    if cfg.is_moe:
        E, Im = cfg.num_experts, cfg.moe_intermediate_size
        params["router"] = w((L, H, E), next(keys))
        params["gate"] = w((L, E, H, Im), next(keys))
        params["up"] = w((L, E, H, Im), next(keys))
        params["down"] = w((L, E, Im, H), next(keys))
    else:
        params["gate"] = w((L, H, I), next(keys))
        params["up"] = w((L, H, I), next(keys))
        params["down"] = w((L, I, H), next(keys))
    return params


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    params = {
        "embed": (jax.random.normal(k_embed, (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02).astype(dtype),
        "layers": init_layer_params(k_layers, cfg, dtype),
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(k_head, (cfg.hidden_size, cfg.vocab_size), jnp.float32) * 0.02
        ).astype(dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def embed(params: dict, token_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], token_ids, axis=0)


def lm_head(params: dict, hidden: jax.Array) -> jax.Array:
    """Logits in float32 ([..., V])."""
    w = params["lm_head"] if "lm_head" in params else params["embed"].T
    return linear(hidden, w, out_dtype=jnp.float32)


def _route(lp: dict, cfg: ModelConfig, xt: jax.Array):
    """Router: per-token combine weights over all experts.

    Qwen3-MoE semantics: softmax over all experts, top-k, optional
    renormalisation of the selected weights.  Returns ([T, k] probs,
    [T, k] indices, [T, E] dense combine matrix)."""
    router_logits = jnp.einsum("th,he->te", xt, lp["router"], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)
    topk_p, topk_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)  # [T, k]
    if cfg.norm_topk_prob:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(topk_i, cfg.num_experts, dtype=jnp.float32)
        * topk_p[..., None],
        axis=1,
    )  # [T, E]
    return topk_p, topk_i, combine


def _gather_rows(bank: jax.Array, idx: jax.Array) -> jax.Array:
    """Extract expert matrices ``bank[idx]`` ([E, K, N] by [M] -> [M, K, N])
    as a scan of dynamic slices.  ``jnp.take`` lowers to a gather HLO whose
    MB-sized slice rows serialize terribly on TPU (measured 28 ms/tok AR on
    an 8-layer 30B-A3B geometry vs ~1 ms with this scan — each step is one
    contiguous DMA)."""
    def get(_, e):
        return None, jax.lax.dynamic_index_in_dim(bank, e, 0, keepdims=False)

    _, out = jax.lax.scan(get, None, idx)
    return out


def _experts_all(gate, up, down, xt: jax.Array, combine: jax.Array) -> jax.Array:
    """Dense all-experts dispatch: every expert processes every token; the
    combine matrix (zero for unselected (token, expert) pairs) folds the
    outputs.  Reads each expert's weights exactly ONCE — at verify-block
    token counts (T*k >~ E) most experts are selected anyway, and the gather
    path's materialized [T, k, H, Im] weight copies cost more HBM traffic
    than streaming the whole bank.  gate/up: [E, H, Im] (bf16 or int8
    QTensor, per-expert scales [E, 1, Im]); down: [E, Im, H]; combine:
    [T, E].  Returns [T, H] float32 partial output (caller psums under EP).

    DFLASH_MOE_CHUNK=N processes the bank in N-expert chunks folded into a
    running [T, H] accumulator (a lax.scan) to bound the f32 intermediates
    ([E, T, Im] twice plus [E, T, H]).  Measured a LOSS on v5e (16-lane l12
    engine: 2902 vs 3269 tok/s unchunked — the sequential scan serializes
    the weight stream XLA otherwise overlaps), so chunking is OFF by
    default; the knob stays for memory-constrained giant-E configs.
    """
    E = combine.shape[-1]
    T = xt.shape[0]
    chunk = int(os.environ.get("DFLASH_MOE_CHUNK", "0"))
    if chunk > 0 and E > chunk and E % chunk == 0:
        n_chunks = E // chunk

        def resh(w):
            if isinstance(w, QTensor):
                return QTensor(
                    w.q.reshape((n_chunks, chunk) + w.q.shape[1:]),
                    w.scale.reshape((n_chunks, chunk) + w.scale.shape[1:]),
                    w.n,
                )
            return w.reshape((n_chunks, chunk) + w.shape[1:])

        comb_chunks = jnp.moveaxis(
            combine.reshape(T, n_chunks, chunk), 1, 0
        )  # [n_chunks, T, chunk]

        def body(acc, xs):
            g_, u_, d_, cb = xs
            return acc + _experts_block(g_, u_, d_, xt, cb), None

        acc0 = jnp.zeros((T, down.n if isinstance(down, QTensor) else down.shape[-1]),
                         jnp.float32)
        out, _ = jax.lax.scan(
            body, acc0, (resh(gate), resh(up), resh(down), comb_chunks)
        )
        return out
    return _experts_block(gate, up, down, xt, combine)


def _experts_block(gate, up, down, xt: jax.Array, combine: jax.Array) -> jax.Array:
    """One dense pass over a (chunk of the) expert bank; see _experts_all."""
    # Explicit HIGHEST precision: XLA lowers the "th,ehi->eti" batched form
    # to a reduced-precision matmul under default precision when xt is f32
    # (measured ~2e-3 rel error vs the gather contraction's exact f32) —
    # enough to break the spec==AR oracle.  With bf16 activations (the TPU
    # perf path) the flag is a no-op: bf16 x bf16 -> f32 is MXU-native.
    hi = jax.lax.Precision.HIGHEST
    if isinstance(gate, QTensor):
        # int8 -> bf16 convert fuses into the einsum; the per-expert
        # per-channel scale is applied to the f32 output (same recipe as
        # ops/linear.py — no dequantized copy is materialized).
        g = jnp.einsum(
            "th,ehi->eti", xt, gate.q.astype(xt.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * gate.scale
        u = jnp.einsum(
            "th,ehi->eti", xt, up.q.astype(xt.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * up.scale
        act = (jax.nn.silu(g) * u).astype(xt.dtype)[..., : gate.n]
        o = jnp.einsum(
            "eti,eih->eth", act, down.q.astype(xt.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * down.scale
        o = o[..., : down.n]
    else:
        g = jnp.einsum("th,ehi->eti", xt, gate,
                       preferred_element_type=jnp.float32, precision=hi)
        u = jnp.einsum("th,ehi->eti", xt, up,
                       preferred_element_type=jnp.float32, precision=hi)
        act = (jax.nn.silu(g) * u).astype(xt.dtype)
        o = jnp.einsum("eti,eih->eth", act, down,
                       preferred_element_type=jnp.float32, precision=hi)
    return jnp.einsum("eth,te->th", o, combine.astype(jnp.float32), precision=hi)


def _moe_mlp(lp: dict, cfg: ModelConfig, x: jax.Array, mesh=None) -> jax.Array:
    """Top-k routed expert MLP (bf16 or int8-QTensor expert banks).

    Three dispatch strategies, all static-shape:

    * **Dense-all** (default): every expert processes every token, combine
      folds the outputs (:func:`_experts_all`).  The whole bank streams once
      per forward with zero gather traffic — measured fastest on v5e even at
      T=1 (see the dispatch-choice comment below).
    * **Gather** (``DFLASH_MOE=gather``): pull the selected experts' weights
      per (token, k) pair via a scan of dynamic slices and run batched
      per-pair matmuls.  Reads only the active experts but is DMA-latency
      bound on TPU; kept for A/B and for hardware where gathers are cheap.
    * **Expert-parallel** (``mesh`` given with experts sharded over
      (ep, tp), parallel/mesh.py): shard_map keeps every expert table
      resident on its shard, replicates the (tiny) activations, computes all
      *local* experts densely, folds in the pre-sliced combine columns and
      psums the partial outputs.  For B<=32-token verify blocks this beats
      an all-to-all dispatch: the routed activation payload is tiny while
      expert weights never move — the all-to-all latency the survey flags
      (SURVEY §7 hard part 6) is avoided entirely.
    """
    b, s, h = x.shape
    xt = x.reshape(b * s, h)
    use_ep = (
        mesh is not None
        and "ep" in mesh.shape
        and (mesh.shape["ep"] * mesh.shape["tp"]) > 1
        and cfg.num_experts % (mesh.shape["ep"] * mesh.shape["tp"]) == 0
    )
    if use_ep:
        from jax.sharding import PartitionSpec as P

        _, _, combine = _route(lp, cfg, xt)

        def local_experts(gate, up, down, xt, combine_loc):
            # combine_loc: [T, E_loc] — shard_map pre-slices the columns, so
            # expert-index offsets never appear explicitly.
            o = _experts_all(gate, up, down, xt, combine_loc)
            return jax.lax.psum(o, ("ep", "tp"))

        ep_spec = P(("ep", "tp"))
        out = jax.shard_map(
            local_experts,
            mesh=mesh,
            in_specs=(ep_spec, ep_spec, ep_spec, P(), P(None, ("ep", "tp"))),
            out_specs=P(),
            check_vma=False,
        )(lp["gate"], lp["up"], lp["down"], xt, combine)
        return out.astype(x.dtype).reshape(b, s, h)

    topk_p, topk_i, combine = _route(lp, cfg, xt)
    # Dispatch choice, whole-loop A/B'd on a v5e (8-layer 30B-A3B geometry,
    # int8 experts, AR decode T=1 — the gather-friendliest case): dense-all
    # 8.85 ms/tok vs scan-of-dynamic-slices gather 17.6 ms vs jnp.take gather
    # 27.9 ms.  Selected-expert gathers are latency-bound on TPU (hundreds of
    # sequential DMA ops per cycle) while the dense read streams the bank at
    # ~550 GB/s, so dense-all is the default for every token count;
    # DFLASH_MOE=gather opts into the slice-gather path.
    if os.environ.get("DFLASH_MOE", "dense") != "gather":
        out = _experts_all(lp["gate"], lp["up"], lp["down"], xt, combine)
        return out.astype(x.dtype).reshape(b, s, h)
    # Gather the selected experts' weights per token.  For the tiny token
    # counts of a verify/decode step this reads only the active experts.
    T, k = topk_i.shape
    flat = topk_i.reshape(-1)
    hi = jax.lax.Precision.HIGHEST
    if isinstance(lp["gate"], QTensor):
        # INT8 expert banks: gather the int8 tiles + per-expert per-channel
        # scales; the int8 -> bf16 convert fuses into the einsum and the
        # scale is applied to the f32 output (see ops/linear.py) — expert
        # HBM traffic per cycle is halved vs bf16 experts.
        gate_w, up_w, down_w = lp["gate"], lp["up"], lp["down"]
        gq = _gather_rows(gate_w.q, flat).reshape(T, k, *gate_w.q.shape[1:])
        gs = _gather_rows(gate_w.scale, flat).reshape(T, k, -1)  # [T, k, Im]
        uq = _gather_rows(up_w.q, flat).reshape(T, k, *up_w.q.shape[1:])
        us = _gather_rows(up_w.scale, flat).reshape(T, k, -1)
        g = jnp.einsum(
            "th,tkhi->tki", xt, gq.astype(xt.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * gs
        u = jnp.einsum(
            "th,tkhi->tki", xt, uq.astype(xt.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * us
        act = (jax.nn.silu(g) * u).astype(x.dtype)[..., : gate_w.n]
        dq = _gather_rows(down_w.q, flat).reshape(T, k, *down_w.q.shape[1:])
        ds = _gather_rows(down_w.scale, flat).reshape(T, k, -1)  # [T, k, H]
        out = jnp.einsum(
            "tki,tkih->tkh", act, dq.astype(x.dtype),
            preferred_element_type=jnp.float32, precision=hi,
        ) * ds
        out = out[..., : down_w.n]
    else:
        gate_w = _gather_rows(lp["gate"], flat).reshape(T, k, *lp["gate"].shape[1:])
        up_w = _gather_rows(lp["up"], flat).reshape(T, k, *lp["up"].shape[1:])
        down_w = _gather_rows(lp["down"], flat).reshape(T, k, *lp["down"].shape[1:])
        g = jnp.einsum("th,tkhi->tki", xt, gate_w,
                       preferred_element_type=jnp.float32, precision=hi)
        u = jnp.einsum("th,tkhi->tki", xt, up_w,
                       preferred_element_type=jnp.float32, precision=hi)
        act = (jax.nn.silu(g) * u).astype(x.dtype)
        out = jnp.einsum("tki,tkih->tkh", act, down_w,
                         preferred_element_type=jnp.float32, precision=hi)
    out = jnp.sum(out * topk_p[..., None], axis=1)
    return out.astype(x.dtype).reshape(b, s, h)


def _dense_mlp(lp: dict, x: jax.Array) -> jax.Array:
    g = linear(x, lp["gate"], out_dtype=jnp.float32)
    u = linear(x, lp["up"], out_dtype=jnp.float32)
    act = (jax.nn.silu(g) * u).astype(x.dtype)
    return linear(act, lp["down"])


def forward(
    params: dict,
    cfg: ModelConfig,
    embeds: jax.Array,  # [B, S, H]
    positions: jax.Array,  # [B, S] int32 absolute positions
    kv: KVCache,
    write_pos: jax.Array,  # scalar int32: cache row of embeds[:, 0]
    mask: jax.Array,  # bool [S, T] or [B, S, T] over the FULL cache buffer
    tap_ids: Tuple[int, ...] = (),
    mesh=None,
    attn_impl: str = "xla",
    attn_limit: Optional[jax.Array] = None,  # [] int32: no valid key >= limit
) -> ForwardResult:
    """One target forward over S tokens, writing K/V at ``write_pos``.

    The attention keys are the whole cache buffer *after* this call's write,
    masked by ``mask`` (the caller encodes causality + the valid frontier).

    ``attn_impl="pallas"`` routes attention through the frontier-bounded
    Pallas kernel (kernels/attention.py): per-cycle attention HBM traffic is
    O(write_pos + S) instead of O(T) — the long-context decode path.  Valid
    only when ``positions[b, i] == write_pos + i`` (the verify/AR decode
    pattern), batch 1, unquantized cache.
    """
    B, S, H = embeds.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    scale = d ** -0.5
    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta, cfg.rope_scaling)

    lp = params["layers"]
    L = cfg.num_hidden_layers
    n_taps = len(tap_ids)
    # tap_slots[l] = index of layer l in tap_ids, or -1.
    slot_of = {l: i for i, l in enumerate(tap_ids)}
    tap_slots = jnp.asarray([slot_of.get(l, -1) for l in range(L)], jnp.int32)
    # One [B, S, H] carry per tap, selected with a flat where — a single
    # [n_taps, B, S, H] buffer updated via DUS+where forces a hostile layout
    # and transposes (profiled at ~10% of a 16-lane batched cycle).
    # NB: carrying the KV stack instead of threading it as scan xs/ys was
    # measured WORSE under vmap: loop-carry batching moves the lane axis to
    # position 0, transposing the whole multi-GB stack at the jit boundary
    # every cycle (docs/RESULTS.md).
    taps0 = tuple(jnp.zeros((B, S, H), embeds.dtype) for _ in range(n_taps))

    def layer_step(carry, xs):
        hidden, taps = carry
        p, cache_layer, slot = xs

        h_norm = rms_norm(hidden, p["input_ln"], cfg.rms_norm_eps)
        q = linear(h_norm, p["wq"]).reshape(B, S, nh, d)
        k = linear(h_norm, p["wk"]).reshape(B, S, nkv, d)
        v = linear(h_norm, p["wv"]).reshape(B, S, nkv, d)
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        cache_layer = update_any(cache_layer, k, v, write_pos)
        if attn_impl == "pallas":
            from dflash_tpu.kernels.attention import verify_attention

            if B != 1 or isinstance(cache_layer, QuantKVCache):
                raise ValueError("attn_impl='pallas' needs batch 1 + bf16 cache")
            attn = verify_attention(
                q, cache_layer.k, cache_layer.v, write_pos, block=S
            )
        else:
            attn = _attend_cache(q, cache_layer, mask, scale, attn_limit)
        attn = linear(attn, p["wo"], out_dtype=hidden.dtype)
        hidden = hidden + attn

        h_norm2 = rms_norm(hidden, p["post_ln"], cfg.rms_norm_eps)
        mlp_out = _moe_mlp(p, cfg, h_norm2, mesh) if cfg.is_moe else _dense_mlp(p, h_norm2)
        hidden = hidden + mlp_out

        taps = tuple(
            jnp.where(slot == i, hidden, t) for i, t in enumerate(taps)
        )
        return (hidden, taps), cache_layer

    (hidden, taps), new_kv = jax.lax.scan(
        layer_step, (embeds, taps0), (lp, kv, tap_slots)
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if n_taps > 0:
        taps_concat = jnp.concatenate(taps, axis=-1)
    else:
        taps_concat = jnp.zeros((B, S, H), embeds.dtype)
    return ForwardResult(hidden=hidden, taps=taps_concat, kv=new_kv)


class PrefillResult(NamedTuple):
    hidden: jax.Array  # [B, S, H] — final-norm'd hidden states
    taps: jax.Array  # [B, S, n_taps * H]
    k: jax.Array  # [L, B, S, n_kv, d] — prompt K rows (pre-cache)
    v: jax.Array  # [L, B, S, n_kv, d]


def forward_prefill(
    params: dict,
    cfg: ModelConfig,
    embeds: jax.Array,  # [B, S, H]
    positions: jax.Array,  # [B, S] int32
    tap_ids: Tuple[int, ...] = (),
    mesh=None,
    seq_axis: Optional[str] = None,
    attn_impl: str = "auto",  # "auto" | "xla" | "flash"
) -> PrefillResult:
    """Cache-free causal prefill over S prompt tokens.

    Unlike ``forward`` (which attends the whole preallocated cache buffer
    under a mask — O(S*T) score work), prefill needs no cache reads at all:
    attention is O(S^2) over the prompt only, and the produced K/V rows are
    returned for the caller to write into the cache at position 0.

    With ``mesh``/``seq_axis``, attention runs sequence-sharded via ring
    ppermute over ICI (``parallel.ring``) — the long-context prefill path
    (the reference has none; SURVEY §5 long-context row).
    """
    B, S, H = embeds.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    scale = d ** -0.5
    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta, cfg.rope_scaling)
    causal = (
        positions[0][:, None] >= positions[0][None, :]
    )  # [S, S] — padded rows (pos >= prompt_len) are never attended by real rows
    # flash prefill: measured crossover on v5e (docs/RESULTS.md TTFT table,
    # round 5) — XLA wins tiny prompts by ~4-5% (128: 32.0 vs 33.6 ms),
    # parity at 512, then the kernel wins 1.16x at 1k, 1.44x at 2k, 1.74x
    # at 4k and 2.5x over the old chunked record at 8k (where XLA's full
    # path OOMs on its own [nh, S, S] transient).  "auto" engages the
    # kernel from the 512 parity point.  Requires the positional (arange)
    # causal structure, which forward_prefill's mask always has.
    from dflash_tpu.kernels import prefill_flash as _pf

    if attn_impl == "flash":
        use_flash = _pf.supported(S, d) and B == 1
    elif attn_impl == "auto":
        use_flash = S >= 512 and _pf.supported(S, d) and B == 1
    else:
        use_flash = False

    lp = params["layers"]
    L = cfg.num_hidden_layers
    n_taps = len(tap_ids)
    slot_of = {l: i for i, l in enumerate(tap_ids)}
    tap_slots = jnp.asarray([slot_of.get(l, -1) for l in range(L)], jnp.int32)
    taps0 = tuple(jnp.zeros((B, S, H), embeds.dtype) for _ in range(n_taps))

    def layer_step(carry, xs):
        hidden, taps = carry
        p, slot = xs

        h_norm = rms_norm(hidden, p["input_ln"], cfg.rms_norm_eps)
        q = linear(h_norm, p["wq"]).reshape(B, S, nh, d)
        k = linear(h_norm, p["wk"]).reshape(B, S, nkv, d)
        v = linear(h_norm, p["wv"]).reshape(B, S, nkv, d)
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if seq_axis is not None:
            from dflash_tpu.parallel.ring import ring_prefill_attention

            attn = ring_prefill_attention(q, k, v, scale, mesh, seq_axis)
        elif use_flash:
            # Tiled causal flash kernel (kernels/prefill_flash.py): past
            # ~2k tokens the XLA path's [nh, S, S] score transients turn
            # the prefill quadratic-bound (TTFT table, docs/RESULTS.md);
            # the kernel keeps score tiles in VMEM and skips the causal
            # upper triangle's fetches and FLOPs.
            from dflash_tpu.kernels.prefill_flash import flash_prefill_attention

            attn = flash_prefill_attention(q, k, v, scale)
        else:
            attn = gqa_attention(q, k, v, causal, scale)
        attn = linear(attn, p["wo"], out_dtype=hidden.dtype)
        hidden = hidden + attn

        h_norm2 = rms_norm(hidden, p["post_ln"], cfg.rms_norm_eps)
        mlp_out = _moe_mlp(p, cfg, h_norm2, mesh) if cfg.is_moe else _dense_mlp(p, h_norm2)
        hidden = hidden + mlp_out

        taps = tuple(
            jnp.where(slot == i, hidden, t) for i, t in enumerate(taps)
        )
        return (hidden, taps), (k, v)

    (hidden, taps), (k_rows, v_rows) = jax.lax.scan(
        layer_step, (embeds, taps0), (lp, tap_slots)
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if n_taps > 0:
        taps_concat = jnp.concatenate(taps, axis=-1)
    else:
        taps_concat = jnp.zeros((B, S, H), embeds.dtype)
    return PrefillResult(hidden=hidden, taps=taps_concat, k=k_rows, v=v_rows)


class CandidateForwardResult(NamedTuple):
    hidden: jax.Array  # [C, B, H]
    taps: jax.Array  # [C, B, n_taps * H]
    blk_k: jax.Array  # [L, C, B, n_kv, d] — per-candidate block keys
    blk_v: jax.Array  # [L, C, B, n_kv, d]


def forward_block_candidates(
    params: dict,
    cfg: ModelConfig,
    embeds: jax.Array,  # [C, B, H] — C candidate blocks
    positions: jax.Array,  # [C, B] absolute positions (identical rows)
    ctx_kv: KVCache,  # committed-context cache, batch 1
    ctx_len: jax.Array,  # scalar int32 frontier (valid ctx rows < ctx_len)
    tap_ids: Tuple[int, ...] = (),
    mesh=None,
    blk_mask: Optional[jax.Array] = None,  # [B, B] row-attendability override
    attn_impl: str = "xla",  # "fused" = Pallas two-part flash verify kernel
) -> CandidateForwardResult:
    """Verify C candidate blocks in one batched forward over a SHARED context.

    TPU-native replacement for the reference's per-candidate KV-cache clone +
    ``batch_repeat_interleave`` (benchmark_candidate_solutions.py:574-576):
    every candidate reads the same committed-context K/V (no copy); only the
    per-candidate block K/V differ, and they are returned so the caller can
    commit the winning candidate's rows into the main cache.

    Attention per query i of candidate c: all ctx rows < ctx_len plus block
    rows j <= i of candidate c (causal within the block).  ``blk_mask``
    overrides the within-block causal mask — the shared-prefix candidate
    verify (spec/candidates.py) flattens C candidate blocks into one C=1 row
    set [1, p + C*(B-p)] whose mask encodes "suffix rows attend the shared
    prefix plus their own candidate's earlier suffix rows", so the p-token
    common prefix is computed once instead of C times.
    """
    C, B, H = embeds.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    scale = d ** -0.5
    T = ctx_kv.max_len
    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta, cfg.rope_scaling)

    ctx_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < ctx_len  # [1, T]
    if blk_mask is None:
        blk_mask = (
            jnp.arange(B, dtype=jnp.int32)[None, :]
            <= jnp.arange(B, dtype=jnp.int32)[:, None]
        )  # [B, B]

    lp = params["layers"]
    L = cfg.num_hidden_layers
    n_taps = len(tap_ids)
    slot_of = {l: i for i, l in enumerate(tap_ids)}
    tap_slots = jnp.asarray([slot_of.get(l, -1) for l in range(L)], jnp.int32)
    taps0 = tuple(jnp.zeros((C, B, H), embeds.dtype) for _ in range(n_taps))

    def layer_step(carry, xs):
        hidden, taps = carry
        p, ctx_layer, slot = xs  # ctx cache layer slice, [1, T, n_kv, d]

        h_norm = rms_norm(hidden, p["input_ln"], cfg.rms_norm_eps)
        q = linear(h_norm, p["wq"]).reshape(C, B, nh, d)
        k = linear(h_norm, p["wk"]).reshape(C, B, nkv, d)
        v = linear(h_norm, p["wv"]).reshape(C, B, nkv, d)
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        quant = isinstance(ctx_layer, QuantKVCache)
        c_ks = ctx_layer.k_scale if quant else None
        c_vs = ctx_layer.v_scale if quant else None
        if attn_impl == "fused":
            # Fused two-part flash verify kernel (kernels/verify_fused.py):
            # same math as the XLA two-part path below, but the [rows, T]
            # score tensor never leaves VMEM and ctx reads stop at the
            # frontier — the round-4-identified lever for the linear
            # 3.2 µs/(row·tok) multi-row verify cost.
            from dflash_tpu.kernels.verify_fused import fused_ctx_block_attention

            attn = fused_ctx_block_attention(
                q, ctx_layer.k, c_ks, ctx_layer.v, c_vs, k, v,
                ctx_len, blk_mask, scale,
            )
        else:
            # Two-part attention merged by log-sum-exp: the shared ctx rows
            # are consumed int8 (batch dim 1, no per-candidate broadcast, no
            # dequantized copy — the earlier implementation materialized a
            # bf16 ctx copy per layer, VERDICT round 1); the tiny
            # per-candidate block rows stay bf16.  For bf16/f32 caches the
            # scales are None — the earlier concatenate materialized a
            # per-candidate [C, T, n_kv, d] broadcast copy of the whole ctx
            # K/V per layer, HBM traffic growing with context.
            from dflash_tpu.ops.attention import gqa_attention_quant_ctx_plus_block

            attn = gqa_attention_quant_ctx_plus_block(
                q, ctx_layer.k, c_ks, ctx_layer.v, c_vs, k, v,
                ctx_mask[0], blk_mask, scale,
            )
        attn = linear(attn, p["wo"], out_dtype=hidden.dtype)
        hidden = hidden + attn

        h_norm2 = rms_norm(hidden, p["post_ln"], cfg.rms_norm_eps)
        mlp_out = _moe_mlp(p, cfg, h_norm2, mesh) if cfg.is_moe else _dense_mlp(p, h_norm2)
        hidden = hidden + mlp_out

        taps = tuple(
            jnp.where(slot == i, hidden, t) for i, t in enumerate(taps)
        )
        return (hidden, taps), (k, v)

    (hidden, taps), (blk_k, blk_v) = jax.lax.scan(
        layer_step, (embeds, taps0), (lp, ctx_kv, tap_slots)
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if n_taps > 0:
        taps_concat = jnp.concatenate(taps, axis=-1)
    else:
        taps_concat = jnp.zeros((C, B, H), embeds.dtype)
    return CandidateForwardResult(hidden=hidden, taps=taps_concat, blk_k=blk_k, blk_v=blk_v)


def causal_mask(q_positions: jax.Array, cache_len: int) -> jax.Array:
    """[S, T] mask: key row s attendable iff s <= q_pos.

    Because cache rows are indexed by absolute position and each cycle's
    writes land *before* attention, `s <= q_pos` alone guarantees every
    attended row holds a committed token or the current block (stale rows from
    rejected drafts always sit at positions > q_pos or are overwritten first).
    """
    key_pos = jnp.arange(cache_len, dtype=jnp.int32)[None, :]
    return key_pos <= q_positions.astype(jnp.int32)[:, None]
