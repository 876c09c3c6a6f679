"""Multi-head self-attention with the reference's exp-score normalization.

Reference semantics (Utils/attention.py:31-78):
    W_Q/W_K/W_V: dense layers WITH bias (tf.layers.dense default)
    scores = exp(Q Kᵀ / sqrt(d_k))              — raw exp, NOT max-subtracted
    attn   = scores / (sum(scores, -1) + 1e-8)   — SURVEY.md Q5
    out    = attn V, heads re-merged; no output projection, no residual.

Q5 note: raw exp overflows quickly in bf16 and for large logits even in f32,
so the parity path computes attention in float32. `stable=True` switches to
max-subtracted softmax, which changes results only by the +1e-8 term:
exp(s)/(Σexp(s)+1e-8) vs exp(s-m)/Σexp(s-m).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """tf.contrib xavier_initializer: U(-a, a), a = sqrt(6/(fan_in+fan_out))."""
    fan_in, fan_out = shape[-2], shape[-1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_mhsa_params(key: jax.Array, d_model: int) -> Dict[str, jax.Array]:
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "wq": xavier_uniform(kq, (d_model, d_model)),
        "bq": jnp.zeros((d_model,)),
        "wk": xavier_uniform(kk, (d_model, d_model)),
        "bk": jnp.zeros((d_model,)),
        "wv": xavier_uniform(kv, (d_model, d_model)),
        "bv": jnp.zeros((d_model,)),
    }


def multi_head_self_attention(params: Dict[str, jax.Array], x: jax.Array,
                              num_heads: int,
                              stable: bool = False,
                              mask: jax.Array | None = None) -> jax.Array:
    """x: [B, T, D] -> [B, T, D] (ref MultiHeadSelfAttention.attention).

    mask: optional [B, T] key-validity mask (1=valid). The reference's exp
    path multiplies raw scores by the mask (attention.py:40-41); the stable
    path adds -inf to masked logits.
    """
    B, T, D = x.shape
    dk = D // num_heads
    xf = x.astype(jnp.float32)

    q = xf @ params["wq"] + params["bq"]
    k = xf @ params["wk"] + params["bk"]
    v = xf @ params["wv"] + params["bv"]

    if T <= 16:
        # Small-T path (the interval axis: T = graph_num ≤ 12). The einsum
        # formulation becomes B·H tiny [T,dk]x[dk,T] batched matmuls, which
        # TPUs execute pathologically (measured ~17 ms for [20k,3,64] vs
        # <1 ms of actual work); broadcast-multiply-reduce stays on the VPU
        # at full width.
        qh = q.reshape(B, T, num_heads, dk)
        kh = k.reshape(B, T, num_heads, dk)
        vh = v.reshape(B, T, num_heads, dk)
        logits = jnp.sum(qh[:, :, None] * kh[:, None, :], axis=-1) \
            / jnp.sqrt(jnp.float32(dk))            # [B, T, S, H]
        if mask is not None:
            logits = jnp.where(mask[:, None, :, None] > 0, logits, -1e30)
        if stable:
            attn = jax.nn.softmax(logits, axis=2)
        else:
            scores = jnp.exp(logits)               # attention.py:39
            attn = scores / (jnp.sum(scores, axis=2, keepdims=True) + 1e-8)
        ctx = jnp.sum(attn[..., None] * vh[:, None], axis=2)  # [B,T,H,dk]
        return ctx.reshape(B, T, D).astype(x.dtype)

    def split_heads(y):  # [B, T, D] -> [B, H, T, dk]
        return y.reshape(B, T, num_heads, dk).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.float32(dk))
    if mask is not None:
        # mask logits BEFORE the exp (exp(big)*0 would give NaN; the
        # reference multiplies after exp, attention.py:40-41, but never
        # actually passes masks)
        logits = jnp.where(mask[:, None, None, :] > 0, logits, -1e30)
    if stable:
        attn = jax.nn.softmax(logits, axis=-1)
    else:
        scores = jnp.exp(logits)  # attention.py:39
        attn = scores / (jnp.sum(scores, axis=-1, keepdims=True) + 1e-8)
    ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v,
                     preferred_element_type=jnp.float32)
    return ctx.transpose(0, 2, 1, 3).reshape(B, T, D).astype(x.dtype)


def init_additive_attention_params(key: jax.Array, query_dim: int,
                                   cand_dim: int) -> Dict[str, jax.Array]:
    """AdditiveAttention (Utils/attention.py:4-29): dense to query_dim, tanh,
    dot with a query vector, softmax-weighted pooling. The reference draws
    the query vector as a NON-trainable uniform(-0.1, 0.1) tensor
    (attention.py:9); kept as a param here (initialized identically).
    Instantiated but dead in the reference model (model.py:147-148, 168)."""
    kd, kq = jax.random.split(key)
    return {
        "w": xavier_uniform(kd, (cand_dim, query_dim)),
        "b": jnp.zeros((query_dim,)),
        "query": jax.random.uniform(kq, (query_dim, 1), minval=-0.1,
                                    maxval=0.1),
    }


def additive_attention(params: Dict[str, jax.Array],
                       candidates: jax.Array) -> jax.Array:
    """candidates: [B, T, D] -> pooled [B, D]."""
    temp = jnp.tanh(candidates @ params["w"] + params["b"])   # [B, T, Q]
    weights = jax.nn.softmax(
        jnp.squeeze(temp @ params["query"], -1), axis=1)       # [B, T]
    return jnp.einsum("bt,btd->bd", weights, candidates)


def layer_norm(x: jax.Array, scale: jax.Array, shift: jax.Array,
               eps: float = 1e-12) -> jax.Array:
    """tf.contrib.layers.layer_norm with its DEFAULTS: begin_norm_axis=1,
    begin_params_axis=-1 — i.e. mean/variance are computed over ALL axes
    after the leading batch axis (for [N, T, D] inputs that is T·D jointly),
    while the trainable scale/shift are per-last-axis. The model calls it
    this way at model.py:152-153,161-162,165. variance_epsilon=1e-12."""
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + shift


def init_layer_norm_params(d: int) -> Dict[str, jax.Array]:
    return {"scale": jnp.ones((d,)), "shift": jnp.zeros((d,))}
