"""T3 conditioning encoder: speaker row + perceiver resampler + emotion row.

Builds the 34-row conditioning prefix (reference `models/t3/modules/cond_enc.py:80-123`):
  row 0      : Linear(speaker_embed 256 -> 1024) of the VoiceEncoder embedding
  rows 1..32 : Perceiver resample of the 150-token speech-prompt embeddings
  row 33     : Linear(1 -> 1024, no bias) of the emotion_adv scalar

Perceiver (reference `models/t3/modules/perceiver.py:176-215`): 32 learned
queries; ONE shared attention block applied twice — cross-attention
(queries, prompt) then self-attention on the result.  The block is pre-LN with
a residual on the query path and 4 heads of 256 dims (no positional encoding;
the unused RelativePositionBias of the reference is not replicated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import T3Config


def _linear_init(key, fan_in, fan_out, dtype, bias=True):
    kw, kb = jax.random.split(key)
    bound = fan_in ** -0.5
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound).astype(dtype)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound).astype(dtype)
    return {"w": w, "b": b}


def init_cond_enc_params(key: jax.Array, cfg: T3Config, dtype=jnp.float32) -> dict:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 8))
    q_var = (3.0 ** 0.5) * (2.0 / (2 * cfg.perceiver_queries)) ** 0.5
    return {
        "spkr_enc": _linear_init(next(keys), cfg.speaker_embed_size, h, dtype),
        "emotion_adv_fc": _linear_init(next(keys), 1, h, dtype, bias=False),
        "perceiver": {
            "query": jax.random.uniform(
                next(keys), (cfg.perceiver_queries, h), jnp.float32, -q_var, q_var
            ).astype(dtype),
            "norm": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
            "to_q": _linear_init(next(keys), h, h, dtype),
            "to_k": _linear_init(next(keys), h, h, dtype),
            "to_v": _linear_init(next(keys), h, h, dtype),
            "proj_out": _linear_init(next(keys), h, h, dtype),
        },
    }


def _linear(p, x):
    from ...ops.quant_matmul import QuantTensor, quant_einsum

    w = p["w"]
    y = quant_einsum(x, w) if isinstance(w, QuantTensor) else x @ w
    return y + p["b"] if "b" in p else y


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _attn_block(p, x1, x2, num_heads: int):
    """Shared pre-LN attention block with residual on x1 ([Tq, h], [Tk, h])."""
    h = x1.shape[-1]
    hd = h // num_heads
    x1n = _layer_norm(p["norm"], x1)
    x2n = _layer_norm(p["norm"], x2)
    q = _linear(p["to_q"], x1n).reshape(-1, num_heads, hd)
    k = _linear(p["to_k"], x2n).reshape(-1, num_heads, hd)
    v = _linear(p["to_v"], x2n).reshape(-1, num_heads, hd)
    scores = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, h)
    return x1 + _linear(p["proj_out"], out)


def perceiver_apply(p: dict, prompt_emb: jnp.ndarray, num_heads: int = 4) -> jnp.ndarray:
    """[Tp, h] speech-prompt embeddings -> [32, h] resampled conditioning rows."""
    q = p["query"].astype(prompt_emb.dtype)
    pre = _attn_block(p, q, prompt_emb, num_heads)
    return _attn_block(p, pre, pre, num_heads)


def cond_enc_apply(
    params: dict,
    cfg: T3Config,
    speaker_emb: jnp.ndarray,     # [256] L2-normalised VoiceEncoder embedding
    prompt_emb: jnp.ndarray,      # [150, hidden] speech_emb + speech_pos_emb of prompt
    emotion_adv: jnp.ndarray,     # scalar in [0, 1]
) -> jnp.ndarray:
    """Build the [34, hidden] conditioning prefix."""
    spkr = _linear(params["spkr_enc"], speaker_emb)[None, :]
    resampled = perceiver_apply(params["perceiver"], prompt_emb, cfg.perceiver_heads)
    emotion = emotion_adv.reshape(1, 1) @ params["emotion_adv_fc"]["w"]
    return jnp.concatenate([spkr, resampled, emotion], axis=0)


def cond_enc_batch(params, cfg, speaker_embs, prompt_embs, emotion_advs):
    """Batched variant: [B,256], [B,150,h], [B] -> [B,34,h]."""
    return jax.vmap(lambda s, p, e: cond_enc_apply(params, cfg, s, p, e))(
        speaker_embs, prompt_embs, emotion_advs
    )
