"""T3: the 520M Llama-style speech-token decoder, TPU-native.

Capability parity with the reference's vLLM plugin (`models/t3/t3.py`), but the
architecture is idiomatic JAX: pure functions over a parameter pytree, layers
stacked for `lax.scan`, a dense slotted KV cache updated functionally, and
classifier-free guidance as a *native batch axis* — each request occupies two
adjacent rows (even = conditioned, odd = unconditioned) of the device batch.

This removes the reference's three signature hacks (SURVEY.md §7):
  * hidden-size doubling to smuggle the CFG pair through vLLM
    (reference `t3.py:260-263,697-713`) — here the pair is just batch rows;
  * the speech-token id offset 2500 (`t3.py:44-49`) — our engine knows which
    phase it is in, ids live in their natural [0, 8194) space;
  * placeholder-token / triangular-matrix prefill smuggling (`t3.py:186-248`)
    — conditioning embeddings are a first-class input to prefill.

Sequence layout (matches reference semantics, `t3.py:542-559`):

    [ cond (34 rows) | text embeds + text_pos | start_of_speech | speech ... ]

The unconditioned row keeps the cond prefix and start-of-speech but zeroes the
text embeddings (`t3.py:556`).  Speech positions are tracked exactly per token
(the reference restarts them at 0 every decode step and documents this as an
approximation, `t3.py:447-464`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import T3Config
from ...ops.norm import rms_norm
from ...ops.rotary import apply_rope, rope_table


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _dense_init(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_t3_params(key: jax.Array, cfg: T3Config, dtype=jnp.float32) -> dict:
    """Random-initialised T3 parameter pytree (tests / benchmarks).

    Real checkpoints are loaded by `utils/checkpoint.py`, which maps the
    reference safetensors names onto this tree.
    """
    keys = iter(jax.random.split(key, 16))
    h, nh, hd, inter = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size
    L = cfg.num_layers

    def stack(k, shape):
        return _dense_init(k, (L,) + shape, dtype)

    layers = {
        "input_norm": jnp.ones((L, h), dtype),
        "q_proj": stack(next(keys), (h, nh * hd)),
        "k_proj": stack(next(keys), (h, cfg.num_kv_heads * hd)),
        "v_proj": stack(next(keys), (h, cfg.num_kv_heads * hd)),
        "o_proj": stack(next(keys), (nh * hd, h)),
        "post_norm": jnp.ones((L, h), dtype),
        "gate_proj": stack(next(keys), (h, inter)),
        "up_proj": stack(next(keys), (h, inter)),
        "down_proj": stack(next(keys), (inter, h)),
    }
    return {
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "text_emb": _dense_init(next(keys), (cfg.text_vocab_size, h), dtype),
        "speech_emb": _dense_init(next(keys), (cfg.speech_vocab_size, h), dtype),
        # reference sizes: max_text_tokens+2 and max_speech_tokens+4
        # (`models/t3/t3.py:280-284`)
        "text_pos_emb": _dense_init(next(keys), (cfg.max_text_tokens + 2, h), dtype),
        "speech_pos_emb": _dense_init(next(keys), (cfg.max_speech_tokens + 4, h), dtype),
        "speech_head": _dense_init(next(keys), (h, cfg.speech_vocab_padded), dtype),
    }


class KVCache(NamedTuple):
    """Dense slotted KV cache: [num_layers, num_slots, max_len, kv_heads, head_dim].

    Slot s is one CFG stream; a request owns slots (2i, 2i+1).  The paged
    variant lives in `engine/kv_cache.py` and shares the model interface.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: T3Config, num_slots: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, num_slots, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


def t3_backbone(
    params: dict,
    cfg: T3Config,
    x: jnp.ndarray,              # [S, T, hidden]
    positions: jnp.ndarray,      # [S, T] int32 — global (RoPE) positions
    kv_cache: KVCache,
    write_index: jnp.ndarray,    # [S] int32 — where the T new tokens land in the cache
    attn_mask: jnp.ndarray,      # [S, T, max_len] bool — True = may attend
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
) -> tuple[jnp.ndarray, KVCache]:
    """Run the 30-layer Llama backbone over new tokens against the KV cache.

    Handles both prefill (T > 1, write_index typically 0) and decode (T = 1,
    write_index = current length).  Returns final hidden states and the
    functionally-updated cache (donate the cache at the jit boundary).
    """
    S, T, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    neg_inf = jnp.asarray(-1e30, jnp.float32)

    def write_kv(cache_l, new, idx):
        # cache_l: [S, M, H, D], new: [S, T, H, D], idx: [S]
        def one(c, n, i):
            return jax.lax.dynamic_update_slice(c, n, (i, 0, 0))
        return jax.vmap(one)(cache_l, new, idx)

    def layer(x, lp_and_cache):
        lp, k_cache_l, v_cache_l = lp_and_cache
        resid = x
        y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q = jnp.einsum("sth,hd->std", y, lp["q_proj"]).reshape(S, T, nh, hd)
        k = jnp.einsum("sth,hd->std", y, lp["k_proj"]).reshape(S, T, cfg.num_kv_heads, hd)
        v = jnp.einsum("sth,hd->std", y, lp["v_proj"]).reshape(S, T, cfg.num_kv_heads, hd)
        q = apply_rope(q, rope_cos, rope_sin, positions)
        k = apply_rope(k, rope_cos, rope_sin, positions)

        k_cache_l = write_kv(k_cache_l, k.astype(k_cache_l.dtype), write_index)
        v_cache_l = write_kv(v_cache_l, v.astype(v_cache_l.dtype), write_index)

        scores = jnp.einsum(
            "sthd,smhd->shtm", q, k_cache_l.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(attn_mask[:, None, :, :], scores, neg_inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "shtm,smhd->sthd", probs.astype(v_cache_l.dtype), v_cache_l,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(S, T, nh * hd)
        x = resid + jnp.einsum("std,dh->sth", out, lp["o_proj"])

        resid = x
        y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        gate = jnp.einsum("sth,hi->sti", y, lp["gate_proj"])
        up = jnp.einsum("sth,hi->sti", y, lp["up_proj"])
        y = jax.nn.silu(gate) * up
        x = resid + jnp.einsum("sti,ih->sth", y, lp["down_proj"])
        return x, (k_cache_l, v_cache_l)

    x, (new_k, new_v) = jax.lax.scan(layer, x, (params["layers"], kv_cache.k, kv_cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(new_k, new_v)


# ---------------------------------------------------------------------------
# Embedding builders (the engine's replacement for the reference's
# get_input_embeddings placeholder machinery, `t3.py:424-647`)
# ---------------------------------------------------------------------------


def build_prefill_embeds(
    params: dict,
    cfg: T3Config,
    cond_emb: jnp.ndarray,     # [B, 34, hidden] — output of cond_enc_apply
    text_ids: jnp.ndarray,     # [B, Tt] int32, right-padded
    text_len: jnp.ndarray,     # [B] int32 — true text lengths
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble CFG-paired prefill embeddings.

    Returns (embeds [2B, T, hidden], positions [2B, T], prefill_len [2B]) with
    T = 34 + Tt + 1.  Row layout per request i: row 2i conditioned, row 2i+1
    unconditioned (text embeddings zeroed, reference `t3.py:556`).  The
    start-of-speech embedding is scattered to index 34 + text_len (exact,
    per-sequence); padded tail rows are don't-care and masked by callers.
    """
    B, Tt = text_ids.shape
    C = cfg.cond_seq_len
    T = C + Tt + 1
    h = cfg.hidden_size
    dtype = cond_emb.dtype

    text_e = params["text_emb"][text_ids] + params["text_pos_emb"][None, :Tt, :]
    tmask = (jnp.arange(Tt)[None, :] < text_len[:, None])[..., None]
    text_e = jnp.where(tmask, text_e, 0.0).astype(dtype)

    sos = (params["speech_emb"][cfg.start_speech_token]
           + params["speech_pos_emb"][0]).astype(dtype)

    pad_tail = jnp.zeros((B, 1, h), dtype)
    cond_rows = jnp.concatenate([cond_emb, text_e, pad_tail], axis=1)
    uncond_rows = jnp.concatenate([cond_emb, jnp.zeros_like(text_e), pad_tail], axis=1)

    sos_idx = C + text_len                                   # [B]
    cond_rows = cond_rows.at[jnp.arange(B), sos_idx].set(sos)
    uncond_rows = uncond_rows.at[jnp.arange(B), sos_idx].set(sos)

    embeds = jnp.stack([cond_rows, uncond_rows], axis=1).reshape(2 * B, T, h)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (2 * B, T))
    prefill_len = jnp.repeat(sos_idx + 1, 2)                 # [2B]
    return embeds, positions, prefill_len


def build_decode_embeds(
    params: dict,
    cfg: T3Config,
    tokens: jnp.ndarray,       # [S] int32 — last sampled speech token per stream
    speech_pos: jnp.ndarray,   # [S] int32 — exact speech position (start token = 0)
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """[S, 1, hidden] decode-step embeddings: speech_emb + exact speech_pos_emb."""
    e = params["speech_emb"][tokens] + params["speech_pos_emb"][speech_pos]
    return e[:, None, :].astype(dtype)


# ---------------------------------------------------------------------------
# Logits
# ---------------------------------------------------------------------------


def speech_logits(params: dict, hidden: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Project hidden states onto the speech vocab (fp32 logits).

    The head is vocab-padded to a 256 multiple for even vocab-parallel
    sharding; the padding columns are sliced off here.
    """
    logits = jnp.einsum(
        "sh,hv->sv", hidden, params["speech_head"], preferred_element_type=jnp.float32
    )
    return logits[:, :vocab_size]


def cfg_combine(logits: jnp.ndarray, cfg_scale: jnp.ndarray) -> jnp.ndarray:
    """Classifier-free-guidance combine over adjacent (cond, uncond) rows.

    logits: [2B, V] (even = cond, odd = uncond); cfg_scale: [B] — per-request,
    which the reference cannot do (global env var, reference `t3.py:296`).
    Formula matches reference `t3.py:662`: cond + s * (cond - uncond).
    """
    pair = logits.reshape(-1, 2, logits.shape[-1])
    cond, uncond = pair[:, 0], pair[:, 1]
    return cond + cfg_scale[:, None] * (cond - uncond)


def make_rope_tables(cfg: T3Config, max_len: int):
    return rope_table(cfg.head_dim, max_len, cfg.rope)


def prefill_attn_mask(prefill_len: jnp.ndarray, T: int, max_len: int) -> jnp.ndarray:
    """[S, T, max_len] causal mask for prefill written at cache offset 0.

    Query t may attend cache slot m iff m <= t and m < prefill_len (padding
    rows beyond the true length are never readable).
    """
    t = jnp.arange(T)[None, :, None]
    m = jnp.arange(max_len)[None, None, :]
    return (m <= t) & (m < prefill_len[:, None, None])


def decode_attn_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[S, 1, max_len] mask for single-token decode: attend all m <= length."""
    m = jnp.arange(max_len)[None, None, :]
    return m <= lengths[:, None, None]
