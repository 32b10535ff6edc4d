"""T3: the 520M Llama-style speech-token decoder, TPU-native.

Capability parity with the reference's vLLM plugin (`models/t3/t3.py`), but the
architecture is idiomatic JAX: pure functions over a parameter pytree, a dense
slotted KV cache updated in place (donated through the jit boundary), and
classifier-free guidance as a *native batch axis* — each request occupies two
adjacent rows (even = conditioned, odd = unconditioned) of the device batch.

This removes the reference's three signature hacks (SURVEY.md §7):
  * hidden-size doubling to smuggle the CFG pair through vLLM
    (reference `t3.py:260-263,697-713`) — here the pair is just batch rows;
  * the speech-token id offset 2500 (`t3.py:44-49`) — our engine knows which
    phase it is in, ids live in their natural [0, 8194) space;
  * placeholder-token / triangular-matrix prefill smuggling (`t3.py:186-248`)
    — conditioning embeddings are a first-class input to prefill.

Performance design (decode is HBM-bound on weight + KV traffic):
  * The 30 layers are a **static Python loop**, not `lax.scan` — scanning over
    layers forces XLA to copy the full KV cache through the scan's xs/ys
    buffers every step (measured: >70%% of step time in round 1).  Unrolled,
    each layer's cache update is one in-place dynamic-update-slice.
  * QKV and gate/up are fused into single matmuls.  Column order is
    TP-friendly: qkv columns are (head, which, head_dim) so a contiguous
    column shard = whole heads; gate_up columns are (inter, which) so a shard
    holds matching gate/up pairs.
  * K and V caches are [L, S, H, M, D] (head-major, D minor) — the layouts
    the QK^T / PV dots want, so no boundary relayouts.
  * Decode attention reads the cache only up to a static `cache_len` bucket
    (the engine rounds the current maximum length up), so early decode steps
    do not pay max_model_len reads.

Sequence layout (matches reference semantics, `t3.py:542-559`):

    [ cond (34 rows) | text embeds + text_pos | start_of_speech | speech ... ]

The unconditioned row keeps the cond prefix and start-of-speech but zeroes the
text embeddings (`t3.py:556`).  Speech positions are tracked exactly per token
(the reference restarts them at 0 every decode step and documents this as an
approximation, `t3.py:447-464`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import T3Config
from ...ops.norm import rms_norm
from ...ops.quant_matmul import quant_einsum
from ...ops.rotary import apply_rope, rope_table


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _dense_init(rng: np.random.Generator, shape, dtype, scale=0.02):
    """Host-side init + upload.  Numpy on purpose: jitted `jax.random.normal`
    would compile a remote program per leaf through the axon tunnel; host
    generation + device_put rides the fast upload path instead.  The dtype
    cast happens on device — numpy's ml_dtypes bfloat16 conversion is slow."""
    return jnp.asarray(rng.standard_normal(shape, np.float32) * scale).astype(dtype)


def fuse_qkv(q: np.ndarray, k: np.ndarray, v: np.ndarray, cfg: T3Config) -> np.ndarray:
    """[h, nh*hd] x3 -> [h, nh*3*hd] with column order (head, which, hd).

    A contiguous column shard then equals whole heads, so tensor-parallel
    sharding of the fused matrix never splits a q/k/v block (the fused-QKV
    analog of vLLM's QKVParallelLinear, which the reference uses implicitly
    through `LlamaModel`).
    """
    h = q.shape[0]
    nh, hd = cfg.num_heads, cfg.head_dim
    stacked = np.stack([w.reshape(h, nh, hd) for w in (q, k, v)], axis=2)
    return stacked.reshape(h, nh * 3 * hd)


def fuse_gate_up(gate: np.ndarray, up: np.ndarray) -> np.ndarray:
    """[h, I] x2 -> [h, I*2] with column order (inter, which): a contiguous
    column shard holds matching (gate, up) pairs for any divisor of I."""
    h, inter = gate.shape
    return np.stack([gate, up], axis=-1).reshape(h, 2 * inter)


def init_t3_params(key: jax.Array, cfg: T3Config, dtype=jnp.float32) -> dict:
    """Random-initialised T3 parameter pytree (tests / benchmarks).

    Real checkpoints are loaded by `utils/checkpoint.py`, which maps the
    reference safetensors names onto this tree (fusing QKV and gate/up).
    """
    if isinstance(key, (int, np.integer)):   # avoid any device round-trip
        seed = int(key)
    else:
        seed = int(np.asarray(jax.random.key_data(
            key if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key) else
            jax.random.wrap_key_data(key))).ravel()[-1])
    rng = np.random.Generator(np.random.PCG64(seed))
    h, nh, hd, inter = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size
    L = cfg.num_layers

    def stack(shape):
        return _dense_init(rng, (L,) + shape, dtype)

    layers = {
        "input_norm": jnp.ones((L, h), dtype),
        "qkv_proj": stack((h, nh * 3 * hd)),
        "o_proj": stack((nh * hd, h)),
        "post_norm": jnp.ones((L, h), dtype),
        "gate_up_proj": stack((h, 2 * inter)),
        "down_proj": stack((inter, h)),
    }
    return {
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "text_emb": _dense_init(rng, (cfg.text_vocab_size, h), dtype),
        "speech_emb": _dense_init(rng, (cfg.speech_vocab_size, h), dtype),
        # reference sizes: max_text_tokens+2 and max_speech_tokens+4
        # (`models/t3/t3.py:280-284`)
        "text_pos_emb": _dense_init(rng, (cfg.max_text_tokens + 2, h), dtype),
        "speech_pos_emb": _dense_init(rng, (cfg.max_speech_tokens + 4, h), dtype),
        "speech_head": _dense_init(rng, (h, cfg.speech_vocab_padded), dtype),
    }


class KVCache(NamedTuple):
    """Dense slotted KV cache: [num_layers, num_slots, kv_heads, max_len, head_dim].

    Slot s is one CFG stream; a request owns slots (2i, 2i+1).  Head-major,
    head_dim-minor — the natural operand layout for both attention dots, so
    the cache never gets relaid-out at jit boundaries.  The paged variant
    lives in `engine/paged.py` and shares the model interface.
    """

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: T3Config, num_slots: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_layers, num_slots, cfg.num_kv_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Layer pieces (shared by prefill / decode / paged decode)
# ---------------------------------------------------------------------------


def _layer_params(params: dict, l: int) -> dict:
    """Static per-layer view of the stacked layer arrays (and, when present,
    the stacked quantized weights, see ops/quant_matmul.QuantLayer)."""
    return jax.tree.map(lambda a: a[l], params["layers"])


def _qkv(lp: dict, y: jnp.ndarray, cfg: T3Config):
    """y [..., h] -> q, k, v each [..., nh, hd]."""
    nh, hd = cfg.num_heads, cfg.head_dim
    out = quant_einsum(y, lp["qkv_proj"])
    out = out.reshape(y.shape[:-1] + (nh, 3, hd))
    return out[..., 0, :], out[..., 1, :], out[..., 2, :]


def _mlp(lp: dict, y: jnp.ndarray) -> jnp.ndarray:
    gu = quant_einsum(y, lp["gate_up_proj"])
    gu = gu.reshape(y.shape[:-1] + (gu.shape[-1] // 2, 2))
    act = jax.nn.silu(gu[..., 0]) * gu[..., 1]
    return quant_einsum(act, lp["down_proj"])


# ---------------------------------------------------------------------------
# Prefill: O(T^2) causal attention over the new tokens only
# ---------------------------------------------------------------------------


# above this many prefill tokens, attention runs blockwise over query chunks
# (full [S, H, T, T] f32 scores at the 2048-token bucket would be ~8.6 GB)
PREFILL_BLOCKWISE_THRESHOLD = 512
PREFILL_QUERY_BLOCK = 256


def _prefill_attention(q, k, v, mask, scale):
    """Causal masked softmax attention for prefill.  q/k/v [S, T, H, D],
    mask [S, T(q), T(k)] bool -> [S, T, H, D] f32-accumulated.

    Small T: one fused einsum (fastest, scores fit trivially).  Large T:
    lax.scan over query blocks, so peak score memory is O(T * block) instead
    of O(T^2) — the pure-XLA flash-style formulation that keeps the
    reference's max_text_tokens=2048 bucket servable (full scores there
    would be ~8.6 GB f32)."""
    S, T, H, D = q.shape
    neg_inf = jnp.asarray(-1e30, jnp.float32)
    if T <= PREFILL_BLOCKWISE_THRESHOLD:
        scores = jnp.einsum("sthd,smhd->shtm", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[:, None, :, :], scores, neg_inf)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("shtm,smhd->sthd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    bq = PREFILL_QUERY_BLOCK
    nb = -(-T // bq)
    pad = nb * bq - T
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    maskp = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    # scan xs lead with the block axis
    q_blocks = qp.reshape(S, nb, bq, H, D).transpose(1, 0, 2, 3, 4)
    m_blocks = maskp.reshape(S, nb, bq, T).transpose(1, 0, 2, 3)

    def body(_, xs):
        qb, mb = xs                                  # [S, bq, H, D], [S, bq, T]
        scores = jnp.einsum("sthd,smhd->shtm", qb, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mb[:, None, :, :], scores, neg_inf)
        probs = jax.nn.softmax(scores, axis=-1)
        ob = jnp.einsum("shtm,smhd->sthd", probs.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        return None, ob

    _, out = jax.lax.scan(body, None, (q_blocks, m_blocks))
    out = out.transpose(1, 0, 2, 3, 4).reshape(S, nb * bq, H, D)
    return out[:, :T]


def _prefill_layer(lp, x, mask, positions, rope_cos, rope_sin, cfg, k_out, v_out):
    """One prefill layer.  Returns (x, k [S,H,T,D], v [S,H,T,D])."""
    S, T, _ = x.shape
    scale = cfg.head_dim ** -0.5
    resid = x
    y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv(lp, y, cfg)                      # [S, T, nh, hd]
    q = apply_rope(q, rope_cos, rope_sin, positions)
    k = apply_rope(k, rope_cos, rope_sin, positions)

    out = _prefill_attention(q, k, v, mask, scale).astype(x.dtype)
    out = out.reshape(S, T, cfg.num_heads * cfg.head_dim)
    x = resid + quant_einsum(out, lp["o_proj"])

    resid = x
    y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
    x = resid + _mlp(lp, y)
    return (x,
            k.transpose(0, 2, 1, 3).astype(k_out),
            v.transpose(0, 2, 1, 3).astype(v_out))


def t3_prefill(
    params: dict,
    cfg: T3Config,
    embeds: jnp.ndarray,         # [S, T, hidden]
    positions: jnp.ndarray,      # [S, T] int32
    prefill_len: jnp.ndarray,    # [S] int32 — true lengths (padding masked out)
    kv: KVCache,                 # cache with max_len >= T; written at offset 0
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    *,
    layer_mode: str = "scan",
) -> tuple[jnp.ndarray, KVCache]:
    """Run the backbone over a fresh sequence and write K/V at cache offset 0.

    Attention is causal over the new tokens themselves (a prefill never has
    prior cache), so cost is O(T^2) — independent of max_model_len, unlike a
    full-cache mask (the fix for round-1's 256-token bucket cap; reference
    supports max_text_tokens=2048, `models/t3/modules/t3_config.py:5`).

    layer_mode "scan" runs the 30 layers as a `lax.scan` over the stacked
    layer params (compiles a single layer body — ~30x smaller program, which
    matters through the slow axon compile tunnel); "unroll" is a static
    Python loop (marginally faster steady-state, 30x the compile time).
    """
    x = embeds
    S, T, h = x.shape
    t_idx = jnp.arange(T)
    # [S, T, T]: query t attends key m iff m <= t and m < prefill_len
    mask = (t_idx[None, None, :] <= t_idx[None, :, None]) & \
           (t_idx[None, None, :] < prefill_len[:, None, None])
    k_cache, v_cache = kv.k, kv.v

    if layer_mode == "scan":
        def body(x, lp):
            x, k, v = _prefill_layer(lp, x, mask, positions, rope_cos,
                                     rope_sin, cfg, k_cache.dtype, v_cache.dtype)
            return x, (k, v)

        x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, ks, (0, 0, 0, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, vs, (0, 0, 0, 0, 0))
    else:
        for l in range(cfg.num_layers):
            lp = _layer_params(params, l)
            x, k, v = _prefill_layer(lp, x, mask, positions, rope_cos,
                                     rope_sin, cfg, k_cache.dtype, v_cache.dtype)
            k_cache = k_cache.at[l, :, :, :T, :].set(k)
            v_cache = v_cache.at[l, :, :, :T, :].set(v)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k_cache, v_cache)


# ---------------------------------------------------------------------------
# Decode: single token per stream, in-place cache append, bucketed reads
# ---------------------------------------------------------------------------


def _decode_layer(lp, x, q_pos_args, mask, M, cfg, kk, vv):
    """One decode layer given that layer's cache views kk/vv [S, H, M, D]
    (already containing this step's K/V at `lengths`).  Returns x."""
    S, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    neg_inf = jnp.asarray(-1e30, jnp.float32)
    q = q_pos_args
    scores = jnp.einsum("shd,shmd->shm", q, kk,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[:, None, :], scores, neg_inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shm,shmd->shd", probs.astype(vv.dtype), vv,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return quant_einsum(out.reshape(S, nh * hd), lp["o_proj"])


def t3_decode(
    params: dict,
    cfg: T3Config,
    x: jnp.ndarray,              # [S, hidden] — this step's token embeddings
    kv: KVCache,
    lengths: jnp.ndarray,        # [S] int32 — tokens already in cache (= RoPE pos)
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    *,
    cache_len: Optional[int] = None,   # static read bound; None = max_len
    layer_mode: str = "scan",
    attn_impl: str = "xla",            # "xla" | "pallas" (ops/dense_attention)
    attn_interpret: bool = False,      # pallas interpret mode (CPU tests)
) -> tuple[jnp.ndarray, KVCache]:
    """One decode step over all streams.  The new token's K/V is appended at
    `lengths` in place; attention reads cache[:cache_len] with a length mask.
    The caller guarantees max(lengths) < cache_len.

    layer_mode "scan" runs the layers as `lax.scan` with the KV cache as
    *carry* (per-layer reads are dynamic slices, writes are in-place scatters
    — NOT the round-1 design that passed the cache through scan xs/ys and
    copied it every step).  "unroll" is the static Python loop.

    attn_impl "pallas" replaces the per-layer cache slice + einsums with the
    fused `dense_decode_attention` kernel (see ops/dense_attention.py for
    when that wins).
    """
    S, h = x.shape
    M = cache_len if cache_len is not None else kv.k.shape[3]
    rows = jnp.arange(S)
    mask = jnp.arange(M)[None, :] <= lengths[:, None]          # [S, M]
    k_cache, v_cache = kv.k, kv.v
    pos = lengths[:, None]
    scale = cfg.head_dim ** -0.5

    def attn_qkv(lp, x):
        y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, cfg)                             # [S, nh, hd]
        q = apply_rope(q[:, None], rope_cos, rope_sin, pos)[:, 0]
        k = apply_rope(k[:, None], rope_cos, rope_sin, pos)[:, 0]
        return q, k, v

    def attend(lp, x, q, k_cache, v_cache, l):
        """Post-write attention read + o_proj for layer l (traced or static)."""
        if attn_impl == "pallas":
            from ...ops.dense_attention import dense_decode_attention
            out = dense_decode_attention(
                q, k_cache, v_cache, l, lengths, cache_len=M,
                sm_scale=scale, interpret=attn_interpret).astype(x.dtype)
            return quant_einsum(out.reshape(S, cfg.num_heads * cfg.head_dim),
                                lp["o_proj"])
        kk = jax.lax.dynamic_index_in_dim(k_cache, l, 0,
                                          keepdims=False)[:, :, :M, :]
        vv = jax.lax.dynamic_index_in_dim(v_cache, l, 0,
                                          keepdims=False)[:, :, :M, :]
        return _decode_layer(lp, x, q, mask, M, cfg, kk, vv)

    if layer_mode == "scan":
        def body(carry, inputs):
            x, k_cache, v_cache = carry
            lp, l = inputs
            q, k, v = attn_qkv(lp, x)
            k_cache = k_cache.at[l, rows, :, lengths, :].set(
                k.astype(k_cache.dtype))
            v_cache = v_cache.at[l, rows, :, lengths, :].set(
                v.astype(v_cache.dtype))
            x = x + attend(lp, x, q, k_cache, v_cache, l)
            y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + _mlp(lp, y)
            return (x, k_cache, v_cache), None

        (x, k_cache, v_cache), _ = jax.lax.scan(
            body, (x, k_cache, v_cache),
            (params["layers"], jnp.arange(cfg.num_layers)))
    else:
        for l in range(cfg.num_layers):
            lp = _layer_params(params, l)
            q, k, v = attn_qkv(lp, x)
            k_cache = k_cache.at[l, rows, :, lengths, :].set(
                k.astype(k_cache.dtype))
            v_cache = v_cache.at[l, rows, :, lengths, :].set(
                v.astype(v_cache.dtype))
            x = x + attend(lp, x, q, k_cache, v_cache, l)
            y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
            x = x + _mlp(lp, y)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k_cache, v_cache)


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
    """[S, hidden] decode-step embeddings: speech_emb + exact speech_pos_emb."""
    e = params["speech_emb"][tokens] + params["speech_pos_emb"][speech_pos]
    return e.astype(dtype)


# ---------------------------------------------------------------------------
# Logits
# ---------------------------------------------------------------------------


def speech_logits(params: dict, hidden: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Project hidden states onto the speech vocab (fp32 logits).

    The head is vocab-padded to a 256 multiple for even vocab-parallel
    sharding; the padding columns are sliced off here.
    """
    logits = quant_einsum(hidden, params["speech_head"],
                          preferred_element_type=jnp.float32)
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
