"""Fully-jittable token sampler.

Replicates the sampling semantics the reference gets from vLLM's CUDA/torch
sampler (`SamplingParams` at reference `tts.py:455-464`): temperature, top-p,
repetition penalty, and a min-p the reference accepts but silently drops
(`tts.py:415` — ours is actually applied).

Repetition penalty follows vLLM: for every token id already present in the
sequence, positive logits are divided by the penalty and negative logits
multiplied by it.  The engine tracks per-stream token presence as a [S, V]
bool table (the only speech-space ids in the prompt are start/stop markers,
so presence over generated ids + start token is equivalent to vLLM's
prompt+output semantics).

Everything is shape-static and batched; sampling uses the Gumbel trick so a
single fused kernel serves greedy (temperature == 0) and stochastic paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingState(NamedTuple):
    """Per-request sampler parameters, stored SoA. All [B]-shaped, f32."""

    temperature: jnp.ndarray
    top_p: jnp.ndarray
    min_p: jnp.ndarray
    repetition_penalty: jnp.ndarray

    @classmethod
    def broadcast(cls, B: int, temperature=0.8, top_p=0.8, min_p=0.0,
                  repetition_penalty=2.0):
        f = lambda v: jnp.full((B,), v, jnp.float32)
        return cls(f(temperature), f(top_p), f(min_p), f(repetition_penalty))


def apply_repetition_penalty(
    logits: jnp.ndarray,        # [B, V] f32
    seen: jnp.ndarray,          # [B, V] bool — token id appeared in the sequence
    penalty: jnp.ndarray,       # [B] f32
) -> jnp.ndarray:
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def top_p_mask(probs_sorted: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Keep the smallest prefix of the descending-sorted probs with mass >= top_p.

    vLLM semantics: a token is kept iff the cumulative probability *excluding*
    it is still < top_p (so the first token crossing the threshold is kept).
    """
    cum = jnp.cumsum(probs_sorted, axis=-1)
    exclusive = cum - probs_sorted
    return exclusive < top_p[:, None]


def sample(
    logits: jnp.ndarray,        # [B, V] f32 — post-CFG logits
    state: SamplingState,
    seen: jnp.ndarray,          # [B, V] bool
    key: jax.Array,
) -> jnp.ndarray:
    """Sample one token per row. Returns [B] int32."""
    B, V = logits.shape
    logits = apply_repetition_penalty(logits, seen, state.repetition_penalty)

    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # temperature (guard 0 for the greedy path selected at the end)
    temp = jnp.maximum(state.temperature, 1e-6)[:, None]
    scaled = logits / temp
    probs = jax.nn.softmax(scaled, axis=-1)

    # min-p: drop tokens below min_p * max prob
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    minp_ok = probs >= (state.min_p[:, None] * pmax)

    # top-p over descending sort
    order = jnp.argsort(-probs, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    keep_sorted = top_p_mask(probs_sorted, state.top_p)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(B)[:, None], order
    ].set(keep_sorted)
    keep = keep & minp_ok

    masked = jnp.where(keep, scaled, -jnp.inf)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (B, V), jnp.float32, minval=1e-20, maxval=1.0)
    ))
    sampled_ids = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(state.temperature > 0, sampled_ids, greedy_ids)
