"""Fully-jittable token sampler with per-stream RNG.

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

Top-p uses a binary-searched probability threshold instead of a full sort:
the vLLM keep-rule (keep token i iff the cumulative mass of strictly-more-
probable tokens is < top_p) is a threshold rule on probabilities, so 30
bisection steps over [0, 1] find the exact cut (up to float ties, which vLLM
breaks by sort order — indistinguishable in practice).  A [B, V] bisection
pass costs microseconds on the VPU; a descending sort of V=8194 costs ~1 ms
per decode step.

Every row samples from its own PRNG key, so per-request seeds are
reproducible regardless of co-batched traffic (round-1 batches shared one
key; ADVICE.md round 1, item 1).
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


def top_p_threshold(probs: jnp.ndarray, top_p: jnp.ndarray,
                    iters: int = 30) -> jnp.ndarray:
    """Per-row probability threshold t such that {p_i > t} is exactly the
    vLLM top-p keep set: keep i iff sum of probs strictly greater than p_i
    is < top_p (the first token crossing the threshold is kept)."""

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs > mid[:, None], probs, 0.0), axis=-1)
        too_low = mass >= top_p          # threshold admits >= top_p mass above it
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    B = probs.shape[0]
    lo, hi = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((B,), jnp.float32), jnp.ones((B,), jnp.float32)))
    return lo


def sample(
    logits: jnp.ndarray,        # [B, V] f32 — post-CFG logits
    state: SamplingState,
    seen: jnp.ndarray,          # [B, V] bool
    keys: jax.Array,            # [B] typed PRNG keys, one per stream
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

    thresh = top_p_threshold(probs, state.top_p)
    keep = (probs > thresh[:, None]) & minp_ok
    # the most-probable token always survives both filters
    keep = keep.at[jnp.arange(B), jnp.argmax(probs, axis=-1)].set(True)

    masked = jnp.where(keep, scaled, -jnp.inf)
    uniform = jax.vmap(
        lambda k: jax.random.uniform(k, (V,), jnp.float32, 1e-20, 1.0))(keys)
    gumbel = -jnp.log(-jnp.log(uniform))
    sampled_ids = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(state.temperature > 0, sampled_ids, greedy_ids)


def split_keys(raw: jnp.ndarray) -> tuple[jax.Array, jnp.ndarray]:
    """Advance a [B, 2]-uint32 vector of raw PRNG keys one step.

    Returns (typed keys to use now [B], raw carry [B, 2]).  Keys live in the
    engine state as raw uint32 so slots can be scattered/updated like any
    other state row (typed key arrays don't support .at updates)."""
    keys = jax.vmap(jax.random.wrap_key_data)(raw)
    pairs = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return pairs[:, 0], jax.vmap(jax.random.key_data)(pairs[:, 1])


def make_keys(seeds) -> jnp.ndarray:
    """[B, 2] raw uint32 key data from an integer seed vector."""
    seeds = jnp.asarray(seeds, jnp.uint32)
    return jax.vmap(lambda s: jax.random.key_data(jax.random.key(s)))(seeds)
