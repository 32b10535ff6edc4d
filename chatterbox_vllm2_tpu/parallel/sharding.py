"""Sharding specs for T3 parameters and engine state.

Tensor-parallel layout (Megatron-style column/row split, expressed as
NamedSharding and compiled by GSPMD into psum/all-gather over ICI):

  q/k/v_proj  [L, h, heads*hd]  -> split output dim over 'model'
  o_proj      [L, heads*hd, h]  -> split input  dim over 'model' (row) -> psum
  gate/up     [L, h, I]         -> split I over 'model'
  down        [L, I, h]         -> split I over 'model' (row) -> psum
  speech_head [h, V]            -> split V over 'model' (vocab-parallel, the
                                   analog of the reference's ParallelLMHead,
                                   reference `models/t3/t3.py:288-294`)
  embeddings / norms            -> replicated (tiny at 520M scale)

Engine state: batch (stream) axis over 'data'; KV cache heads over 'model'.
CFG pairs are adjacent stream rows, so the stream count per data shard stays
even — pairs never straddle shards.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def t3_param_specs() -> dict:
    layers = {
        "input_norm": P(None, None),
        "q_proj": P(None, None, "model"),
        "k_proj": P(None, None, "model"),
        "v_proj": P(None, None, "model"),
        "o_proj": P(None, "model", None),
        "post_norm": P(None, None),
        "gate_proj": P(None, None, "model"),
        "up_proj": P(None, None, "model"),
        "down_proj": P(None, "model", None),
    }
    return {
        "layers": layers,
        "final_norm": P(None),
        "text_emb": P(None, None),
        "speech_emb": P(None, None),
        "text_pos_emb": P(None, None),
        "speech_pos_emb": P(None, None),
        "speech_head": P(None, "model"),
    }


def kv_cache_spec() -> P:
    # [L, S, max_len, kv_heads, head_dim]
    return P(None, "data", None, "model", None)


def decode_state_specs(state_type) -> "object":
    """PartitionSpec pytree matching engine.DecodeState."""
    from ..engine.engine import DecodeState
    from ..models.t3.model import KVCache

    return DecodeState(
        kv=KVCache(kv_cache_spec(), kv_cache_spec()),
        lengths=P("data"),
        speech_pos=P("data"),
        last_token=P("data"),
        prev_tokens=P("data", None),
        completed_at=P("data"),
        seen=P("data", None),
        done=P("data"),
        stopped=P("data"),
        n_generated=P("data"),
        out_tokens=P("data", None),
        key=P(),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = t3_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"),
    )
