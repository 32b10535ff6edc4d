"""Sharding specs for T3 parameters and engine state.

Tensor-parallel layout (Megatron-style column/row split, expressed as
NamedSharding and compiled by GSPMD into psum/all-gather over ICI):

  qkv_proj     [L, h, nh*3*hd] -> split output dim over 'model'.  Fused-QKV
                                  columns are ordered (head, which, hd), so a
                                  contiguous shard = whole heads (model.py
                                  fuse_qkv) — no shard ever splits a q/k/v
                                  block.
  o_proj       [L, nh*hd, h]   -> split input dim over 'model' (row) -> psum
  gate_up_proj [L, h, 2I]      -> split over 'model'; columns ordered
                                  (inter, which) so shards hold matching
                                  gate/up pairs (model.py fuse_gate_up)
  down_proj    [L, I, h]       -> split I over 'model' (row) -> psum
  speech_head  [h, V]          -> split V over 'model' (vocab-parallel, the
                                  analog of the reference's ParallelLMHead,
                                  reference `models/t3/t3.py:288-294`)
  embeddings / norms           -> replicated (tiny at 520M scale)

Quantized weights (ops/quant_matmul.QuantTensor) shard with the same spec on
every field — data [L, K(/2), N], scales/zeros [L, G, N] all split along N.

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
        "qkv_proj": P(None, None, "model"),
        "o_proj": P(None, "model", None),
        "post_norm": P(None, None),
        "gate_up_proj": P(None, None, "model"),
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
    # [L, S, kv_heads, max_len, head_dim]
    return P(None, "data", "model", None, None)


def decode_state_specs():
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
        keys=P("data", None),
    )


def decode_state_shardings(mesh: Mesh):
    """NamedSharding pytree matching engine.DecodeState."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), decode_state_specs(),
        is_leaf=lambda x: isinstance(x, P))


def shard_engine_params(params: dict, mesh: Mesh) -> dict:
    """device_put the T3 param tree with TP specs.

    Quantized (QuantTensor) leaves: `data` takes the weight's spec; scales /
    zeros are [L, G, N] and follow only the output-column factor of that spec
    (replicated for row-split weights, whose scales are per-column).
    """
    from ..ops.quant_matmul import QuantTensor

    specs = t3_param_specs()

    def put(sub, spec):
        if isinstance(sub, dict):
            return {k: put(sub[k], spec[k]) for k in sub}
        if isinstance(sub, QuantTensor):
            ns = NamedSharding(mesh, spec)
            s_spec = NamedSharding(mesh, P(*([None] * (sub.scales.ndim - 1)),
                                           spec[-1]))
            return QuantTensor(
                jax.device_put(sub.data, ns),
                jax.device_put(sub.scales, s_spec),
                None if sub.zeros is None else jax.device_put(sub.zeros, s_spec),
                sub.bits, sub.group_size)
        return jax.device_put(sub, NamedSharding(mesh, spec))

    return put(params, specs)


# Backwards-compatible alias (round-1 name).
shard_params = shard_engine_params
