"""TPU compute ops: XLA-level primitives and Pallas kernels.

Modules:
  norm        — RMSNorm / LayerNorm
  rotary      — llama3-scaled rotary position embeddings
  attention   — dense reference attention paths (XLA)
  flash       — Pallas flash attention (prefill)
  paged       — Pallas ragged paged attention over a block KV cache (decode)
  quant       — INT8/INT4 quantization kernels (weights and KV cache)
  sampling    — jittable token sampler (temp / top-p / repetition penalty)
"""
