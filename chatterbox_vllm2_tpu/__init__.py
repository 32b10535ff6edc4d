"""TPU-native Chatterbox TTS inference framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
groxaxo/chatterbox-vllm2 (reference surveyed in /root/repo/SURVEY.md):

  text --tokenize--> T3 (520M Llama-style decoder, CFG-paired) --> speech tokens
  speech tokens + voice ref --> S3Gen (conformer -> CFM -> HiFT) --> 24 kHz wav

Unlike the reference (which delegates its engine to vLLM + CUDA), this package
owns the serving engine natively on TPU: a jitted continuous-batching decode
loop over a paged KV cache, Pallas kernels for the hot ops, CFG pairing as a
native batch axis, and pjit/shard_map sharding over multi-host device meshes.
"""

__version__ = "0.1.0"
