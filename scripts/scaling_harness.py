"""Scaling-efficiency harness: throughput at 1 device vs an N-device mesh.

BASELINE.md target: >=80% scaling efficiency on a 2-host slice.  Real pods
aren't available in this sandbox, so the harness supports:

  * --platform cpu --devices 8   virtual 8-device host (mesh logic, DCN-free)
  * default (TPU)                whatever jax.devices() offers

Usage:
    python scripts/scaling_harness.py --platform cpu --devices 8 \
        --mesh 2x4 --tokens 32

Prints per-config tokens/s and the efficiency of the mesh run vs the
single-device run scaled by device count.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from chatterbox_vllm2_tpu.config import (Config, EngineConfig, MeshConfig,
                                             SamplingConfig, T3Config)
    from chatterbox_vllm2_tpu.engine import T3Engine, T3Request
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params
    from chatterbox_vllm2_tpu.parallel import initialize, make_mesh

    initialize()
    data, model = (int(x) for x in args.mesh.split("x"))
    n_dev = data * model

    t3 = dataclasses.replace(T3Config.multilingual(), num_layers=args.layers)
    params = init_t3_params(0, t3, jnp.float32)

    def run(mesh, B):
        config = Config(t3=t3, engine=EngineConfig(
            max_batch_size=B, max_model_len=256, prefill_buckets=(32,),
            kv_cache_dtype="float32", cache_len_schedule="single"))
        eng = T3Engine(config, params, compute_dtype=jnp.float32, mesh=mesh)
        rng = np.random.RandomState(0)
        reqs = [T3Request(
            text_ids=rng.randint(1, t3.text_vocab_size, size=16).astype(np.int32),
            cond_emb=(rng.randn(34, t3.hidden_size) * 0.02).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.9,
                                    repetition_penalty=1.5),
            max_new_tokens=args.tokens) for _ in range(B)]
        eng.generate(reqs)                    # compile + warm
        t0 = time.time()
        res = eng.generate(reqs, seed=1)
        dt = time.time() - t0
        total = sum(len(r.tokens) + (1 if r.finished_by_stop else 0) for r in res)
        return total / dt

    B0 = max(2, 2 * data)
    tps_1 = run(None, B0)
    print(f"1 device,        batch {B0:>3}: {tps_1:9.1f} tok/s")
    mesh = make_mesh(MeshConfig(data=data, model=model))
    # same work per data shard: scale the batch with the data axis
    tps_n = run(mesh, B0 * data)
    print(f"mesh {args.mesh} ({n_dev} dev), batch {B0 * data:>3}: {tps_n:9.1f} tok/s")
    eff = tps_n / (tps_1 * n_dev)
    print(f"scaling efficiency vs {n_dev}x single-device: {eff:.1%} "
          f"(per-data-shard speedup {tps_n / tps_1:.2f}x over {data} shards)")
    if args.platform == "cpu":
        # Virtual CPU devices share one host's FLOPs, so the number above
        # cannot reach 1/n_dev x n_dev.  The honest virtual-mesh metric is
        # partitioning overhead: same GLOBAL batch, mesh vs no mesh — both
        # runs use the same silicon, so any slowdown is GSPMD collectives +
        # sharding bookkeeping.
        tps_same = run(None, B0 * data)
        overhead = 1.0 - tps_n / tps_same
        print(f"1 device,        batch {B0 * data:>3}: {tps_same:9.1f} tok/s")
        print(f"partitioning overhead at same global batch (virtual mesh): "
              f"{overhead:+.1%}  -> mesh efficiency {tps_n / tps_same:.1%} "
              f"of the shared-silicon ideal")
        print("NOTE: virtual CPU devices share one host's FLOPs — this run "
              "validates mesh/collective correctness and overhead, not real "
              "scaling; run on a pod slice for BASELINE's >=80% target.")


if __name__ == "__main__":
    main()
