"""Two-process multi-host SERVING smoke test on CPU (no pod needed).

Each of 2 processes (4 virtual devices each) runs its own
`MultiHostContinuousEngine` over one global (2, 4) mesh and serves a
DIFFERENT local request load (host 0: three requests, host 1: one) — the
uneven case that must not deadlock the lockstep collectives.  Every host's
results must match a single-process reference run of the same requests
token-for-token (per-request seeds make token streams placement-invariant).

    python scripts/multihost_serving_smoke.py

SURVEY.md §5.8 / VERDICT r4 item 3.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("SMOKE_PORT", 12391))
NPROC = 2
DEV_PER_PROC = 4
LOADS = {0: [0, 1, 2], 1: [3]}      # request indices per host (uneven)


def _setup_cpu():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def _config_and_params():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.config import Config, EngineConfig, T3Config
    from chatterbox_vllm2_tpu.models.t3.model import init_t3_params

    t3 = dataclasses.replace(T3Config.multilingual(), num_layers=2)
    config = Config(
        t3=t3,
        engine=EngineConfig(max_batch_size=4, max_model_len=128,
                            prefill_buckets=(16,), kv_cache_dtype="float32",
                            decode_steps_per_dispatch=4))
    params = init_t3_params(jax.random.PRNGKey(0), t3, jnp.float32)
    return config, params


def _requests(t3):
    import numpy as np

    from chatterbox_vllm2_tpu.config import SamplingConfig
    from chatterbox_vllm2_tpu.engine import T3Request

    rng = np.random.RandomState(7)
    return [
        T3Request(
            text_ids=rng.randint(1, t3.text_vocab_size, size=8 + i
                                 ).astype(np.int32),
            cond_emb=(rng.randn(t3.cond_seq_len, t3.hidden_size) * 0.02
                      ).astype(np.float32),
            sampling=SamplingConfig(temperature=0.8, top_p=0.9,
                                    repetition_penalty=1.5),
            max_new_tokens=10, seed=500 + i)
        for i in range(4)
    ]


def reference(out_path: str) -> None:
    """Single-process reference tokens (written by the parent)."""
    _setup_cpu()
    from chatterbox_vllm2_tpu.engine import T3Engine
    from chatterbox_vllm2_tpu.engine.scheduler import ContinuousEngine
    import jax.numpy as jnp

    config, params = _config_and_params()
    eng = ContinuousEngine(T3Engine(config, params,
                                    compute_dtype=jnp.float32))
    res = eng.generate(_requests(config.t3))
    json.dump({str(i): [int(t) for t in r.tokens]
               for i, r in enumerate(res)}, open(out_path, "w"))


def worker(ref_path: str) -> None:
    _setup_cpu()
    import jax

    from chatterbox_vllm2_tpu.parallel.distributed import initialize

    assert initialize()
    import jax.numpy as jnp

    from chatterbox_vllm2_tpu.engine.multihost import MultiHostContinuousEngine
    from chatterbox_vllm2_tpu.engine.scheduler import make_engine

    config, params = _config_and_params()
    # the server path: make_engine auto-selects (and starts) the multi-host
    # driver in multi-process jobs
    eng = make_engine(config, params, compute_dtype=jnp.float32)
    assert isinstance(eng, MultiHostContinuousEngine), type(eng)
    assert eng.loop_running
    eng.stop()          # phase 1 drives the rounds inline via run()
    assert (eng.lo, eng.hi) == ((0, 2) if eng.host == 0 else (2, 4)), \
        (eng.host, eng.lo, eng.hi)
    reqs = _requests(config.t3)
    mine = [reqs[i] for i in LOADS[eng.host]]
    results = eng.run(mine)
    ref = json.load(open(ref_path))
    for idx, res in zip(LOADS[eng.host], results):
        want = ref[str(idx)]
        got = [int(t) for t in res.tokens]
        assert got == want, (
            f"host {eng.host} request {idx}: {got} != reference {want}")
    print(f"worker {eng.host} OK: {len(results)} requests, "
          f"tokens match the single-process reference", flush=True)

    # phase 2: background lockstep loop with STAGGERED submissions — host 1
    # submits 0.6 s after host 0 while both loops idle-tick; the late
    # request must still complete (no deadlock from asymmetric timing)
    import dataclasses as _dc
    import time as _time

    eng.start()
    again = [_dc.replace(reqs[i], request_id=None, seed=800 + i)
             for i in LOADS[eng.host][:1]]
    if eng.host == 1:
        _time.sleep(0.6)
    again[0].request_id = f"caller-{eng.host}"   # alias path coverage
    res2 = eng.submit_wait(again[0], timeout_s=300)
    assert len(res2.tokens) > 0 or res2.finished_by_stop
    assert res2.request_id == f"caller-{eng.host}", res2.request_id
    # the serving adapter the TTSService path uses (generate -> events)
    more = [_dc.replace(reqs[i], request_id=None, seed=850 + i)
            for i in LOADS[eng.host]]
    res3 = eng.generate(more, timeout_s=300)
    assert len(res3) == len(more)
    eng.stop()
    print(f"worker {eng.host} staggered submit_wait OK "
          f"({len(res2.tokens)} tokens)", flush=True)
    if eng.host == 0:
        print("multihost_serving_smoke OK: 2 hosts x 4 devices, uneven "
              "load, global token parity, no deadlock")


def main() -> None:
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    ref_path = tempfile.mktemp(suffix=".json")
    subprocess.run([sys.executable, os.path.abspath(__file__), "--reference",
                    ref_path], check=True)
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        env.update({
            "CHATTERBOX_COORDINATOR": f"127.0.0.1:{PORT}",
            "CHATTERBOX_NUM_PROCESSES": str(NPROC),
            "CHATTERBOX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", ref_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    rc = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        rc.append(p.returncode)
    sys.stdout.write(outs[0].decode())
    if any(rc):
        for o in outs[1:]:
            sys.stdout.write(o.decode())
        raise SystemExit(f"worker exit codes {rc}")


if __name__ == "__main__":
    if "--reference" in sys.argv:
        reference(sys.argv[sys.argv.index("--reference") + 1])
    else:
        main()
