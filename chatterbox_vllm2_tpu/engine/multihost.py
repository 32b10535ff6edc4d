"""Multi-host data-parallel serving driver (SURVEY §5.8, VERDICT r4 item 3).

Wraps the mesh-sharded `ContinuousEngine` in a lockstep protocol so N host
processes serve their own request queues against ONE global SPMD engine:

  * Slot ownership: the 'data' mesh axis is host-major, so each host owns a
    contiguous CFG-pair slot range (`parallel.distributed.host_batch_slice`)
    and admits only from its local queue into its own slots.
  * Lockstep rounds: every round, each host packs up to K admission
    proposals (slot + text ids + conditioning + sampling + seed) into a
    fixed-shape record and all hosts exchange them with ONE
    `process_allgather` — the only host-side synchronization point.  Every
    host then replays the SAME deterministic admission sequence (sorted by
    text bucket, then slot), so the SPMD prefill/admit/decode dispatches are
    identical everywhere; a host with an empty queue still participates in
    other hosts' admissions (its device shards hold part of every pair's
    state).
  * Harvest: post-chunk `done/n_generated/stopped/out_tokens` are
    allgathered (the state is 'data'-sharded, so no host can device_get it
    alone); each host keeps results only for its own request ids.
  * Liveness: the proposal record carries a has-work flag; `run()` loops
    while ANY host has work, so uneven load cannot deadlock the collectives
    (an idle host keeps dispatching the same chunks — its slots are masked
    `done` on device and cost nothing extra).

Request ids are `h{process}-{seq}` and seeds are assigned at submit time, so
the reconstructed requests are bit-identical on every host.
"""

from __future__ import annotations

import itertools
import time
from collections import deque
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, SamplingConfig
from .engine import T3Engine, T3Request, T3Result
from .scheduler import ContinuousEngine


class MultiHostContinuousEngine:
    """submit()/step()/run() with host-local queues over a global mesh."""

    MAX_ADMITS_PER_ROUND = 4          # proposals per host per round

    def __init__(self, config: Config, params: dict, *,
                 mesh: Optional[Mesh] = None, compute_dtype=jnp.bfloat16):
        from ..parallel.distributed import global_mesh, host_batch_slice

        self.mesh = mesh if mesh is not None else global_mesh()
        self.config = config
        self.inner = ContinuousEngine(
            T3Engine(config, params, compute_dtype=compute_dtype,
                     mesh=self.mesh))
        # per-request parameter vectors must be GLOBAL (replicated) arrays,
        # not process-local ones, for multi-process jit inputs
        rep = NamedSharding(self.mesh, P())
        self.inner._sampling = jax.device_put(
            jax.tree.map(np.asarray, self.inner._sampling), rep)
        self.inner._cfg_scale = jax.device_put(
            np.asarray(self.inner._cfg_scale), rep)
        self.inner._max_new = jax.device_put(
            np.asarray(self.inner._max_new), rep)
        self.inner._text_len = jax.device_put(
            np.asarray(self.inner._text_len), rep)

        self.B = config.engine.max_batch_size
        self.lo, self.hi = host_batch_slice(self.mesh, self.B)
        self.n_hosts = jax.process_count()
        self.host = jax.process_index()
        cfg = config.t3
        self._max_text = max(
            b for b in config.engine.prefill_buckets
            if cfg.cond_seq_len + b + 2 <= config.engine.max_model_len)
        self._cond_shape = (cfg.cond_seq_len, cfg.hidden_size)

        self._pending: deque = deque()
        self._results: dict[str, T3Result] = {}
        self._alias: dict[str, str] = {}     # wire rid -> caller request_id
        self._seq = itertools.count()
        self._seed = itertools.count(1)
        self._done_host = np.ones((self.B,), bool)

    # ------------------------------------------------------------------ #

    def submit(self, req: T3Request) -> str:
        # the WIRE id is always engine-generated (the proposal record packs
        # only its integer sequence number); a caller-supplied request_id is
        # preserved as an alias and restored on the caller's copy of the
        # result at harvest
        rid = f"h{self.host}-{next(self._seq)}"
        if req.request_id:
            self._alias[rid] = req.request_id
        req.request_id = rid
        if req.seed is None:
            # assigned now so the proposal record is complete and every host
            # reconstructs an identical request
            req.seed = (self.host + 1) * 1_000_003 + next(self._seed)
        if len(req.text_ids) > self._max_text:
            raise ValueError("text longer than the largest prefill bucket")
        self._pending.append((rid, req))
        return rid

    @property
    def has_local_work(self) -> bool:
        mine = any(s in self.inner._active for s in range(self.lo, self.hi))
        return bool(self._pending) or mine

    # ------------------------------------------------------------------ #
    # proposal record packing (fixed shapes for process_allgather)
    # ------------------------------------------------------------------ #

    def _pack_proposals(self):
        K, MT = self.MAX_ADMITS_PER_ROUND, self._max_text
        ints = np.full((K, 5 + MT), -1, np.int64)
        floats = np.zeros((K, 5), np.float32)
        conds = np.zeros((K,) + self._cond_shape, np.float32)
        free = [s for s in range(self.lo, self.hi)
                if bool(self._done_host[s]) and s not in self.inner._active]
        lock = getattr(self, "_lock", None)
        taken = []
        for k in range(K):
            if lock is not None:
                with lock:
                    if not self._pending or not free:
                        break
                    rid, req = self._pending.popleft()
            else:
                if not self._pending or not free:
                    break
                rid, req = self._pending.popleft()
            slot = free.pop(0)
            taken.append((slot, rid, req))
            L = len(req.text_ids)
            ints[k, 0] = slot
            ints[k, 1] = int(rid.split("-")[-1])
            ints[k, 2] = L
            ints[k, 3] = req.seed
            ints[k, 4] = req.max_new_tokens
            ints[k, 5:5 + L] = req.text_ids
            s = req.sampling
            floats[k] = (s.temperature, s.top_p, s.min_p,
                         s.repetition_penalty, s.cfg_scale)
            conds[k] = req.cond_emb
        busy = 1 if (self._pending or taken or any(
            s in self.inner._active for s in range(self.lo, self.hi))) else 0
        # bit 1: this host wants to stop its background loop; the loop only
        # exits once EVERY host set it (leaving a collective one-sided
        # aborts the peer's gloo/ICI transfer)
        stop_bit = 2 if getattr(self, "_stop_evt", None) is not None             and self._stop_evt.is_set() else 0
        work = np.asarray([busy | stop_bit], np.int64)
        return ints, floats, conds, work

    def _unpack(self, host: int, ints, floats, conds):
        """Rebuild one host's proposals as (slot, rid, T3Request) triples."""
        out = []
        for k in range(self.MAX_ADMITS_PER_ROUND):
            slot = int(ints[k, 0])
            if slot < 0:
                continue
            L = int(ints[k, 2])
            t, tp, mp, rp, cs = (float(x) for x in floats[k])
            rid = f"h{host}-{int(ints[k, 1])}"
            req = T3Request(
                text_ids=np.asarray(ints[k, 5:5 + L], np.int32),
                cond_emb=np.asarray(conds[k], np.float32),
                sampling=SamplingConfig(
                    temperature=t, top_p=tp, min_p=mp,
                    repetition_penalty=rp, cfg_scale=cs),
                max_new_tokens=int(ints[k, 4]),
                request_id=rid, seed=int(ints[k, 3]))
            out.append((slot, rid, req))
        return out

    # ------------------------------------------------------------------ #

    def step(self) -> list[T3Result]:
        """One lockstep round.  Returns my finished results; sets
        `self.global_work` (True while ANY host has work)."""
        from jax.experimental import multihost_utils as mh

        inner = self.inner
        ints, floats, conds, work = self._pack_proposals()
        g_ints, g_floats, g_conds, g_work = mh.process_allgather(
            (ints, floats, conds, work), tiled=True)
        g_ints = g_ints.reshape(self.n_hosts, *ints.shape)
        g_floats = g_floats.reshape(self.n_hosts, *floats.shape)
        g_conds = g_conds.reshape(self.n_hosts, *conds.shape)

        admits = []
        for h in range(self.n_hosts):
            admits.extend(self._unpack(h, g_ints[h], g_floats[h], g_conds[h]))
        groups: dict[int, list] = {}
        for slot, rid, req in admits:
            Tt = inner.engine._bucket_len(len(req.text_ids))
            groups.setdefault(Tt, []).append((slot, rid, req))
        for Tt in sorted(groups):
            grp = sorted(groups[Tt], key=lambda e: e[0])
            for j in range(0, len(grp), inner.ADMIT_BUCKETS[-1]):
                inner._admit_chunk(Tt, grp[j:j + inner.ADMIT_BUCKETS[-1]])

        before = set(self._results)
        if inner._active:
            steps = self.config.engine.decode_steps_per_dispatch
            active_slots = list(inner._active)
            cache_len = inner.engine._cache_len(
                int(inner._len_bound[active_slots].max()) + steps + 1)
            inner._state = inner.engine._decode_chunk(
                inner.engine.params, inner._state, inner._sampling,
                inner._cfg_scale, inner._max_new, inner._text_len,
                num_steps=steps, cache_len=cache_len)
            inner._len_bound[active_slots] += steps
            done, n_gen, stopped, out = mh.process_allgather(
                (inner._state.done, inner._state.n_generated,
                 inner._state.stopped, inner._state.out_tokens), tiled=True)
            self._done_host = np.asarray(done)
            self._last_out = np.asarray(out)
            self._last_n_gen = np.asarray(n_gen)
            inner._harvest(np.asarray(done), np.asarray(n_gen),
                           np.asarray(stopped), out_host=self._last_out)
            # keep only my results (other hosts' land in their own drivers)
            for rid in list(inner._results):
                res = inner._results.pop(rid)
                if rid.startswith(f"h{self.host}-"):
                    alias = self._alias.pop(rid, None)
                    if alias is not None:
                        res.request_id = alias
                    self._results[rid] = res
                    # signal under the WIRE rid — events are keyed by it;
                    # res.request_id may now carry the caller's alias
                    lock = getattr(self, "_lock", None)
                    if lock is not None:
                        with lock:
                            ev = self._events.get(rid)
                        if ev is not None:
                            ev.set()

        flags = np.asarray(g_work).astype(np.int64)
        self.global_work = bool(int((flags & 1).sum()))
        self.all_want_stop = bool(int((flags & 2).astype(bool).sum())
                                  == self.n_hosts)
        return [self._results[r] for r in self._results if r not in before]

    def run(self, requests: Sequence[T3Request],
            timeout_s: float = 900.0) -> list[T3Result]:
        """Serve my local requests to completion, staying in lockstep until
        EVERY host is idle (uneven load cannot deadlock the collectives)."""
        rids = [self.submit(r) for r in requests]
        t0 = time.time()
        self.global_work = True
        while self.global_work:
            self.step()
            if time.time() - t0 > timeout_s:
                raise TimeoutError("multi-host serving did not drain")
        return [self._results.pop(r) for r in rids]

    # ------------------------------------------------------------------ #
    # background lockstep loop (per-host HTTP serving)
    # ------------------------------------------------------------------ #

    def start(self) -> None:
        """Run the lockstep rounds on a background thread so host-local
        callers (e.g. a TTSService worker) can submit() and block on
        wait() while the collectives keep every host in step.  All hosts
        must start their loops; idle rounds cost one tiny allgather and the
        fast host simply blocks in it until the slow host arrives."""
        import threading

        if getattr(self, "_loop_thread", None) is not None:
            return
        self._lock = threading.Lock()
        self._events: dict = {}
        self._stop_evt = threading.Event()

        def loop():
            # coordinated shutdown: keep stepping (and serving other hosts'
            # work) until EVERY host has requested stop and no work remains.
            # Completion events are signaled inside step() under the wire
            # rid (results may carry a caller alias in request_id).
            while True:
                self.step()
                if (getattr(self, "all_want_stop", False)
                        and not self.global_work):
                    return
                if not self.global_work:
                    time.sleep(0.01)

        self._loop_thread = threading.Thread(target=loop, daemon=True,
                                             name="multihost-lockstep")
        self._loop_thread.start()

    def stop(self) -> None:
        if getattr(self, "_loop_thread", None) is None:
            return
        self._stop_evt.set()
        self._loop_thread.join(timeout=120)
        self._loop_thread = None

    def submit_wait(self, req: T3Request, timeout_s: float = 600.0) -> T3Result:
        """Thread-safe submit + block until this request completes (requires
        start()); the host-local entry an HTTP handler calls."""
        import threading

        ev = threading.Event()
        with self._lock:
            rid = self.submit(req)
            self._events[rid] = ev
        if not ev.wait(timeout_s):
            raise TimeoutError(f"request {rid} timed out")
        with self._lock:
            del self._events[rid]
            return self._results.pop(rid)

    # ------------------------------------------------------------------ #
    # serving-path adapters (TTSService / ChatterboxTTS call these)
    # ------------------------------------------------------------------ #

    @property
    def loop_running(self) -> bool:
        return getattr(self, "_loop_thread", None) is not None

    def submit_with_event(self, req: T3Request):
        """Thread-safe submit returning (rid, completion Event); requires
        start()."""
        import threading

        ev = threading.Event()
        with self._lock:
            rid = self.submit(req)
            self._events[rid] = ev
        return rid, ev

    def result(self, rid: str) -> T3Result:
        with self._lock:
            self._events.pop(rid, None)
            return self._results.pop(rid)

    def partial_tokens(self) -> dict:
        """Tokens-so-far for MY active requests, from the flags cached at
        the last lockstep round (no extra device traffic)."""
        from .engine import collect_partial_tokens

        out = getattr(self, "_last_out", None)
        n_gen = getattr(self, "_last_n_gen", None)
        if out is None:
            return {}
        mine = {s: v for s, v in list(self.inner._active.items())
                if v[0].startswith(f"h{self.host}-")}
        return collect_partial_tokens(mine, n_gen, out,
                                      self.config.t3.stop_speech_token)

    def generate(self, requests: Sequence[T3Request], seed: int = 0,
                 timeout_s: float = 900.0) -> list[T3Result]:
        """Engine-API adapter: with the background loop running, submit all
        and block; otherwise drive the lockstep rounds inline (run())."""
        for i, r in enumerate(requests):
            if r.seed is None:
                r.seed = seed + i
        if not self.loop_running:
            return self.run(requests, timeout_s=timeout_s)
        pairs = [self.submit_with_event(r) for r in requests]
        t0 = time.time()
        out = []
        for rid, ev in pairs:
            remaining = timeout_s - (time.time() - t0)
            if not ev.wait(max(remaining, 0.0)):
                raise TimeoutError(f"request {rid} timed out")
            out.append(self.result(rid))
        return out
