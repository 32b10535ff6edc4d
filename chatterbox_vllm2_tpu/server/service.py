"""TTS service: voice registry + queued, micro-batched synthesis.

The reference handles one request at a time (its async route awaits a
blocking `model.generate`; `api_server.py:269-276`), so concurrent clients
serialize.  Here HTTP threads enqueue jobs and a single worker drains the
queue in micro-batches of up to `max_batch_size`, so concurrent requests ride
one CFG-paired engine step — continuous batching at the serving layer, which
is exactly the workload the engine's slot scheduler was built for.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from ..config import SamplingConfig
from ..engine import T3Request
from ..frontend.audio import encode_audio, time_stretch
from ..frontend.text import detect_language, punc_norm
from .schema import TTSRequest

# Reference `api_server.py:54-72`: all six OpenAI preset voices map to one
# bundled reference wav.  Here presets resolve against CHATTERBOX_VOICE_DIR
# (<voice>.wav), falling back to CHATTERBOX_VOICE_WAV, falling back to the
# model's built-in default conditioning.
OPENAI_VOICES = ("alloy", "echo", "fable", "onyx", "nova", "shimmer")


class VoiceRegistry:
    """voice/preset/language-code -> reference wav path (or None = default)."""

    def __init__(self, voice_dir: Optional[str] = None,
                 default_wav: Optional[str] = None,
                 overrides: Optional[dict] = None):
        self.voice_dir = Path(voice_dir) if voice_dir else None
        self.default_wav = default_wav
        self.overrides = dict(overrides or {})

    @classmethod
    def from_env(cls) -> "VoiceRegistry":
        return cls(voice_dir=os.environ.get("CHATTERBOX_VOICE_DIR"),
                   default_wav=os.environ.get("CHATTERBOX_VOICE_WAV"))

    def get_voice_reference(self, voice: str) -> Optional[str]:
        """Reference `api_server.py:74-93`: preset -> wav path if it exists."""
        if voice in self.overrides:
            p = self.overrides[voice]
            return p if p and Path(p).exists() else None
        if self.voice_dir is not None:
            for ext in (".wav", ".flac", ".mp3"):
                p = self.voice_dir / f"{voice}{ext}"
                if p.exists():
                    return str(p)
        if self.default_wav and Path(self.default_wav).exists():
            return self.default_wav
        return None


@dataclass
class _Job:
    request: TTSRequest
    language_id: str
    wav_path: Optional[str]
    done: threading.Event = field(default_factory=threading.Event)
    audio: Optional[bytes] = None
    media_type: str = "audio/wav"
    metrics: dict = field(default_factory=dict)
    error: Optional[Exception] = None


class TTSService:
    """Owns the model, the voice registry, the job queue, and metrics."""

    def __init__(self, model, voices: Optional[VoiceRegistry] = None,
                 batch_window_ms: float = 8.0):
        self.model = model
        self.voices = voices or VoiceRegistry.from_env()
        self.batch_window_s = batch_window_ms / 1000.0
        self._queue: "queue.Queue[_Job]" = queue.Queue()
        self._stop = threading.Event()
        self._counters = {
            "requests_total": 0, "errors_total": 0,
            "speech_tokens_total": 0, "audio_seconds_total": 0.0,
            "t3_seconds_total": 0.0, "s3gen_seconds_total": 0.0,
        }
        self._counters_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="tts-service-worker")
        self._worker.start()

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def resolve_language(self, req: TTSRequest) -> str:
        """explicit -> voice-derived -> text heuristics -> 'en'
        (reference `api_server.py:242-249`)."""
        supported = self.model.get_supported_languages()
        lang = req.language_id
        if not lang and req.voice in supported:
            lang = req.voice  # voice given as a language code
        if not lang:
            lang = detect_language(req.input, supported=supported.keys(),
                                   default="en")
        lang = lang.lower()
        if lang not in supported:
            raise ValueError(
                f"Unsupported language '{lang}'. "
                f"Supported: {', '.join(supported)}")
        return lang

    def synthesize(self, req: TTSRequest,
                   timeout: Optional[float] = None) -> tuple[bytes, str, dict]:
        """Blocking entry used by HTTP threads; jobs batch across callers."""
        job = _Job(request=req, language_id=self.resolve_language(req),
                   wav_path=self.voices.get_voice_reference(req.voice))
        self._queue.put(job)
        if not job.done.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if job.error is not None:
            with self._counters_lock:
                self._counters["errors_total"] += 1
            raise job.error
        return job.audio, job.media_type, job.metrics

    def synthesize_stream(self, req: TTSRequest,
                          timeout: Optional[float] = None):
        """Streaming entry: yields (audio_chunk, media_type) per sentence
        segment, in order.  ALL segments are queued up front so they ride the
        continuous engine's batch concurrently — the first chunk arrives at
        first-sentence latency while later sentences are still decoding.  A
        capability the reference does not have (its route is one-shot,
        reference `api_server.py:228-329`)."""
        import dataclasses

        from ..frontend.text import split_segments

        segments = split_segments(req.input) or [req.input]
        language_id = self.resolve_language(req)
        wav_path = self.voices.get_voice_reference(req.voice)
        jobs = []
        for seg in segments:
            job = _Job(request=dataclasses.replace(req, input=seg),
                       language_id=language_id, wav_path=wav_path)
            self._queue.put(job)
            jobs.append(job)
        deadline = (time.monotonic() + timeout) if timeout else None
        for job in jobs:
            remaining = (deadline - time.monotonic()) if deadline else None
            if not job.done.wait(remaining):
                raise TimeoutError("streaming synthesis timed out")
            if job.error is not None:
                with self._counters_lock:
                    self._counters["errors_total"] += 1
                raise job.error
            yield job.audio, job.media_type

    def counters(self) -> dict:
        with self._counters_lock:
            return dict(self._counters)

    def shutdown(self) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=5)
        if hasattr(self.model, "shutdown"):
            self.model.shutdown()
        # fail anything still queued so no waiter hangs on an unset event
        while True:
            try:
                job = self._queue.get_nowait()
            except queue.Empty:
                break
            if job is not None and not job.done.is_set():
                job.error = RuntimeError("service shut down")
                job.done.set()

    # ------------------------------------------------------------------ #
    # worker
    # ------------------------------------------------------------------ #

    def _drain_batch(self) -> list[_Job]:
        job = self._queue.get()
        if job is None:
            return []
        jobs = [job]
        limit = self.model.config.engine.max_batch_size
        deadline = time.monotonic() + self.batch_window_s
        while len(jobs) < limit:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            jobs.append(nxt)
        return jobs

    def _run(self) -> None:
        # Multi-host engines own step() on their background lockstep loop —
        # the worker only submits and harvests completion events.  Other
        # continuous engines (submit/step) get the stepping loop: requests
        # join the device batch mid-decode of others.  The dense barrier
        # engine falls back to micro-batches.
        if getattr(self.model.engine, "loop_running", False):
            self._run_multihost()
            return
        if hasattr(self.model.engine, "submit"):
            self._run_continuous()
            return
        while not self._stop.is_set():
            jobs = self._drain_batch()
            if not jobs:
                continue
            try:
                self._process(jobs)
            except Exception as e:  # engine-level failure fails the batch
                for j in jobs:
                    if j.error is None and j.audio is None:
                        j.error = e
                        j.done.set()

    # -------------------------- continuous path ------------------------ #

    def _prep_job(self, j: _Job):
        """Tokenize + conditioning for one job; returns (T3Request, conds)."""
        model = self.model
        conds = model.get_audio_conditionals(j.wav_path)
        cond_emb = model.update_exaggeration(conds, j.request.exaggeration)
        ids = np.asarray(
            model.tokenizer.encode(
                punc_norm(j.request.input),
                j.language_id if model.variant == "multilingual" else None),
            np.int32)
        sampling = SamplingConfig(
            temperature=j.request.temperature,
            top_p=j.request.top_p, min_p=j.request.min_p,
            repetition_penalty=j.request.repetition_penalty,
            max_tokens=j.request.max_tokens,
            cfg_scale=j.request.cfg_scale,
        )
        return T3Request(text_ids=ids, cond_emb=cond_emb, sampling=sampling,
                         max_new_tokens=j.request.max_tokens,
                         seed=j.request.seed), conds

    def _finish_job(self, j: _Job, conds, res, t3_time: float) -> None:
        """S3Gen + encode for one finished T3 result."""
        self._finish_jobs([(j, conds, res, t3_time)])

    def _finish_jobs(self, entries) -> None:
        """Batched vocoding + per-job encode for finished T3 results.

        entries: [(job, conds, res, t3_time)].  Same-bucket utterances share
        one S3Gen dispatch (`inference_batch`) — the reference vocodes
        strictly serially (`tts.py:474-521`)."""
        model = self.model
        vocab = model.config.s3gen.speech_vocab_size
        s0 = time.time()
        items, seeds, live = [], [], []
        for j, conds, res, t3_time in entries:
            toks = res.tokens
            toks = toks[(toks >= 0) & (toks < vocab)]
            items.append((toks, conds.ref) if len(toks) else None)
            seeds.append(j.request.seed if j.request.seed is not None else 0)
            live.append((j, toks, t3_time))
        try:
            # one dispatch per distinct diffusion-step count
            wav_list = [None] * len(items)
            by_steps: dict = {}
            for k, (it, s) in enumerate(zip(items, seeds)):
                if it is not None:
                    by_steps.setdefault(
                        entries[k][0].request.diffusion_steps, []).append(k)
            for steps, ks in by_steps.items():
                outs = model.s3gen.inference_batch(
                    [items[k] for k in ks], n_timesteps=steps,
                    seeds=[seeds[k] for k in ks])
                for k, w in zip(ks, outs):
                    wav_list[k] = w
        except Exception as e:
            for j, _, _ in live:
                j.error = e
                j.done.set()
            return
        s3_time = time.time() - s0
        per_job_s3 = s3_time / max(len(entries), 1)
        for (j, toks, t3_time), wav in zip(live, wav_list):
            try:
                if wav is None:
                    wav = np.zeros(0, np.float32)
                if abs(j.request.speed - 1.0) > 1e-3:
                    # OpenAI-compat speed: WSOLA time stretch (the reference
                    # accepts `speed` but ignores it, api_server.py:41)
                    wav = time_stretch(wav, model.SR, j.request.speed)
                j.audio, j.media_type = encode_audio(
                    wav, model.SR, j.request.response_format)
                j.metrics = {
                    "speech_tokens": int(len(toks)),
                    "t3_time_s": round(t3_time, 3),
                    "s3gen_time_s": round(per_job_s3, 3),
                    "audio_s": round(len(wav) / model.SR, 3),
                    "language": j.language_id,
                }
                with self._counters_lock:
                    self._counters["requests_total"] += 1
                    self._counters["speech_tokens_total"] += int(len(toks))
                    self._counters["audio_seconds_total"] += len(wav) / model.SR
                    self._counters["s3gen_seconds_total"] += per_job_s3
                    self._counters["t3_seconds_total"] += t3_time
            except Exception as e:
                j.error = e
            finally:
                j.done.set()

    def _drain_new_jobs(self, block: bool, submit):
        """Shared queue-drain for the continuous/multihost workers: pull
        jobs (blocking only when idle), prep, and hand them to `submit`.
        Returns False if the shutdown sentinel was seen while stopping."""
        while True:
            try:
                job = (self._queue.get(timeout=0.25) if block
                       else self._queue.get_nowait())
            except queue.Empty:
                return True
            if job is None:
                return not self._stop.is_set()
            block = False
            try:
                req, conds = self._prep_job(job)
                submit(job, req, conds)
            except Exception as e:       # per-job prep failure
                job.error = e
                job.done.set()

    def _run_multihost(self) -> None:
        """Worker loop over a MultiHostContinuousEngine: submit jobs with
        completion events and harvest as the engine's own lockstep loop
        finishes them (never calls step() — that thread owns it)."""
        engine = self.model.engine
        inflight: dict[str, tuple[_Job, object, object]] = {}

        def submit(job, req, conds):
            rid, ev = engine.submit_with_event(req)
            inflight[rid] = (job, conds, ev)

        while not self._stop.is_set():
            if not self._drain_new_jobs(not inflight, submit):
                return
            # watchdog: if the engine's lockstep thread died, inflight
            # events will never fire — fail the jobs instead of hanging
            # their HTTP callers until timeout
            t = getattr(engine, "_loop_thread", None)
            if inflight and t is not None and not t.is_alive():
                err = RuntimeError("multi-host lockstep loop died")
                for rid, (j, _c, _e) in list(inflight.items()):
                    if j.error is None and j.audio is None:
                        j.error = err
                        j.done.set()
                inflight.clear()
                continue
            finished = [(rid, j, conds) for rid, (j, conds, ev)
                        in inflight.items() if ev.is_set()]
            for rid, j, conds in finished:
                inflight.pop(rid)
                try:
                    res = engine.result(rid)
                    self._finish_jobs([(j, conds, res, res.t3_time_s)])
                except Exception as e:
                    j.error = e
                    j.done.set()
            if inflight and not finished:
                time.sleep(0.01)

    def _run_continuous(self) -> None:
        engine = self.model.engine
        inflight: dict[str, tuple[_Job, object]] = {}  # rid -> (job, conds)

        def submit(job, req, conds):
            inflight[engine.submit(req)] = (job, conds)

        while not self._stop.is_set():
            # pull new jobs; block only when fully idle
            if not self._drain_new_jobs(
                    not inflight and not engine.has_work, submit):
                return
            if not engine.has_work:
                continue
            try:
                finished = [(inflight.pop(res.request_id), res)
                            for res in engine.step()
                            if res.request_id in inflight]
                if finished:
                    self._finish_jobs([(j, conds, res, res.t3_time_s)
                                       for (j, conds), res in finished])
            except Exception as e:       # engine-level failure fails inflight
                for rid, (j, _) in list(inflight.items()):
                    if j.error is None and j.audio is None:
                        j.error = e
                        j.done.set()
                inflight.clear()
                # Drain the engine's own pending/active state too — otherwise
                # orphaned slots keep decoding and later step() results can
                # alias dead request ids.  New jobs then start from a clean
                # engine (the service keeps serving).
                if hasattr(engine, "reset"):
                    engine.reset()

    def _process(self, jobs: list[_Job]) -> None:
        """Barrier micro-batch path (engine_kind="dense")."""
        model = self.model
        t0 = time.time()
        requests, conds_list, live = [], [], []
        for j in jobs:
            try:
                req, conds = self._prep_job(j)
                requests.append(req)
                conds_list.append(conds)
                live.append(j)
            except Exception as e:  # per-job prep failure: fail only that job
                j.error = e
                j.done.set()
        if not live:
            return

        results = model.engine.generate(requests)
        t3_time = time.time() - t0
        self._finish_jobs([(j, conds, res, t3_time)
                           for j, conds, res in zip(live, conds_list, results)])
