"""Unit tests for the in-loop alignment stream analyzer."""

import jax.numpy as jnp
import numpy as np

from chatterbox_vllm2_tpu.engine.engine import DecodeState, alignment_analyzer_logits

EOS = 121
V = 128


def _state(n_gen, last, prev, completed_at=-1):
    B = len(n_gen)
    return DecodeState(
        kv=None, lengths=None,
        speech_pos=None,
        last_token=jnp.asarray(last, jnp.int32),
        prev_tokens=jnp.asarray(prev, jnp.int32),
        completed_at=jnp.asarray(completed_at if hasattr(completed_at, "__len__")
                                 else [completed_at] * B, jnp.int32),
        seen=None, done=None, stopped=None,
        n_generated=jnp.asarray(n_gen, jnp.int32),
        out_tokens=None, keys=None,
    )


def test_eos_suppressed_early():
    logits = jnp.zeros((1, V))
    st = _state([2], [5], [[3, 4]])
    out, _ = alignment_analyzer_logits(logits, st, jnp.asarray([20]), EOS)
    assert np.asarray(out)[0, EOS] <= -(2 ** 14)
    assert np.asarray(out)[0, 0] == 0.0


def test_eos_forced_on_repetition():
    logits = jnp.zeros((2, V))
    st = _state([50, 50], [7, 9], [[7, 7], [8, 9]])
    out, _ = alignment_analyzer_logits(logits, st, jnp.asarray([20, 20]), EOS)
    out = np.asarray(out)
    # row 0: last three tokens identical -> EOS forced
    assert out[0, EOS] >= 2 ** 14 and out[0, 0] <= -(2 ** 14)
    # row 1: no repetition, text covered -> untouched
    assert out[1, EOS] == 0.0


def test_long_tail_forces_eos():
    logits = jnp.zeros((1, V))
    # completed at frame 34, now at frame 45 -> 11 frames of tail
    st = _state([45], [7], [[5, 6]], completed_at=[34])
    out, ca = alignment_analyzer_logits(logits, st, jnp.asarray([20]), EOS)
    assert np.asarray(out)[0, EOS] >= 2 ** 14
    np.testing.assert_array_equal(np.asarray(ca), [34])  # unchanged


def test_completed_at_is_recorded_once():
    logits = jnp.zeros((1, V))
    st = _state([34], [7], [[5, 6]], completed_at=-1)
    _, ca = alignment_analyzer_logits(logits, st, jnp.asarray([20]), EOS)
    np.testing.assert_array_equal(np.asarray(ca), [34])
