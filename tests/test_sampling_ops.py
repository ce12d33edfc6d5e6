"""EOS-ordering constraint, min-length suppression, top-k/top-p filters."""

import jax
import jax.numpy as jnp
import numpy as np

from parler_tts_tpu.ops import (
    advance_eos_state,
    init_eos_state,
    mask_eos_ordering,
    record_sampled,
    sample_tokens,
    suppress_eos_before_min_length,
)
from parler_tts_tpu.ops.sampling import NEG_INF, apply_top_k, apply_top_p

EOS = 1024


def test_eos_ordering_blocks_higher_codebooks():
    b, k, v = 2, 4, 1026
    state = init_eos_state(b, k)
    logits = jnp.zeros((b, k, v))
    masked = mask_eos_ordering(logits, state, EOS)
    # codebook 0 may emit EOS, codebooks 1..3 may not
    assert np.asarray(masked)[0, 0, EOS] == 0.0
    assert np.all(np.asarray(masked)[:, 1:, EOS] == NEG_INF)
    # other vocab entries untouched
    assert np.all(np.asarray(masked)[:, :, 0] == 0.0)


def test_eos_ordering_cascade_matches_reference_processor():
    """Codebooks must finish strictly in order; the pointer advances one per step
    after the current codebook emits EOS (reference logits_processors.py:44-52)."""
    b, k = 1, 3
    state = init_eos_state(b, k)

    # step 1: codebook 0 emits EOS
    state = record_sampled(state, jnp.array([[EOS, 5, 7]]), EOS)
    state = advance_eos_state(state, k)
    assert int(state.first_unfinished[0]) == 1

    # step 2: codebook 1 not yet EOS -> pointer stays
    state = record_sampled(state, jnp.array([[EOS, 3, 9]]), EOS)
    state2 = advance_eos_state(state, k)
    assert int(state2.first_unfinished[0]) == 1

    # codebook 1 emits EOS -> pointer to 2, then saturates at K-1
    state3 = record_sampled(state2, jnp.array([[EOS, EOS, 2]]), EOS)
    state3 = advance_eos_state(state3, k)
    assert int(state3.first_unfinished[0]) == 2
    state4 = record_sampled(state3, jnp.array([[EOS, EOS, EOS]]), EOS)
    state4 = advance_eos_state(state4, k)
    assert int(state4.first_unfinished[0]) == 2  # saturates


def test_min_length_suppression():
    logits = jnp.zeros((1, 2, 1026))
    out = suppress_eos_before_min_length(logits, jnp.int32(3), 10, EOS)
    assert np.all(np.asarray(out)[:, :, EOS] == NEG_INF)
    out2 = suppress_eos_before_min_length(logits, jnp.int32(12), 10, EOS)
    assert np.all(np.asarray(out2)[:, :, EOS] == 0.0)


def test_top_k_keeps_k_best():
    logits = jnp.array([[[5.0, 4.0, 3.0, 2.0, 1.0]]])
    out = np.asarray(apply_top_k(logits, 2))
    assert (out[0, 0] > NEG_INF / 2).sum() == 2
    assert out[0, 0, 0] == 5.0 and out[0, 0, 1] == 4.0


def test_top_p_nucleus():
    # probs ~ [0.643, 0.236, 0.087, 0.032, 0.002]
    logits = jnp.log(jnp.array([[[0.643, 0.236, 0.087, 0.032, 0.002]]]))
    out = np.asarray(apply_top_p(logits, 0.8))
    kept = out[0, 0] > NEG_INF / 2
    # 0.643 < 0.8, 0.643+0.236 crosses 0.8 -> keep first two
    np.testing.assert_array_equal(kept, [True, True, False, False, False])


def test_greedy_vs_sampled():
    logits = jnp.zeros((2, 3, 8)).at[:, :, 5].set(10.0)
    greedy = sample_tokens(jax.random.key(0), logits, do_sample=False)
    assert np.all(np.asarray(greedy) == 5)
    sampled = sample_tokens(jax.random.key(0), logits, do_sample=True, temperature=1.0)
    assert np.all(np.asarray(sampled) == 5)  # peaked distribution


def test_sampling_respects_filters_jit():
    @jax.jit
    def run(key, logits):
        return sample_tokens(key, logits, do_sample=True, temperature=0.7, top_k=3, top_p=0.9)

    logits = jax.random.normal(jax.random.key(1), (4, 9, 1026))
    toks = run(jax.random.key(2), logits)
    assert toks.shape == (4, 9)
    assert toks.dtype == jnp.int32
