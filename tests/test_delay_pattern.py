"""Delay-pattern ops: parity with the reference torch implementation + round trips."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parler_tts_tpu.ops import (
    apply_delay_pattern_mask,
    build_delay_pattern_mask,
    undelay_pattern,
    unflatten_codebooks,
    valid_frame_lengths,
)

BOS, PAD = 1025, 1024


def torch_build_delay_pattern_mask(input_ids, bos_token_id, pad_token_id, max_length, num_codebooks):
    """Reference algorithm (modeling_parler_tts.py:214-276), reimplemented in torch
    for oracle comparison (kept verbatim in behavior, not copied code)."""
    input_ids = input_ids.reshape(-1, num_codebooks, input_ids.shape[-1])
    bsz, k, seq_len = input_ids.shape
    shifted = torch.full((bsz, k, max_length), -1, dtype=torch.long)
    if max_length < 2 * k - 1:
        return input_ids.reshape(bsz * k, -1), shifted.reshape(bsz * k, -1)
    for cb in range(k):
        shifted[:, cb, cb : seq_len + cb] = input_ids[:, cb]
    eos_tri = torch.triu(torch.ones((k, max_length), dtype=torch.bool), diagonal=max_length - k + 1)
    bos_tri = torch.tril(torch.ones((k, max_length), dtype=torch.bool))
    mask = ~(bos_tri | eos_tri)
    pattern = mask * shifted + bos_tri * bos_token_id + eos_tri * pad_token_id
    first = pattern[:, 0, :]
    starts = (first == -1).nonzero()[:, 1]
    first_start = int(starts.min()) if len(starts) else seq_len
    out = pattern[..., :first_start].reshape(bsz * k, -1)
    return out, pattern.reshape(bsz * k, -1)


@pytest.mark.parametrize("bsz,k,seq_len,max_len", [(2, 9, 1, 20), (1, 4, 1, 8), (3, 9, 5, 40), (2, 4, 3, 12)])
def test_pattern_matches_reference_oracle(bsz, k, seq_len, max_len):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1024, size=(bsz, k, seq_len))
    ids[:, :, 0] = BOS  # decoder start column

    ours_ids, ours_pat = build_delay_pattern_mask(jnp.asarray(ids), BOS, PAD, max_len)

    ref_ids, ref_pat = torch_build_delay_pattern_mask(
        torch.tensor(ids.reshape(bsz * k, seq_len)), BOS, PAD, max_len, k
    )
    np.testing.assert_array_equal(
        np.asarray(ours_pat).reshape(bsz * k, -1), ref_pat.numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours_ids).reshape(bsz * k, -1), ref_ids.numpy()
    )


def test_apply_overrides_only_pattern_positions():
    ids = jnp.array([[[7, 8, 9, 3]]])
    pattern = jnp.array([[[BOS, -1, -1, PAD, PAD]]])
    out = apply_delay_pattern_mask(ids, pattern)
    np.testing.assert_array_equal(np.asarray(out), [[[BOS, 8, 9, PAD]]])


@pytest.mark.parametrize("bsz,k,max_len", [(2, 9, 30), (1, 4, 10)])
def test_build_apply_undelay_roundtrip(bsz, k, max_len):
    """Simulate generation: fill every -1 with a distinct token, un-delay, and
    check each codebook row recovers its tokens in order."""
    rng = np.random.default_rng(1)
    start = jnp.full((bsz, k, 1), BOS, dtype=jnp.int32)
    _, pattern = build_delay_pattern_mask(start, BOS, PAD, max_len)

    fill = rng.integers(0, 1024, size=(bsz, k, max_len)).astype(np.int32)
    delayed = apply_delay_pattern_mask(jnp.asarray(fill), pattern)
    codes = undelay_pattern(delayed, k)

    assert codes.shape == (bsz, k, max_len - k)
    for cb in range(k):
        np.testing.assert_array_equal(
            np.asarray(codes)[:, cb],
            fill[:, cb, cb + 1 : max_len - k + cb + 1],
        )
    # un-delayed codes contain no BOS/PAD
    assert not np.any(np.asarray(codes) >= 1024)


def test_valid_frame_lengths():
    codes = jnp.array(
        [
            [[1, 2, 3], [4, 5, 6]],        # all valid -> 3
            [[1, PAD, 3], [4, 5, 6]],      # frame1 invalid -> 1
            [[PAD, 2, 3], [4, 5, 6]],      # frame0 invalid -> 0
        ]
    )
    np.testing.assert_array_equal(np.asarray(valid_frame_lengths(codes, 1024)), [3, 1, 0])


def test_unflatten_matches_reference_row_major():
    # the reference's (bsz*K, T) layout is row-major per sample
    ids = jnp.arange(2 * 3 * 4).reshape(2 * 3, 4)
    out = unflatten_codebooks(ids, 3)
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(out[1, 0]), np.asarray(ids[3]))
