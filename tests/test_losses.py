"""Per-codebook masked CE: parity with a torch oracle of the reference loss."""

import jax.numpy as jnp
import numpy as np
import torch

from parler_tts_tpu.ops import (
    mean_loss_reference_style,
    per_codebook_cross_entropy,
    shift_tokens_right,
)

BOS, EOS, PAD = 1025, 1024, 1024


def torch_reference_loss(logits, labels, input_ids, num_codebooks, codebook_weights=None, reduction="mean"):
    """Oracle re-derivation of modeling_parler_tts.py:1928-1957."""
    loss_fct = torch.nn.CrossEntropyLoss(reduction=reduction)
    labels = labels.masked_fill(labels == BOS, -100)
    mask = (input_ids.transpose(1, 2) != EOS) & (labels != -100)
    loss = torch.zeros([])
    per_cb = []
    for cb in range(num_codebooks):
        cb_logits = logits[:, cb].reshape(-1, logits.shape[-1])
        cb_mask = mask[..., cb].reshape(-1)
        cb_labels = labels[..., cb].reshape(-1)
        cb_loss = loss_fct(cb_logits[cb_mask], cb_labels[cb_mask])
        per_cb.append(cb_loss)
        if codebook_weights is not None:
            cb_loss = cb_loss * codebook_weights[cb]
        loss = loss + cb_loss
    if codebook_weights is not None:
        loss = loss / sum(codebook_weights)
    else:
        loss = loss / num_codebooks
    return loss, per_cb


def _random_case(seed=0, b=2, k=4, t=10, v=32):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, k, t, v)).astype(np.float32)
    labels = rng.integers(0, v - 2, size=(b, t, k)).astype(np.int64)
    # sprinkle BOS labels and EOS inputs
    labels[0, 2, 1] = BOS % v if BOS < v else v - 1
    inputs = rng.integers(0, v - 2, size=(b, k, t)).astype(np.int64)
    inputs[0, 0, 5] = EOS if EOS < v else v - 1
    return logits, labels, inputs


def test_mean_loss_matches_torch_oracle():
    v = 1100  # big enough vocab to hold the real special ids
    rng = np.random.default_rng(3)
    b, k, t = 2, 9, 12
    logits = rng.normal(size=(b, k, t, v)).astype(np.float32)
    labels = rng.integers(0, 1024, size=(b, t, k)).astype(np.int64)
    labels[0, 3, 2] = BOS
    labels[1, 5, 0] = EOS
    inputs = rng.integers(0, 1024, size=(b, k, t)).astype(np.int64)
    inputs[0, 2, 7] = EOS
    inputs[1, 8, 3] = EOS

    ours, per_cb = mean_loss_reference_style(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(inputs),
        bos_token_id=BOS, eos_token_id=EOS,
    )
    ref, ref_per_cb = torch_reference_loss(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(inputs), k
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(per_cb), [float(x) for x in ref_per_cb], rtol=1e-5
    )


def test_codebook_weights():
    v = 1100
    rng = np.random.default_rng(4)
    b, k, t = 1, 4, 8
    logits = rng.normal(size=(b, k, t, v)).astype(np.float32)
    labels = rng.integers(0, 1024, size=(b, t, k)).astype(np.int64)
    inputs = rng.integers(0, 1024, size=(b, k, t)).astype(np.int64)
    w = (2.0, 1.0, 1.0, 0.5)

    ours, _ = mean_loss_reference_style(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(inputs),
        bos_token_id=BOS, eos_token_id=EOS, codebook_weights=w,
    )
    ref, _ = torch_reference_loss(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(inputs), k,
        codebook_weights=list(w),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_sum_loss_and_count():
    v = 1100
    rng = np.random.default_rng(5)
    b, k, t = 2, 4, 6
    logits = rng.normal(size=(b, k, t, v)).astype(np.float32)
    labels = rng.integers(0, 1024, size=(b, t, k)).astype(np.int64)
    inputs = rng.integers(0, 1024, size=(b, k, t)).astype(np.int64)
    inputs[0, 1, 2] = EOS

    sum_loss, num_items, _, counts = per_codebook_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(inputs),
        bos_token_id=BOS, eos_token_id=EOS,
    )
    # torch sum-reduction oracle. NOTE: the reference divides by num_codebooks
    # even under sum reduction (modeling_parler_tts.py:1955-1957), so our raw
    # token-sum is exactly K times the reference value.
    ref_sum, _ = torch_reference_loss(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(inputs), k,
        reduction="sum",
    )
    np.testing.assert_allclose(float(sum_loss), float(ref_sum) * k, rtol=1e-5)
    assert int(num_items) == b * k * t - 1  # one masked input position
    assert int(counts.sum()) == int(num_items)


def test_shift_tokens_right():
    labels = jnp.array([[[1, 2], [3, 4], [5, 6]]])  # (1, T=3, K=2)
    out = shift_tokens_right(labels, PAD, BOS)
    assert out.shape == (1, 2, 3)
    np.testing.assert_array_equal(np.asarray(out), [[[BOS, 1, 3], [BOS, 2, 4]]])

    labels2 = jnp.array([[[-100, 2], [3, 4], [5, 6]]])
    out2 = shift_tokens_right(labels2, PAD, BOS)
    np.testing.assert_array_equal(np.asarray(out2)[0, 0], [BOS, PAD, 3])


def test_chunked_fused_head_ce_matches_unchunked():
    """chunked_per_codebook_cross_entropy(hidden, heads, ...) == the unchunked
    loss on einsum'd logits — values AND grads (wrt hidden and heads), for
    chunk sizes that do and don't divide T."""
    import jax

    from parler_tts_tpu.ops import chunked_per_codebook_cross_entropy

    rng = np.random.default_rng(3)
    b, k, t, v, d = 2, 4, 10, 32, 16
    hidden = rng.normal(size=(b, t, d)).astype(np.float32)
    heads = rng.normal(size=(k, d, v)).astype(np.float32) * 0.3
    labels = rng.integers(0, v - 2, size=(b, t, k)).astype(np.int32)
    labels[0, 2, 1] = -100
    inputs = rng.integers(0, v - 2, size=(b, k, t)).astype(np.int32)
    inputs[0, 0, 5] = EOS % v

    def ref(hd, hs):
        logits = jnp.einsum(
            "btd,kdv->bktv", hd, hs, preferred_element_type=jnp.float32
        )
        s, n, m, c = per_codebook_cross_entropy(
            logits, labels, inputs,
            bos_token_id=BOS, eos_token_id=EOS % v,
            codebook_weights=(1.0, 0.5, 0.25, 0.25),
        )
        return s, (n, m, c)

    s0, (n0, m0, c0) = ref(hidden, heads)
    g0 = jax.grad(lambda *a: ref(*a)[0], argnums=(0, 1))(hidden, heads)

    for chunk in (5, 4, 16):  # divides / ragged / > T
        def ch(hd, hs):
            s, n, m, c = chunked_per_codebook_cross_entropy(
                hd, hs, labels, inputs,
                bos_token_id=BOS, eos_token_id=EOS % v,
                codebook_weights=(1.0, 0.5, 0.25, 0.25),
                chunk_size=chunk,
            )
            return s, (n, m, c)

        s1, (n1, m1, c1) = ch(hidden, heads)
        np.testing.assert_allclose(float(s1), float(s0), rtol=1e-6)
        assert int(n1) == int(n0)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
        g1 = jax.grad(lambda *a: ch(*a)[0], argnums=(0, 1))(hidden, heads)
        for a, bgrad in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(bgrad), np.asarray(a), rtol=2e-5, atol=1e-6
            )
