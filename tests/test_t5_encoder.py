"""T5 encoder parity vs HF torch T5EncoderModel (tiny random configs)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import T5Config as HFT5Config
from transformers import T5EncoderModel

from parler_tts_tpu.config import T5Config
from parler_tts_tpu.models.t5_encoder import T5Encoder, convert_t5_encoder_params
from parler_tts_tpu.utils.hf_bridge import torch_state_dict_to_numpy


def make_pair(seed=0, gated=True, d_model=64, layers=2, heads=4):
    torch.manual_seed(seed)
    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=d_model,
        d_kv=d_model // heads,
        d_ff=d_model * 2,
        num_layers=layers,
        num_heads=heads,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    ref = T5EncoderModel(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=120,
        d_model=d_model,
        d_kv=d_model // heads,
        d_ff=d_model * 2,
        num_layers=layers,
        num_heads=heads,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    params = convert_t5_encoder_params(torch_state_dict_to_numpy(ref.state_dict()), cfg)
    return ref, T5Encoder(cfg), params


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_parity(gated):
    ref, model, params = make_pair(gated=gated)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, size=(2, 11))
    mask = np.ones((2, 11), dtype=np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_t5_encoder_long_sequence_buckets():
    """Distances beyond max_distance exercise the log-bucket branch."""
    ref, model, params = make_pair(seed=1)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 120, size=(1, 50))
    with torch.no_grad():
        ref_out = ref(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=1e-3)
