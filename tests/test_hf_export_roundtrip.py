"""Weight-bridge round trip: our params -> HF tensor layout -> our params."""

import jax
import numpy as np

from parler_tts_tpu.models.parler import ParlerTTS, convert_composite_params
from parler_tts_tpu.utils.hf_export import export_composite_to_hf_tensors

from test_training_step import init_state, tiny_config
from parler_tts_tpu.training import make_optimizer


def test_composite_roundtrip():
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    state = init_state(model, make_optimizer())
    params = jax.tree.map(np.asarray, state.params)

    tensors = export_composite_to_hf_tensors(params, cfg)
    back = convert_composite_params(tensors, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(back)[0]
    )
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_array_equal(leaf, flat_b[name], err_msg=name)


def test_export_tensor_layout_matches_reference_names():
    cfg = tiny_config()
    model = ParlerTTS(cfg)
    state = init_state(model, make_optimizer())
    tensors = export_composite_to_hf_tensors(
        jax.tree.map(np.asarray, state.params), cfg
    )
    # spot-check reference state-dict names and torch (out, in) orientation
    assert "decoder.model.decoder.layers.0.self_attn.q_proj.weight" in tensors
    assert "decoder.lm_heads.0.weight" in tensors
    assert "text_encoder.encoder.block.0.layer.0.SelfAttention.q.weight" in tensors
    assert "embed_prompts.weight" in tensors
    d = cfg.decoder.hidden_size
    assert tensors["decoder.lm_heads.0.weight"].shape == (cfg.decoder.vocab_size, d)
    assert tensors["decoder.model.decoder.embed_tokens.0.weight"].shape == (
        cfg.decoder.vocab_size + 1, d,
    )
