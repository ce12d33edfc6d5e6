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


def test_export_loads_into_reference_torch_model():
    """Models trained here must load in the reference implementation: export to
    the HF tensor layout, `load_state_dict` into the torch composite, and match
    teacher-forced logits."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import torch
    from test_composite_parity import build_pair, _inputs, PAD, BOS
    import jax.numpy as jnp

    # fresh random JAX params exported onto the reference skeleton
    ref, model, _, cfg = build_pair(seed=13)
    from test_training_step import init_state
    from parler_tts_tpu.training import make_optimizer

    jx_params = init_state(model, make_optimizer(), seed=13).params
    tensors = export_composite_to_hf_tensors(jax.tree.map(np.asarray, jx_params), cfg)
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(np.array(v)) for k, v in tensors.items()}, strict=False
    )
    # only non-persistent/positional buffers may be absent
    assert not unexpected, unexpected
    assert all("position" in m or "embed_positions" in m or "rotary" in m
               for m in missing), missing

    desc, desc_mask, prompt, prompt_mask, labels = _inputs(seed=14)
    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(desc), attention_mask=torch.tensor(desc_mask),
            prompt_input_ids=torch.tensor(prompt),
            prompt_attention_mask=torch.tensor(prompt_mask),
            labels=torch.tensor(labels),
        )
    b, t, k = labels.shape
    ref_logits = ref_out.logits.reshape(b, k, -1, ref_out.logits.shape[-1])[:, :, -t:].numpy()
    logits, _ = model.apply(
        {"params": jx_params},
        jnp.asarray(desc), jnp.asarray(desc_mask),
        jnp.asarray(prompt), jnp.asarray(prompt_mask), jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=3e-4, rtol=1e-3)
