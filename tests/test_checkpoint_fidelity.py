"""Full-scale checkpoint fidelity: a mini-v1-SHAPED HF checkpoint — sharded
safetensors written torch-side from the actual reference composite, weight-norm
parametrized DAC tensors (dac_wrapper/modeling_dac.py:148-164), enc_to_dec_proj
present (mini-v1: T5 768 != decoder 1024) and absent variants,
generation_config.json — loaded through `ParlerTTSPipeline.from_pretrained`
and parity-checked against the torch composite's logits at real config scale.
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest
import torch
from safetensors.numpy import save_file

from parler_tts_tpu.codec.convert import convert_dac_params, export_dac_params
from parler_tts_tpu.codec.dac_model import DACModel
from parler_tts_tpu.codec.registry import init_codec_params
from parler_tts_tpu.config import DACConfig, DecoderConfig, ParlerTTSConfig, T5Config
from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline
from parler_tts_tpu.utils.hf_bridge import torch_state_dict_to_numpy

from reference_oracle import import_reference_parler_tts, make_reference_composite_class

ref_pkg = import_reference_parler_tts()
RefComposite = make_reference_composite_class()


def _write_sharded_safetensors(tensors, path, n_shards=3):
    """HF-style sharded layout: model-0000i-of-0000N.safetensors + index json."""
    keys = sorted(tensors.keys())
    shards = [keys[i::n_shards] for i in range(n_shards)]
    index = {"metadata": {"total_size": 0}, "weight_map": {}}
    for i, shard_keys in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file(
            {k: np.ascontiguousarray(tensors[k]) for k in shard_keys},
            os.path.join(path, fname),
        )
        for k in shard_keys:
            index["weight_map"][k] = fname
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f)


def _build_checkpoint(tmp_path, t5_kw, dec_kw, dac_cfg, vocab=32128,
                      pad=1024, bos=1025, seed=0):
    """Reference torch composite + synthesized weight-normed DAC -> HF dir."""
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    torch.manual_seed(seed)
    t5 = T5EncoderModel(HFT5Config(dropout_rate=0.0, **t5_kw)).eval()
    ref_dec_cfg = ref_pkg.ParlerTTSDecoderConfig(
        pad_token_id=pad, bos_token_id=bos, eos_token_id=pad, dropout=0.0,
        **dec_kw,
    )
    dec = ref_pkg.ParlerTTSForCausalLM(ref_dec_cfg).eval()
    from parler_tts.dac_wrapper import DACConfig as RefDACConfig
    from parler_tts.dac_wrapper.modeling_dac import DACModel as RefDACModel

    ref_dac = RefDACModel(
        RefDACConfig(num_codebooks=dac_cfg.num_codebooks,
                     codebook_size=dac_cfg.codebook_size,
                     latent_dim=dac_cfg.latent_dim,
                     frame_rate=dac_cfg.frame_rate,
                     sampling_rate=dac_cfg.sampling_rate)
    ).eval()
    # composite config BEFORE construction: embed_prompts is sized from
    # config.vocab_size at __init__ (modeling:2395)
    ref_cfg = ref_pkg.ParlerTTSConfig.from_sub_models_config(
        t5.config, ref_dac.config, ref_dec_cfg, vocab_size=vocab,
    )
    ref_cfg.pad_token_id = pad
    ref_cfg.decoder_start_token_id = bos
    ref = RefComposite(config=ref_cfg, text_encoder=t5, audio_encoder=ref_dac,
                       decoder=dec).eval()

    tensors = torch_state_dict_to_numpy(ref.state_dict())
    # reference DAC is an external-package stub in this environment; synthesize
    # the descript tensors from a real JAX DAC init, split into weight-norm
    # (g, v) pairs with v deliberately rescaled so load-time folding is real
    dac = DACModel(dac_cfg)
    dac_params = jax.tree.map(
        np.asarray, init_codec_params(dac, dac_cfg, jax.random.key(seed + 1))
    )
    tensors.update(
        export_dac_params(dac_params, dac_cfg, prefix="audio_encoder.model.",
                          weight_norm=True, v_scale=3.0)
    )

    path = str(tmp_path / "ckpt")
    os.makedirs(path)
    _write_sharded_safetensors(tensors, path)
    cfg_json = {
        "vocab_size": vocab,
        "pad_token_id": pad,
        "decoder_start_token_id": bos,
        "prompt_cross_attention": False,
        "text_encoder": dict(t5_kw, dropout_rate=0.0),
        "audio_encoder": dict(
            {"model_type": "dac_on_the_hub"},
            **{f.name: getattr(dac_cfg, f.name) for f in dataclasses.fields(dac_cfg)},
        ),
        "decoder": dict(dec_kw, pad_token_id=pad, bos_token_id=bos,
                        eos_token_id=pad, dropout=0.0),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_json, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"max_length": 2580, "do_sample": True, "temperature": 1.0,
                   "bos_token_id": bos, "pad_token_id": pad,
                   "eos_token_id": pad}, f)
    return ref, dac_params, path


def _logits_parity(ref, pipe, b=1, s_desc=10, s_p=6, t=12, atol=2e-3):
    import jax.numpy as jnp

    k = pipe.config.decoder.num_codebooks
    rng = np.random.default_rng(7)
    desc = rng.integers(0, pipe.config.text_encoder.vocab_size, size=(b, s_desc))
    dm = np.ones((b, s_desc), np.int64)
    prompt = rng.integers(0, pipe.config.vocab_size, size=(b, s_p))
    pm = np.ones((b, s_p), np.int64)
    labels = rng.integers(0, pipe.config.decoder.pad_token_id, size=(b, t, k))

    with torch.no_grad():
        ref_out = ref(
            input_ids=torch.tensor(desc), attention_mask=torch.tensor(dm),
            prompt_input_ids=torch.tensor(prompt),
            prompt_attention_mask=torch.tensor(pm),
            labels=torch.tensor(labels),
        )
    ref_logits = ref_out.logits.reshape(b, k, -1, ref_out.logits.shape[-1])[:, :, -t:].numpy()

    logits, _ = pipe.model.apply(
        {"params": pipe.params},
        jnp.asarray(desc), jnp.asarray(dm), jnp.asarray(prompt), jnp.asarray(pm),
        jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_mini_v1_scale_checkpoint_fidelity(tmp_path):
    """mini-v1 dimensions: flan-t5-base encoder (768) + 24L/1024h/9-codebook
    decoder (enc_to_dec_proj PRESENT), full-size DAC, sharded safetensors."""
    ref, dac_params, path = _build_checkpoint(
        tmp_path,
        t5_kw=dict(vocab_size=32128, d_model=768, d_kv=64, d_ff=2048,
                   num_layers=12, num_heads=12,
                   feed_forward_proj="gated-gelu"),  # flan-t5-base is gated
        dec_kw=dict(vocab_size=1088, hidden_size=1024, num_hidden_layers=24,
                    num_attention_heads=16, ffn_dim=4096, num_codebooks=9,
                    max_position_embeddings=4096),
        dac_cfg=DACConfig(),  # real v1 DAC geometry
    )
    pipe = ParlerTTSPipeline.from_pretrained(path)
    # generation_config.json parsed
    assert pipe.generation_config.max_length == 2580
    assert pipe.generation_config.do_sample is True
    # enc_to_dec_proj made it through (768 != 1024)
    assert "enc_to_dec_proj" in pipe.params
    # weight-norm folding reproduced the exact DAC weights at full scale
    host_dac = jax.tree.map(np.asarray, pipe.dac_params)
    flat_a = jax.tree_util.tree_leaves_with_path(host_dac)
    flat_b = dict(
        ("/".join(str(getattr(p, "key", p)) for p in kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(dac_params)
    )
    checked = 0
    for kp, v in flat_a:
        key = "/".join(str(getattr(p, "key", p)) for p in kp)
        np.testing.assert_allclose(v, flat_b[key], atol=1e-5, err_msg=key)
        checked += 1
    assert checked > 100
    _logits_parity(ref, pipe)


@pytest.mark.slow
def test_large_v1_geometry_checkpoint_fidelity(tmp_path):
    """large-v1 layer geometry (init_large_model.py:25-43): 1536 hidden /
    24 heads (MHA, num_key_value_heads=24) / 6144 ffn decoder over 9
    codebooks, flan-t5-large encoder width (1024, gated-gelu) — layer COUNTS
    trimmed (30->4 decoder, 24->2 encoder) to keep the CPU oracle tractable;
    every per-layer tensor keeps the exact large-v1 shape."""
    ref, _, path = _build_checkpoint(
        tmp_path,
        t5_kw=dict(vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
                   num_layers=2, num_heads=16,
                   feed_forward_proj="gated-gelu"),  # flan-t5-large is gated
        dec_kw=dict(vocab_size=1088, hidden_size=1536, num_hidden_layers=4,
                    num_attention_heads=24, num_key_value_heads=24,
                    ffn_dim=6144, num_codebooks=9,
                    max_position_embeddings=4096),
        dac_cfg=DACConfig(),  # real v1 DAC geometry
        seed=11,
    )
    pipe = ParlerTTSPipeline.from_pretrained(path)
    # enc_to_dec_proj present (1024 != 1536)
    assert "enc_to_dec_proj" in pipe.params
    assert pipe.config.decoder.hidden_size == 1536
    assert pipe.config.decoder.num_attention_heads == 24
    _logits_parity(ref, pipe, t=8)


@pytest.mark.slow
def test_checkpoint_fidelity_no_enc_to_dec_proj(tmp_path):
    """Equal hidden sizes: the reference writes NO enc_to_dec_proj tensors; the
    loader must cope (modeling:2388-2392) and logits must still match."""
    ref, _, path = _build_checkpoint(
        tmp_path,
        t5_kw=dict(vocab_size=400, d_model=64, d_kv=16, d_ff=128,
                   num_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=20),
        dec_kw=dict(vocab_size=100, hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, ffn_dim=128, num_codebooks=4,
                    max_position_embeddings=256),
        dac_cfg=DACConfig(num_codebooks=4, codebook_size=88, codebook_dim=4,
                          latent_dim=32, encoder_dim=4, encoder_rates=(2, 4),
                          decoder_dim=32, decoder_rates=(4, 2),
                          sampling_rate=8000, frame_rate=1000),
        vocab=256, pad=88, bos=89, seed=3,
    )
    pipe = ParlerTTSPipeline.from_pretrained(path)
    assert "enc_to_dec_proj" not in pipe.params
    _logits_parity(ref, pipe, atol=5e-4)


def test_weight_norm_split_matches_torch():
    """export_dac_params' (g, v) split must reconstruct the weight through
    torch's own weight_norm math."""
    from parler_tts_tpu.codec.convert import _split_weight_norm

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 4, 7)).astype(np.float32)
    g, v = _split_weight_norm(w, v_scale=2.5)
    # torch: w = g * v / ||v|| (norm over dims 1..N)
    tv = torch.tensor(v)
    norm = tv.norm(dim=(1, 2), keepdim=True)
    rec = (torch.tensor(g) * tv / norm).numpy()
    np.testing.assert_allclose(rec, w, atol=1e-6)
